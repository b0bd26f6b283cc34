"""Mixture-weight expansion vs the DuckDB splitmix64 replay."""

import duckdb
import numpy as np
import pandas as pd

from lexor_ray.ops.sampling import (
    materialize_epochs,
    mixture_weights,
    mixture_weights_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def _oracle(parquet: str) -> pd.DataFrame:
    """The op's own DuckDB replay (lexor_ray/ops/sampling.py): the
    splitmix64 finalizer in UHUGEINT mod-2^64 (same chain the
    driver-checked corpus_sampling oracle proved bit-exact), then the
    epoch rule."""
    con = duckdb.connect()
    return con.sql(mixture_weights_oracle_sql(parquet)).df()


def test_mixture_weights_matches_duckdb(ray_session):
    got = mixture_weights(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _oracle(f"{SF}/documents.parquet")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # both fractional branches must occur, or the hash rule is untested
    src0 = got[got["source"] == "src0"]["n_repeats"]
    assert set(src0) == {2, 3}


def test_mixture_weights_custom_epochs(ray_session):
    got = mixture_weights(SF, {"src2": 3.0}).to_pandas()
    assert (got[got["source"] == "src2"]["n_repeats"] == 3).all()
    assert (got[got["source"] != "src2"]["n_repeats"] == 1).all()


def test_materialize_epochs_counts(ray_session):
    plan = mixture_weights(SF).to_pandas()
    rows = materialize_epochs(SF).to_pandas()
    counts = rows.groupby("doc_id").size()
    want = plan.set_index("doc_id")["n_repeats"]
    want = want[want > 0]
    assert counts.sort_index().equals(want.sort_index().astype(counts.dtype))
    # epoch_idx is exactly 0..n-1 per doc
    assert (
        rows.sort_values(["doc_id", "epoch_idx"])
        .groupby("doc_id")["epoch_idx"]
        .agg(lambda s: (s.to_numpy() == np.arange(len(s))).all())
        .all()
    )
