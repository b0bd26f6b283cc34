"""C4 global span dedup vs the DuckDB window-function replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.cleaning import (
    span_dedup,
    span_dedup_docs,
    span_dedup_docs_oracle_sql,
    span_dedup_oracle_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spanful_corpus(tmp_path_factory):
    """Docs assembled from a small sentence pool so that three-sentence
    spans genuinely repeat across documents."""
    rng = np.random.default_rng(11)
    pool = [f"sentence {i} about topic {i % 7}" for i in range(12)]
    docs = []
    for _ in range(150):
        n = int(rng.integers(0, 10))
        docs.append(". ".join(str(rng.choice(pool)) for _ in range(n)))
    d = tmp_path_factory.mktemp("spancorpus")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(150), type=pa.int64()),
             "text": pa.array(docs)}
        ),
        d / "documents.parquet",
    )
    return str(d)


# the oracle SQL lives beside the op (lexor_ray/ops/cleaning.py) so
# rule changes are one review away from their oracle
_span_sql = span_dedup_oracle_sql
_docs_sql = span_dedup_docs_oracle_sql


def test_span_dedup_matches_duckdb(ray_session, spanful_corpus):
    got = (
        span_dedup(spanful_corpus)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)[["doc_id", "span_idx", "span", "kept"]]
    )
    con = duckdb.connect()
    want = con.sql(_span_sql(f"{spanful_corpus}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the corpus must contain actual cross-doc repeats
    assert (~got["kept"]).sum() > 0
    # exactly one winner per distinct span value
    assert got[got["kept"]]["span"].is_unique
    assert set(got[got["kept"]]["span"]) == set(got["span"])


def test_span_dedup_docs_matches_duckdb(ray_session, spanful_corpus):
    got = (
        span_dedup_docs(spanful_corpus)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(_docs_sql(f"{spanful_corpus}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_span_dedup_on_testdata(ray_session):
    """Word-soup docs have no '. ' — each doc is one span, so span
    dedup must reduce exactly to whole-document exact dedup."""
    got = span_dedup(SF).to_pandas()
    assert (got["span_idx"] == 0).all()
    src = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    first_ids = set(src.groupby("text")["doc_id"].min())
    assert set(got[got["kept"]]["doc_id"]) == first_ids
