"""Bloom incremental dedup vs the full DuckDB bit-arithmetic replay.

The oracle rebuilds the filter in SQL — polynomial codepoint hash,
splitmix64 bit positions, the prior-snapshot position set, the all-k
membership test — so the comparison is exact INCLUDING Bloom false
positives (exercised with a deliberately tiny filter).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.bloom import bloom_dedup, bloom_dedup_oracle_sql

# the oracle SQL lives beside the op (lexor_ray/ops/bloom.py)
_bloom_sql = bloom_dedup_oracle_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def snapshot_corpus(tmp_path_factory):
    """Planted cross-snapshot duplicates: every doc 4i+1 (incoming)
    repeats the text of doc 4i (prior); other incoming docs are
    unique. Includes an empty and a non-ASCII doc."""
    texts = []
    for i in range(0, 200, 4):
        t = f"shared payload {i} 中文 text"
        texts += [t, t, f"prior only {i}", f"incoming only {i} unique"]
    texts[8] = ""  # empty doc on the prior side
    d = tmp_path_factory.mktemp("snapshots")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_bloom_matches_duckdb_on_testdata(ray_session):
    got = bloom_dedup(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(_bloom_sql(f"{SF}/documents.parquet", 1 << 20, 4)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bloom_flags_planted_cross_snapshot_dups(ray_session, snapshot_corpus):
    got = bloom_dedup(snapshot_corpus).to_pandas().sort_values("doc_id")
    want = duckdb.sql(
        _bloom_sql(f"{snapshot_corpus}/documents.parquet", 1 << 20, 4)
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    by_id = got.set_index("doc_id")["maybe_dup"]
    planted = [i + 1 for i in range(0, 200, 4) if i != 8]
    assert by_id.loc[planted].all(), "planted duplicates must be flagged"
    # at m=2^20 the unique incoming docs are FP-free
    uniques = [i + 3 for i in range(0, 200, 4)]
    assert not by_id.loc[uniques].any()


def test_bloom_false_positives_replay_exactly(ray_session, snapshot_corpus):
    """A deliberately tiny filter (m=64, k=2) forces false positives;
    the SQL replay must reproduce them bit-for-bit."""
    got = (
        bloom_dedup(snapshot_corpus, m=64, k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        _bloom_sql(f"{snapshot_corpus}/documents.parquet", 64, 2)
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    planted = set(i + 1 for i in range(0, 200, 4) if i != 8)
    fp = got[got["maybe_dup"] & ~got["doc_id"].isin(planted)]
    assert len(fp) > 0, "tiny filter must produce false positives"
