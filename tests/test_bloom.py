"""Bloom incremental dedup vs the full DuckDB bit-arithmetic replay.

The oracle rebuilds the filter in SQL — polynomial codepoint hash,
splitmix64 bit positions, the prior-snapshot position set, the all-k
membership test — so the comparison is exact INCLUDING Bloom false
positives (exercised with a deliberately tiny filter).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.bloom import bloom_dedup

SF = "/root/testdata/sf0.001"


def _bloom_sql(parquet: str, m: int, k: int) -> str:
    return f"""
        WITH base AS (
            SELECT doc_id, coalesce(text, '') AS t
            FROM read_parquet('{parquet}')
        ), h AS (
            SELECT doc_id,
                   CASE WHEN len(t) = 0 THEN 0::UBIGINT
                        ELSE list_reduce(
                            list_transform(range(1, len(t) + 1),
                                i -> CAST(unicode(t[i]) AS UBIGINT)),
                            (a, b) -> CAST((CAST(a AS UHUGEINT) * 257
                                            + CAST(b AS UHUGEINT))
                                           % 18446744073709551616::UHUGEINT
                                           AS UBIGINT))
                   END AS h
            FROM base
        ), seeds AS (
            SELECT doc_id, j,
                   CAST((CAST(h AS UHUGEINT)
                         + CAST(j AS UHUGEINT)
                           * 11400714819323198485::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS x
            FROM h CROSS JOIN (SELECT unnest(range({k})) AS j)
        ), s0 AS (
            SELECT doc_id, j,
                   CAST((CAST(x AS UHUGEINT) + 11400714819323198485::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS za
            FROM seeds
        ), s1 AS (
            SELECT doc_id, j,
                   CAST((CAST(xor(za, za >> 30) AS UHUGEINT)
                         * 13787848793156543929::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS za
            FROM s0
        ), s2 AS (
            SELECT doc_id, j,
                   CAST((CAST(xor(za, za >> 27) AS UHUGEINT)
                         * 10723151780598845931::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS za
            FROM s1
        ), pos AS (
            SELECT doc_id, j, xor(za, za >> 31) % {m} AS pos FROM s2
        ), apos AS (
            SELECT DISTINCT pos FROM pos WHERE doc_id % 2 = 0
        ), hits AS (
            SELECT p.doc_id,
                   CAST(sum(CASE WHEN a.pos IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_hit_bits
            FROM pos p LEFT JOIN apos a USING (pos)
            WHERE p.doc_id % 2 = 1
            GROUP BY p.doc_id
        )
        SELECT doc_id, n_hit_bits, n_hit_bits = {k} AS maybe_dup
        FROM hits ORDER BY doc_id
    """


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
    got = bloom_dedup(SF).to_pandas().reset_index(drop=True)
    want = duckdb.sql(_bloom_sql(f"{SF}/documents.parquet", 1 << 20, 4)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bloom_flags_planted_cross_snapshot_dups(ray_session, snapshot_corpus):
    got = bloom_dedup(snapshot_corpus).to_pandas()
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
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        _bloom_sql(f"{snapshot_corpus}/documents.parquet", 64, 2)
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    planted = set(i + 1 for i in range(0, 200, 4) if i != 8)
    fp = got[got["maybe_dup"] & ~got["doc_id"].isin(planted)]
    assert len(fp) > 0, "tiny filter must produce false positives"
