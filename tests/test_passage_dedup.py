"""ExactSubstr duplicated-passage dedup vs the DuckDB replay.

The crafted corpus stitches documents out of a small pool of
multi-token passages so that runs of >= k tokens genuinely repeat
across documents (Lee et al. 2021 setting); filler tokens are unique
per position so only the planted passages can collide.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.cleaning import (
    dup_passages,
    dup_passages_oracle_sql,
    passage_dedup_docs,
    passage_dedup_docs_oracle_sql,
)

SF = "/root/testdata/sf0.001"
K = 5


@pytest.fixture(scope="module")
def passage_corpus(tmp_path_factory):
    rng = np.random.default_rng(23)
    pool = [
        " ".join(f"p{p}w{w}" for w in range(int(rng.integers(6, 12))))
        for p in range(8)
    ]
    docs = []
    uniq = 0
    for i in range(120):
        parts = []
        for _ in range(int(rng.integers(0, 5))):
            if rng.random() < 0.6:
                parts.append(str(rng.choice(pool)))
            else:
                parts.append(" ".join(f"u{uniq}x{j}" for j in range(4)))
                uniq += 1
        docs.append(" ".join(parts))
    # a planted exact-duplicate pair (>= K tokens): the later copy must
    # be fully removed by passage_dedup_docs
    docs[100] = "dup a1 b2 c3 d4 e5 f6 g7 h8"
    docs[110] = docs[100]
    d = tmp_path_factory.mktemp("passagecorpus")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(docs)), type=pa.int64()),
             "text": pa.array(docs)}
        ),
        d / "documents.parquet",
    )
    return str(d)


# the oracle SQL lives beside the op (lexor_ray/ops/cleaning.py)
_wins_sql = dup_passages_oracle_sql
_docs_sql = passage_dedup_docs_oracle_sql


def test_dup_passages_matches_duckdb(ray_session, passage_corpus):
    got = (
        dup_passages(passage_corpus, k=K)
        .to_pandas()
        .sort_values(["doc_id", "tok_start"])
        .reset_index(drop=True)[["doc_id", "tok_start", "window", "kept"]]
    )
    con = duckdb.connect()
    want = con.sql(_wins_sql(f"{passage_corpus}/documents.parquet", K)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (~got["kept"]).sum() > 0
    # exactly one winner per distinct duplicated window value
    assert got[got["kept"]]["window"].is_unique
    assert set(got[got["kept"]]["window"]) == set(got["window"])


def test_hash_tier_identical_decisions(ray_session, passage_corpus):
    """key='hash' (the 100-TB shuffle tier) must make the same
    (doc_id, tok_start, kept) decisions as the exact-string tier."""
    text = (
        dup_passages(passage_corpus, k=K)
        .to_pandas()[["doc_id", "tok_start", "kept"]]
        .sort_values(["doc_id", "tok_start"])
        .reset_index(drop=True)
    )
    hashed = (
        dup_passages(passage_corpus, k=K, key="hash")
        .to_pandas()[["doc_id", "tok_start", "kept"]]
        .sort_values(["doc_id", "tok_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(text, hashed)


def test_passage_dedup_docs_matches_duckdb(ray_session, passage_corpus):
    got = (
        passage_dedup_docs(passage_corpus, k=K)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(_docs_sql(f"{passage_corpus}/documents.parquet", K)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted later exact-duplicate doc is fully cut
    row = got[got["doc_id"] == 110].iloc[0]
    assert row["clean_text"] == ""
    assert row["n_removed_tokens"] == row["n_tokens"] > 0
    # and its first occurrence is fully kept
    first = got[got["doc_id"] == 100].iloc[0]
    assert first["n_removed_tokens"] == 0


def test_passage_dedup_on_testdata(ray_session):
    """The testdata word-soup: every planted exact-duplicate document
    shares all its windows with the first copy, so each later copy
    loses every token; a doc whose text is globally unique loses none
    unless it shares a k-run by chance (checked exactly vs DuckDB)."""
    got = (
        passage_dedup_docs(SF, k=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(_docs_sql(f"{SF}/documents.parquet", 8)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    src = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    dup_later = src[src.duplicated("text") & (src["text"].str.len() > 0)]
    sub = got.set_index("doc_id").loc[dup_later["doc_id"]]
    assert (sub["n_removed_tokens"] == sub["n_tokens"]).all()


def test_auto_tier_resolves_on_measured_bytes(passage_corpus):
    """key='auto' (r4: the curation_docs default) must pick the exact
    string tier under the byte limit and the hash tier above it — from
    parquet metadata alone, measured not guessed."""
    from lexor_ray.ops.cleaning import _WINDOW_BYTE_LIMIT, _resolve_window_key

    # crafted corpus: ~tens of KB of text * K << the 32 MiB limit
    assert _resolve_window_key(passage_corpus, K, "auto") == "text"
    # a k large enough to push the estimate over the limit flips it
    big_k = int(_WINDOW_BYTE_LIMIT // 1000) + 50
    assert _resolve_window_key(passage_corpus, big_k, "auto") == "hash"
    # explicit keys pass through untouched
    assert _resolve_window_key(passage_corpus, K, "text") == "text"
    assert _resolve_window_key(passage_corpus, K, "hash") == "hash"
    # the driver's oracle scale stays on the exact tier at k=50
    assert _resolve_window_key("/root/testdata/sf0.01", 50, "auto") == "text"
    # bench scale takes the hash tier
    assert _resolve_window_key("/root/testdata/sf0.1", 50, "auto") == "hash"
