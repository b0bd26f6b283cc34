"""Bigram-LM perplexity vs the full DuckDB train+score replay.

The oracle retrains the stupid-backoff bigram model in SQL — split
hash, BOS-context bigram counts, micro-nat quantization — and
rescores every document; integer micro-nat NLLs make the comparison
exact (no float-sum order sensitivity anywhere). The crafted corpus
plants unseen bigrams AND unseen words in non-train documents so the
backoff and OOV paths are both exercised (the synthetic testdata's
vocabulary is closed: every eval bigram appears in training there).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.lm import (
    lm_perplexity,
    lm_perplexity_oracle_sql,
    train_bigram_lm,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lm_corpus(tmp_path_factory):
    """Fluent docs share a small vocabulary (low perplexity); some
    eval docs shuffle word ORDER (novel bigrams -> backoff) and some
    carry per-doc unique words (-> OOV)."""
    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(240):
        # a "sentence" walk that makes adjacent pairs predictable:
        # w_k is mostly followed by w_{k+1 mod 30}
        start = int(rng.integers(0, 30))
        words = [vocab[(start + j) % 30] for j in range(20)]
        if i % 7 == 3:
            rng.shuffle(words)  # novel bigrams over known words
        if i % 11 == 5:
            words.append(f"uniq{i}")  # OOV word
        docs.append(" ".join(words))
    docs.append("")  # empty doc: n_tokens=0, ppl=0.0 row
    d = tmp_path_factory.mktemp("lmcorpus")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_lm_matches_duckdb_on_testdata(ray_session):
    got = lm_perplexity(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(lm_perplexity_oracle_sql(f"{SF}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lm_matches_duckdb_on_crafted(ray_session, lm_corpus):
    got = lm_perplexity(lm_corpus).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        lm_perplexity_oracle_sql(f"{lm_corpus}/documents.parquet")
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the crafted corpus must actually reach both fallback tiers
    assert got["n_backoff"].sum() > 0
    assert got["n_oov"].sum() > 0
    empty = got[got["n_tokens"] == 0]
    assert len(empty) == 1 and (empty["ppl"] == 0.0).all()


def test_lm_separates_fluent_from_shuffled(ray_session, lm_corpus):
    """CCNet's use case: shuffled-word docs must score materially
    higher perplexity than fluent held-out docs."""
    got = lm_perplexity(lm_corpus).to_pandas()
    got = got[(~got["is_train"]) & (got["n_tokens"] > 0)]
    shuffled = got[got["doc_id"] % 7 == 3]["ppl"]
    fluent = got[got["doc_id"] % 7 != 3]["ppl"]
    assert len(shuffled) and len(fluent)
    assert shuffled.median() > 2 * fluent.median()


def test_lm_model_is_model_sized(ray_session, lm_corpus):
    """The broadcast model is bounded by distinct bigrams/words, not
    corpus rows, and its totals are consistent."""
    m = train_bigram_lm(lm_corpus)
    assert len(m["bg_key"]) <= m["t"]  # distinct bigrams <= train tokens
    assert len(m["uni_word"]) == m["v"]
    assert m["backoff"] < 0 and m["oov_lp"] < 0


def test_model_quality_fused_matches_oracle_and_standalone(ray_session):
    """The fused recording row (NB + LM in one scan) equals the
    DuckDB fused oracle AND equals each standalone op
    column-for-column."""
    import duckdb

    from lexor_ray.ops.classify import nb_quality_scores
    from lexor_ray.ops.lm import model_quality, model_quality_oracle_sql

    got = model_quality(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        model_quality_oracle_sql(f"{SF}/documents.parquet")
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    nb = nb_quality_scores(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in nb.columns:
        assert (got[c].to_numpy() == nb[c].to_numpy()).all(), c
    lm = lm_perplexity(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for src, dst in [
        ("n_backoff", "lm_n_backoff"),
        ("n_oov", "lm_n_oov"),
        ("nll_micro", "nll_micro"),
        ("ppl", "ppl"),
    ]:
        assert (got[dst].to_numpy() == lm[src].to_numpy()).all(), dst


def test_lm_perplexity_empty_training_split(ray_session, tmp_path):
    """Every doc outside the train split: the LM degrades to the flat
    OOV model instead of crashing (review fix, mirrors classify)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        {"doc_id": i, "text": "some words here " * 10}
        for i in (4, 15, 23, 30, 53)  # verified non-train doc_ids
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = lm_perplexity(str(tmp_path)).to_pandas()
    assert len(got) == 5
    assert not got["is_train"].any()
    assert got["n_oov"].eq(got["n_tokens"]).all()


def test_lm_prune_bounds_the_collect(ray_session, tmp_path):
    """min_count=2 (the default) must drop every singleton bigram
    BEFORE the driver collect (r4 verdict item 1): on a corpus whose
    cross-doc bigrams never repeat, the model holds only the
    within-pattern repeats — and still matches the SQL replay of the
    same cutoff."""
    # each doc: a repeated 2-word motif (bigrams occur >= 5 times
    # inside one doc and across docs) plus 15 doc-unique filler words
    # (every bigram touching filler is a singleton -> pruned)
    rows = []
    for i in range(120):
        motif = "alpha beta " * 5
        filler = " ".join(f"f{i}q{j}" for j in range(15))
        rows.append({"doc_id": i, "text": motif + filler})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    m = train_bigram_lm(str(tmp_path))
    # unpruned: ~16 distinct bigrams per doc x 120 docs; pruned: the
    # motif bigrams + the shared BOS/motif boundary pairs only
    assert len(m["bg_key"]) <= 8, len(m["bg_key"])
    got = (
        lm_perplexity(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        lm_perplexity_oracle_sql(f"{tmp_path}/documents.parquet")
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_backoff"].sum() > 0  # pruned bigrams take backoff


def test_lm_top_n_cap_matches_oracle(ray_session, lm_corpus):
    """top_n keeps exactly the N most frequent bigrams (deterministic
    tie-break); distributed-prefilter + driver merge == QUALIFY."""
    m = train_bigram_lm(lm_corpus, min_count=1, top_n=25)
    assert len(m["bg_key"]) == 25
    got = (
        lm_perplexity(lm_corpus, min_count=1, top_n=25)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        lm_perplexity_oracle_sql(
            f"{lm_corpus}/documents.parquet", min_count=1, top_n=25
        )
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lm_pruned_to_nothing_matches_oracle(ray_session, tmp_path):
    """ALL bigrams singletons -> the prune empties the model; Python's
    denom clamp and the SQL greatest(t+v, 1) (ADVICE r3) must agree."""
    rows = [
        {"doc_id": i, "text": " ".join(f"z{i}w{j}" for j in range(20))}
        for i in range(40)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = (
        lm_perplexity(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        lm_perplexity_oracle_sql(f"{tmp_path}/documents.parquet")
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_oov"].eq(got["n_tokens"]).all()
