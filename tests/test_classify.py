"""Naive Bayes quality classifier vs the full DuckDB train+score replay.

The oracle retrains the model in SQL — split hash, teacher labels,
word counts, fixed-point log-probs — and rescored every document;
integer micro-nat scores make the comparison exact (no float-sum
order sensitivity anywhere).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.classify import nb_quality_oracle_sql as _nb_sql, nb_quality_scores

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def quality_corpus(tmp_path_factory):
    """Two populations with nearly disjoint vocabularies: long clean
    docs (teacher: pass) and short spammy docs (teacher: fail), plus
    per-doc unique words so held-out docs exercise the OOV path."""
    rng = np.random.default_rng(31)
    clean = [f"clean{i}" for i in range(40)]
    spam = [f"$${i}!!" for i in range(40)]
    docs = []
    for i in range(240):
        if i % 2 == 0:
            words = list(rng.choice(clean, 25)) + [f"uniqc{i}"]
        else:
            words = list(rng.choice(spam, 8)) + [f"uniqs{i}"]
        docs.append(" ".join(words))
    d = tmp_path_factory.mktemp("qualitycorpus")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(docs)), type=pa.int64()),
             "text": pa.array(docs)}
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_nb_scores_match_duckdb_on_testdata(ray_session):
    got = nb_quality_scores(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(_nb_sql(f"{SF}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nb_scores_match_duckdb_on_crafted(ray_session, quality_corpus):
    got = nb_quality_scores(quality_corpus).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(_nb_sql(f"{quality_corpus}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the valid/test docs carry unique words -> OOV path is exercised
    assert got[~got["is_train"]]["n_oov"].sum() > 0


def test_nb_distills_the_teacher(ray_session, quality_corpus):
    """Held-out accuracy: the classifier must reproduce the teacher
    rule's verdict on >= 90% of NON-train documents (the populations
    are linearly separable by vocabulary, so NB should ace this)."""
    got = nb_quality_scores(quality_corpus).to_pandas()
    held = got[~got["is_train"]]
    assert len(held) > 0
    acc = (held["pred"] == held["label"]).mean()
    assert acc >= 0.9, acc


def test_nb_quality_empty_training_split(ray_session, tmp_path):
    """A corpus whose every doc_id hashes OUT of the train split must
    degrade to the flat prior model, not crash (review fix: the
    denominator guard lm.py already had)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # doc_ids verified non-train via _labels_and_tokens itself
    rows = [
        {"doc_id": i, "text": "some words here " * 10}
        for i in (4, 15, 23, 30, 53)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = nb_quality_scores(str(tmp_path)).to_pandas()
    assert len(got) == 5
    assert not got["is_train"].any()
    assert got["n_oov"].eq(got["n_tokens"]).all()  # everything is OOV


@pytest.fixture(scope="module")
def hapax_heavy_corpus(tmp_path_factory):
    """Vocabulary-heavy corpus (r4 verdict item 1): each doc carries
    20 per-doc-unique words plus a few words from a tiny common pool —
    the unpruned vocabulary is ~corpus-sized, the pruned one is
    pool-sized."""
    rng = np.random.default_rng(53)
    pool = [f"common{i}" for i in range(10)]
    docs = []
    for i in range(200):
        words = [f"u{i}x{j}" for j in range(20)] + list(rng.choice(pool, 5))
        docs.append(" ".join(words))
    d = tmp_path_factory.mktemp("hapaxcorpus")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(docs)), type=pa.int64()),
             "text": pa.array(docs)}
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_nb_prune_bounds_the_collect(ray_session, hapax_heavy_corpus):
    """min_count=2 (the default) must drop every hapax word BEFORE the
    driver collect: the model is pool-sized, not corpus-sized — and
    the pruned model still matches the SQL replay of the same cutoff."""
    from lexor_ray.ops.classify import train_nb_quality

    m = train_nb_quality(hapax_heavy_corpus)
    # ~3600 hapax words existed in training; none may reach the model
    assert len(m["words"]) <= 20, len(m["words"])
    assert not any(w.startswith("u") for w in m["words"])
    got = (
        nb_quality_scores(hapax_heavy_corpus)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        _nb_sql(f"{hapax_heavy_corpus}/documents.parquet")
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # pruned words score through the OOV path
    assert (got["n_oov"] >= 20).all()


def test_nb_top_v_cap_matches_oracle(ray_session, quality_corpus):
    """top_v keeps exactly the V most frequent words (deterministic
    tie-break), distributed-prefilter + driver merge == the SQL
    QUALIFY replay."""
    from lexor_ray.ops.classify import train_nb_quality

    m = train_nb_quality(quality_corpus, min_count=1, top_v=15)
    assert len(m["words"]) == 15
    got = (
        nb_quality_scores(quality_corpus, min_count=1, top_v=15)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        _nb_sql(f"{quality_corpus}/documents.parquet", min_count=1, top_v=15)
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nb_pruned_to_nothing_matches_oracle(ray_session, tmp_path):
    """ALL words hapax -> the prune empties the vocabulary entirely;
    the Python denom clamp and the SQL greatest(t+v, 1) (ADVICE r3)
    must agree on the degenerate flat model."""
    rows = [
        {"doc_id": i, "text": " ".join(f"only{i}w{j}" for j in range(25))}
        for i in range(40)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = (
        nb_quality_scores(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(_nb_sql(f"{tmp_path}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_oov"].eq(got["n_tokens"]).all()
