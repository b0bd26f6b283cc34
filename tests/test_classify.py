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

from lexor_ray.ops.classify import nb_quality_scores

SF = "/root/testdata/sf0.001"


def _nb_sql(parquet: str, min_words: int = 20, max_punct_pct: int = 5) -> str:
    return f"""
        WITH base AS (
            SELECT doc_id, coalesce(text, '') AS text
            FROM read_parquet('{parquet}')
        ), s0 AS (
            SELECT doc_id,
                   CAST((CAST(doc_id AS UHUGEINT)
                         + 11400714819323198485::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS za
            FROM base
        ), s1 AS (
            SELECT doc_id,
                   CAST((CAST(xor(za, za >> 30) AS UHUGEINT)
                         * 13787848793156543929::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS za
            FROM s0
        ), s2 AS (
            SELECT doc_id,
                   CAST((CAST(xor(za, za >> 27) AS UHUGEINT)
                         * 10723151780598845931::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT) AS za
            FROM s1
        ), hh AS (
            SELECT doc_id, xor(za, za >> 31) % 1000 < 900 AS is_train
            FROM s2
        ), lab AS (
            SELECT b.doc_id, h.is_train,
                   len(regexp_extract_all(b.text, '\\S+')) AS n_tokens,
                   (len(regexp_extract_all(b.text, '\\S+')) >= {min_words}
                    AND length(regexp_replace(b.text,
                            '[^!-/:-@\\[-`{{-~]', '', 'g')) * 100
                        <= length(b.text) * {max_punct_pct}) AS label
            FROM base b JOIN hh h USING (doc_id)
        ), trainw AS (
            SELECT l.doc_id, l.label,
                   unnest(regexp_extract_all(b.text, '\\S+')) AS word
            FROM base b JOIN lab l USING (doc_id)
            WHERE l.is_train
        ), wc AS (
            SELECT word,
                   CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                   CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT)
                       AS cf
            FROM trainw GROUP BY word
        ), const AS (
            SELECT (SELECT count(DISTINCT word) FROM trainw) AS v,
                   (SELECT count(*) FROM trainw WHERE label) AS t_pass,
                   (SELECT count(*) FROM trainw WHERE NOT label) AS t_fail,
                   (SELECT count(*) FROM lab WHERE is_train AND label)
                       AS d_pass,
                   (SELECT count(*) FROM lab WHERE is_train AND NOT label)
                       AS d_fail
        ), km AS (
            SELECT CAST(floor(ln(1 / (t_pass + v)) * 1e6) AS BIGINT)
                       AS oov_pass,
                   CAST(floor(ln(1 / (t_fail + v)) * 1e6) AS BIGINT)
                       AS oov_fail,
                   CAST(floor(ln((d_pass + 1) / (d_pass + d_fail + 2)) * 1e6)
                        AS BIGINT) AS prior_pass,
                   CAST(floor(ln((d_fail + 1) / (d_pass + d_fail + 2)) * 1e6)
                        AS BIGINT) AS prior_fail
            FROM const
        ), model AS (
            SELECT word,
                   CAST(floor(ln((cp + 1) / (t_pass + v)) * 1e6) AS BIGINT)
                       AS lp_pass,
                   CAST(floor(ln((cf + 1) / (t_fail + v)) * 1e6) AS BIGINT)
                       AS lp_fail
            FROM wc, const
        ), tok AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word
            FROM base
        ), contrib AS (
            SELECT t.doc_id,
                   coalesce(m.lp_pass, k.oov_pass) AS lp_pass,
                   coalesce(m.lp_fail, k.oov_fail) AS lp_fail,
                   CASE WHEN m.word IS NULL THEN 1 ELSE 0 END AS is_oov
            FROM tok t LEFT JOIN model m ON t.word = m.word CROSS JOIN km k
        ), per_doc AS (
            SELECT doc_id,
                   CAST(sum(lp_pass) AS BIGINT) AS sp,
                   CAST(sum(lp_fail) AS BIGINT) AS sf,
                   CAST(sum(is_oov) AS BIGINT) AS n_oov
            FROM contrib GROUP BY doc_id
        )
        SELECT l.doc_id, l.is_train, l.label,
               CAST(l.n_tokens AS BIGINT) AS n_tokens,
               coalesce(p.n_oov, 0) AS n_oov,
               k.prior_pass + coalesce(p.sp, 0) AS score_pass,
               k.prior_fail + coalesce(p.sf, 0) AS score_fail,
               k.prior_pass + coalesce(p.sp, 0)
                   >= k.prior_fail + coalesce(p.sf, 0) AS pred
        FROM lab l LEFT JOIN per_doc p USING (doc_id) CROSS JOIN km k
        ORDER BY l.doc_id
    """


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
    got = nb_quality_scores(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(_nb_sql(f"{SF}/documents.parquet")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nb_scores_match_duckdb_on_crafted(ray_session, quality_corpus):
    got = nb_quality_scores(quality_corpus).to_pandas().reset_index(drop=True)
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
