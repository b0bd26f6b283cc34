"""C4 line-level cleaning vs the DuckDB replay of the same rules."""

import numpy as np
import pandas as pd
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.cleaning import C4LineCleaner, c4_clean, c4_clean_oracle_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineful_corpus(tmp_path_factory):
    """The testdata documents are single-line word soup, so build a
    deterministic multi-line corpus that actually exercises every
    rule: terminal-punct variants, short lines, boilerplate phrases,
    intra-doc duplicate lines, tabs/trailing whitespace, empty lines
    and empty docs."""
    rng = np.random.default_rng(7)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    enders = [".", "!", "?", '"', "'", "", ",", ":"]
    boiler = [
        "please enable JavaScript in your browser",
        "see our Cookie Policy for details.",
        "This text is fine and long enough.",
    ]
    docs = []
    for doc_id in range(200):
        n = int(rng.integers(0, 12))
        lines = []
        for _ in range(n):
            k = int(rng.integers(1, 7))
            body = " ".join(rng.choice(words, size=k))
            line = body + str(rng.choice(enders))
            if rng.random() < 0.15:
                line = str(rng.choice(boiler))
            if rng.random() < 0.2:
                line = "  " + line + " \t"
            lines.append(line)
            if lines and rng.random() < 0.25:
                lines.append(lines[int(rng.integers(0, len(lines)))])
        docs.append("\n".join(lines))
    d = tmp_path_factory.mktemp("c4corpus")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(200), type=pa.int64()),
                  "text": pa.array(docs)}),
        d / "documents.parquet",
    )
    return str(d)


def _oracle(sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    return con.sql(c4_clean_oracle_sql(f"{sf_dir}/documents.parquet")).df()


def test_c4_clean_matches_duckdb_on_lineful_corpus(ray_session, lineful_corpus):
    got = (
        c4_clean(lineful_corpus)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(lineful_corpus)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the crafted corpus must actually exercise every rule, or the
    # equality above proves nothing about them
    for col in ("n_no_terminal", "n_too_short", "n_boilerplate", "n_dup_lines"):
        assert got[col].sum() > 0, f"corpus never triggers {col}"
    assert (got["n_kept"] > 0).any()


def test_c4_clean_matches_duckdb_on_testdata(ray_session):
    got = c4_clean(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _oracle(SF)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_c4_rules_unit():
    cleaner = C4LineCleaner(min_words=3)
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "Keep this line here.\nno punct\nShort.\n"
                "Enable JavaScript to continue.\nKeep this line here.\n"
                "  Trailing spaces survive stripping.  ",
                "",
            ],
        }
    )
    out = cleaner(batch)
    r = out.iloc[0]
    assert r["clean_text"] == (
        "Keep this line here.\nTrailing spaces survive stripping."
    )
    assert r["n_lines"] == 6
    assert r["n_kept"] == 2
    assert r["n_no_terminal"] == 1  # "no punct"
    assert r["n_too_short"] == 2  # "no punct", "Short."
    assert r["n_boilerplate"] == 1  # JavaScript line
    assert r["n_dup_lines"] == 1  # repeated keep-line
    empty = out.iloc[1]
    assert empty["clean_text"] == "" and empty["n_lines"] == 1
    assert empty["n_kept"] == 0


def test_c4_clean_deterministic_across_block_layouts(ray_session, lineful_corpus):
    import ray.data

    a = c4_clean(lineful_corpus).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ds = ray.data.read_parquet(
        f"{lineful_corpus}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(7)
    b = (
        ds.map_batches(lambda x: C4LineCleaner(3)(x), batch_format="pandas")
        .sort("doc_id")
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
