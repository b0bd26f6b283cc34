"""HLL sketch accuracy and as-of join semantics."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hll_within_tolerance(ray_session):
    import duckdb

    from lexor_ray.ops.sketch import approx_distinct_users

    got = approx_distinct_users(SF).to_pandas().set_index("event_type")
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")
    for et, row in exact.iterrows():
        err = abs(got.loc[et, "approx_users"] - row["n"]) / max(row["n"], 1)
        assert err < 0.05, (et, got.loc[et, "approx_users"], row["n"])


def test_hll_merge_order_invariant():
    from lexor_ray.ops.sketch import _estimate, _registers

    vals = pd.util.hash_array(np.arange(10000)).astype(np.uint64)
    parts = np.array_split(vals, 7)
    a = np.maximum.reduce([_registers(p) for p in parts])
    b = np.maximum.reduce([_registers(p) for p in reversed(parts)])
    assert (a == b).all()
    assert abs(_estimate(a) - 10000) / 10000 < 0.05


def test_asof_backward_semantics(ray_session):
    from lexor_ray.ops.relational import events_asof_join

    got = events_asof_join(SF).to_pandas()
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    clicks = ev[ev["event_type"] == "click"]
    assert len(got) == len(clicks)
    # spot-check 20 rows against a brute-force scan
    merged = got.set_index("event_id")
    for _, c in clicks.head(20).iterrows():
        purch = ev[
            (ev["event_type"] == "purchase")
            & (ev["user_id"] == c["user_id"])
            & (ev["ts"] <= c["ts"])
        ].sort_values("ts")
        want = purch["value"].iloc[-1] if len(purch) else np.nan
        gotv = merged.loc[c["event_id"], "last_purchase_value"]
        assert (np.isnan(want) and np.isnan(gotv)) or want == gotv


def test_sparse_mode_exact_and_dense_degrade():
    """HLL++ sparse tier: all-sparse merges are EXACT; unions past
    SPARSE_MAX (or any dense part) degrade to the ±5% register tier."""
    from lexor_ray.ops.sketch import SPARSE_MAX, _registers, merge_sketches

    vals = pd.util.hash_array(np.arange(3000)).astype(np.uint64)
    parts = np.array_split(vals, 4)  # each < SPARSE_MAX, union = 3000
    got = merge_sketches([0] * 4, [p.tolist() for p in parts])
    assert got == 3000  # exact
    # oversized union degrades but stays accurate
    big = pd.util.hash_array(np.arange(50000)).astype(np.uint64)
    bparts = np.array_split(big, 20)
    est = merge_sketches([0] * 20, [p.tolist() for p in bparts])
    assert abs(est - 50000) / 50000 < 0.05
    # mixed sparse + dense
    est2 = merge_sketches(
        [0, 1], [parts[0].tolist(), _registers(big).tolist()]
    )
    assert abs(est2 - 50000) / 50000 < 0.06
    # BOTH oversized merges must have degraded to the register tier:
    # parts[0]'s hashes (arange(3000)) are a subset of big's
    # (arange(50000)), so the two register sets — and therefore the
    # register-tier estimates — are identical. If the sparse merge
    # regressed to holding all 50k hashes (the unbounded-memory bug
    # SPARSE_MAX exists to prevent), est would be the exact 50000 and
    # this equality would fail (r5 review: the old assertion was dead).
    assert est == est2


def test_cms_heavy_hitters_matches_exact(ray_session):
    """The CMS tier finds the same top-k terms as the exact keyed
    shuffle, and every estimate only ever OVERCOUNTS."""
    import duckdb

    from lexor_ray.ops.sketch import cms_heavy_hitters, heavy_hitter_terms

    k = 20
    exact = heavy_hitter_terms(SF, k=k).to_pandas()
    cms = cms_heavy_hitters(SF, k=k)
    assert set(cms["term"]) == set(exact["term"])
    con = duckdb.connect()
    true_counts = con.sql(
        f"""SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                   AS term
               FROM read_parquet('{SF}/documents.parquet'))
            GROUP BY term"""
    ).df().set_index("term")["c"]
    for _, row in cms.iterrows():
        assert row["est_count"] >= true_counts[row["term"]]


def test_cms_heavy_hitters_planted_skew(ray_session, tmp_path):
    """A planted zipf-ish corpus: the handful of very hot terms must
    surface through the sketch in rank order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lexor_ray.ops.sketch import cms_heavy_hitters

    rows = []
    for i in range(200):
        body = ["hot0"] * 50 + ["hot1"] * 30 + ["hot2"] * 10 + [
            f"rare{i}_{j}" for j in range(5)
        ]
        rows.append({"doc_id": i, "text": " ".join(body)})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = cms_heavy_hitters(str(tmp_path), k=3)
    assert list(got["term"]) == ["hot0", "hot1", "hot2"]
    assert got["est_count"].iloc[0] >= 200 * 50


def test_value_quantile_reservoir_tier(ray_session, tmp_path):
    """Forcing the degraded tier (tiny sparse budget): reservoir
    quantile estimates stay within a small rank error of the exact
    answer, and the exact tier reproduces quantile_disc."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lexor_ray.ops.sketch import value_quantile_sketch

    rng = np.random.default_rng(7)
    n = 20_000
    vals = np.round(rng.standard_normal(n) * 100, 6)  # ~all distinct
    rows = [
        {"event_id": i, "event_type": "t", "value": float(vals[i])}
        for i in range(n)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))

    exact = value_quantile_sketch(str(tmp_path)).to_pandas().iloc[0]
    assert exact["mode"] == "exact"
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT quantile_disc(value, 0.5) AS q50,
                   quantile_disc(value, 0.99) AS q99
            FROM read_parquet('{tmp_path}/events.parquet')"""
    ).df().iloc[0]
    assert exact["q50"] == want["q50"] and exact["q99"] == want["q99"]

    approx = (
        value_quantile_sketch(str(tmp_path), sparse_max=64).to_pandas().iloc[0]
    )
    assert approx["mode"] == "reservoir"
    sorted_vals = np.sort(vals)
    for q, col in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.9, "q90")]:
        est_rank = np.searchsorted(sorted_vals, approx[col]) / n
        assert abs(est_rank - q) < 0.06, (col, est_rank)


def test_value_quantile_sketch_generic_columns(ray_session):
    """The sketch works over any keyed double column via
    ds/key_col/id_col/value_col (here: per-source n_chars quantiles
    over the documents table), exactly matching quantile_disc."""
    import duckdb
    import ray.data

    from lexor_ray.ops.sketch import value_quantile_sketch

    ds = ray.data.read_parquet(
        SF + "/documents.parquet", columns=["source", "doc_id", "n_chars"]
    )
    got = value_quantile_sketch(
        SF, ds=ds, key_col="source", id_col="doc_id", value_col="n_chars"
    ).to_pandas()
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT source,
               quantile_disc(CAST(n_chars AS DOUBLE), 0.25) AS q25,
               quantile_disc(CAST(n_chars AS DOUBLE), 0.5) AS q50,
               quantile_disc(CAST(n_chars AS DOUBLE), 0.75) AS q75,
               quantile_disc(CAST(n_chars AS DOUBLE), 0.9) AS q90,
               quantile_disc(CAST(n_chars AS DOUBLE), 0.99) AS q99
            FROM read_parquet('{SF}/documents.parquet')
            GROUP BY source ORDER BY source"""
    ).df()
    pd.testing.assert_frame_equal(
        got.drop(columns=["mode"]).reset_index(drop=True),
        want,
        check_dtype=False,
        check_exact=True,
    )


def test_quantile_filter_matches_duckdb(ray_session):
    """Per-source length-percentile filtering replays exactly:
    quantile_disc threshold per source + the same comparison."""
    import duckdb

    from lexor_ray.ops.sketch import quantile_filter

    got = (
        quantile_filter(SF, q=0.25)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""WITH t AS (
               SELECT source,
                      quantile_disc(CAST(n_chars AS DOUBLE), 0.25) AS threshold
               FROM read_parquet('{SF}/documents.parquet') GROUP BY source
            )
            SELECT d.doc_id, d.source, d.n_chars, t.threshold,
                   CAST(d.n_chars AS DOUBLE) >= t.threshold AS keep
            FROM read_parquet('{SF}/documents.parquet') d
            JOIN t USING (source) ORDER BY d.doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # the filter actually cuts (and keeps) something per source
    per_src = got.groupby("source")["keep"]
    assert (per_src.sum() > 0).all() and (~got["keep"]).sum() > 0
