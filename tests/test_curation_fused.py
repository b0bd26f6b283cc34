"""The fused recording entries: curation_docs (five curation ops in
one wide oracle-checked per-doc row), events_windows (tumbling +
sliding tagged union) and the exact+HLL distinct-users merge. Each
fusion must equal its parts column-for-column — the fusions exist
only because the driver records 50 entries, so any divergence from
the standalone ops would silently decertify them."""

import duckdb
import pandas as pd

from lexor_ray.ops.curation import curation_docs, curation_docs_oracle_sql

SF = "/root/testdata/sf0.001"


def test_curation_docs_matches_fused_oracle(ray_session):
    got = curation_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        curation_docs_oracle_sql(f"{SF}/documents.parquet")
    ).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_curation_docs_equals_parts(ray_session):
    """Each source column of the wide row must equal the standalone
    op's output (the fusion may not alter any operator's result)."""
    from lexor_ray.ops.bloom import bloom_dedup
    from lexor_ray.ops.cleaning import c4_clean
    from lexor_ray.ops.sampling import mixture_weights

    wide = curation_docs(SF).to_pandas().set_index("doc_id").sort_index()

    c4 = c4_clean(SF).to_pandas().set_index("doc_id").sort_index()
    pd.testing.assert_series_equal(
        wide["c4_text"], c4["clean_text"], check_names=False
    )
    pd.testing.assert_series_equal(
        wide["n_kept"].astype("int64"), c4["n_kept"], check_names=False
    )

    mx = mixture_weights(SF).to_pandas().set_index("doc_id").sort_index()
    pd.testing.assert_series_equal(
        wide["n_repeats"].astype("int64"), mx["n_repeats"], check_names=False
    )

    bl = bloom_dedup(SF).to_pandas().set_index("doc_id").sort_index()
    sub = wide.loc[bl.index]
    pd.testing.assert_series_equal(
        sub["n_hit_bits"].astype("int64"), bl["n_hit_bits"], check_names=False
    )
    # prior-snapshot (even) docs get the documented fill
    even = wide.drop(index=bl.index)
    assert (even["n_hit_bits"] == -1).all()
    assert (~even["maybe_dup"]).all()

    # the r4 sixth branch: the quantile-filter verdict columns
    from lexor_ray.ops.sketch import quantile_filter

    qf = quantile_filter(SF).to_pandas().set_index("doc_id").sort_index()
    pd.testing.assert_series_equal(
        wide["q_threshold"], qf["threshold"], check_names=False
    )
    pd.testing.assert_series_equal(
        wide["q_keep"], qf["keep"], check_names=False
    )


def test_events_windows_equals_parts(ray_session):
    from lexor_ray.ops.relational import (
        events_sliding_window,
        events_tumbling_window,
        events_windows,
    )

    fused = events_windows(SF).to_pandas()
    tum = events_tumbling_window(SF).to_pandas().reset_index(drop=True)
    sld = events_sliding_window(SF).to_pandas().reset_index(drop=True)
    cols = ["event_type", "window_start", "value_sum", "n_events"]
    pd.testing.assert_frame_equal(
        fused[fused["kind"] == "tumbling"][cols].reset_index(drop=True), tum
    )
    pd.testing.assert_frame_equal(
        fused[fused["kind"] == "sliding"][cols].reset_index(drop=True), sld
    )


def test_distinct_users_merge_equals_parts(ray_session):
    from lexor_ray.ops.relational import distinct_users_per_event_type
    from lexor_ray.ops.sketch import (
        approx_distinct_users,
        distinct_users_exact_and_sketch,
    )

    fused = distinct_users_exact_and_sketch(SF)
    exact = distinct_users_per_event_type(SF).to_pandas()
    approx = approx_distinct_users(SF).to_pandas()
    pd.testing.assert_frame_equal(
        fused[["event_type", "n_users"]], exact, check_dtype=False
    )
    pd.testing.assert_frame_equal(
        fused[["event_type", "approx_users"]].reset_index(drop=True),
        approx.reset_index(drop=True),
        check_dtype=False,
    )
