"""Relational operators over the TPC-H-ish testdata tables.

The reference implements no relational operators (SURVEY.md §2.5) —
these are the new wide operators a Ray-Data engine needs: grouped
aggregation with map-side partials, broadcast hash joins, sort/top-k,
and event-time windowed aggregation. Every query here has a DuckDB
oracle in ``__ray_entry__.oracle_sql`` with matching column names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .util import tbl

# ---------------------------------------------------------------------------

#: global per-key row count above which the per-user operators salt
#: the key with a time slice (a single pathological user — a bot
#: emitting billions of events — would otherwise land whole in one
#: coarse_apply task; r3 verdict item 3). Sized so one flagged key's
#: slice still vectorizes comfortably in one task at web scale.
HEAVY_KEY_THRESHOLD = 5_000_000

#: time-slice width for flagged heavy keys (one day): a flagged key's
#: rows land in per-slice tasks instead of one task; the tiny second
#: pass merges per-slice partials back into exact per-key results.
HEAVY_SLICE_S = 86_400


def _events_heavy_keys(sf_dir: str, threshold: int):
    """Heavy-user pre-count for the events table, gated on parquet
    METADATA first: when the table's total row count is below the
    threshold no key can possibly be heavy, so the pre-count scan is
    skipped outright (zero cost at test/bench scales — the guard only
    pays its one column scan where it can matter)."""
    import os

    import pyarrow.parquet as pq

    from .util import heavy_keys

    md = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata
    if md.num_rows < threshold:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
    return heavy_keys(
        tbl(sf_dir, "events", columns=["user_id"]), "user_id", threshold
    )


def _with_heavy_slice(ds, heavy_ids: np.ndarray, slice_width_s: int, slot: str):
    """Append ``__slice`` (0 for light keys; a biased ts_us // width
    for flagged heavy keys — time partitioned, so per-(user, slice)
    groups are disjoint in time) for downstream ``coarse_apply``
    bucketing on ``[user_id, __slice]``. The heavy-id set broadcasts
    once. The bias keeps heavy slices ≥ 1 (monotone in ts) even for
    pre-epoch timestamps, where the raw floor-div goes ≤ 0 and would
    alias the light sentinel (r4 review); downstream only relies on
    ``__slice > 0`` ⇔ heavy and slice order ⇔ time order."""
    import ray

    from .util import cached_for_ref

    h_ref = ray.put(heavy_ids)
    width_us = slice_width_s * 1_000_000
    bias = 1 - ((-(2**63)) // width_us)  # slice = base + bias ≥ 1 ∀ int64 ts

    def add_slice(batch: pd.DataFrame) -> pd.DataFrame:
        hs = cached_for_ref(slot, h_ref, lambda: ray.get(h_ref))
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        is_h = batch["user_id"].isin(hs).to_numpy()
        batch = batch.copy()
        batch["__slice"] = np.where(
            is_h, ts_us.to_numpy() // width_us + bias, 0
        )
        return batch

    return ds.map_batches(add_slice, batch_format="pandas")



def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan → per-batch partial grouped
    aggregate → small groupby over the partials (the shuffle moves one
    row per key per batch, SURVEY.md §2.5 pre-aggregation rule)."""
    ds = tbl(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), type=pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        batch = batch.append_column("disc_price", disc_price)
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                ("l_quantity", "count"),
            ]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from .util import fold_bounded

    # the (returnflag, linestatus) domain is a handful of pairs —
    # two-level arrow fold instead of a sort-shuffle groupby + a
    # trailing Dataset.sort (both are pure fixed overhead on 6 rows)
    out = fold_bounded(parts, ["l_returnflag", "l_linestatus"])

    def finalize(batch: pa.Table) -> pa.Table:
        batch = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["l_quantity_sum"],
                "sum_base_price": batch["l_extendedprice_sum"],
                "sum_disc_price": batch["disc_price_sum"],
                "count_order": batch["l_quantity_count"],
            }
        )
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, pc.round(batch[c], ndigits=2))
        return batch

    return out.map_batches(finalize, batch_format="pyarrow")


def q3_top_revenue_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """TPC-H Q3 shape. Customer is the small side → broadcast its
    filtered key set via ``ray.put`` (semi-join, no shuffle). Orders ⋈
    lineitem is large ⋈ large → partial-aggregate lineitem revenue per
    orderkey first (shrinks the probe side to one row per order), then
    the task-based ``bucketed_join`` (``Dataset.join``'s actor pool
    starves small CPU budgets — see the inline note below)."""
    import ray

    def segment_keys(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["c_mktsegment"], segment))
        return keep.select(["c_custkey"])

    # segment filter runs distributed; only the compact key column of
    # ONE segment is collected for the broadcast semi-join
    cust_keys = (
        tbl(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(segment_keys, batch_format="pyarrow")
        .to_pandas()
    )
    keys = pa.array(np.sort(cust_keys["c_custkey"].to_numpy()), type=pa.int64())
    keys_ref = ray.put(keys)

    def filter_orders(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["o_custkey"], value_set=ray.get(keys_ref))
        return batch.filter(mask).select(["o_orderkey"])

    orders = tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        filter_orders, batch_format="pyarrow"
    )

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        batch = batch.append_column("revenue", revenue)
        return batch.group_by(["l_orderkey"]).aggregate([("revenue", "sum")])

    li = tbl(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    parts = li.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    rev = parts.groupby("l_orderkey").aggregate(Sum("revenue_sum", alias_name="revenue"))
    rev = rev.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("revenue"),
            "revenue",
            pc.round(b["revenue"], ndigits=2),
        ),
        batch_format="pyarrow",
    )
    # task-based semi join on the shared shuffle path (ops/util
    # bucketed_join): Dataset.join's aggregator ACTOR pool reserves a
    # CPU per partition and starves the streaming executor on small
    # CPU budgets — measured 59 s vs ~2 s for this query at sf0.01 on
    # 8 cpus (CLAUDE.md actor-pool rule; the chained-join deadlock is
    # the extreme case of the same reservation behavior)
    from .util import bucketed_join

    joined = bucketed_join(
        rev,
        orders,
        key_col="l_orderkey",
        right_key="o_orderkey",
        value_col="o_orderkey",
        out_col="__match",
        carry={"l_orderkey": pa.int64(), "revenue": pa.float64()},
        value_type=pa.int64(),
    )
    joined = joined.map_batches(
        lambda b: b.select(["l_orderkey", "revenue"]), batch_format="pyarrow"
    )
    return joined.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(k)


def order_priority_counts(sf_dir: str):
    """Grouped count over orders with a date-range filter."""
    ds = tbl(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate"])
    lo = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), type=pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo),
            pc.less(batch["o_orderdate"], hi),
        )
        return (
            batch.filter(m)
            .group_by(["o_orderpriority"])
            .aggregate([("o_orderpriority", "count")])
        )

    from .util import fold_bounded

    out = fold_bounded(
        ds.map_batches(partial, batch_format="pyarrow"), ["o_orderpriority"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(["o_orderpriority", "order_count"]),
        batch_format="pyarrow",
    )


def customer_nation_revenue(sf_dir: str):
    """Fact→dimension revenue per nation, built the way it must work
    when BOTH orders and customer scale with SF (round-1 verdict fix —
    a customer→nation broadcast dict grows with the corpus, and the
    per-row ``dict.get`` loop was the hot path):

    1. per-batch partial aggregate of orders keyed on o_custkey
       (vectorized ``pyarrow group_by``) → global groupby(o_custkey)
       — the shuffle moves one row per customer, not per order
    2. distributed task-based hash join (``bucketed_join``) of the
       per-customer partials to customer on custkey
    3. nation (a TRUE fixed-size dimension, 25 rows) broadcast via
       ``ray.put`` and applied with a vectorized pandas ``.map``
    4. tiny partial → final groupby(n_name)
    """
    import ray

    orders = tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_custkey"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )

    from ray.data.aggregate import Sum

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("o_totalprice_sum", alias_name="revenue"),
            Sum("o_totalprice_count", alias_name="n_orders"),
        )
    )
    cust = tbl(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    # task-based hash join (see q3_top_revenue_orders: Dataset.join's
    # per-partition actor reservation measured 33 s vs ~2 s here at
    # sf0.01 on 8 cpus)
    from .util import bucketed_join

    joined = bucketed_join(
        per_cust,
        cust,
        key_col="o_custkey",
        right_key="c_custkey",
        value_col="c_nationkey",
        out_col="c_nationkey",
        carry={"revenue": pa.float64(), "n_orders": pa.int64()},
        value_type=pa.int64(),
    )

    nation = tbl(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nation_ref = ray.put(
        pd.Series(nation["n_name"].to_numpy(), index=nation["n_nationkey"])
    )

    def to_nation(batch: pd.DataFrame) -> pd.DataFrame:
        if "revenue" not in batch.columns:  # schemaless empty join block
            return pd.DataFrame(
                {
                    "n_name": pd.Series([], dtype=object),
                    "revenue": pd.Series([], dtype="float64"),
                    "n_orders": pd.Series([], dtype="int64"),
                }
            )
        names = batch["c_nationkey"].map(ray.get(nation_ref))
        t = pd.DataFrame(
            {"n_name": names, "revenue": batch["revenue"], "n_orders": batch["n_orders"]}
        )
        g = t.groupby("n_name", sort=False)
        return pd.DataFrame(
            {"revenue": g["revenue"].sum(), "n_orders": g["n_orders"].sum()}
        ).reset_index()

    from .util import fold_bounded

    out = fold_bounded(
        joined.map_batches(to_nation, batch_format="pandas"), ["n_name"]
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": b["n_name"],
                "total_revenue": pc.round(b["revenue"], ndigits=2),
                "order_count": b["n_orders"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def part_type_stats(sf_dir: str):
    """Grouped min/max/avg over part — small-table aggregate coverage."""
    ds = tbl(sf_dir, "part", columns=["p_type", "p_retailprice", "p_size"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["p_type"]).aggregate(
            [
                ("p_retailprice", "sum"),
                ("p_retailprice", "count"),
                ("p_size", "min"),
                ("p_size", "max"),
            ]
        )

    from .util import fold_bounded

    out = fold_bounded(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["p_type"],
        aggs={"p_size_min": "min", "p_size_max": "max"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(
                batch["p_retailprice_sum"],
                pc.cast(batch["p_retailprice_count"], pa.float64()),
            ),
            ndigits=2,
        )
        return pa.table(
            {
                "p_type": batch["p_type"],
                "n_parts": batch["p_retailprice_count"],
                "min_size": batch["p_size_min"],
                "max_size": batch["p_size_max"],
                "avg_price": avg,
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def events_tumbling_window(sf_dir: str, window_s: int = 3600):
    """Event-time tumbling window per event_type: Ray Data has no
    watermarks, so windows are keyed aggregation over
    ``floor(epoch/window)`` (ray_guide streaming-shaped pattern) —
    partial per batch, then a small groupby."""
    ds = tbl(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64())  # us since epoch
        win = pc.multiply(
            pc.cast(pc.floor(pc.divide(epoch, 1_000_000 * window_s)), pa.int64()),
            window_s,
        )
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": win,
                "value": batch["value"],
            }
        )
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    from .util import fold_bounded

    # key domain = event types × time windows (data-independent) —
    # two-level fold, see fold_bounded
    out = fold_bounded(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"],
    )
    return out.map_batches(_window_finalize, batch_format="pyarrow")


def _window_finalize(b: pa.Table) -> pa.Table:
    """(value_sum, value_count) partials → rounded (value_sum,
    n_events) output columns (shared by tumbling/sliding)."""
    return pa.table(
        {
            "event_type": b["event_type"],
            "window_start": b["window_start"],
            "value_sum": pc.round(b["value_sum"], ndigits=3),
            "n_events": b["value_count"],
        }
    )


def events_sliding_window(sf_dir: str, size_s: int = 3600, step_s: int = 1800):
    """Sliding event-time window (size 1h, step 30min): each event is
    exploded to the windows containing it inside ``map_batches``
    (size/step replicas — vectorized numpy), then the usual partial →
    small groupby. Window key = window start epoch seconds."""
    ds = tbl(sf_dir, "events", columns=["event_type", "ts", "value"])
    n_windows = size_s // step_s

    def explode(batch: pa.Table) -> pa.Table:
        epoch_s = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False
        ) // 1_000_000
        # every event belongs to exactly n_windows windows: the last
        # window containing it and the n_windows-1 preceding steps
        # (start <= es < start + size holds for all of them by
        # construction) — plain repeat/tile, no membership filter
        last_start = (epoch_s // step_s) * step_s
        starts = last_start[:, None] - np.arange(n_windows)[None, :] * step_s
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        rep_et = np.repeat(et, n_windows)
        rep_val = np.repeat(val, n_windows)
        rep_ws = starts.reshape(-1)
        t = pa.table(
            {
                "event_type": pa.array(rep_et, type=pa.string()),
                "window_start": pa.array(rep_ws, type=pa.int64()),
                "value": pa.array(rep_val, type=pa.float64()),
            }
        )
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    from .util import fold_bounded

    out = fold_bounded(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["event_type", "window_start"],
    )
    return out.map_batches(_window_finalize, batch_format="pyarrow")


def events_windows(sf_dir: str):
    """Recording fusion of :func:`events_tumbling_window` and
    :func:`events_sliding_window` (both stay first-class with their
    own tests; the driver's 50-entry window forces merged recording):
    one tagged union ``(kind, event_type, window_start, value_sum,
    n_events)``. Each branch is the public op verbatim; the tag map is
    an identity-format pass that also normalizes block formats before
    the union (CLAUDE.md sort-sampler rule)."""

    def tag(kind: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "kind": pa.array([kind] * b.num_rows, type=pa.string()),
                    "event_type": b["event_type"],
                    "window_start": b["window_start"],
                    "value_sum": b["value_sum"],
                    "n_events": b["n_events"],
                }
            )

        return f

    return (
        events_tumbling_window(sf_dir)
        .map_batches(tag("tumbling"), batch_format="pyarrow")
        .union(
            events_sliding_window(sf_dir).map_batches(
                tag("sliding"), batch_format="pyarrow"
            )
        )
        
    )


def top_events_per_user(
    sf_dir: str,
    k: int = 3,
    heavy_threshold: int = HEAVY_KEY_THRESHOLD,
    slice_width_s: int = HEAVY_SLICE_S,
):
    """Per-group top-k (window-function shape): the k most recent
    events per user — coarse hash-bucket shuffle + ONE vectorized
    pandas pass per bucket (sort + groupby cumcount; no per-user
    Python call at all — ``coarse_apply``; BENCH/BASELINE.md measured
    per-group dispatch binding both map_groups AND per-fine-group
    coarse_grouped at high user cardinality).

    Heavy-key guard (r3 verdict item 3): flagged users compute a
    per-time-slice local top-k first (top-k is trivially mergeable: a
    user's global top-k is contained in the union of its per-slice
    top-ks), then one tiny keyed pass re-ranks the ≤ k·n_slices
    candidates. With no heavy keys the single-pass path runs
    unchanged."""
    from .util import coarse_apply

    ds = tbl(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    heavy = _events_heavy_keys(sf_dir, heavy_threshold)

    def topk(bucket: pd.DataFrame, by: list[str], ts_col: str) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        df = bucket.sort_values(
            [*by, ts_col, "event_id"],
            ascending=[True] * len(by) + [False, True],
            kind="mergesort",
        )
        rank = df.groupby(by, sort=False).cumcount() + 1
        df = df.assign(rank=rank)[rank <= k]
        ts_us = (
            df[ts_col].astype("datetime64[us]").astype("int64")
            if ts_col == "ts"
            else df[ts_col].astype("int64")
        )
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "event_id": df["event_id"],
                "ts_us": ts_us,
                "rank": df["rank"],
            }
        )

    if heavy.empty:
        return coarse_apply(ds, ["user_id"], lambda b: topk(b, ["user_id"], "ts"))

    sliced = _with_heavy_slice(
        ds, heavy["user_id"].to_numpy(np.int64), slice_width_s, "topk-heavy"
    )
    cand = coarse_apply(
        sliced,
        ["user_id", "__slice"],
        lambda b: topk(b, ["user_id", "__slice"], "ts"),
    )
    # re-rank the per-slice candidates: ≤ k rows per (user, slice)
    return coarse_apply(
        cand, ["user_id"], lambda b: topk(b, ["user_id"], "ts_us")
    )


def customers_without_orders(sf_dir: str, since: str = "2001-01-01"):
    """Broadcast ANTI-join: the key set of recent orders ships once
    via ``ray.put``; customers filter against it inside map_batches —
    no shuffle (the semi/anti-join pattern). 'Recent' keeps the result
    non-degenerate on the synthetic data (every customer has *some*
    order over the full history).

    The key set is built DISTRIBUTED (round-1 verdict fix — no full
    fact-table ``to_pandas``): filter + per-batch dedup + coarse
    global dedup, then only the compact distinct-custkey column is
    collected for the broadcast."""
    import ray

    from .util import coarse_dedup

    lo = pa.scalar(pd.Timestamp(since), type=pa.timestamp("us"))

    def recent_keys(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch["o_orderdate"], lo))
        return pa.table(
            {"o_custkey": pc.unique(keep["o_custkey"].combine_chunks())}
        )

    orders = tbl(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    distinct = coarse_dedup(
        orders.map_batches(recent_keys, batch_format="pyarrow"), ["o_custkey"]
    ).to_pandas()
    keys_ref = ray.put(
        pa.array(np.sort(distinct["o_custkey"].to_numpy()), type=pa.int64())
    )

    def anti(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["c_custkey"], value_set=ray.get(keys_ref)))
        return batch.filter(mask)

    ds = tbl(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return ds.map_batches(anti, batch_format="pyarrow")


def events_json_stats(sf_dir: str):
    """JSON scalar functions over the ``props`` column: extract the
    ``k`` field per event, aggregate min/max/sum per event_type — a
    capability the reference lacks entirely (SURVEY §2.6: no json
    functions). Extraction is a vectorized regex over the whole batch
    (C-level ``Series.str.extract``); rows the fast pattern misses
    (quoted/nested/absent ``k``) fall back to per-row ``json.loads``
    — the r4 verdict's per-row-Python fix with semantics unchanged."""
    import json

    ds = tbl(sf_dir, "events", columns=["event_type", "props"])

    def _extract_k(props: pd.Series) -> pd.Series:
        k = pd.to_numeric(
            props.str.extract(r'"k"\s*:\s*(-?\d+)(?=\s*[,}])', expand=False),
            errors="coerce",
        )
        # the regex finds the FIRST "k": int ANYWHERE, so only trust it
        # on provably FLAT scalar objects (r5 review, tightened): one
        # '{' (no nested objects), no '[' (no arrays / non-object top
        # level), and no '\' — a '"k":' embedded in a STRING value
        # would need \" escapes, so escape-free flat objects can only
        # match the real top-level key. Everything else goes through
        # json.loads, like the DuckDB oracle's $.k (None for a
        # non-object top level).
        fast_ok = (
            (props.str.count(r"\{") == 1)
            & ~props.str.contains("[", regex=False)
            & ~props.str.contains("\\", regex=False)
        )
        miss = k.isna() | ~fast_ok
        if miss.any():
            k[miss] = props[miss].map(
                lambda s: (
                    lambda o: o.get("k") if isinstance(o, dict) else None
                )(json.loads(s))
            )
        return k

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = _extract_k(batch["props"])
        t = pd.DataFrame({"event_type": batch["event_type"], "k": k.astype("int64")})
        g = t.groupby("event_type", sort=False)["k"]
        out = pd.DataFrame(
            {
                "k_sum": g.sum(),
                "k_min": g.min(),
                "k_max": g.max(),
                "n": g.size(),
            }
        ).reset_index()
        return out

    from .util import fold_bounded

    out = fold_bounded(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        aggs={"k_min": "min", "k_max": "max"},
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["event_type", "k_sum", "k_min", "k_max", "n_events"]
        ),
        batch_format="pyarrow",
    )


def conversation_documents(sf_dir: str):
    """Ordered string aggregation: assemble each conversation's raw
    turns into one document in turn order — groupby(conv_id) +
    in-group sort + join. The ordering-sensitive aggregate shape
    (DuckDB oracle: string_agg(... ORDER BY turn_idx))."""
    import ray.data

    from ..transcripts import transcripts_for

    src = transcripts_for(sf_dir)
    ds = ray.data.read_parquet(src, columns=["conv_id", "turn_idx", "text"])

    def assemble(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "n_turns": pd.Series([], dtype="int64"),
                    "full_text": pd.Series([], dtype=object),
                }
            )
        df = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        out = pd.DataFrame(
            {
                "conv_id": g["conv_id"].first(),
                "n_turns": g.size(),
                "full_text": g["text"].agg("\n".join),
            }
        )
        return out.reset_index(drop=True)

    from .util import coarse_apply

    return coarse_apply(ds, ["conv_id"], assemble)


def events_sessionize(
    sf_dir: str,
    gap_s: int = 600,
    heavy_threshold: int = HEAVY_KEY_THRESHOLD,
    slice_width_s: int = HEAVY_SLICE_S,
):
    """Sessionization: per-user ordered gap analysis — coarse
    hash-bucket shuffle on user_id, then ONE vectorized pandas pass
    per bucket (``coarse_apply``): sort by (user, ts), session breaks
    where the user changes or the gap exceeds ``gap_s``, cumsum →
    session ids, single C-level groupby for the roll-up. No per-user
    Python call (measured: per-group dispatch dominates at high user
    cardinality even under coarse_grouped). Returns one row per
    session.

    Heavy-key guard (r3 verdict item 3): a cheap distributed pre-count
    (``util.heavy_keys``) flags users with ≥ ``heavy_threshold`` rows;
    when any exist, their rows are salted by ``ts // slice_width_s``
    so no task sees more than one slice of a hot user, and a tiny
    second keyed pass over SESSION rows (≪ event rows) merges
    slice-boundary sessions — merging is exact because sessionization
    over time-partitioned slices composes: within-slice sessions are
    separated by > gap by construction, so only the boundary pairs can
    merge, and the merge rule is the same gap rule applied to session
    intervals. With no heavy keys (every driver sf) the single-pass
    path runs unchanged."""
    from .util import coarse_apply

    ds = tbl(sf_dir, "events", columns=["user_id", "ts"])
    heavy = _events_heavy_keys(sf_dir, heavy_threshold)

    def sessions(bucket: pd.DataFrame, by: list[str]) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "session_start": pd.Series([], dtype="int64"),
                    "session_end": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        df = bucket.sort_values([*by, "ts"], kind="mergesort")
        gaps = df["ts"].diff().dt.total_seconds()
        brk = (gaps > gap_s) | df[by[0]].ne(df[by[0]].shift())
        for b in by[1:]:
            brk |= df[b].ne(df[b].shift())
        sid = brk.cumsum()
        g = df.groupby(sid, sort=False)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].first(),
                # exact integer microseconds: immune to timestamp-unit
                # normalization differences between engines
                "session_start": g["ts"].min().astype("datetime64[us]").astype("int64"),
                "session_end": g["ts"].max().astype("datetime64[us]").astype("int64"),
                "n_events": g.size(),
            }
        )
        return out.reset_index(drop=True)

    if heavy.empty:
        return coarse_apply(ds, ["user_id"], lambda b: sessions(b, ["user_id"]))

    sliced = _with_heavy_slice(
        ds, heavy["user_id"].to_numpy(np.int64), slice_width_s,
        "sessionize-heavy",
    )
    partials = coarse_apply(
        sliced,
        ["user_id", "__slice"],
        lambda b: sessions(b, ["user_id", "__slice"]),
    )

    def merge_sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return sessions(bucket, ["user_id"])
        df = bucket.sort_values(
            ["user_id", "session_start", "session_end"], kind="mergesort"
        )
        brk = df["user_id"].ne(df["user_id"].shift()) | (
            df["session_start"] - df["session_end"].shift()
            > gap_s * 1_000_000
        )
        sid = brk.cumsum()
        g = df.groupby(sid, sort=False)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].first(),
                "session_start": g["session_start"].min(),
                "session_end": g["session_end"].max(),
                "n_events": g["n_events"].sum(),
            }
        ).reset_index(drop=True)

    # second pass over SESSION rows: idempotent for light users (their
    # sessions are already gap-separated), merges boundary sessions of
    # sliced heavy users; per-task rows are session counts, not events
    return coarse_apply(partials, ["user_id"], merge_sessions)


def events_asof_join(
    sf_dir: str,
    heavy_threshold: int = HEAVY_KEY_THRESHOLD,
    slice_width_s: int = HEAVY_SLICE_S,
):
    """As-of join (SURVEY custom-operator rule): for every click
    event, the most recent prior-or-equal purchase value of the same
    user. Ray Data has no asof join → coarse hash-bucket shuffle on
    user_id with ONE ``pd.merge_asof(..., by="user_id")`` per bucket
    (``coarse_apply``: merge_asof's ``by`` handles every user in the
    bucket in a single vectorized C pass).

    Heavy-key guard (r3 verdict item 3): users flagged by the cheap
    pre-count are salted by ``ts // slice_width_s`` so no task holds
    more than one slice of a hot user. Cross-slice resolution is
    exact: a click unmatched within its slice has NO same-slice
    purchase at-or-before it, so its answer is the LAST purchase of
    the nearest earlier slice that has one — recovered by two tiny
    keyed passes over per-slice summary rows (one row per (user,
    slice)), never over the raw events. With no heavy keys (every
    driver sf) the single-pass path runs unchanged."""
    from .util import coarse_apply

    ds = tbl(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    heavy = _events_heavy_keys(sf_dir, heavy_threshold)

    def _final(event_id, user_id, value) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": np.asarray(event_id, dtype=np.int64),
                "user_id": np.asarray(user_id, dtype=np.int64),
                "last_purchase_value": np.asarray(value, dtype=np.float64),
            }
        )

    def asof(bucket: pd.DataFrame, by: list[str]) -> pd.DataFrame | None:
        clicks = bucket[bucket["event_type"] == "click"].sort_values(
            "ts", kind="mergesort"
        )
        purch = bucket[bucket["event_type"] == "purchase"].sort_values(
            "ts", kind="mergesort"
        )
        if len(clicks) == 0:
            return None
        # __hit marks a real asof match — a matched purchase whose
        # value is itself NaN must NOT be confused with "no match"
        # when the guarded path routes misses to cross-slice repair
        right = purch[[*by, "ts", "value"]].assign(__hit=np.int8(1))
        return pd.merge_asof(
            clicks[["event_id", *by, "ts"]],
            right,
            on="ts",
            by=by,
            direction="backward",
        )

    if heavy.empty:

        def simple(bucket: pd.DataFrame) -> pd.DataFrame:
            m = asof(bucket, ["user_id"])
            if m is None:
                return _final([], [], [])
            return _final(m["event_id"], m["user_id"], m["value"])

        return coarse_apply(ds, ["user_id"], simple)

    # --- guarded path: per-(user, slice) asof + two summary passes ---
    sliced = _with_heavy_slice(
        ds, heavy["user_id"].to_numpy(np.int64), slice_width_s, "asof-heavy"
    )

    _kinds = ("m", "u", "p", "q")  # matched / unmatched / slice-last
    # purchase / slice-needs-resolution

    def _wide(kind, event_id, user_id, sl, ts_us, value) -> pd.DataFrame:
        uid = np.asarray(user_id, dtype=np.int64)
        n = len(uid)

        def arr(x, dt):
            a = np.asarray(x, dtype=dt)
            return np.full(n, a, dtype=dt) if a.ndim == 0 else a

        k = (
            np.full(n, kind, dtype=object)
            if isinstance(kind, str)
            else np.asarray(kind, dtype=object)
        )
        return pd.DataFrame(
            {
                "kind": pd.Series(k, dtype=object),
                "event_id": arr(event_id, np.int64),
                "user_id": uid,
                "__slice": arr(sl, np.int64),
                "ts_us": arr(ts_us, np.int64),
                "value": arr(value, np.float64),
            }
        )

    def parts(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        m = asof(bucket, ["user_id", "__slice"])
        if m is not None and len(m):
            un = (m["__slice"] > 0) & m["__hit"].isna()
            mm = m[~un]
            outs.append(
                _wide("m", mm["event_id"], mm["user_id"], mm["__slice"],
                      0, mm["value"])
            )
            uu = m[un]
            if len(uu):
                outs.append(
                    _wide("u", uu["event_id"], uu["user_id"], uu["__slice"],
                          0, np.nan)
                )
                qq = uu[["user_id", "__slice"]].drop_duplicates()
                outs.append(
                    _wide("q", 0, qq["user_id"], qq["__slice"], 0, np.nan)
                )
        hp = bucket[(bucket["event_type"] == "purchase") & (bucket["__slice"] > 0)]
        if len(hp):
            hp = hp.sort_values("ts", kind="mergesort")
            # last ROW per group — groupby(...).last() takes the last
            # NON-NULL per column, which would pair a NaN-valued final
            # purchase's ts with an EARLIER purchase's value (r4 review)
            last = hp.drop_duplicates(["user_id", "__slice"], keep="last")
            outs.append(
                _wide(
                    "p", 0, last["user_id"], last["__slice"],
                    last["ts"].astype("datetime64[us]").astype("int64"),
                    last["value"],
                )
            )
        if not outs:
            return _wide([], [], [], [], [], [])
        return pd.concat(outs, ignore_index=True)

    # one materialize: three consumers below would otherwise re-execute
    # the whole asof pass per branch (rows here ≈ click count — the
    # same magnitude the final result holds anyway; spills at scale)
    wide = coarse_apply(sliced, ["user_id", "__slice"], parts).materialize()

    def resolve(bucket: pd.DataFrame) -> pd.DataFrame:
        """Per user: for each slice flagged 'q', the latest 'p' row of
        any EARLIER slice (own-slice purchases are all later than the
        unmatched clicks by construction). Rows here are per-slice
        summaries — bounded by time range / slice width, not events."""
        if len(bucket) == 0:
            return _wide([], [], [], [], [], [])
        # q sorts before p within a slice so the carry never leaks the
        # own-slice purchase into its own slice's resolution; carry ROW
        # POSITIONS (not values) so a purchase whose value is genuinely
        # NaN still wins the carry
        ordk = bucket["kind"].map({"q": 0, "p": 1})
        df = (
            bucket.assign(__ord=ordk)
            .sort_values(["user_id", "__slice", "__ord"], kind="mergesort")
            .reset_index(drop=True)
        )
        pos = pd.Series(
            np.where(
                df["kind"].to_numpy() == "p",
                np.arange(len(df), dtype=np.float64),
                np.nan,
            )
        )
        carried = pos.groupby(df["user_id"].to_numpy(), sort=False).ffill()
        q = (df["kind"] == "q").to_numpy()
        ci = carried.to_numpy()[q]
        vals = np.full(int(q.sum()), np.nan)
        ok = ~np.isnan(ci)
        vals[ok] = df["value"].to_numpy()[ci[ok].astype(np.int64)]
        return _wide(
            "r", 0, df.loc[q, "user_id"], df.loc[q, "__slice"], 0, vals
        )

    def _filt(kinds: set):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["kind"].isin(kinds)]

        return f

    pq = wide.map_batches(_filt({"p", "q"}), batch_format="pandas")
    resolved = coarse_apply(pq, ["user_id"], resolve)

    u_rows = wide.map_batches(_filt({"u"}), batch_format="pandas")

    def attach(bucket: pd.DataFrame) -> pd.DataFrame:
        u = bucket[bucket["kind"] == "u"]
        if len(u) == 0:
            return _final([], [], [])
        r = bucket[bucket["kind"] == "r"]
        m = u.merge(
            r[["user_id", "__slice", "value"]].rename(
                columns={"value": "__rv"}
            ),
            on=["user_id", "__slice"],
            how="left",
        )
        return _final(m["event_id"], m["user_id"], m["__rv"])

    fixed = coarse_apply(
        u_rows.union(resolved), ["user_id", "__slice"], attach
    )

    def m_final(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["kind"] == "m"]
        return _final(m["event_id"], m["user_id"], m["value"])

    matched = wide.map_batches(m_final, batch_format="pandas")
    return matched.union(fixed)


def distinct_users_per_event_type(sf_dir: str):
    """Exact COUNT(DISTINCT): per-batch pair dedup (vectorized) →
    global coarse dedup of (event_type, user_id) → tiny grouped count.
    The shuffle moves one row per distinct pair, not per event."""
    from .util import coarse_dedup

    ds = tbl(sf_dir, "events", columns=["event_type", "user_id"])

    def local_dedup(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            batch.to_pandas().drop_duplicates(["event_type", "user_id"]),
            preserve_index=False,
        )

    pairs = ds.map_batches(local_dedup, batch_format="pyarrow")
    distinct = coarse_dedup(pairs, ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type"]).aggregate([("user_id", "count")])

    from .util import fold_bounded

    return fold_bounded(
        distinct.map_batches(partial, batch_format="pyarrow"), ["event_type"]
    ).map_batches(
        lambda b: b.rename_columns(["event_type", "n_users"]),
        batch_format="pyarrow",
    )


def top_customers_by_balance(sf_dir: str, k: int = 25):
    """Sort + limit (top-k) with a deterministic tiebreak."""
    ds = tbl(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    return ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(k)


def lineitem_distinct_flags(sf_dir: str):
    """Distinct values — grouped count reused as DISTINCT."""
    ds = tbl(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate([])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from .util import fold_bounded

    # keys-only partials: with zero value columns fold_bounded's
    # group_by(keys).aggregate([]) IS a two-level DISTINCT fold
    return fold_bounded(parts, ["l_returnflag", "l_linestatus"])
