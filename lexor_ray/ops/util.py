"""Shared helpers for the dataset operators.

Scale-first conventions used across ``lexor_ray.ops``:

- **Prune at the read**: every reader passes ``columns=[...]``.
- **Partial aggregation**: grouped aggregates combine inside
  ``map_batches`` (vectorized ``pyarrow.Table.group_by`` per batch)
  before the wide ``groupby`` — the shuffle then moves one row per
  (key, batch), not one row per input row.
- **Broadcast small sides**: dimension tables go through ``ray.put``
  once and are read inside each task; never a shuffle join for a
  small side.
- **Stable rounding**: float aggregates are rounded identically in
  the Ray path and the DuckDB oracle SQL so value-hash comparison is
  deterministic across summation orders.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def tbl(sf_dir: str, name: str, columns=None):
    """Column-pruned Ray Dataset over one testdata table."""
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def round_col(table: pa.Table, name: str, ndigits: int) -> pa.Table:
    import pyarrow.compute as pc

    i = table.schema.get_field_index(name)
    return table.set_column(i, name, pc.round(table.column(name), ndigits=ndigits))


#: per-worker-process instance cache for stateful batch callables.
#: Stateless tasks + this cache give actor-style state amortization
#: (compiled regexes, hash params, broadcast handles) WITHOUT an actor
#: pool's fixed CPU reservation — a pool sized at the CPU count
#: deadlocks the streaming executor's downstream shuffle stages on
#: small machines, and undersized pools starve the stage.
_WORKER_CACHE: dict = {}


def cached(key, factory):
    inst = _WORKER_CACHE.get(key)
    if inst is None:
        inst = _WORKER_CACHE[key] = factory()
    return inst


#: broadcasts kept per cached_for_ref slot per worker — >1 so two
#: pipelines sharing a worker (the GATE_WORKERS-overlapped gate, or
#: curation_docs alongside a standalone quantile_filter) don't evict
#: each other's entry every batch (ADVICE r4), small enough that the
#: pinned plasma buffers stay bounded (the r2 LSH cache-leak lesson).
_REF_CACHE_PER_SLOT = 4


def cached_for_ref(slot: str, ref, factory):
    """Small per-slot LRU of materialized broadcasts, keyed by the
    ObjectRef hex — an unchanged ref hits the cache, a new ref
    replaces the least-recently-used entry once the slot holds
    ``_REF_CACHE_PER_SLOT``. ``factory()`` receives nothing and
    typically does ``ray.get(ref)`` + derived indexes."""
    from collections import OrderedDict

    hex_ = ref.hex()
    lru = _WORKER_CACHE.get(slot)
    if not isinstance(lru, OrderedDict):
        lru = _WORKER_CACHE[slot] = OrderedDict()
    if hex_ in lru:
        lru.move_to_end(hex_)
        return lru[hex_]
    val = lru[hex_] = factory()
    if len(lru) > _REF_CACHE_PER_SLOT:
        lru.popitem(last=False)
    return val


def coarse_grouped(
    ds, fine_keys: list[str], fn, n_buckets: int = 256, min_group_size: int = 1
):
    """Apply a per-fine-group pandas function via COARSE shuffle
    groups: shuffle on ``hash(fine_keys) % n_buckets`` (≈n_buckets
    medium groups), then run a vectorized pandas ``groupby`` over the
    fine keys inside each. Ray's ``groupby().map_groups`` launches
    per-group Python work — with millions of tiny groups (LSH buckets,
    candidate pairs) that overhead dominates; this keeps the shuffle
    while amortizing the per-group cost. ``fn(fine_group_df) -> df``.

    ``min_group_size > 1`` drops smaller fine groups *vectorized*
    before fn runs — for pair expansion over LSH buckets the vast
    majority of buckets are singletons that can't produce pairs, so
    this removes almost every Python call.
    """
    import pandas as pd
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df[fine_keys], index=False)
        return batch.append_column(
            "__bucket", pa.array((h % n_buckets).astype("int32"))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if min_group_size > 1 and len(g):
            sizes = g.groupby(fine_keys, sort=False)[fine_keys[0]].transform("size")
            g = g[sizes >= min_group_size]
        outs = [fn(sub) for _, sub in g.groupby(fine_keys, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return fn(g.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def bucketed_join(
    left,
    right,
    key_col: str,
    right_key: str,
    value_col: str,
    out_col: str,
    carry: dict,
    value_type=None,
    n_buckets: int = 64,
):
    """TASK-BASED distributed hash join: attach ``right[value_col]``
    to each ``left`` row on ``left[key_col] == right[right_key]``
    (inner). Both sides are tagged, unioned and hash-bucketed on the
    join key, then resolved with one vectorized pandas ``merge`` per
    bucket — this rides the proven task-based sort shuffle instead of
    ``Dataset.join``'s aggregator ACTOR pool, which reserves CPU
    proportional to num_partitions and deadlocks chained joins on
    small CPU budgets (measured; CLAUDE.md actor-pool rule).

    ``carry`` maps carried left-column name → pyarrow type. Keys may
    be any hashable dtype (int64, string). ``value_type`` defaults to
    string."""
    import pandas as pd
    import pyarrow as pa

    if value_type is None:
        value_type = pa.string()
    carry_items = list(carry.items())

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c, _ in carry_items}
        cols["__key"] = batch[key_col]
        cols["__value"] = pa.nulls(batch.num_rows, type=value_type)
        cols["__side"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: pa.nulls(n, type=t) for c, t in carry_items}
        cols["__key"] = batch[right_key]
        cols["__value"] = batch[value_col]
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column("__key").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return batch.append_column(
            "__bucket", pa.array((h % n_buckets).astype("int32"))
        )

    out_cols = [*carry, out_col]

    def _series(t) -> pd.Series:
        if pa.types.is_integer(t):
            return pd.Series([], dtype="int64")
        if pa.types.is_floating(t):
            return pd.Series([], dtype="float64")
        return pd.Series([], dtype=object)

    def _empty() -> pd.DataFrame:
        data = {c: _series(t) for c, t in carry_items}
        data[out_col] = _series(value_type)
        return pd.DataFrame(data)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        left_g = g[g["__side"] == 1]
        right_g = g[g["__side"] == 0]
        if len(left_g) == 0 or len(right_g) == 0:
            return _empty()
        m = left_g.merge(
            right_g[["__key", "__value"]].rename(columns={"__value": out_col}),
            on="__key",
            how="inner",
        )
        if len(m) == 0:
            return _empty()
        res = m[out_cols].copy()
        for c, t in carry_items:
            if pa.types.is_integer(t):
                res[c] = res[c].astype("int64")
        if pa.types.is_integer(value_type):
            res[out_col] = res[out_col].astype("int64")
        return res

    b = tagged.map_batches(add_bucket, batch_format="pyarrow")
    return b.groupby("__bucket").map_groups(resolve, batch_format="pandas")


def coarse_apply(ds, keys: list[str], fn, n_buckets: int = 256):
    """Apply a VECTORIZED pandas function per coarse hash bucket of
    ``keys``: shuffle on ``hash(keys) % n_buckets``, call ``fn`` once
    per bucket with all of that bucket's rows (every fine key's rows
    colocated). Unlike :func:`coarse_grouped` there is no per-fine-
    group Python call at all — ``fn`` is expected to handle the whole
    bucket with pandas groupby/transform kernels. The right shape for
    per-key ordered analytics over millions of tiny keys."""
    import pandas as pd
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df[keys], index=False)
        return batch.append_column(
            "__bucket", pa.array((h % n_buckets).astype("int32"))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def heavy_keys(ds, key: str, threshold: int, n_buckets: int = 64):
    """Distributed heavy-key pre-count (r3 verdict item 3): the keys
    whose GLOBAL row count is at least ``threshold``, as a tiny pandas
    frame ``(key, n)``. One column-pruned scan emits a per-batch
    ``value_counts`` partial (one row per distinct key per batch), ONE
    coarse keyed shuffle sums and filters per bucket (exact: a key
    lives entirely in one bucket). The collect is bounded by
    construction — at most ``total_rows / threshold`` keys survive —
    so this is safe to run before any per-key operator to decide
    whether its hot keys need time-sliced salting."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        # arrow-native count: no pandas round-trip, no sort — this
        # partial scans the FULL keyed table before every guarded
        # per-key operator, so it must stay zero-copy (r4 review)
        vc = pc.value_counts(batch.column(key))
        return pa.table(
            {
                key: vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key, sort=False)["n"].sum().reset_index()
        return s[s["n"] >= threshold]

    out = coarse_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        agg,
        n_buckets=n_buckets,
    ).to_pandas()
    if key not in out.columns:
        # all-empty buckets lose the schema (Ray drops empty blocks)
        out = pd.DataFrame({key: pd.Series([], dtype="int64"),
                            "n": pd.Series([], dtype="int64")})
    return out


def coarse_dedup(ds, keys: list[str], n_buckets: int = 64):
    """Distributed drop-duplicates on ``keys``: coarse hash-bucket
    shuffle + vectorized ``drop_duplicates`` per bucket (no per-group
    Python calls at all)."""
    import pandas as pd
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df[keys], index=False)
        return batch.append_column(
            "__bucket", pa.array((h % n_buckets).astype("int32"))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__bucket").drop_duplicates(keys)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def partial_group_agg(keys: list[str], aggs: list[tuple[str, str]]):
    """Return a map_batches fn computing a per-batch grouped partial
    aggregate with ``pyarrow.Table.group_by`` (vectorized). ``aggs``
    is ``[(column, fn)]`` with fn in {'sum','count','min','max'};
    output columns are named ``{column}_{fn}`` (pyarrow convention).
    """

    def _agg(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(aggs)

    return _agg


def sql_source(table_or_path: str) -> str:
    """A DuckDB FROM-clause source: a parquet path is wrapped in
    ``read_parquet(...)``; anything else is used verbatim as a
    table/view name (the driver pre-registers the testdata tables as
    views, while pytest oracles point at tmp parquet files)."""
    if table_or_path.endswith(".parquet") or "/" in table_or_path:
        return f"read_parquet('{table_or_path}')"
    return table_or_path


def fold_bounded(parts, keys: list[str], fan_in: int = 16, aggs: dict | None = None):
    """Two-level arrow fold for KEY-BOUNDED partial aggregates —
    replaces ``groupby().aggregate(Sum...)`` + a trailing
    ``Dataset.sort`` when the key domain is small and data-independent
    (flag/status pairs, event types × time windows): Ray's sort-based
    groupby plus a separate sort shuffle cost whole seconds of fixed
    overhead on results of a few hundred rows (measured on q1: the
    6-row trailing sort alone sampled+shuffled 64 blocks for ~0.4 s).

    Level 1 sums every non-key column per key inside ``fan_in``
    coalesced partitions; level 2 folds those in ONE task and returns
    the table sorted by ``keys``. Level-2 input is ≤ #keys × fan_in
    rows — callers assert key-boundedness by choosing this helper; for
    unbounded keys use a real keyed shuffle (``coarse_apply``).

    ``aggs`` maps a value column to its reassociative fold kernel
    (``"sum" | "min" | "max"``; default ``"sum"`` for every non-key
    column) — the SAME kernel applies at both levels, which is exactly
    why only reassociative aggregates are allowed here.

    Limitation: an ALL-empty input yields an empty dataset with NO
    schema (Ray's repartition drops empty blocks before combine runs);
    fine for the call sites, which roll up non-empty tables."""
    import pyarrow as pa

    def combine(t: pa.Table) -> pa.Table:
        vals = [c for c in t.column_names if c not in keys]
        kind = {c: (aggs or {}).get(c, "sum") for c in vals}
        agg = t.group_by(keys).aggregate([(c, kind[c]) for c in vals])
        return pa.table(
            {k: agg[k] for k in keys}
            | {c: agg[f"{c}_{kind[c]}"] for c in vals}
        )

    # batch_size=None = whole block per call: the level-2 reducer MUST
    # see the single repartition(1) block in one batch or it would emit
    # one partially-folded row group per batch slice (ADVICE r3: the
    # invariant held on Ray 2.49 by default, but was unasserted)
    lvl1 = parts.repartition(fan_in).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    return lvl1.repartition(1).map_batches(
        lambda t: combine(t).sort_by([(k, "ascending") for k in keys]),
        batch_format="pyarrow",
        batch_size=None,
    )


def splitmix64_sql(
    input_expr: str,
    source: str,
    carry: str = "",
    state: str = "za",
    prefix: str = "s",
) -> str:
    """ONE definition of the 3-stage DuckDB splitmix64 finalizer CTE
    chain (review fix: the identical UHUGEINT mod-2^64 SQL was
    copy-pasted across five oracle builders). Emits
    ``{prefix}0 AS (...), {prefix}1 AS (...), {prefix}2 AS (...)``;
    the last CTE carries the pre-finalizer ``{state}`` — finish with
    ``xor({state}, {state} >> 31)``. ``carry`` is the projected key
    columns (e.g. ``"doc_id"`` or ``"doc_id, source"``); ``input_expr``
    is the uint64-able seed expression (``doc_id``,
    ``xor(doc_id, SALT)``, ...). Constants mirror
    :func:`lexor_ray.ops.sampling.splitmix64` exactly."""
    sel = f"{carry}, " if carry else ""
    return f"""{prefix}0 AS (
            SELECT {sel}CAST((CAST({input_expr} AS UHUGEINT)
                         + 11400714819323198485::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT)
                       AS {state}
            FROM {source}
        ), {prefix}1 AS (
            SELECT {sel}CAST((CAST(xor({state}, {state} >> 30) AS UHUGEINT)
                         * 13787848793156543929::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT)
                       AS {state}
            FROM {prefix}0
        ), {prefix}2 AS (
            SELECT {sel}CAST((CAST(xor({state}, {state} >> 27) AS UHUGEINT)
                         * 10723151780598845931::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT)
                       AS {state}
            FROM {prefix}1
        )"""
