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


def partial_group_agg(keys: list[str], aggs: list[tuple[str, str]]):
    """Return a map_batches fn computing a per-batch grouped partial
    aggregate with ``pyarrow.Table.group_by`` (vectorized). ``aggs``
    is ``[(column, fn)]`` with fn in {'sum','count','min','max'};
    output columns are named ``{column}_{fn}`` (pyarrow convention).
    """

    def _agg(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(aggs)

    return _agg
