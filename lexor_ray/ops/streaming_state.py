"""Stateful streaming via raw Ray actors — the last-resort tier.

The custom-operator ladder (SURVEY.md intro): (a) compose Dataset ops,
(b) actor-pool stage, (c) raw Ray actors when the Dataset API can't
express the semantics. This module demonstrates (c) honestly: a
shared MUTABLE index that must observe batches *in event order* and
answer queries mid-stream — e.g. "has this conversation already seen
a tool turn when each new turn arrives?" — which per-batch map
functions cannot express (they see one batch, no cross-batch order).

Pattern (ray_guide streaming-shaped workloads): one ``@ray.remote``
actor per key-hash bucket owns the state for its conversations;
the driver feeds each bucket's rows in ts order; results come back as
tables and are unioned. Ordering assumption documented: rows must be
routed to buckets by conv_id (so one conversation is owned by exactly
one actor) and fed in ts order within the bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def first_tool_turn_flags(sf_dir: str, n_buckets: int = 4):
    """For every turn: had this conversation already produced a tool
    turn strictly before it (by ts)? Incremental per-conversation
    state in bucket actors; validated against a batch recomputation in
    tests."""
    import ray
    import ray.data

    from ..transcripts import transcripts_for

    @ray.remote
    class BucketState:
        """Owns the seen-tool set for its conversations."""

        def __init__(self) -> None:
            self.seen_tool: set[str] = set()

        def process(self, table: pa.Table) -> pa.Table:
            # rows arrive in ts order within this bucket
            convs = table.column("conv_id").to_pylist()
            roles = table.column("role").to_pylist()
            flags = np.empty(len(convs), dtype=bool)
            for i, (c, r) in enumerate(zip(convs, roles)):
                flags[i] = c in self.seen_tool
                if r == "tool":
                    self.seen_tool.add(c)
            return pa.table(
                {
                    "conv_id": table["conv_id"],
                    "turn_idx": table["turn_idx"],
                    "tool_seen_before": pa.array(flags),
                }
            )

    src = transcripts_for(sf_dir)
    ds = ray.data.read_parquet(src, columns=["conv_id", "turn_idx", "role", "ts"])
    actors = [BucketState.remote() for _ in range(n_buckets)]
    pending = []
    # The ordered log: a ts-sorted dataset iterated on the driver (a
    # deployment would tail a partitioned log). Ordering guarantees:
    # iter_batches over a sorted dataset yields rows in sort order,
    # and Ray executes tasks submitted by one caller to one actor in
    # submission order — so each bucket actor observes its
    # conversations' turns in global ts order without driver-side
    # synchronization per batch.
    for batch in ds.sort(["ts", "conv_id", "turn_idx"]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        batch = batch.assign(
            __bucket=pd.util.hash_array(batch["conv_id"].to_numpy()) % n_buckets
        )
        for bid, sub in batch.groupby("__bucket", sort=False):
            sub = sub.drop(columns=["__bucket", "ts"])
            pending.append(
                actors[int(bid)].process.remote(
                    pa.Table.from_pandas(sub, preserve_index=False)
                )
            )
    tables = ray.get(pending)
    out = pa.concat_tables(tables)
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
