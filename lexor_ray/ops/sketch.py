"""Mergeable sketches: HyperLogLog approximate distinct count.

The guide's sketch pattern: emit ONE serialized sketch per batch per
key from ``map_batches`` and merge them in a second, tiny stage —
sketches are designed to be mergeable, so the shuffle moves
``n_keys × n_batches`` register arrays instead of every row. Public
algorithm: Flajolet et al., HyperLogLog (AofA 2007) with the standard
bias correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import tbl

P = 12  #: 2^12 = 4096 registers, ~1.6% standard error
M = 1 << P


def _registers(values: np.ndarray) -> np.ndarray:
    """HLL registers for a uint64 hash array (vectorized). Rank =
    leading zeros of the low 64-P bits (viewed MSB-first) + 1,
    computed exactly via float log2 over the top 53 bits — hashes
    whose first set bit is below bit 11 (probability 2^-53 per value)
    saturate to the max rank, a negligible bias."""
    idx = (values >> np.uint64(64 - P)).astype(np.int64)
    rest = values << np.uint64(P)  # the suffix, MSB-aligned
    hi = (rest >> np.uint64(11)).astype(np.float64)  # exact in float64
    with np.errstate(divide="ignore"):
        bitlen = np.where(hi > 0, np.floor(np.log2(np.maximum(hi, 1))) + 1 + 11, 0)
    lz = 64 - bitlen.astype(np.int64)
    rank = np.minimum(lz, 64 - P) + 1
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    alpha = 0.7213 / (1 + 1.079 / M)
    est = alpha * M * M / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # small-range correction
    return float(est)


def approx_distinct_users(sf_dir: str):
    """Approximate distinct user_id per event_type via mergeable HLL:
    one 4 KiB register vector per (key, batch) → per-key max-merge →
    estimate. Compared against the exact count in tests (±5%)."""
    ds = tbl(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keys, regs = [], []
        for k, sub in df.groupby("event_type", sort=False):
            h = pd.util.hash_array(sub["user_id"].to_numpy()).astype(np.uint64)
            keys.append(k)
            regs.append(_registers(h))
        return pa.table(
            {
                "event_type": pa.array(keys, type=pa.string()),
                "regs": pa.array([r.tolist() for r in regs]),
            }
        )

    sketches = ds.map_batches(sketch, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce(
            [np.asarray(r, dtype=np.uint8) for r in g["regs"]]
        )
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "approx_users": [int(round(_estimate(regs)))],
            }
        )

    return (
        sketches.groupby("event_type").map_groups(merge, batch_format="pandas")
        .sort("event_type")
    )
