"""Bare-multiprocessing silicon control for the N→4N scaling proxy.

N fully independent Python processes (no Ray, no object store, no IO)
each run the REAL per-task extraction work — the full ExtractBatch
UDF: parse → convert → write + Arrow build + log + lineage — over
their own in-memory transcripts batch. The ratio of per-proc
throughput between process counts is the machine's own scaling
ceiling for this allocation-heavy string workload; the Ray pipeline's
measured efficiency is judged against THIS, not against 1.0
(BENCH/BASELINE.md: the 8→32 decay is the memory bus, not the
framework — r2 control 0.72, r3 control 0.713).

Usage: python tools/scaling_control.py [rows_per_proc] [procs,procs,..]
e.g.   python tools/scaling_control.py 30000 1,8,32
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _one_proc(args: tuple[int, int, float]) -> tuple[float, float]:
    """Child: generate its own batch (seeded per proc), SLEEP until
    the shared start barrier so every child's timed window truly
    overlaps (otherwise a child that finishes generating early times
    its extraction against idle CPUs and inflates the aggregate),
    then run the full UDF 3× and return (rows/sec, seconds the child
    missed the barrier by — 0.0 when it made it)."""
    rows, seed, start_at = args
    from lexor_ray.pipeline import ExtractBatch
    from lexor_ray.transcripts import generate_transcripts

    tbl = generate_transcripts(rows, seed=seed)
    if isinstance(tbl, tuple):  # (table, golden) signature guard
        tbl = tbl[0]
    udf = ExtractBatch("html-text", emit_log=True, emit_lineage=True)
    wait = start_at - time.time()
    late = max(0.0, -wait)
    if wait > 0:
        time.sleep(wait)
    t0 = time.time()
    out_rows = 0
    for _ in range(3):
        for piece in udf(tbl):
            out_rows += piece.num_rows
    dt = time.time() - t0
    assert out_rows == rows * 3
    return out_rows / dt, late


def run(rows: int, procs: int):
    """(total rows/s, per-proc rows/s, per-proc rates) at a count.

    Total is the SUM of child-measured steady rates: every child
    starts at once and spends the same untimed generation warmup, so
    their timed sections overlap — parent wall clock would charge the
    warmup and pool startup to the workload."""
    # barrier: generous generation allowance so every child is ready
    start_at = time.time() + 20.0
    with ProcessPoolExecutor(max_workers=procs) as ex:
        out = list(
            ex.map(_one_proc, [(rows, 1000 + i, start_at) for i in range(procs)])
        )
    rates = [r for r, _ in out]
    late = [l for _, l in out if l > 0]
    if late:
        # a late child timed against partially idle CPUs — the run's
        # figure is invalid evidence; fail loudly (r4 review; r5: with
        # a NONZERO exit, not just a warning a consumer can miss)
        raise SystemExit(
            f"ABORT: {len(late)} children missed the start barrier "
            f"(worst {max(late):.1f}s late) — rerun with fewer rows; "
            "this measurement is NOT overlap-valid"
        )
    total = float(sum(rates))
    return total, total / procs, rates


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    counts = [
        int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,8,32").split(",")
    ]
    results = {}
    for p in counts:
        total, per, _ = run(rows, p)
        results[p] = total
        print(f"{p:3d} procs: total {total/1000:.1f}k rows/s, "
              f"per-proc {per/1000:.1f}k")
    if 8 in results and 32 in results:
        eff = (results[32] / results[8]) / 4
        print(f"8→32 control efficiency: {eff:.3f}")
    if 2 in results and 8 in results:
        eff = (results[8] / results[2]) / 4
        print(f"2→8 control efficiency: {eff:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
