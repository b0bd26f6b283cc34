"""Large-scale soak of the extraction pipeline: overlapped chunk
pipelines at the production chunk size over a multi-million-turn
synthetic transcripts table, reporting sustained turns/s — plus
resume verification when rerun over a partially-complete output dir
(kill a run mid-flight, rerun, and completed chunks are skipped).

Usage:
    python tools/soak.py [sf] [out_dir]      # sf16 = 16M turns
    RAY_GRAFT_CPUS=32 python tools/soak.py 16 /tmp/lexor_soak_out

Prints ONE JSON line: generation time, chunk counts (total/skipped),
extraction wall seconds and sustained turns/s for the rows processed
in THIS run (skipped chunks excluded from the rate).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lexor_soak_out"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lexor_ray.pipeline import run_extraction
    from lexor_ray.transcripts import transcripts_dir

    t0 = time.time()
    src = transcripts_dir(sf)
    gen_sec = time.time() - t0

    t0 = time.time()
    s = run_extraction(
        src, out, files_per_chunk=64, batch_size=1024, max_in_flight=3
    )
    dt = time.time() - t0
    # skipped rows reported by run_extraction itself (r4 review)
    done_rows = s["rows"] - s["rows_skipped"]
    print(
        json.dumps(
            {
                "sf": sf,
                "num_cpus": cpus,
                "gen_sec": round(gen_sec, 1),
                "rows_total": s["rows"],
                "rows_this_run": done_rows,
                "chunks_total": s["chunks_total"],
                "chunks_skipped": s["chunks_skipped"],
                "sec": round(dt, 1),
                "turns_per_sec": round(done_rows / dt, 1) if dt > 0 else None,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
