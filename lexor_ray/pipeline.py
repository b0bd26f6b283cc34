"""Ray Data assembly of the extraction engine.

The reference pipeline (``lexor/command/to.py:225-291``: read → parse →
convert → write, one file per process) restated Ray-Data-first
(SURVEY.md §3.1): ``read_parquet(transcripts)`` →
``map_batches(ExtractBatch, batch_format='pyarrow')`` on an actor pool
(compiled dialect registries built once per actor, §2.7) →
optional ``sort(['conv_id','turn_idx'])`` ordering shuffle →
``write_parquet`` with a per-chunk lineage manifest enabling exact
resume (north rule).

Scale notes (100 TB / 10^12 turns):

- The extract stage is embarrassingly parallel per row; no shuffle.
  The only wide op is the optional ordering sort, applied at
  comparison time, never mid-pipeline (SURVEY.md §7.4.5).
- ``columns=`` pruning at the read: only ``conv_id, turn_idx, text``
  leave storage for extraction.
- Long tool-output turns: handled by a character budget per batch —
  the actor slices incoming Arrow batches so a few multi-MB rows never
  ride with thousands of small ones (length-skew mitigation of
  SURVEY.md §4.3 without a repartition pass).
- Resumability: input files are processed in deterministic chunks;
  each chunk writes to its own output directory (atomic rename) plus a
  ``manifest/part-*.json`` with input fragment identity, parser-rule
  hit counts and span checksums. A rerun skips completed chunks.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

from .extract import Extractor

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
EXTRACT_INPUT_COLUMNS = ["conv_id", "turn_idx", "text"]

SPAN_TYPE = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))
LOG_TYPE = pa.list_(
    pa.struct(
        [
            ("module", pa.string()),
            ("code", pa.string()),
            ("line", pa.int32()),
            ("col", pa.int32()),
            ("arg", pa.list_(pa.string())),
        ]
    )
)


def transcript_schema() -> pa.Schema:
    """The enforced input schema (BASELINE.json ``input_hint``)."""
    return pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )


class ExtractBatch:
    """Actor-pool batch UDF: parse→convert→write per row, fused
    (SURVEY.md §2.2 legend). Dialect registries are compiled once per
    actor here in ``__init__`` — the Ray restatement of the
    reference's ``_reload`` amortization (``parser.py:159-160``)."""

    #: stable rule order for the lineage hit vector
    RULE_NAMES = [
        "CommentParser",
        "CDataParser",
        "DoctypeParser",
        "PIParser",
        "ElementParser",
        "StrayCloseParser",
        "EntityParser",
    ]

    def __init__(
        self,
        dialect: str = "html-text",
        emit_log: bool = True,
        emit_lineage: bool = True,
        max_batch_chars: int = 8_000_000,
        carry_source: bool = True,
    ) -> None:
        self.extractor = Extractor(dialect)
        self.emit_log = emit_log
        self.emit_lineage = emit_lineage
        self.max_batch_chars = max_batch_chars
        self.carry_source = carry_source
        self._rule_index = {n: i for i, n in enumerate(self.RULE_NAMES)}

    def __call__(self, batch: pa.Table):
        # char-budget slicing: keep huge tool-output rows from blowing
        # up one task's heap (skew mitigation, SURVEY.md §4.3).
        import pyarrow.compute as pc

        nchars = pc.sum(pc.binary_length(batch["text"])).as_py() or 0
        if nchars > self.max_batch_chars and batch.num_rows > 1:
            half = batch.num_rows // 2
            yield from self(batch.slice(0, half))
            yield from self(batch.slice(half))
            return
        yield self._process(batch)

    def _process(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        extractor = self.extractor
        parser = extractor.parser
        out_texts: list[str] = []
        flat_start: list[int] = []
        flat_end: list[int] = []
        span_offsets = np.empty(n + 1, dtype=np.int32)
        span_offsets[0] = 0
        logs: list[list[dict]] = []
        span_crc = np.zeros(n, dtype=np.int64)
        hit_vecs = np.zeros((n, len(self.RULE_NAMES)), dtype=np.int32)
        rule_index = self._rule_index
        for i, text in enumerate(texts):
            if text is None:
                text = ""
            parser.rule_hits = {}
            res = extractor.extract_one(text)
            out_texts.append(res["extracted_text"])
            spans = res["spans"]
            for s, e in spans:
                flat_start.append(s)
                flat_end.append(e)
            span_offsets[i + 1] = len(flat_start)
            logs.append(res["log"])
            if self.emit_lineage:
                span_crc[i] = zlib.crc32(
                    np.asarray(spans, dtype=np.int64).tobytes()
                    + res["extracted_text"].encode("utf-8", "surrogatepass")
                )
                for rname, cnt in parser.rule_hits.items():
                    idx = rule_index.get(rname)
                    if idx is not None:
                        hit_vecs[i, idx] = cnt
        if not self.carry_source:
            # production shape: the source text already lives in the
            # input table and spans index into it — re-emitting it
            # roughly doubles write/emission bytes per turn (measured
            # 371→202 MB at 2M turns; BENCH/BASELINE.md r4)
            batch = batch.select(
                [c for c in batch.column_names if c != "text"]
            )
        struct = pa.StructArray.from_arrays(
            [pa.array(flat_start, type=pa.int64()), pa.array(flat_end, type=pa.int64())],
            ["start", "end"],
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(span_offsets, type=pa.int32()), struct)
        out = batch.append_column("extracted_text", pa.array(out_texts, type=pa.string()))
        out = out.append_column("spans", spans_arr)
        if self.emit_log:
            out = out.append_column("log", pa.array(logs, type=LOG_TYPE))
        if self.emit_lineage:
            out = out.append_column("span_crc", pa.array(span_crc))
            out = out.append_column(
                "rule_hits", pa.FixedSizeListArray.from_arrays(
                    pa.array(hit_vecs.reshape(-1), type=pa.int32()), len(self.RULE_NAMES)
                )
            )
        return out


def default_concurrency() -> int:
    import ray

    if ray.is_initialized():
        return max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    return 4


#: per-worker-process extractor cache: the stateless-task equivalent
#: of actor ``__init__`` state — Ray reuses worker processes across
#: tasks, so the compiled dialect registries are built once per worker
#: and amortized exactly like actor state, WITHOUT the actor-pool
#: dispatch overhead (measured 1.7-3x slower than the task pool for
#: this workload on Ray 2.49 local mode; see BASELINE.md).
_WORKER_EXTRACTORS: dict[tuple, "ExtractBatch"] = {}


def _extract_batches(
    batch, dialect, emit_log, emit_lineage, max_batch_chars, carry_source=True
):
    key = (dialect, emit_log, emit_lineage, max_batch_chars, carry_source)
    ex = _WORKER_EXTRACTORS.get(key)
    if ex is None:
        ex = _WORKER_EXTRACTORS[key] = ExtractBatch(
            dialect=dialect,
            emit_log=emit_log,
            emit_lineage=emit_lineage,
            max_batch_chars=max_batch_chars,
            carry_source=carry_source,
        )
    yield from ex(batch)


def extract_ds(
    ds,
    dialect: str = "html-text",
    batch_size: int | None = None,
    concurrency=None,
    emit_log: bool = True,
    emit_lineage: bool = True,
    max_batch_chars: int = 8_000_000,
    use_actors: bool = False,
    carry_source: bool = True,
):
    """Attach the fused extraction stage to a transcripts Dataset.

    ``carry_source=False`` drops the source ``text`` column from the
    output (the input table already holds it; spans index into it) —
    the production-sink shape, cutting emission/write bytes per turn
    nearly in half on this corpus.

    Default path: stateless tasks with a per-worker extractor cache
    (state amortized per worker process, elastic scheduling).
    ``use_actors=True`` switches to the explicit actor pool
    (``concurrency`` = pool size) — semantically identical; useful
    when the stage must pin resources. ``batch_size=None`` processes
    whole blocks; the char-budget inside :class:`ExtractBatch` still
    splits pathological long-turn batches.
    """
    import functools

    if use_actors:
        if concurrency is None:
            concurrency = default_concurrency()
        return ds.map_batches(
            ExtractBatch,
            fn_constructor_kwargs=dict(
                dialect=dialect,
                emit_log=emit_log,
                emit_lineage=emit_lineage,
                max_batch_chars=max_batch_chars,
                carry_source=carry_source,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    fn = functools.partial(
        _extract_batches,
        dialect=dialect,
        emit_log=emit_log,
        emit_lineage=emit_lineage,
        max_batch_chars=max_batch_chars,
        carry_source=carry_source,
    )
    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def read_transcripts(path, columns=None, **kwargs):
    """Schema-pruned read of a transcripts table (prune at the read:
    extraction needs only conv_id/turn_idx/text)."""
    import ray.data

    return ray.data.read_parquet(
        path, columns=columns or EXTRACT_INPUT_COLUMNS, **kwargs
    )


def stable_order(ds):
    """The explicit ordering shuffle of the north rule: global sort by
    ``(conv_id, turn_idx)``. Apply only at comparison/export time —
    this is the expensive all-to-all path (SURVEY.md §7.4.5)."""
    return ds.sort(["conv_id", "turn_idx"])


def order_within_conversations(ds):
    """Per-conversation turn ordering via ``groupby(conv_id)`` +
    in-group sort. MEASURED CAVEAT (BENCH/BASELINE.md): with many
    small conversations the per-group call overhead makes this SLOWER
    than the global ``stable_order`` sort (19.4s vs 17.2s at 4M
    turns); prefer it only when conversations are large enough that
    per-group work amortizes (or when downstream genuinely needs
    group-at-a-time processing)."""
    import pyarrow as pa

    def sort_group(t: pa.Table) -> pa.Table:
        return t.sort_by("turn_idx")

    return ds.groupby("conv_id").map_groups(sort_group, batch_format="pyarrow")


def conversation_stats(ds, salt_buckets: int = 8):
    """Per-conversation roll-up (n_turns, total_chars) with **salted
    keys**: pass 1 groups by ``(conv_id, salt)`` so a pathological
    conversation with millions of turns spreads over ``salt_buckets``
    reducers; pass 2 merges the tiny salted partials per conv_id
    (SURVEY.md §4.3 hot-key design — ordering-free because the
    aggregate is associative)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        salt = pc.cast(
            pc.bit_wise_and(batch["turn_idx"], salt_buckets - 1), pa.int32()
        )
        t = pa.table(
            {
                "conv_id": batch["conv_id"],
                "salt": salt,
                # fill_null so ("n_chars", "count") counts EVERY turn —
                # a null text row otherwise vanishes from n_turns while
                # the oracle's count(*) keeps it (r5 review)
                "n_chars": pc.cast(
                    pc.utf8_length(pc.fill_null(batch["text"], "")),
                    pa.int64(),
                ),
            }
        )
        return t.group_by(["conv_id", "salt"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")]
        )

    from ray.data.aggregate import Sum

    salted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["conv_id", "salt"])
        .aggregate(
            Sum("n_chars_sum", alias_name="chars"),
            Sum("n_chars_count", alias_name="turns"),
        )
    )
    return (
        salted.groupby("conv_id")
        .aggregate(
            Sum("chars", alias_name="total_chars"),
            Sum("turns", alias_name="n_turns"),
        )
        .sort("conv_id")
    )


# ---------------------------------------------------------------------------
# Resumable chunked run with lineage manifest (north rule: "resumable
# from checkpoint with per-partition lineage + metrics")


def write_partitioned(ds, out_dir: str, partition_cols: list[str]):
    """Hive-partitioned parquet sink (``out_dir/col=value/...``):
    downstream readers prune whole partitions at the path level —
    the other half of 'prune at the read'."""
    ds.write_parquet(out_dir, partition_cols=partition_cols)
    return out_dir


def ensure_fsspec_http_probe() -> None:
    """Make Ray's per-write `fsspec.implementations.http` probe
    race-free under threads. When aiohttp is absent that import FAILS,
    Python evicts the partial module, and every thread re-attempts it
    — two concurrent attempts race into a non-ModuleNotFoundError
    ImportError that Ray's probe doesn't catch. Register a stub module
    with an HTTPFileSystem sentinel class once: the probe then
    succeeds and its isinstance check is correctly False for real
    filesystems. Shared by run_extraction(max_in_flight>1) and the
    overlapped tools/check_correctness.py gate."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys as _sys
        import types as _types

        _stub = _types.ModuleType("fsspec.implementations.http")
        _stub.__doc__ = (
            "lexor_ray SENTINEL module (pipeline.ensure_fsspec_http_probe): "
            "aiohttp is absent so the real fsspec http module cannot "
            "import; this stub exists ONLY so Ray's per-write "
            "isinstance probe succeeds race-free. Any attempt to "
            "actually USE the filesystem raises ImportError."
        )

        class _HTTPFileSystemSentinel:
            """Probe-only stand-in — ``isinstance(fs, HTTPFileSystem)``
            is correctly False for every real filesystem, and real
            use fails LOUDLY instead of silently (ADVICE r2 fix)."""

            def __init__(self, *a, **kw):
                raise ImportError(
                    "fsspec.implementations.http is a lexor_ray probe "
                    "sentinel: aiohttp is not installed, so the real "
                    "HTTPFileSystem is unavailable in this environment"
                )

        _stub.HTTPFileSystem = _HTTPFileSystemSentinel
        _sys.modules["fsspec.implementations.http"] = _stub


def _chunks(seq, size):
    for i in range(0, len(seq), size):
        yield seq[i : i + size]


def run_extraction(
    input_path: str,
    out_dir: str,
    dialect: str = "html-text",
    files_per_chunk: int = 64,
    batch_size: int = 1024,
    concurrency=None,
    max_in_flight: int = 2,
    carry_source: bool = False,
) -> dict:
    """Process a directory (or file) of transcripts parquet in
    deterministic chunks of input files. Completed chunks are recorded
    in ``out_dir/manifest/part-*.json`` and skipped on rerun; data
    lands under ``out_dir/data/part-*/`` via atomic rename. Returns a
    summary dict.

    At cluster scale each chunk is sized (``files_per_chunk``) to keep
    every node busy while bounding the work lost to a mid-chunk
    failure; within a chunk execution is fully streaming. Up to
    ``max_in_flight`` chunk pipelines run concurrently (each Dataset
    has its own streaming executor) so one chunk's startup/lineage
    tail overlaps the next chunk's compute — measured to recover most
    of the per-chunk startup cost of the strictly sequential loop
    (BENCH/BASELINE.md soak); chunk identity, manifests and atomic
    renames are unchanged, so resume semantics are identical.
    """
    import ray.data

    if os.path.isdir(input_path):
        files = sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    else:
        files = [input_path]
    # refuse to run — and in particular to SWEEP a previous successful
    # run's parts — on an empty or nonexistent input set: a mistyped
    # path or a transiently unmounted dir must not become data loss
    # (r5 review)
    if not files:
        raise ValueError(
            f"no .parquet inputs under {input_path!r}; refusing to run "
            "(the orphan sweep would delete the previous run's output)"
        )
    missing = [f for f in files if "://" not in f and not os.path.exists(f)]
    if missing:
        raise ValueError(f"input paths do not exist: {missing[:3]}")
    manifest_dir = os.path.join(out_dir, "manifest")
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    summary = {"chunks_total": 0, "chunks_skipped": 0, "rows": 0, "rows_skipped": 0}
    jobs: list[tuple[int, list]] = []
    for ci, chunk in enumerate(_chunks(files, files_per_chunk)):
        part = f"part-{ci:05d}"
        mpath = os.path.join(manifest_dir, part + ".json")
        summary["chunks_total"] += 1
        if os.path.exists(mpath):
            try:
                with open(mpath) as fh:
                    rec = json.load(fh)
            except (OSError, ValueError):
                rec = {}  # corrupt/partial manifest → reprocess (r5)
            if rec.get("inputs") == chunk:  # same fragment identity
                summary["chunks_skipped"] += 1
                summary["rows"] += rec.get("rows", 0)
                # rows NOT processed this run — lets resuming tools
                # report honest throughput without re-deriving it from
                # a manifest scan that miscounts stale/orphaned parts
                # (r4 review)
                summary["rows_skipped"] += rec.get("rows", 0)
                continue
        jobs.append((ci, chunk))

    # sweep orphaned parts left by a previous run with a different
    # chunking or input set: chunk identity is index-based, so a rerun
    # with fewer chunks would otherwise leave the old higher-numbered
    # parts (data AND manifests) in place and every downstream reader
    # of data/ would see those rows twice (r4 review). Only parts this
    # run will not (re)write are removed — and only when the run-level
    # identity (input list + chunking) CHANGED: two concurrent
    # invocations sharing an out_dir on the same inputs (a resumed
    # submit while a soak runs, ADVICE r4) then never delete each
    # other's in-progress tmp dirs or manifests. A missing/unreadable
    # run.json sweeps conservatively (pre-identity layouts may hold
    # orphans). Concurrent runs with DIFFERENT identities on one
    # out_dir remain misuse — they contend for the same part names.
    import shutil as _shutil

    run_ident = {"inputs": files, "files_per_chunk": files_per_chunk}
    run_path = os.path.join(out_dir, "run.json")
    lock_path = os.path.join(out_dir, ".run.lock")
    prev_ident = None
    if os.path.exists(run_path):
        try:
            with open(run_path) as fh:
                prev_ident = json.load(fh)
        except (OSError, ValueError):
            prev_ident = None

    def _pid_alive(pid: int) -> bool:
        if pid <= 0:
            return False
        try:
            os.kill(pid, 0)  # liveness probe only, no signal sent
        except ProcessLookupError:
            return False  # pid is gone
        except OSError:
            # EPERM: the pid EXISTS but belongs to another uid (e.g. a
            # root-launched soak probed by a user rerun) — that is a
            # LIVE holder, not a stale lock (r5 review)
            return True
        return True

    def _live_foreign_lock() -> bool:
        """True iff another LIVE process holds this out_dir's lock —
        its in-progress parts must not be swept even when the
        chunking identity differs. Pid-based liveness can
        false-positive on a RECYCLED pid (or another uid's unrelated
        process via EPERM) — the failure mode is then a permanently
        deferred sweep, healed by manually deleting ``.run.lock``;
        erring live is the safe direction (a false 'dead' would sweep
        a running job's parts)."""
        try:
            with open(lock_path) as fh:
                raw = fh.read().strip()
        except OSError:
            return False
        if not raw:
            # the holder may sit between the O_EXCL create and the pid
            # write — a FRESH empty lock counts as live; an old one is
            # debris from a crash inside that window (r5 review)
            import time

            try:
                return (time.time() - os.path.getmtime(lock_path)) < 60.0
            except OSError:
                return False
        try:
            pid = int(raw)
        except ValueError:
            return False
        if pid == os.getpid():
            return False
        return _pid_alive(pid)

    if prev_ident != run_ident:
        if _live_foreign_lock():
            # sweep deferred — but run.json no longer describes what
            # the directory will hold once this run lands parts under
            # a NEW identity, so drop it: the next uncontended run then
            # sweeps conservatively instead of skipping forever on a
            # stale identity match (r5 review)
            try:
                os.remove(run_path)
            except OSError:
                pass
        else:
            expected = {
                f"part-{ci:05d}" for ci in range(summary["chunks_total"])
            }
            for name in os.listdir(manifest_dir):
                if (
                    name.endswith(".json")
                    and name[: -len(".json")] not in expected
                ):
                    os.remove(os.path.join(manifest_dir, name))
            for name in os.listdir(data_dir):
                base = (
                    name[1 : -len(".tmp")]
                    if name.startswith(".") and name.endswith(".tmp")
                    else name
                )
                # pid-suffixed tmp names (".part-00001.123.tmp") parse
                # to a base outside `expected` and are swept here too
                if base not in expected:
                    _shutil.rmtree(
                        os.path.join(data_dir, name), ignore_errors=True
                    )
            rtmp = run_path + ".tmp"
            with open(rtmp, "w") as fh:
                json.dump(run_ident, fh)
            os.replace(rtmp, run_path)

    def process(ci: int, chunk: list) -> int:
        part = f"part-{ci:05d}"
        mpath = os.path.join(manifest_dir, part + ".json")
        pdir = os.path.join(data_dir, part)
        # pid-suffixed tmp dir: two LIVE runs sharing an out_dir (a
        # resumed submit beside a soak, ADVICE r4) must never write
        # into the same in-progress dir (r5 review). Leftover tmp dirs
        # for this part from DEAD runs (incl. the old un-suffixed
        # ".part-X.tmp" layout, which parses to owner 0) are reaped;
        # a live run's tmp is left alone.
        tmp = os.path.join(data_dir, f".{part}.{os.getpid()}.tmp")
        import shutil

        prefix, suffix = "." + part + ".", ".tmp"
        for name in os.listdir(data_dir):
            if not (name.startswith(prefix) and name.endswith(suffix)):
                continue
            try:
                owner = int(name[len(prefix) : -len(suffix)])
            except ValueError:
                owner = 0
            if owner == os.getpid() or not _pid_alive(owner):
                shutil.rmtree(
                    os.path.join(data_dir, name), ignore_errors=True
                )
        # same reap for crash-orphaned manifest tmp files (r5 review)
        mprefix = part + ".json."
        for name in os.listdir(manifest_dir):
            if not (name.startswith(mprefix) and name.endswith(suffix)):
                continue
            try:
                owner = int(name[len(mprefix) : -len(suffix)])
            except ValueError:
                owner = 0
            if owner == os.getpid() or not _pid_alive(owner):
                try:
                    os.remove(os.path.join(manifest_dir, name))
                except OSError:
                    pass
        ds = read_transcripts(chunk)
        ds = extract_ds(
            ds,
            dialect=dialect,
            batch_size=batch_size,
            concurrency=concurrency,
            carry_source=carry_source,
        )
        # NOTE (measured, BENCH/BASELINE.md soak): a materialize-once
        # tier that fed both the write and the lineage partials from
        # pinned blocks was TRIED here and lost ~20% end-to-end — the
        # per-chunk materialization barrier and the extra object-store
        # traffic cost more than the column-pruned read-back saves, so
        # the streaming write + distributed read-back stays.
        ds.write_parquet(tmp)
        # lineage is computed from OUR OWN pid-unique tmp dir BEFORE
        # the rename (r5 review, probed live): a concurrent
        # same-identity run may rmtree+replace the landed part dir at
        # any time, so no run may ever read a path another run can
        # delete. The record is identical — same files, pre-rename.
        rec = _chunk_lineage(tmp, chunk)
        if os.path.exists(mpath):
            # another live same-identity run completed this chunk while
            # we computed it — keep ITS landed output and discard ours
            try:
                with open(mpath) as fh:
                    done = json.load(fh)
            except (OSError, ValueError):
                done = {}
            if done.get("inputs") == chunk:
                shutil.rmtree(tmp, ignore_errors=True)
                return done["rows"]
        if os.path.exists(pdir):
            shutil.rmtree(pdir)
        os.rename(tmp, pdir)
        # pid-suffixed manifest tmp: concurrent runs must never
        # interleave writes into one tmp file and rename corrupt JSON
        # into place (r5 review)
        mtmp = mpath + f".{os.getpid()}.tmp"
        with open(mtmp, "w") as fh:
            json.dump(rec, fh)
        os.rename(mtmp, mpath)
        return rec["rows"]

    def _acquire_lock() -> None:
        """Atomic O_CREAT|O_EXCL acquisition: the old check-then-write
        let two racing runs both 'acquire', after which the loser's
        clean exit unlinked the winner's lock and left it unprotected
        against a third run's sweep (r5 review). A dead holder's lock
        is reaped once and the create retried; losing the race is fine
        — the loser simply runs lockless, exactly like the old
        same-identity-concurrent path."""
        for _ in range(2):
            try:
                fd = os.open(
                    lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
            except FileExistsError:
                if _live_foreign_lock():
                    return
                try:
                    os.remove(lock_path)  # dead holder — reap, retry
                except OSError:
                    return
                continue
            except OSError:
                return
            with os.fdopen(fd, "w") as fh:
                fh.write(str(os.getpid()))
            return

    _acquire_lock()
    try:
        if max_in_flight <= 1 or len(jobs) <= 1:
            for ci, chunk in jobs:
                summary["rows"] += process(ci, chunk)
        else:
            from concurrent.futures import ThreadPoolExecutor

            ensure_fsspec_http_probe()

            with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
                for rows in pool.map(lambda j: process(*j), jobs):
                    summary["rows"] += rows
    finally:
        try:  # release only a lock this process owns
            with open(lock_path) as fh:
                if int(fh.read().strip() or 0) == os.getpid():
                    os.remove(lock_path)
        except (OSError, ValueError):
            pass
    return summary


def _chunk_lineage(part_dir: str, inputs: list[str]) -> dict:
    """Per-partition lineage record: input fragment identity,
    parser-rule hit counts, span checksum (xor of per-row crc32).

    Computed DISTRIBUTED (round-2 verdict item 2): a column-pruned
    ``read_parquet`` over the chunk's output plus one partial row
    (count, crc-xor, rule-hit sums) per batch in ``map_batches`` — the
    driver collects only those scalar partials and folds them, never a
    chunk-sized column (at production chunk sizes the old driver-side
    ``to_table`` held 10⁷–10⁸ rows of crc/hits in one table). The xor
    and sums are order-independent, so the manifest is byte-identical
    to the old path (asserted by the resume tests)."""
    import ray.data

    # a handful of coalesced read tasks: the per-chunk output is many
    # small files, and per-file read tasks made this pass task-launch
    # bound (measured ~2s/chunk → ~0.7s with coalescing)
    ds = ray.data.read_parquet(
        part_dir, columns=["span_crc", "rule_hits"], override_num_blocks=16
    )
    return _lineage_record(ds, inputs)


def _lineage_record(ds, inputs: list[str]) -> dict:
    """Fold per-batch lineage partials of a Dataset holding
    ``span_crc``/``rule_hits`` columns into one manifest record; the
    driver sees one tiny row per batch, never the columns."""
    n_rules = len(ExtractBatch.RULE_NAMES)

    def partial(batch: pa.Table) -> pa.Table:
        crc = batch.column("span_crc").to_numpy(zero_copy_only=False)
        xor = int(np.bitwise_xor.reduce(crc.astype(np.int64))) if len(crc) else 0
        rh = batch.column("rule_hits")
        if len(rh):
            hits = (
                np.asarray(
                    rh.combine_chunks().flatten().to_numpy(zero_copy_only=False)
                )
                .reshape(len(rh), -1)
                .sum(axis=0)
                .astype(np.int64)
            )
        else:
            hits = np.zeros(n_rules, dtype=np.int64)
        return pa.table(
            {
                "rows": pa.array([len(crc)], type=pa.int64()),
                "xor": pa.array([xor], type=pa.int64()),
                "hits": pa.array([hits.tolist()]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts):
        rows = int(parts["rows"].sum())
        xor = int(np.bitwise_xor.reduce(parts["xor"].to_numpy().astype(np.int64)))
        hits = np.asarray(parts["hits"].tolist(), dtype=np.int64).sum(axis=0)
    else:
        rows, xor, hits = 0, 0, np.zeros(n_rules, dtype=np.int64)
    return {
        "inputs": inputs,
        "rows": rows,
        "span_checksum_xor": xor,
        "rule_hits": {
            n: int(c) for n, c in zip(ExtractBatch.RULE_NAMES, hits.tolist())
        },
    }
