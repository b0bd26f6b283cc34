"""Distributed == single-process oracle, and resume semantics.

The north-rule gate: the Ray pipeline's extracted text + spans must be
byte-identical per (conv_id, turn_idx) to the pure-function oracle
under stable turn ordering; chunked runs must resume exactly."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from lexor_ray.extract import Extractor
from lexor_ray.pipeline import (
    extract_ds,
    read_transcripts,
    run_extraction,
    stable_order,
    transcript_schema,
)
from lexor_ray.transcripts import generate_transcripts, transcripts_dir


@pytest.fixture(scope="module")
def small_dir(ray_session):
    return transcripts_dir(0.001)


def test_generator_deterministic():
    a = generate_transcripts(200, seed=42)
    b = generate_transcripts(200, seed=42)
    assert a.equals(b)
    assert a.schema.equals(transcript_schema())


def test_ray_matches_oracle(ray_session, small_dir):
    ds = read_transcripts(small_dir)
    out = stable_order(extract_ds(ds, batch_size=128, concurrency=2))
    rows = out.take_all()
    ex = Extractor()
    src = pq.read_table(
        os.path.join(small_dir), columns=["conv_id", "turn_idx", "text"]
    ).to_pylist()
    oracle = {
        (r["conv_id"], r["turn_idx"]): ex.extract_one(r["text"]) for r in src
    }
    assert len(rows) == len(oracle)
    prev_key = None
    for row in rows:
        key = (row["conv_id"], row["turn_idx"])
        if prev_key is not None:
            assert key > prev_key  # stable turn ordering
        prev_key = key
        want = oracle[key]
        assert row["extracted_text"] == want["extracted_text"], key
        got_spans = [(s["start"], s["end"]) for s in row["spans"]]
        assert got_spans == [tuple(s) for s in want["spans"]], key
        assert [r["code"] for r in row["log"]] == [
            r["code"] for r in want["log"]
        ], key


def test_order_within_conversations(ray_session, small_dir):
    """Per-conversation ordering without a global sort: within each
    conv the turns come back sorted by turn_idx."""
    import ray.data

    from lexor_ray.pipeline import order_within_conversations

    ds = ray.data.read_parquet(small_dir, columns=["conv_id", "turn_idx"])
    rows = order_within_conversations(ds).take_all()
    seen = {}
    for r in rows:
        prev = seen.get(r["conv_id"], -1)
        assert r["turn_idx"] > prev, (r["conv_id"], prev, r["turn_idx"])
        seen[r["conv_id"]] = r["turn_idx"]
    assert len(rows) == sum(v + 1 for v in seen.values())


def test_run_extraction_resumable(ray_session, small_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    s1 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    assert s1["chunks_total"] >= 2 and s1["chunks_skipped"] == 0
    # simulate a crashed run missing the last chunk
    parts = sorted(os.listdir(os.path.join(out_dir, "manifest")))
    victim = parts[-1]
    os.remove(os.path.join(out_dir, "manifest", victim))
    shutil.rmtree(os.path.join(out_dir, "data", victim[: -len(".json")]))
    s2 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    assert s2["chunks_skipped"] == s2["chunks_total"] - 1
    assert s2["rows"] == s1["rows"]
    # manifest carries lineage: rule hits and span checksum
    import json

    with open(os.path.join(out_dir, "manifest", parts[0])) as fh:
        rec = json.load(fh)
    assert rec["rows"] > 0
    assert sum(rec["rule_hits"].values()) > 0
    assert "span_checksum_xor" in rec


def test_resume_rejects_stale_fragment_identity(ray_session, small_dir, tmp_path):
    """A manifest whose recorded input-fragment list no longer matches
    the chunk (input set changed between runs) must NOT be skipped —
    fragment identity is part of the resume contract (north rule:
    lineage carries 'input fragment identity')."""
    import json

    out_dir = str(tmp_path / "out_frag")
    s1 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    parts = sorted(os.listdir(os.path.join(out_dir, "manifest")))
    victim = os.path.join(out_dir, "manifest", parts[0])
    with open(victim) as fh:
        rec = json.load(fh)
    rec["inputs"] = ["/somewhere/else.parquet"]
    with open(victim, "w") as fh:
        json.dump(rec, fh)
    s2 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    # the tampered chunk is reprocessed, the rest skipped
    assert s2["chunks_skipped"] == s2["chunks_total"] - 1
    assert s2["rows"] == s1["rows"]
    with open(victim) as fh:
        assert json.load(fh)["inputs"] != ["/somewhere/else.parquet"]


def test_resume_after_crash_with_stale_tmp(ray_session, small_dir, tmp_path):
    """A run killed mid-chunk leaves a .tmp dir and no manifest entry;
    the rerun must clean it up and produce the complete output."""
    out_dir = str(tmp_path / "out3")
    s1 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    # simulate crash: victim chunk loses manifest+data, leaves garbage tmp
    parts = sorted(os.listdir(os.path.join(out_dir, "manifest")))
    victim = parts[-1][: -len(".json")]
    os.remove(os.path.join(out_dir, "manifest", parts[-1]))
    shutil.rmtree(os.path.join(out_dir, "data", victim))
    stale = os.path.join(out_dir, "data", "." + victim + ".tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")
    s2 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    assert s2["rows"] == s1["rows"]
    assert not os.path.exists(stale)
    import pyarrow.dataset as pads

    n = pads.dataset(os.path.join(out_dir, "data"), format="parquet").count_rows()
    assert n == s1["rows"]


def test_actor_pool_path_matches_task_path(ray_session, small_dir):
    """extract_ds(use_actors=True) must produce identical rows to the
    default stateless-task path (the explicit actor-pool alternative
    stays live and correct)."""
    ds1 = read_transcripts(small_dir)
    task_rows = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in extract_ds(ds1, emit_log=False, emit_lineage=False).take_all()
    }
    ds2 = read_transcripts(small_dir)
    actor_rows = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in extract_ds(
            ds2, emit_log=False, emit_lineage=False, use_actors=True, concurrency=2
        ).take_all()
    }
    assert task_rows == actor_rows


def test_char_budget_splits_huge_batches(ray_session):
    """A batch whose text exceeds max_batch_chars is recursively split
    (skew guard for multi-MB turns) with identical total output."""
    import pyarrow as pa

    from lexor_ray.pipeline import ExtractBatch

    texts = ["<p>" + ("x" * 50_000) + "</p>" for _ in range(8)]
    batch = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(8)],
            "turn_idx": pa.array(range(8), type=pa.int32()),
            "text": texts,
        }
    )
    small_budget = ExtractBatch(max_batch_chars=60_000)
    outs = list(small_budget(batch))
    assert len(outs) > 1  # forced splitting
    assert sum(t.num_rows for t in outs) == 8
    big_budget = ExtractBatch(max_batch_chars=10_000_000)
    whole = list(big_budget(batch))
    assert len(whole) == 1
    merged = pa.concat_tables(outs).sort_by("conv_id")
    assert merged.column("extracted_text").to_pylist() == whole[0].sort_by(
        "conv_id"
    ).column("extracted_text").to_pylist()


def test_write_partitioned_layout(ray_session, tmp_path):
    """Hive layout: one directory per partition value, readable with
    path-level pruning."""
    import ray.data

    from lexor_ray.pipeline import write_partitioned

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "bylang")
    write_partitioned(ds, out, ["lang"])
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert langs == {"en", "de", "fr", "es", "zh"}
    import pyarrow.dataset as pads

    part = pads.dataset(os.path.join(out, "lang=en"), format="parquet")
    assert part.count_rows() > 0


def test_rerun_is_idempotent(ray_session, small_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    s1 = run_extraction(small_dir, out_dir, files_per_chunk=2, concurrency=2)
    s2 = run_extraction(small_dir, out_dir, files_per_chunk=2, concurrency=2)
    assert s2["chunks_skipped"] == s2["chunks_total"]
    assert s1["rows"] == s2["rows"]


def test_golden_log_codes_match_engine():
    """The generation-time diagnostic-code counts must equal what the
    engine actually logs per turn (the compositional-contribution
    claim behind the extraction_log_summary oracle)."""
    from collections import Counter

    from lexor_ray.extract import extract_one
    from lexor_ray.transcripts import generate_transcripts

    tbl, golden = generate_transcripts(1500, seed=11, with_golden=True)
    gm = {
        (c, i): (e, w, s)
        for c, i, e, w, s in zip(
            golden["conv_id"].to_pylist(),
            golden["turn_idx"].to_pylist(),
            golden["n_e100"].to_pylist(),
            golden["n_w100"].to_pylist(),
            golden["n_w101"].to_pylist(),
        )
    }
    sm = {
        (c, i): n
        for c, i, n in zip(
            golden["conv_id"].to_pylist(),
            golden["turn_idx"].to_pylist(),
            golden["n_spans"].to_pylist(),
        )
    }
    for c, i, t in zip(
        tbl["conv_id"].to_pylist(),
        tbl["turn_idx"].to_pylist(),
        tbl["text"].to_pylist(),
    ):
        res = extract_one(t)
        got = Counter(l["code"] for l in res["log"])
        assert (
            got.get("E100", 0),
            got.get("W100", 0),
            got.get("W101", 0),
        ) == gm[(c, i)], (c, i, t[:80])
        assert set(got) <= {"E100", "W100", "W101"}
        assert len(res["spans"]) == sm[(c, i)], (c, i, t[:80])


def test_golden_markdown_matches_engine():
    """The generation-time composed markdown (transcripts._compose_md)
    must equal the real parse→convert→write markdown per turn — the
    claim behind the extract_markdown oracle. 8k turns cover every
    part shape incl. E100 nesting, W100 sweeps, lists, images,
    entities and boilerplate divs."""
    from lexor_ray.dialects.markdown import to_markdown
    from lexor_ray.transcripts import generate_transcripts

    tbl, golden = generate_transcripts(8000, seed=123, with_golden=True)
    want = {
        (c, i): md
        for c, i, md in zip(
            golden["conv_id"].to_pylist(),
            golden["turn_idx"].to_pylist(),
            golden["clean_md"].to_pylist(),
        )
    }
    for c, i, t in zip(
        tbl["conv_id"].to_pylist(),
        tbl["turn_idx"].to_pylist(),
        tbl["text"].to_pylist(),
    ):
        assert to_markdown(t) == want[(c, i)], (c, i, t[:120])


def test_markdown_compose_structure_fuzz():
    """Randomized STRUCTURE fuzz of the markdown composition rules:
    part kinds in adversarial orders the corpus generator never emits
    (lists first, images first, consecutive unclosed parts, unclosed
    blockquotes followed by pre/list, boilerplate between paragraphs).
    _compose_md's spec semantics must match the real writer on every
    ordering."""
    import numpy as np

    from lexor_ray.dialects.markdown import to_markdown
    from lexor_ray.transcripts import _compose_md

    rng = np.random.default_rng(20260817)
    words = "alpha beta gamma delta epsilon zeta".split()

    def sent(lo=1, hi=6):
        n = int(rng.integers(lo, hi))
        return " ".join(words[int(rng.integers(0, len(words)))] for _ in range(n))

    def one_part():
        kind = ["para", "quote", "list", "img", "pre", "drop", "boiler",
                "unclosed", "w100", "w101"][int(rng.integers(0, 10))]
        tag = ["p", "div", "section"][int(rng.integers(0, 3))]
        inner = sent()
        inner_md = inner
        deco = rng.random()
        if deco < 0.25:
            s1 = sent(1, 3)
            inner = f"{inner} <b>{s1}</b>"
            inner_md = f"{inner_md} **{s1}**"
        elif deco < 0.4:
            s1 = sent(1, 3)
            inner = f'{inner} <a href="http://x/9">{s1}</a>'
            inner_md = f"{inner_md} [{s1}](http://x/9)"
        elif deco < 0.5:
            inner = f"{inner} &amp; &lt;z&gt;"
            inner_md = f"{inner_md} & <z>"
        if kind == "para":
            return f"<{tag}>{inner}</{tag}>", ("para", inner_md, True)
        if kind == "quote":
            return f"<blockquote>{inner}</blockquote>", ("quote", inner_md, True)
        if kind == "list":
            items = [sent(1, 4) for _ in range(int(rng.integers(1, 4)))]
            return (
                "<ul>" + "".join(f"<li>{s}</li>" for s in items) + "</ul>",
                ("list", items),
            )
        if kind == "img":
            return '<img src="i.png" alt="A b">', ("img", "i.png", "A b")
        if kind == "pre":
            d = sent(2, 6)
            return f"<pre>{d}</pre>", ("pre", d)
        if kind == "drop":
            return [
                "<!DOCTYPE html>",
                f"<!-- {sent()} -->",
                f"<script>var q={int(rng.integers(0,99))};</script>",
                f"<?pi {sent(1,3)} ?>",
            ][int(rng.integers(0, 4))], ("drop",)
        if kind == "boiler":
            b = sent(2, 5)
            return f'<div class="ad wide">{b}</div>', ("para", b, True)
        if kind == "unclosed":
            if rng.random() < 0.4:
                return f"<blockquote>{inner}", ("quote", inner_md, False)
            return f"<{tag}>{inner}", ("para", inner_md, False)
        if kind == "w100":
            return f"<{tag}><span>{inner}</{tag}>", ("para", inner_md, True)
        return f"<{tag}>{inner}</{tag}></em>", ("para", inner_md, True)

    bad = 0
    for _ in range(400):
        n = int(rng.integers(1, 7))
        parts, specs = zip(*(one_part() for _ in range(n)))
        text = "\n".join(parts)
        want = _compose_md(list(specs))
        got = to_markdown(text)
        if got != want:
            bad += 1
            if bad <= 3:
                print("SRC:", repr(text))
                print("GOT:", repr(got))
                print("WANT:", repr(want))
    assert bad == 0


def test_run_extraction_concurrent_chunks(ray_session, small_dir, tmp_path):
    """Overlapped chunk pipelines (max_in_flight=4) produce the same
    output as sequential, and resume under concurrency still skips
    exactly the finished chunks."""
    import pyarrow.dataset as pads

    seq_dir = str(tmp_path / "seq")
    con_dir = str(tmp_path / "con")
    s1 = run_extraction(small_dir, seq_dir, files_per_chunk=1, max_in_flight=1)
    s2 = run_extraction(small_dir, con_dir, files_per_chunk=1, max_in_flight=4)
    assert s2["rows"] == s1["rows"] and s2["chunks_total"] == s1["chunks_total"]
    a = (
        pads.dataset(os.path.join(seq_dir, "data"), format="parquet")
        .to_table(columns=["conv_id", "turn_idx", "extracted_text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        pads.dataset(os.path.join(con_dir, "data"), format="parquet")
        .to_table(columns=["conv_id", "turn_idx", "extracted_text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # kill one chunk, rerun concurrently → exactly that chunk redone
    parts = sorted(os.listdir(os.path.join(con_dir, "manifest")))
    victim = parts[1]
    os.remove(os.path.join(con_dir, "manifest", victim))
    shutil.rmtree(os.path.join(con_dir, "data", victim[: -len(".json")]))
    s3 = run_extraction(small_dir, con_dir, files_per_chunk=1, max_in_flight=4)
    assert s3["chunks_skipped"] == s3["chunks_total"] - 1
    assert s3["rows"] == s1["rows"]


def test_submit_entrypoint_subprocess(small_dir, tmp_path):
    """The `ray job submit` entrypoint (tools/submit_extraction.py) in
    a fresh process: clean run, then a resume run after deleting one
    chunk's manifest + data — exactly that chunk is redone."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "job_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable,
        os.path.join(repo, "tools", "submit_extraction.py"),
        "--input", small_dir,
        "--output", out,
        "--files-per-chunk", "2",
    ]
    env = dict(os.environ, RAY_ADDRESS="local")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["chunks_skipped"] == 0 and s1["rows_this_run"] == s1["rows_total"] > 0

    parts = sorted(os.listdir(os.path.join(out, "manifest")))
    victim = parts[0]
    os.remove(os.path.join(out, "manifest", victim))
    shutil.rmtree(os.path.join(out, "data", victim[: -len(".json")]))
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["chunks_skipped"] == s2["chunks_total"] - 1
    assert 0 < s2["rows_this_run"] < s1["rows_total"]
    assert s2["rows_total"] == s1["rows_total"]


def test_rechunked_rerun_sweeps_orphaned_parts(ray_session, small_dir, tmp_path):
    """Rerunning into the same out_dir with a COARSER chunking must
    remove the previous run's higher-numbered parts (data AND
    manifests) — chunk identity is index-based, so without the sweep
    a reader of data/ would see every row twice (r4 review)."""
    import pyarrow.dataset as pds

    out_dir = str(tmp_path / "out_rechunk")
    s1 = run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    assert s1["chunks_total"] > 1
    s2 = run_extraction(small_dir, out_dir, files_per_chunk=64, concurrency=2)
    assert s2["chunks_total"] == 1
    assert sorted(os.listdir(os.path.join(out_dir, "manifest"))) == [
        "part-00000.json"
    ]
    assert sorted(os.listdir(os.path.join(out_dir, "data"))) == ["part-00000"]
    rows = pds.dataset(os.path.join(out_dir, "data")).count_rows()
    assert rows == s1["rows"] == s2["rows"]


def test_sweep_gated_on_run_identity_and_live_lock(
    ray_session, small_dir, tmp_path
):
    """The orphan sweep must fire only when the run identity (input
    list + chunking) CHANGED and no LIVE process holds the out_dir
    lock (ADVICE r4): a same-identity rerun leaves foreign parts
    alone; a live foreign lock defers the sweep even across an
    identity change; a stale (dead-pid) lock does not block it."""
    import shutil

    out_dir = str(tmp_path / "out_lockgate")
    run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    # plant an out-of-range orphan as another run's in-progress part
    mdir, ddir = os.path.join(out_dir, "manifest"), os.path.join(out_dir, "data")
    orphan_m = os.path.join(mdir, "part-99999.json")
    with open(orphan_m, "w") as fh:
        fh.write("{}")
    orphan_d = os.path.join(ddir, "part-99999")
    os.makedirs(orphan_d)
    # same identity → no sweep, orphan survives
    run_extraction(small_dir, out_dir, files_per_chunk=1, concurrency=2)
    assert os.path.exists(orphan_m) and os.path.exists(orphan_d)
    # identity change but a LIVE foreign lock → sweep deferred
    with open(os.path.join(out_dir, ".run.lock"), "w") as fh:
        fh.write(str(os.getppid()))  # a live pid that is not ours
    run_extraction(small_dir, out_dir, files_per_chunk=64, concurrency=2)
    assert os.path.exists(orphan_m) and os.path.exists(orphan_d)
    # stale lock (dead pid) + identity change → sweep proceeds (the
    # deferred sweep left run.json at the fpc=1 identity, so fpc=2
    # differs from it)
    shutil.rmtree(os.path.join(ddir, "part-00000"), ignore_errors=True)
    os.remove(os.path.join(mdir, "part-00000.json"))
    with open(os.path.join(out_dir, ".run.lock"), "w") as fh:
        fh.write("999999999")
    run_extraction(small_dir, out_dir, files_per_chunk=2, concurrency=2)
    assert not os.path.exists(orphan_m) and not os.path.exists(orphan_d)
    # the released lock is gone after a clean return
    assert not os.path.exists(os.path.join(out_dir, ".run.lock"))
