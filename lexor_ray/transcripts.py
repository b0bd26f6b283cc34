"""Deterministic synthetic transcripts table.

BASELINE.json ``input_hint`` fixes the input shape: a Parquet table of
multi-turn conversation / agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``. The driver's testdata has no such table,
so this module synthesises one deterministically (seeded numpy, no
Python ``hash``) at any scale — the small-scale stand-in for the
10^12-turn production table.

The ``text`` payloads are HTML-ish markup exercising every node parser
of the HTML dialect: tags + attributes, nesting, entities, comments,
scripts/styles (boilerplate), doctype/CDATA/PI, unclosed tags (E100),
implicit closes (W100), plain-text rows (fast path), and rare
multi-megabyte tool-output rows (length skew, SURVEY.md §4.3).

Generation is cached on disk per (n_turns, seed); a ``_DONE`` marker
makes concurrent generation race-safe.
"""

from __future__ import annotations

import os
import re
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_BASE = os.environ.get("LEXOR_RAY_DATA", "/tmp/lexor_ray_data")
SEED = 42

_WORDS = (
    "the quick brown fox jumps over lazy dog stream batch arrow ray data "
    "shuffle actor block parse node tree span text turn agent tool call "
    "result plan answer question context window token merge sort filter"
).split()

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "", "", "search", "python", "browser", "calculator"]


def _sentence(rng: np.random.Generator, lo: int = 4, hi: int = 14) -> str:
    n = int(rng.integers(lo, hi))
    idx = rng.integers(0, len(_WORDS), n)
    return " ".join(_WORDS[i] for i in idx)


def _compose_md(specs: list[tuple]) -> str:
    """Expected html→markdown output for a turn, composed at
    generation time from the part specs — an independent derivation of
    the markdown dialect's documented semantics (no parser/writer
    involved), mirroring the event stream of ``dialects/markdown.py``:

    - paragraphs/div/section: soft leading newline, inner markdown,
      ``\\n\\n`` on close (an E100-unclosed part's close fires at EOF,
      where the final strip removes it — so unclosed parts contribute
      no trailing newlines);
    - blockquote: ``'> '`` prefix once; lists: one ``'- item'`` line
      per item; pre: fenced block; img: inline ``![alt](src)``;
    - comments/doctype/script/style/PI are dropped but their adjacent
      newline separators still emit (they are top-level text nodes);
      class-boilerplate divs are NOT dropped by the markdown style
      (class-based dropping is an html-text hook) — they render as
      paragraphs;
    - soft newline == the writer's ``endl(force=False)``: emit only
      when the output doesn't already end in a newline.
    """
    md = ""

    def soft(m: str) -> str:
        return m if (m == "" or m.endswith("\n")) else m + "\n"

    for i, spec in enumerate(specs):
        kind = spec[0]
        if kind == "para":
            md = soft(md) + spec[1] + ("\n\n" if spec[2] else "")
        elif kind == "quote":
            md = soft(md) + "> " + spec[1] + ("\n\n" if spec[2] else "")
        elif kind == "list":
            md = soft(md)
            for s in spec[1]:
                md = soft(md) + "- " + s + "\n"
        elif kind == "img":
            md += f"![{spec[2]}]({spec[1]})"
        elif kind == "pre":
            md = soft(md) + "```\n" + spec[1] + "\n```" + "\n\n"
        # "drop": contributes nothing
        if i < len(specs) - 1:
            md += "\n"  # the inter-part separator text node
    return md.strip("\n")


def _make_text(rng: np.random.Generator):
    """One turn's text: a deterministic random HTML-ish document,
    PLUS the golden main-content text an extractor must recover,
    PLUS the golden html→markdown rendering (``_compose_md``),
    PLUS the expected diagnostic-code counts (n_e100, n_w100, n_w101).

    The golden string is composed alongside the markup from the same
    source sentences — an independent derivation of the expected
    output, written at generation time (before any parser runs), so
    the driver's DuckDB oracle can assert the north-rule per-turn
    text equality without circular reference to the extractor.
    Composition rules mirror the documented html-text semantics:
    markup stripped, entities decoded, comments/doctype/script/style/
    PI/img and class-based boilerplate contribute nothing, top-level
    parts joined by the literal newline text nodes between them.

    The code counts are compositional because each injected shape
    contributes exactly one diagnostic regardless of nesting
    (verified empirically against the engine): an unclosed part's tag
    stays open to EOF → one E100 (later parts merely nest inside it;
    there is no p-in-p auto-close); a W100-shape part's own close tag
    resolves innermost-first, sweeping exactly its one open span; the
    stray ``</em>`` never matches an open em (all generated em's are
    closed) → one W101."""
    kind = rng.random()
    if kind < 0.30:  # plain text — fast path
        s = _sentence(rng, 6, 40)
        return s, s, s, (0, 0, 0, 1)
    parts: list[str] = []
    clean: list[str] = []
    segs: list[int] = []  # emitted text-span segments per part
    text_tail: list[bool] = []  # part's SOURCE ends in emitted text
    mds: list[tuple] = []  # markdown part specs for _compose_md
    n_e100 = n_w100 = n_w101 = 0
    if rng.random() < 0.05:
        parts.append("<!DOCTYPE html>")
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        mds.append(("drop",))
    if rng.random() < 0.10:
        parts.append(f"<!-- {_sentence(rng, 2, 6)} -->")
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        mds.append(("drop",))
    if rng.random() < 0.12:
        parts.append(f"<script>var x = {int(rng.integers(0, 999))};</script>")
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        mds.append(("drop",))
    if rng.random() < 0.08:
        parts.append(f"<style>.c{int(rng.integers(0,99))} {{color: red}}</style>")
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        mds.append(("drop",))
    n_paras = int(rng.integers(1, 5))
    for _ in range(n_paras):
        inner = _sentence(rng)
        inner_clean = inner
        inner_md = inner
        inner_segs = 1
        ends_in_text = True  # deco none and bold leave a raw text tail
        deco = rng.random()
        if deco < 0.25:
            s1, s2 = _sentence(rng, 1, 4), _sentence(rng, 1, 6)
            inner = f"{inner} <b>{s1}</b> {s2}"
            inner_clean = f"{inner_clean} {s1} {s2}"
            inner_md = f"{inner_md} **{s1}** {s2}"
            inner_segs = 3
        elif deco < 0.40:
            href = int(rng.integers(0, 999))
            s1 = _sentence(rng, 1, 3)
            inner = f'{inner} <a href="http://example.com/{href}">{s1}</a>'
            inner_clean = f"{inner_clean} {s1}"
            inner_md = f"{inner_md} [{s1}](http://example.com/{href})"
            inner_segs = 2
            ends_in_text = False  # </a> tail
        elif deco < 0.50:
            s1 = _sentence(rng, 1, 4)
            inner = f"{inner} &amp; {s1} &lt;ok&gt;"
            inner_clean = f"{inner_clean} & {s1} <ok>"
            inner_md = inner_clean  # entities decode identically
            inner_segs = 6  # text, &amp;, text, &lt;, 'ok', &gt;
            ends_in_text = False  # entity tail (entities never coalesce)
        elif deco < 0.58:
            s1 = _sentence(rng, 1, 3)
            inner = f"{inner} <i>{s1} <em>deep</em></i>"
            inner_clean = f"{inner_clean} {s1} deep"
            inner_md = f"{inner_md} *{s1} *deep**"
            inner_segs = 3
            ends_in_text = False  # </i> tail
        tag = ["p", "div", "section", "blockquote"][int(rng.integers(0, 4))]
        shape = rng.random()
        closed = True
        if shape < 0.05:  # unclosed at EOF -> E100
            parts.append(f"<{tag}>{inner}")
            n_e100 += 1
            closed = False
        elif shape < 0.10:  # inner left open, outer closes -> W100
            parts.append(f"<{tag}><span>{inner}</{tag}>")
            n_w100 += 1
        elif shape < 0.13:  # stray close tag -> W101
            parts.append(f"<{tag}>{inner}</{tag}></em>")
            n_w101 += 1
        else:
            parts.append(f"<{tag}>{inner}</{tag}>")
        clean.append(inner_clean)
        segs.append(inner_segs)
        mds.append(
            ("quote" if tag == "blockquote" else "para", inner_md, closed)
        )
        # only the UNCLOSED shape exposes the inner tail to the
        # following separator (every other shape ends with a tag)
        text_tail.append(shape < 0.05 and ends_in_text)
    if rng.random() < 0.15:
        sents = [_sentence(rng, 1, 5) for _ in range(int(rng.integers(2, 5)))]
        parts.append("<ul>" + "".join(f"<li>{s}</li>" for s in sents) + "</ul>")
        clean.append("".join(sents))
        segs.append(len(sents))
        text_tail.append(False)
        mds.append(("list", sents))
    if rng.random() < 0.10:
        src = f"x{int(rng.integers(0,99))}.png"
        alt = _sentence(rng, 1, 3)
        parts.append(f'<img src="{src}" alt="{alt}">')
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        mds.append(("img", src, alt))
    if rng.random() < 0.04:
        parts.append(f"<?pi {_sentence(rng, 1, 3)} ?>")
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        mds.append(("drop",))
    if rng.random() < 0.06:  # class-based boilerplate (F2)
        cls = ["ad", "banner", "sidebar", "cookie-notice"][int(rng.integers(0, 4))]
        boiler = _sentence(rng, 3, 8)
        parts.append(f'<div class="{cls} wide">{boiler}</div>')
        clean.append("")
        segs.append(0)
        text_tail.append(False)
        # class-based dropping is an html-text hook; the markdown
        # style renders these divs as ordinary paragraphs
        mds.append(("para", boiler, True))
    if rng.random() < 0.12:  # contact line with synthetic PII (the
        # pii_scrub fixture: emails / NANP 555 phones / rfc5737-ish
        # private IPs, all deterministic — never real data). Plain
        # text inside a closed <p>, so clean/markdown composition and
        # span counting follow the ordinary paragraph rules.
        toks: list[str] = []
        if rng.random() < 0.7:
            toks.append(
                f"user{int(rng.integers(0, 5000))}"
                f"@example{int(rng.integers(0, 20))}.com"
            )
        if rng.random() < 0.5:
            toks.append(
                f"{int(rng.integers(200, 1000))}-555-"
                f"{int(rng.integers(0, 10000)):04d}"
            )
        if rng.random() < 0.4:
            toks.append(
                f"10.{int(rng.integers(0, 256))}.{int(rng.integers(0, 256))}"
                f".{int(rng.integers(1, 255))}"
            )
        if not toks:
            toks.append(f"admin@example{int(rng.integers(0, 20))}.org")
        line = "contact " + " or ".join(toks)
        parts.append(f"<p>{line}</p>")
        clean.append(line)
        segs.append(1)
        text_tail.append(False)
        mds.append(("para", line, True))
    if rng.random() < 0.001:  # rare huge tool dump (heavy-tail skew)
        dump = " ".join([_sentence(rng, 8, 16)] * 2500)
        parts.append("<pre>" + dump + "</pre>")
        clean.append(dump)
        segs.append(1)
        text_tail.append(False)
        mds.append(("pre", dump))
    # each inter-part newline separator is its own emitted text span —
    # EXCEPT when the preceding part's source ends in emitted text
    # (unclosed shape, raw-text tail): that tail and the separator are
    # source-contiguous and coalesce into one span (verified against
    # the engine in tests)
    merged = sum(1 for j, f in enumerate(text_tail) if f and j < len(parts) - 1)
    n_spans = sum(segs) + max(0, len(parts) - 1) - merged
    return (
        "\n".join(parts),
        "\n".join(clean),
        _compose_md(mds),
        (n_e100, n_w100, n_w101, n_spans),
    )


#: bump when generation logic changes — invalidates cached dirs
GEN_VERSION = "v9"

#: turns per generation chunk: content is a pure function of
#: (seed, chunk_index), so chunks can be generated in parallel (Ray
#: tasks) or sequentially with identical results.
CHUNK_TURNS = 250_000


def generate_transcripts(
    n_turns: int, seed: int = SEED, conv_prefix: str = "", with_golden: bool = False
):
    """Build an n_turns-row transcripts table, deterministic in
    (n_turns, seed). Per FIXTURES.md F1: Zipf-distributed conversation
    sizes (hot conv_ids exercise the salted-key path), rows emitted in
    SHUFFLED order (stable-turn-ordering is really exercised), roles
    alternate user/assistant with tool turns. ``conv_prefix``
    namespaces conv_ids for parallel chunked generation.

    With ``with_golden=True`` also returns the generation-time golden
    table (conv_id, turn_idx, clean_text) — the expected extraction
    output composed independently of any parser (see ``_make_text``).
    The golden table is written to a SIBLING directory, never mixed
    into the input table, which keeps the input at exactly the
    BASELINE.json ``input_hint`` schema."""
    rng = np.random.default_rng(seed)
    conv_ids: list[str] = []
    turn_idx: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    cleans: list[str] = []
    md_golds: list[str] = []
    codes: list[tuple] = []
    tools: list[str] = []
    ts: list[int] = []
    base_ts = 1_700_000_000_000_000  # us epoch, fixed
    conv = 0
    while len(texts) < n_turns:
        # Zipf tail: most convs are short, a few are very hot
        n = 2 + min(int(rng.zipf(1.6)), 498)
        n = min(n, n_turns - len(texts))
        cid = f"conv-{conv_prefix}{conv:08d}"
        t0 = base_ts + int(rng.integers(0, 10**9))
        for i in range(n):
            conv_ids.append(cid)
            turn_idx.append(i)
            role = _ROLES[2] if rng.random() < 0.15 else _ROLES[i % 2]
            roles.append(role)
            text, clean, md, code = _make_text(rng)
            texts.append(text)
            cleans.append(clean)
            md_golds.append(md)
            codes.append(code)
            tools.append(
                _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else ""
            )
            t0 += int(rng.integers(1_000_000, 60_000_000))
            ts.append(t0)
        conv += 1
    tbl = pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    # globally shuffle row order (seeded) — input files must NOT
    # arrive pre-sorted by (conv_id, turn_idx)
    perm = rng.permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm))
    if not with_golden:
        return tbl
    golden = pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "clean_text": pa.array(cleans, type=pa.string()),
            "clean_md": pa.array(md_golds, type=pa.string()),
            "n_e100": pa.array([c[0] for c in codes], type=pa.int32()),
            "n_w100": pa.array([c[1] for c in codes], type=pa.int32()),
            "n_w101": pa.array([c[2] for c in codes], type=pa.int32()),
            "n_spans": pa.array([c[3] for c in codes], type=pa.int32()),
        }
    )
    return tbl, golden


def golden_dir_for(transcripts_out: str) -> str:
    """Sibling dir holding the generation-time golden (conv_id,
    turn_idx, clean_text) table for a transcripts dir."""
    return os.path.join(os.path.dirname(os.path.normpath(transcripts_out)), "golden")


def sf_to_turns(sf: float) -> int:
    """sf0.001 → 1k turns, sf0.01 → 10k, sf0.1 → 100k, sf1 → 1M."""
    return max(100, int(round(sf * 1_000_000)))


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


_GEN_LOCK = threading.Lock()


def transcripts_dir(sf: float, base: str = DEFAULT_BASE, seed: int = SEED) -> str:
    """Directory of transcripts parquet for scale ``sf``; generated on
    first use (multiple files so chunked/resumable runs have >1 input
    fragment). Serialized under a module lock: concurrent callers (the
    overlapped correctness gate runs queries from GATE_WORKERS
    threads) must not race the check → rmtree-stale → regenerate
    sequence, or one thread truncates files another is reading
    (r4 review)."""
    with _GEN_LOCK:
        return _transcripts_dir_locked(sf, base, seed)


def _transcripts_dir_locked(sf: float, base: str, seed: int) -> str:
    n = sf_to_turns(sf)
    out = os.path.join(base, f"sf{sf:g}", "transcripts")
    marker = os.path.join(out, "_DONE")
    stamp = f"n_turns={n} seed={seed} gen={GEN_VERSION}\n"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out
        import shutil

        shutil.rmtree(out)  # stale generator version — rebuild
        shutil.rmtree(golden_dir_for(out), ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    golden_dir = golden_dir_for(out)
    os.makedirs(golden_dir, exist_ok=True)
    chunks = [
        (ci, min(CHUNK_TURNS, n - ci * CHUNK_TURNS))
        for ci in range((n + CHUNK_TURNS - 1) // CHUNK_TURNS)
    ]

    def write_chunk(ci: int, rows: int) -> None:
        # content is a pure function of (seed, ci): identical output
        # whether chunks run sequentially or as parallel Ray tasks
        tbl, golden = generate_transcripts(
            rows, seed + 100_003 * ci, conv_prefix=f"{ci:04d}-", with_golden=True
        )
        pq.write_table(golden, os.path.join(golden_dir, f"golden-{ci:04d}.parquet"))
        rows_per_file = 25_000
        n_files = max(1 if len(chunks) > 1 else 4, (rows + rows_per_file - 1) // rows_per_file)
        per = (tbl.num_rows + n_files - 1) // n_files
        for i in range(n_files):
            part = tbl.slice(i * per, per)
            if part.num_rows:
                pq.write_table(
                    part, os.path.join(out, f"turns-{ci:04d}-{i:03d}.parquet")
                )

    use_ray = False
    if len(chunks) > 1:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass
    if use_ray:
        import ray

        @ray.remote
        def _gen(ci: int, rows: int) -> int:
            write_chunk(ci, rows)
            return ci

        ray.get([_gen.remote(ci, rows) for ci, rows in chunks])
    else:
        for ci, rows in chunks:
            write_chunk(ci, rows)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out


def transcripts_for(sf_dir: str) -> str:
    """Map a driver sf dir (e.g. /root/testdata/sf0.01) to the matching
    synthetic transcripts directory."""
    return transcripts_dir(sf_from_dir(sf_dir))
