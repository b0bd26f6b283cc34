"""CLI — the Ray restatement of the reference's ``lexor src to style``
entry point (``lexor/__main__.py:149-163``, ``lexor/command/to.py``).

Single-file mode converts one document (no Ray session needed); table
mode runs the distributed pipeline over a transcripts parquet
directory.

    python -m lexor_ray doc.html --to text        # text+spans JSON to stdout
    python -m lexor_ray doc.html --to markdown    # markdown to stdout
    python -m lexor_ray doc.html --to xml         # normalized XML-ish dump
    python -m lexor_ray doc.html --to md,xml      # multi-target, one parse
                                                  # per target, files beside src
    python -m lexor_ray doc.html --to 'markdown[style=custom]'
                                                  # style parameters (the
                                                  # reference grammar; built-in
                                                  # styles never wrap, so
                                                  # width= is parsed but inert)
    python -m lexor_ray --table IN_DIR --out OUT_DIR [--to text]
                                                  # distributed, resumable

Target specs follow the reference's ``style[param=val,...]`` grammar
(``lexor/command/to.py:51-165`` ``split_at``/``style_parameters``);
several comma-separated targets convert in one invocation like the
reference's ``lexor f.html md xml`` (``to.py:271-291``).
"""

from __future__ import annotations

import argparse
import json
import sys

#: target aliases (reference accepts short style names)
_TARGET_ALIASES = {"md": "markdown", "txt": "text"}


def parse_target_spec(spec: str) -> tuple[str, dict]:
    """``'markdown[width=100,drop=ad|banner]'`` → ``('markdown',
    {'width': '100', 'drop': 'ad|banner'})`` — the reference's style
    parameter grammar (``lexor/command/to.py:51-165``)."""
    spec = spec.strip()
    params: dict = {}
    if "[" in spec:
        if not spec.endswith("]"):
            raise SystemExit(f"bad target spec {spec!r}: missing closing ']'")
        spec, _, raw = spec[:-1].partition("[")
        for item in raw.split(","):
            if not item:
                continue
            if "=" not in item:
                raise SystemExit(f"bad style parameter {item!r}: expected k=v")
            k, _, v = item.partition("=")
            params[k.strip()] = v.strip()
    target = _TARGET_ALIASES.get(spec, spec)
    return target, params


def split_targets(to: str) -> list[tuple[str, dict]]:
    """Split a ``--to`` value into target specs; commas inside
    ``[...]`` belong to the parameter list, not the target list."""
    out, buf, depth = [], [], 0
    for ch in to:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return [parse_target_spec(s) for s in out if s.strip()]


def _drop_classes_dialect(base_name: str, drop: str) -> str:
    """Register a derived dialect with an overridden boilerplate
    class set (style parameter ``drop=cls1|cls2``); returns its
    name. Derived dialects are cached by name, so per-worker state
    amortization still applies."""
    from dataclasses import replace

    from .dialects.registry import _REGISTRY, get_dialect, register_dialect

    name = f"{base_name}#drop={drop}"
    if name not in _REGISTRY:
        base = get_dialect(base_name)
        register_dialect(
            replace(base, name=name, drop_classes=frozenset(drop.split("|")))
        )
    return name


def convert_one(text: str, to: str, lang: str = "html", params: dict | None = None) -> str:
    params = params or {}
    if to == "text":
        from .extract import extract_one

        dialect = f"{lang}-text"
        if "drop" in params:
            dialect = _drop_classes_dialect(dialect, params["drop"])
        res = extract_one(text, dialect=dialect)
        return json.dumps(
            {
                "extracted_text": res["extracted_text"],
                "spans": res["spans"],
                "log": res["log"],
            }
        )
    if to == "markdown":
        if lang != "html":
            raise SystemExit("--to markdown converts HTML input; use --lang html")
        from .dialects.markdown import to_markdown

        # params like width= are accepted through the style/config
        # chain for reference surface parity but are inert: neither
        # built-in writer style wraps (see to_markdown docstring)
        return to_markdown(text)
    if to == "xml":
        from .core.parser import Parser
        from .core.writer import Writer
        from .dialects.registry import get_dialect

        parse_dialect = {
            "html": "html",
            "latex": "latex-text",
            "markdown": "markdown",
            "lexor": "lexor-text",
        }
        if lang not in parse_dialect:
            raise SystemExit(
                f"unknown input language {lang!r} for --to xml "
                f"(html|latex|markdown|lexor; inferred from the file "
                f"extension when --lang is omitted)"
            )
        doc = Parser(get_dialect(parse_dialect[lang])).parse(text)
        return Writer().write(doc)
    raise SystemExit(f"unknown target style: {to!r} (text|markdown|xml)")


def document_dialect(name: str) -> str:
    """Emit a markdown API document for a dialect — the reference's
    ``lexor document`` command restated (``lexor/command/document.py``:
    it generated API docs for a style module; here the doc is derived
    from the registered :class:`~lexor_ray.dialects.registry.Dialect`
    object: node parsers, converter rules, writer rules, boilerplate
    classes and lifecycle hooks, each with its docstring summary)."""
    from .dialects.registry import get_dialect

    d = get_dialect(name)
    lines = [f"# dialect `{d.name}`", "", f"language: `{d.lang}`", ""]

    def first_line(obj) -> str:
        doc = getattr(obj, "__doc__", None) or ""
        return doc.strip().splitlines()[0] if doc.strip() else ""

    lines.append("## node parsers (MAPPING)")
    lines.append("")
    lines.append("| container | next-char class | parsers |")
    lines.append("|---|---|---|")
    for key, val in sorted(d.parser_mapping.items()):
        if isinstance(val, str):
            lines.append(f"| `{key}` | → alias of `{val}` | |")
        else:
            chars, parsers = val
            names = ", ".join(
                f"`{p.__name__}`" + (f" — {first_line(p)}" if first_line(p) else "")
                for p in parsers
            )
            lines.append(f"| `{key}` | `{chars!r}` | {names} |")
    lines.append("")
    lines.append("## converter rules")
    lines.append("")
    for key, rule in sorted(d.converters.items()):
        bits = [f"copy={rule.copy}", f"copy_children={rule.copy_children}"]
        if rule.start:
            bits.append(f"start={getattr(rule.start, '__name__', rule.start)}")
        if rule.end:
            bits.append(f"end={getattr(rule.end, '__name__', rule.end)}")
        lines.append(f"- `{key}`: {', '.join(bits)}")
    lines.append("")
    lines.append("## writer rules")
    lines.append("")
    for key, w in sorted(d.writers.items()):
        if isinstance(w, str):
            # alias entry ('h2': 'h1') — point at the target rule
            # instead of documenting the str class (r5 review)
            lines.append(f"- `{key}`: alias of `{w}`")
            continue
        nm = getattr(w, "__name__", type(w).__name__)
        doc = first_line(w)
        lines.append(f"- `{key}`: `{nm}`" + (f" — {doc}" if doc else ""))
    if d.drop_classes:
        lines.append("")
        lines.append(
            "## boilerplate classes dropped: "
            + ", ".join(f"`{c}`" for c in sorted(d.drop_classes))
        )
    if d.hooks:
        lines.append("")
        lines.append(
            "## lifecycle hooks: " + ", ".join(f"`{h}`" for h in sorted(d.hooks))
        )
    return "\n".join(lines)


_STYLE_TEMPLATE = '''\
"""{name} — a lexor_ray style module (scaffolded).

Register node parsers for your grammar and (optionally) converter /
writer rules. Install with `python -m lexor_ray --install {name}.py`
or put it on $LEXOR_RAY_STYLE_PATH.

MSG examples (run by test_{name}.py):

    Okay: plain text
    E100: {open_tok}note{close_brace}unclosed
"""

import re

from lexor_ray.core.dom import Element
from lexor_ray.core.parser import NodeParser
from lexor_ray.dialects.registry import ConvertRule, Dialect

_OPEN = re.compile(r"@\\{{([A-Za-z][A-Za-z0-9_-]*)\\}}")


class {cls}NodeParser(NodeParser):
    """`@{{name}}` opens a node; `@@` closes the innermost one —
    replace with your grammar. Unclosed nodes log E100 at EOF and
    early outer closes cascade W100 (engine-provided semantics)."""

    def make_node(self):
        p = self.parser
        m = _OPEN.match(p.text, p.caret)
        if m is None:
            return None
        node = Element(m.group(1))
        node.span = (p.caret, m.end())
        node.pos = p.copy_pos()
        p.update(m.end())
        return node

    def close(self, node):
        p = self.parser
        if p.text.startswith("@@", p.caret) and not _OPEN.match(p.text, p.caret):
            pos = p.copy_pos()
            p.update(p.caret + 2)
            return pos
        return None


DIALECT = Dialect(
    # "<lang>-text" naming: `--to text --lang {name}` resolves the
    # dialect as f"{{lang}}-text" (the lexor-text precedent)
    name="{name}-text",
    lang="{name}",
    parser_mapping={{"__default__": ("@", [{cls}NodeParser])}},
    converters={{"__default__": ConvertRule()}},
    close_prefix="@@",
)
'''

_TEST_TEMPLATE = '''\
"""Conformance tests for the {name} style (scaffolded)."""

import os

from lexor_ray.dialects.registry import load_style_file
from lexor_ray.testing import assert_msg_examples, parse_write_roundtrip

# resolve the sibling style module relative to THIS file, so the
# generated pair is relocatable (any cwd, any directory name)
_STYLE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "{name}.py")
load_style_file(_STYLE)


def test_msg_examples():
    # replays every `Okay:` / `E100:` example in the module docstring
    import {name}  # noqa: F401  (registered by load_style_file above)

    assert_msg_examples("{name}-text", open(_STYLE).read())


def test_roundtrip():
    assert "hello" in parse_write_roundtrip("@{{b}}hello@@", "{name}-text")
'''


def scaffold_style(name: str, out_dir: str) -> list[str]:
    """Write ``NAME.py`` + ``test_NAME.py`` skeletons — the
    reference's `paste` command semantics (template instantiation,
    ``lexor/command/paste.py:46-125``), re-expressed for the Dialect
    contract. Returns the written paths; refuses to overwrite."""
    import os
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"style name must be a Python identifier: {name!r}")
    os.makedirs(out_dir, exist_ok=True)
    style = os.path.join(out_dir, f"{name}.py")
    test = os.path.join(out_dir, f"test_{name}.py")
    for p in (style, test):
        if os.path.exists(p):
            raise FileExistsError(p)
    cls = name.title().replace("_", "")
    with open(style, "w") as fh:
        fh.write(
            _STYLE_TEMPLATE.format(
                name=name, cls=cls, open_tok="@{", close_brace="}"
            )
        )
    with open(test, "w") as fh:
        fh.write(_TEST_TEMPLATE.format(name=name))
    return [style, test]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lexor_ray", description=__doc__)
    ap.add_argument("src", nargs="?", help="input file ('-' for stdin)")
    ap.add_argument(
        "--to",
        default="text",
        help="comma-separated target specs: text|markdown|xml, each "
        "optionally with [k=v,...] style parameters "
        "(e.g. --to 'markdown[width=100],xml')",
    )
    ap.add_argument(
        "--out-dir",
        help="where multi-target outputs are written "
        "(default: beside the source file)",
    )
    ap.add_argument(
        "--lang",
        default=None,
        help="input language: html|latex|markdown (default: inferred from extension)",
    )
    ap.add_argument(
        "--document",
        metavar="DIALECT",
        help="print a markdown API document for a registered dialect "
        "(the reference's `lexor document` command) and exit",
    )
    ap.add_argument(
        "--list",
        action="store_true",
        dest="list_dialects",
        help="list registered and installed dialects (the reference's "
        "`lexor lang` display, lexor/command/lang.py:140-173) and exit",
    )
    ap.add_argument(
        "--defaults",
        metavar="SECTION",
        help="print the resolved default values for a style/config "
        "section (the reference's `lexor defaults` command, "
        "lexor/command/defaults.py:39-51): module DEFAULTS first, "
        "then config-file overrides; prints NO DEFAULTS when the "
        "section is unknown",
    )
    ap.add_argument(
        "--install",
        metavar="STYLE.py",
        help="install a style module (a Python file defining DIALECT/"
        "DIALECTS) into the styles dir so its dialect name resolves "
        "everywhere — the reference's `lexor install` command "
        "(lexor/command/install.py:41-110); search path: "
        "$LEXOR_RAY_STYLE_PATH then ~/.lexor_ray/styles",
    )
    ap.add_argument(
        "--develop",
        metavar="STYLE.py",
        help="register a style module for in-place development: its "
        "dialect name resolves to this file (before any installed "
        "copy) via the config file's [develop] section — the "
        "reference's `lexor develop` command "
        "(lexor/command/develop.py:29-59)",
    )
    ap.add_argument(
        "--dist",
        metavar="STYLE.py",
        help="package a style module plus its aux dir and conformance "
        "tests into lexor_ray.<lang>.<name>.zip in --out-dir (default "
        ".) — the reference's `lexor dist` command "
        "(lexor/command/dist.py:59-103)",
    )
    ap.add_argument(
        "--write",
        "-w",
        action="store_true",
        help="also write the output to '<base>.<style>.<lang>' beside "
        "the source (the reference's --write flag and naming, "
        "lexor/command/to.py:300-306,352)",
    )
    ap.add_argument(
        "--nodisplay",
        "-n",
        action="store_true",
        help="suppress stdout display (reference --nodisplay)",
    )
    ap.add_argument(
        "--append",
        action="store_true",
        help="open output files in append mode (the reference "
        "Writer.write(filename, mode='a') option, core/writer.py:355)",
    )
    ap.add_argument(
        "--scaffold",
        metavar="NAME",
        help="write a new style-module skeleton NAME.py plus its "
        "test_NAME.py into --out-dir (default .) — the reference's "
        "`lexor paste` template instantiation "
        "(lexor/command/paste.py:46-125; templates under "
        "lexor/core/templates/). The skeleton registers a working "
        "dialect (text passthrough + one node parser stub) and the "
        "test uses lexor_ray.testing's Okay:/code conformance runner.",
    )
    ap.add_argument("--table", help="transcripts parquet dir (distributed mode)")
    ap.add_argument("--out", help="output dir for --table mode")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if args.list_dialects:
        import os

        from .dialects.registry import (
            _REGISTRY,
            get_dialect,
            styles_search_path,
        )

        get_dialect("html")  # force built-in registration
        for name in sorted(_REGISTRY):
            d = _REGISTRY[name]
            print(f"{name}\tlang={d.lang}\tbuilt-in")
        for sdir in styles_search_path():
            if os.path.isdir(sdir):
                for f in sorted(os.listdir(sdir)):
                    if f.endswith(".py"):
                        print(f"{f[:-3]}\tinstalled\t{os.path.join(sdir, f)}")
        return 0

    if args.defaults:
        from .config import style_defaults

        vals = style_defaults(args.defaults)
        if not vals:
            print("NO DEFAULTS")
        else:
            for key in sorted(vals):
                print(f"{key} = {vals[key]!r}")
        return 0

    if args.install:
        from .dialects.registry import install_style

        print(install_style(args.install))
        return 0

    if args.develop:
        from .dialects.registry import develop_style

        print(develop_style(args.develop))
        return 0

    if args.dist:
        from .dialects.registry import dist_style

        print(dist_style(args.dist, args.out_dir or "."))
        return 0

    if args.scaffold:
        for p in scaffold_style(args.scaffold, args.out_dir or "."):
            print(p)
        return 0

    if args.document:
        print(document_dialect(args.document))
        return 0

    if args.table:
        if not args.out:
            ap.error("--table requires --out")
        # honor --lang / --to in table mode instead of silently
        # running the html-text dialect on everything (r4 review):
        # the distributed pipeline emits text+spans, so the target
        # must be 'text'; the source language picks the extraction
        # dialect.
        _table_dialects = {
            None: "html-text",
            "html": "html-text",
            "latex": "latex-text",
            "markdown": "markdown-text",
            "lexor": "lexor-text",
        }
        if args.lang not in _table_dialects:
            ap.error(
                f"--table supports --lang html|latex|markdown|lexor, "
                f"not {args.lang!r}"
            )
        _to, _ = parse_target_spec(args.to)
        if _TARGET_ALIASES.get(_to, _to) != "text":
            ap.error(
                "--table mode emits text+spans ('--to text'); convert "
                "to other styles downstream or per file in single-file "
                "mode"
            )
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                logging_level="ERROR",
            )
        from .pipeline import run_extraction

        summary = run_extraction(
            args.table, args.out, dialect=_table_dialects[args.lang]
        )
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if not args.src:
        ap.error("provide a source file or --table")
    if args.src == "-":
        text = sys.stdin.read()
    else:
        from . import resolve_input

        resolved = resolve_input(args.src)
        if resolved is None:
            ap.error(
                f"{args.src!r} not found (searched LEXORINPUTS="
                f"{__import__('os').environ.get('LEXORINPUTS', '')!r})"
            )
        args.src = resolved
        text = open(resolved).read()
    lang = args.lang
    if lang is None:
        # language inference from extension (reference DEFAULTS alias
        # table, lexor/command/lang.py:24-37); stdin and unknown
        # extensions default to html, matching the string-input branch
        # at lexor/__init__.py:71-75.
        import os

        from . import EXTENSION_DIALECTS

        ext = os.path.splitext(args.src)[1].lower() if args.src != "-" else ""
        dialect = EXTENSION_DIALECTS.get(ext, "html")
        lang = {"latex-text": "latex", "lexor-text": "lexor"}.get(dialect, dialect)
    targets = split_targets(args.to)
    # defaults merge chain (reference config.py:163-210 semantics):
    # module DEFAULTS → config-file [lang-kind-style] section → the
    # CLI style[param=val] overrides
    from .config import read_config, style_defaults

    _kind = {"markdown": "writer", "xml": "writer", "text": "converter"}
    cfg = read_config()
    # the config section is keyed by the STYLE (an explicit CLI
    # style= parameter names a sub-style; default: the target itself),
    # matching the reference's '{lang}-{kind}-{style}' key shape —
    # --to 'markdown[style=custom]' consults [html-writer-custom]
    targets = [
        (
            to,
            style_defaults(
                f"{lang}-{_kind.get(to, 'writer')}-{params.get('style', to)}",
                params,
                cfg,
            ),
        )
        for to, params in targets
    ]
    import os

    mode = "a" if args.append else "w"
    if len(targets) == 1:
        to, params = targets[0]
        out = convert_one(text, to, lang, params)
        if not args.nodisplay:
            print(out)
        if args.write:
            if args.src == "-":
                ap.error("--write needs a source file, not stdin")
            base = os.path.splitext(os.path.basename(args.src))[0]
            out_dir = args.out_dir or os.path.dirname(os.path.abspath(args.src))
            os.makedirs(out_dir, exist_ok=True)
            sname = params.get("style", "default")
            path = os.path.join(out_dir, f"{base}.{sname}.{to}")
            with open(path, mode) as fh:
                fh.write(out)
                fh.write("\n")
        return 0
    # multi-target (reference to.py:271-291): one file per target with
    # the reference's '<base>.<style>.<lang>' naming (to.py:332,352)
    if args.src == "-":
        ap.error("multi-target conversion needs a source file, not stdin")
    base = os.path.splitext(os.path.basename(args.src))[0]
    out_dir = args.out_dir or (os.path.dirname(os.path.abspath(args.src)))
    os.makedirs(out_dir, exist_ok=True)
    for to, params in targets:
        sname = params.get("style", "default")
        path = os.path.join(out_dir, f"{base}.{sname}.{to}")
        with open(path, mode) as fh:
            fh.write(convert_one(text, to, lang, params))
            fh.write("\n")
        print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
