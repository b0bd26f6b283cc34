"""CLI — the Ray restatement of the reference's ``lexor src to style``
entry point (``lexor/__main__.py:149-163``, ``lexor/command/to.py``).

Single-file mode converts one document (no Ray session needed); table
mode runs the distributed pipeline over a transcripts parquet
directory.

    python -m lexor_ray doc.html --to text        # text+spans JSON to stdout
    python -m lexor_ray doc.html --to markdown    # markdown to stdout
    python -m lexor_ray doc.html --to xml         # normalized XML-ish dump
    python -m lexor_ray --table IN_DIR --out OUT_DIR [--to text]
                                                  # distributed, resumable
"""

from __future__ import annotations

import argparse
import json
import sys


def convert_one(text: str, to: str, lang: str = "html") -> str:
    if to == "text":
        from .extract import extract_one

        res = extract_one(text, dialect=f"{lang}-text")
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

        return to_markdown(text)
    if to == "xml":
        from .core.parser import Parser
        from .core.writer import Writer
        from .dialects.registry import get_dialect

        parse_dialect = {"html": "html", "latex": "latex-text", "markdown": "markdown"}
        if lang not in parse_dialect:
            raise SystemExit(f"unknown --lang {lang!r} (html|latex|markdown)")
        doc = Parser(get_dialect(parse_dialect[lang])).parse(text)
        return Writer().write(doc)
    raise SystemExit(f"unknown target style: {to!r} (text|markdown|xml)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lexor_ray", description=__doc__)
    ap.add_argument("src", nargs="?", help="input file ('-' for stdin)")
    ap.add_argument("--to", default="text", help="target style: text|markdown|xml")
    ap.add_argument(
        "--lang",
        default=None,
        help="input language: html|latex|markdown (default: inferred from extension)",
    )
    ap.add_argument("--table", help="transcripts parquet dir (distributed mode)")
    ap.add_argument("--out", help="output dir for --table mode")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if args.table:
        if not args.out:
            ap.error("--table requires --out")
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                logging_level="ERROR",
            )
        from .pipeline import run_extraction

        summary = run_extraction(args.table, args.out)
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if not args.src:
        ap.error("provide a source file or --table")
    text = sys.stdin.read() if args.src == "-" else open(args.src).read()
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
    print(convert_one(text, args.to, lang))
    return 0


if __name__ == "__main__":
    sys.exit(main())
