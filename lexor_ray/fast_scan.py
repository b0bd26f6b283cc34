"""Flat-scan extraction: the DOM-free fast path.

For *pure copy/drop* dialects (no converter hooks, no kept-childless
rules — the flagship ``html-text``), main-content extraction does not
need a materialized DOM: a single left-to-right scan with an open-tag
stack and a drop-depth counter produces byte-identical
``(extracted_text, spans, log, rule_hits)`` to the full
parse → convert → write pipeline, without allocating a node per token.
This cuts both CPU and memory traffic per turn (the parse path's
allocation pressure is what saturates a many-core node first).

Semantics mirrored exactly from the engine (and property-tested
against it in ``tests/test_fast_scan.py``):

- token grammar of the HTML dialect (``dialects/html.py``): tags with
  the same attribute scanner, comments, doctype, CDATA, PIs, entities,
  rawtext elements, voids, self-closing, stray closes;
- the auto-close cascade: ``</name>`` pops inner open tags with W100
  (innermost-first), stray closes log W101, unterminated constructs
  log E100/E200, open tags at EOF log E100 (outermost-first) —
  reference ``lexor/core/parser.py:357-410``;
- drop semantics: subtree dropped for boilerplate names, boilerplate
  classes, all comments/doctype/CDATA/PI/rawtext bodies (none of which
  ever contribute extracted text);
- span coalescing: adjacent plain-text runs merge when contiguous;
  entity spans always stand alone.
"""

from __future__ import annotations

import bisect
import html as _htmlmod
import re

from .dialects.html import (
    RAWTEXT_ELEMENTS,
    VOID_ELEMENTS,
    _ATTR_NAME,
    _TAG_OPEN,
    _UNQUOTED,
    _WS,
    _close_re,
)

_CAND = re.compile(r"[<&]")
_CLOSE = re.compile(r"</([a-zA-Z][a-zA-Z0-9:_.-]*)\s*>")
_PI = re.compile(r"<\?([a-zA-Z][a-zA-Z0-9:_-]*)")
_DOCTYPE = re.compile(r"<!doctype", re.IGNORECASE)
_ENT = re.compile(r"&(?:#[0-9]{1,7};|#[xX][0-9a-fA-F]{1,6};|[a-zA-Z][a-zA-Z0-9]{1,31};)")

_ENGINE = "lexor_ray.core.parser"


#: attribute-less open tag `<name>` — the dominant case in real
#: markup; same name charset as _TAG_OPEN with an immediate '>'
_SIMPLE_TAG = re.compile(r"<([a-zA-Z][a-zA-Z0-9:_.-]*)>")


def _scan_tag(text: str, c: int, end: int):
    """Shared open-tag scanner — the exact attribute grammar of
    ``ElementParser.make_node`` (``dialects/html.py``). Returns
    (name, class_attr, i, self_closing, terminated) or None."""
    sm = _SIMPLE_TAG.match(text, c)
    if sm is not None:
        # equivalent to the full scan: name chars identical to
        # _TAG_OPEN, '>' immediately after → no attributes, not
        # self-closing, terminated (byte-identity fuzz-tested)
        return sm.group(1).lower(), None, sm.end(), False, True
    m = _TAG_OPEN.match(text, c)
    if m is None:
        return None
    name = m.group(1).lower()
    i = m.end()
    self_closing = False
    terminated = False
    class_attr = None
    while i < end:
        i = _WS.match(text, i).end()
        if i >= end:
            break
        ch = text[i]
        if ch == ">":
            i += 1
            terminated = True
            break
        if ch == "/" and text.startswith("/>", i):
            i += 2
            self_closing = True
            terminated = True
            break
        am = _ATTR_NAME.match(text, i)
        if am is None:
            i += 1
            continue
        aname = am.group(1).lower()
        i = am.end()
        j = _WS.match(text, i).end()
        aval = ""
        if j < end and text[j] == "=":
            j = _WS.match(text, j + 1).end()
            if j < end and text[j] in "\"'":
                q = text[j]
                k = text.find(q, j + 1)
                if k == -1:
                    aval = text[j + 1 :]
                    i = end
                else:
                    aval = text[j + 1 : k]
                    i = k + 1
            else:
                vm = _UNQUOTED.match(text, j)
                aval = vm.group(0)
                i = vm.end()
                # HTML5: '/' is unquoted-value data (mirror of the
                # dialect scanner — byte-identity contract)
        else:
            i = j if j > i else i
        if aname == "class":
            # last duplicate wins — Element.__setitem__ overwrite
            # semantics (core/dom.py)
            class_attr = aval
    return name, class_attr, i, self_closing, terminated


def scan_extract(
    text: str,
    drop_names: frozenset,
    drop_classes: frozenset,
    rule_hits: dict | None = None,
):
    """One-pass extraction. Returns (extracted_text, spans, log)."""
    end = len(text)
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    last_text = False  # last emitted run was plain text (coalescible)
    # raw log: (module, code, offset, args) — args may hold the W100
    # close-position placeholder resolved at the end
    rawlog: list = []
    # stack of (name, dropped, open_offset)
    stack: list[tuple[str, bool, int]] = []
    drop_depth = 0
    hits = rule_hits if rule_hits is not None else {}

    def hit(rule: str) -> None:
        hits[rule] = hits.get(rule, 0) + 1

    def emit_text(s: int, e: int) -> None:
        nonlocal last_text
        if drop_depth:
            return
        parts.append(text[s:e])
        if last_text and spans and spans[-1][1] == s:
            spans[-1] = (spans[-1][0], e)
        else:
            spans.append((s, e))
        last_text = True

    pos = 0
    while pos < end:
        m = _CAND.search(text, pos)
        if m is None:
            emit_text(pos, end)
            break
        c = m.start()
        if c > pos:
            emit_text(pos, c)
        ch = text[c]
        if ch == "&":
            em = _ENT.match(text, c)
            if em is None:
                emit_text(c, c + 1)
                pos = c + 1
                continue
            hit("EntityParser")
            if not drop_depth:
                parts.append(_htmlmod.unescape(em.group(0)))
                spans.append((c, em.end()))
                last_text = False
            pos = em.end()
            continue
        # ch == '<'
        nxt = text[c + 1] if c + 1 < end else ""
        if nxt == "/":
            cm = _CLOSE.match(text, c)
            if cm is None:
                emit_text(c, c + 1)
                pos = c + 1
                continue
            name = cm.group(1).lower()
            # find matching open tag, innermost-out (parser.py:357-383)
            idx = None
            for si in range(len(stack) - 1, -1, -1):
                if stack[si][0] == name:
                    idx = si
                    break
            if idx is None:
                hit("StrayCloseParser")
                rawlog.append(("StrayCloseParser", "W101", c, [name]))
                pos = cm.end()
                continue
            # W100 cascade for inner unclosed tags, innermost-first
            for si in range(len(stack) - 1, idx, -1):
                iname, idropped, ioff = stack[si]
                rawlog.append((_ENGINE, "W100", ioff, [iname, ("POS", c)]))
                if idropped:
                    drop_depth -= 1
            if stack[idx][1]:
                drop_depth -= 1
            del stack[idx:]
            last_text = False
            pos = cm.end()
            continue
        if nxt == "!":
            if text.startswith("<!--", c):
                hit("CommentParser")
                k = text.find("-->", c + 4)
                if k == -1:
                    rawlog.append(("CommentParser", "E100", c, ["#comment"]))
                    pos = end
                else:
                    pos = k + 3
                last_text = False
                continue
            if text.startswith("<![CDATA[", c):
                hit("CDataParser")
                k = text.find("]]>", c + 9)
                if k == -1:
                    rawlog.append(("CDataParser", "E100", c, ["#cdata-section"]))
                    pos = end
                else:
                    pos = k + 3
                last_text = False
                continue
            dm = _DOCTYPE.match(text, c)
            if dm is not None:
                hit("DoctypeParser")
                k = text.find(">", dm.end())
                if k == -1:
                    rawlog.append(("DoctypeParser", "E100", c, ["#doctype"]))
                    pos = end
                else:
                    pos = k + 1
                last_text = False
                continue
            emit_text(c, c + 1)
            pos = c + 1
            continue
        if nxt == "?":
            pm = _PI.match(text, c)
            if pm is None:
                emit_text(c, c + 1)
                pos = c + 1
                continue
            hit("PIParser")
            k = text.find("?>", pm.end())
            if k == -1:
                rawlog.append(("PIParser", "E100", c, ["?" + pm.group(1)]))
                pos = end
            else:
                pos = k + 2
            last_text = False
            continue
        tag = _scan_tag(text, c, end)
        if tag is None:
            emit_text(c, c + 1)
            pos = c + 1
            continue
        hit("ElementParser")
        name, class_attr, i, self_closing, terminated = tag
        if not terminated:
            rawlog.append(("ElementParser", "E200", c, [name]))
        if name in VOID_ELEMENTS:
            pos = i
            last_text = False
            continue
        if name in RAWTEXT_ELEMENTS and not self_closing:
            cm = _close_re(name).search(text, i)
            if cm is None:
                rawlog.append(("ElementParser", "E100", c, [name]))
                pos = end
            else:
                pos = cm.end()
            last_text = False
            continue
        if self_closing or not terminated:
            pos = i
            last_text = False
            continue
        dropped = name in drop_names or (
            drop_classes
            and class_attr is not None
            and not drop_classes.isdisjoint(class_attr.split())
        )
        stack.append((name, bool(dropped), c))
        if dropped:
            drop_depth += 1
        last_text = False
        pos = i
    # EOF sweep: open tags log E100 outermost-first (parser.py:408-410)
    for name, _dropped, off in stack:
        rawlog.append((_ENGINE, "E100", off, [name]))

    if not rawlog:
        return "".join(parts), spans, []
    # resolve offsets → line/col via one newline index
    nl: list[int] = []
    i = text.find("\n")
    while i != -1:
        nl.append(i)
        i = text.find("\n", i + 1)

    def line_col(off: int) -> tuple[int, int]:
        line = bisect.bisect_right(nl, off - 1)
        col = off - (nl[line - 1] + 1 if line > 0 else 0) + 1
        return line + 1, col

    log = []
    for module, code, off, args in rawlog:
        line, col = line_col(off)
        out_args = []
        for a in args:
            if isinstance(a, tuple) and a[0] == "POS":
                cl, cc = line_col(a[1])
                out_args.extend([str(cl), str(cc)])
            else:
                out_args.append(str(a))
        log.append(
            {"module": module, "code": code, "line": line, "col": col, "arg": out_args}
        )
    return "".join(parts), spans, log
