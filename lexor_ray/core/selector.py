"""Selector micro-language — the *working subset* of the reference's
Sizzle port (``lexor/core/selector.py``, 624 LoC of which ~350
functional; the full compiled-matcher path is explicitly unfinished —
stubs at ``selector.py:224-250``).

Supported, matching the reference's quick paths (``RQUICKEXPR``
``selector.py:77, 182-199``) plus its functional token filters:

- ``#id`` — id lookup
- ``tag`` — by element name
- ``.class`` — class-attribute membership
- ``tag.class``/``tag#id`` combinations
- ``[attr]`` / ``[attr=value]`` attribute filters
- comma-separated groups (union)

Descendant/child combinators and pseudo-classes are NOT implemented —
they were not functional in the reference either (SURVEY.md §2.4 Q4).
Used by converter rules for boilerplate heuristics (e.g. drop
``.ad``/``#sidebar`` subtrees).
"""

from __future__ import annotations

import re

from .dom import Element, Node

_TOKEN = re.compile(
    r"(?P<id>#[\w-]+)|(?P<cls>\.[\w-]+)|(?P<attr>\[[^\]]+\])|(?P<tag>[\w*-]+)"
)
_ATTR = re.compile(r"\[\s*([\w-]+)\s*(?:=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\]\s]+)))?\s*\]")

_CACHE: dict[str, list[list[tuple[str, str | tuple]]]] = {}


def _compile(selector: str):
    """Parse into OR-groups of AND-conditions (cached, mirroring the
    reference's ``tokenize.cache`` at ``selector.py:300-303``)."""
    if selector in _CACHE:
        return _CACHE[selector]
    groups = []
    for part in selector.split(","):
        part = part.strip()
        conds: list[tuple[str, str | tuple]] = []
        pos = 0
        while pos < len(part):
            m = _TOKEN.match(part, pos)
            if m is None:
                raise ValueError(f"unsupported selector syntax at {part[pos:]!r}")
            if m.group("id"):
                conds.append(("id", m.group("id")[1:]))
            elif m.group("cls"):
                conds.append(("class", m.group("cls")[1:]))
            elif m.group("attr"):
                am = _ATTR.match(m.group("attr"))
                if am is None:
                    raise ValueError(f"bad attribute selector {m.group('attr')!r}")
                val = next((g for g in am.groups()[1:] if g is not None), None)
                conds.append(("attr", (am.group(1), val)))
            elif m.group("tag") and m.group("tag") != "*":
                conds.append(("tag", m.group("tag").lower()))
            pos = m.end()
        groups.append(conds)
    _CACHE[selector] = groups
    return groups


def matches(node: Node, selector: str) -> bool:
    if not isinstance(node, Element):
        return False
    for conds in _compile(selector):
        ok = True
        for kind, arg in conds:
            if kind == "tag":
                ok = node.name == arg
            elif kind == "id":
                ok = node.attrs.get("id") == arg
            elif kind == "class":
                ok = arg in node.class_list()
            elif kind == "attr":
                name, val = arg
                ok = name in node.attrs and (val is None or node.attrs[name] == val)
            if not ok:
                break
        if ok:
            return True
    return False


def select(root: Node, selector: str) -> list[Element]:
    """DFS collect all elements in the subtree matching ``selector``
    (the reference's ``Selector.find``, ``selector.py:306-330``,
    quick-path semantics)."""
    return [n for n in root.iter() if matches(n, selector)]


def remove_matching(root: Node, selector: str) -> int:
    """Detach every matching element (and subtree); returns the count.
    The in-UDF rewrite surface (reference ``Converter.remove_node``,
    ``converter.py:222-237``)."""
    victims = select(root, selector)
    for v in victims:
        if v.parent is not None:
            v.detach()
    return len(victims)
