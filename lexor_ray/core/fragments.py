"""Parse-string splice + jQuery-style selection mutation.

P10 of SURVEY.md §2.2 (reference ``Element.children`` get/set,
``lexor/core/elements.py:431-481``: serialize children to a string /
parse a string and replace children) and Q5 of §2.4 (the reference's
``Selector.find/contents/append/prepend/after/before`` mutation API,
``selector.py:306-612``, with parse-on-demand of string arguments and
clone-per-target).

These are in-UDF DOM utilities for rule authoring — never dataset
stages.
"""

from __future__ import annotations

from .dom import Element, Node
from .parser import Parser
from .selector import select
from .writer import Writer

_PARSERS: dict[str, Parser] = {}


def _parser(dialect: str) -> Parser:
    p = _PARSERS.get(dialect)
    if p is None:
        from ..dialects.registry import get_dialect

        p = _PARSERS[dialect] = Parser(get_dialect(dialect))
    return p


def parse_fragment(text: str, dialect: str = "html") -> list[Node]:
    """Parse markup into a list of nodes (the reference's
    string-argument handling, ``selector.py:364-372``)."""
    doc = _parser(dialect).parse(text)
    nodes = list(doc.child or [])
    for n in nodes:
        n.parent = None
    return nodes


def children_str(el: Element, dialect: str = "html") -> str:
    """Serialize an element's children to markup
    (``elements.py:431-449`` getter) — with the DIALECT's writers,
    symmetric with :func:`set_children_str` (r4 review: the dialect
    argument used to be accepted but ignored, always falling back to
    the dialect-less DefaultWriter)."""
    w = Writer(_parser(dialect).dialect)
    return "".join(w.write(c) for c in (el.child or []))


def set_children_str(el: Element, text: str, dialect: str = "html") -> Element:
    """Parse ``text`` and replace the element's children
    (``elements.py:450-481`` setter)."""
    el.remove_children()
    for n in parse_fragment(text, dialect):
        el.append_child(n)
    return el


def _materialize(content, dialect: str) -> list[Node]:
    if isinstance(content, str):
        return parse_fragment(content, dialect)
    if isinstance(content, Node):
        return [content]
    return list(content)


def _clone_all(nodes: list[Node]) -> list[Node]:
    return [
        n.clone_node(True) if isinstance(n, Element) else n.clone_node()
        for n in nodes
    ]


class Selection:
    """jQuery-style wrapper over a list of matched elements
    (reference ``Selector`` object, ``selector.py:306-612``). String
    content is parsed on demand; when there are multiple targets each
    gets its own clone (``clone-per-target``, ``selector.py:418-452``).
    """

    def __init__(self, root: Node, selector: str | None = None, dialect: str = "html"):
        self.dialect = dialect
        self.nodes: list[Element] = (
            select(root, selector) if selector else ([root] if isinstance(root, Element) else [])
        )

    def __len__(self) -> int:
        return len(self.nodes)

    def __iter__(self):
        return iter(self.nodes)

    def find(self, selector: str) -> "Selection":
        out = Selection.__new__(Selection)
        out.dialect = self.dialect
        seen = set()
        nodes = []
        for n in self.nodes:
            for m in select(n, selector):
                if id(m) not in seen:
                    seen.add(id(m))
                    nodes.append(m)
        out.nodes = nodes
        return out

    def contents(self) -> list[Node]:
        """All child nodes of the matched set (``selector.py:340-352``)."""
        out: list[Node] = []
        for n in self.nodes:
            out.extend(n.child or [])
        return out

    def _each(self, content, insert) -> "Selection":
        proto = _materialize(content, self.dialect)
        for i, target in enumerate(self.nodes):
            nodes = proto if i == len(self.nodes) - 1 else _clone_all(proto)
            insert(target, nodes)
        return self

    def append(self, content) -> "Selection":
        """Append to each target (``selector.py:364-398``)."""
        return self._each(content, lambda t, ns: t.extend_children(ns))

    def prepend(self, content) -> "Selection":
        """Prepend to each target (``selector.py:418-452``)."""
        return self._each(content, lambda t, ns: t.extend_before(0, ns))

    def after(self, content) -> "Selection":
        """Insert after each target (``selector.py:470-532``)."""
        return self._each(
            content,
            lambda t, ns: t.parent.extend_before(t.index + 1, ns),
        )

    def before(self, content) -> "Selection":
        """Insert before each target (``selector.py:550-612``)."""
        return self._each(
            content, lambda t, ns: t.parent.extend_before(t.index, ns)
        )

    def remove(self) -> "Selection":
        for n in self.nodes:
            if n.parent is not None:
                n.detach()
        return self
