"""Slim DOM for the Ray-Data-native extraction engine.

Re-expresses the node hierarchy of the reference
(``lexor/core/node.py:58-75``, ``lexor/core/elements.py``) in Python 3
with explicit attribute dicts and **character spans**: every node
carries the half-open ``(start, end)`` offset range of the source text
it was parsed from (the Arrow-friendly generalization of the
reference's transient ``node.pos`` line/column pairs,
``lexor/core/parser.py:44-50``).

The DOM is a *transient per-row value* inside a ``map_batches`` UDF —
it is never materialized across rows or shipped through the object
store, so plain Python objects with ``__slots__`` are the right tool.

Differences from the reference (deliberate):

- Sibling links are index-based (``parent.child`` list + ``index``)
  instead of the reference's doubly-linked ``prev``/``next`` pointers
  (``node.py:58-75``); traversals recompute neighbors from the list.
- ``Element`` attributes live in an explicit ``attrs`` dict +
  ``attr_order`` list instead of ``self.__dict__`` tricks
  (``elements.py:206-218``).
- ``Text`` carries ``spans``: a list of ``(start, end)`` source ranges,
  one per merged run, so span fidelity survives the eager Text-merging
  the reference performs in three places (``parser.py:323-327,
  342-355``; ``node.py:445-469``).
"""

from __future__ import annotations


class Node:
    """Base node. ``child`` is a list for container nodes, else None.

    Mirrors ``lexor/core/node.py:58-75`` minus owner/level bookkeeping
    (no incremental id index is needed: documents are tiny per-row
    values and any id lookup is a single DFS).
    """

    __slots__ = ("name", "parent", "index", "child", "span", "pos")

    def __init__(self) -> None:
        self.name: str = "#node"
        self.parent: Node | None = None
        self.index: int = 0
        self.child: list[Node] | None = None
        self.span: tuple[int, int] = (0, 0)
        # [line, col] diagnostic position; only kept while parsing
        # (reference: parser.py:44-50 deletes it when done).
        self.pos: list[int] | None = None

    # -- sibling access (index-based) -----------------------------------
    @property
    def next(self) -> Node | None:
        p = self.parent
        if p is None or p.child is None:
            return None
        i = self.index + 1
        return p.child[i] if i < len(p.child) else None

    @property
    def prev(self) -> Node | None:
        p = self.parent
        if p is None or p.child is None or self.index == 0:
            return None
        return p.child[self.index - 1]

    # -- mutation --------------------------------------------------------
    def append_child(self, node: "Node | str") -> "Node":
        """Append a child; a plain str is wrapped in a Text node
        (reference: ``node.py:389-399``)."""
        if self.child is None:
            raise TypeError(f"{self.name} does not accept children")
        if isinstance(node, str):
            node = Text(node)
        if node.parent is not None:
            node.detach()
        node.parent = self
        node.index = len(self.child)
        self.child.append(node)
        return node

    def detach(self) -> "Node":
        p = self.parent
        if p is not None and p.child is not None:
            del p.child[self.index]
            for i in range(self.index, len(p.child)):
                p.child[i].index = i
        self.parent = None
        self.index = 0
        return self

    def remove_child(self, index: int) -> "Node":
        assert self.child is not None
        node = self.child[index]
        return node.detach()

    def remove_children(self) -> None:
        """Reference ``node.py:262-266``."""
        if self.child:
            for c in self.child:
                c.parent = None
            self.child = []

    def _reindex(self, start: int = 0) -> None:
        assert self.child is not None
        for i in range(start, len(self.child)):
            self.child[i].index = i

    def insert_before(self, index: int, node: "Node | str") -> "Node":
        """Insert a child at ``index`` (reference ``node.py:328-340``)."""
        if self.child is None:
            raise TypeError(f"{self.name} does not accept children")
        if isinstance(node, str):
            node = Text(node)
        if node.parent is not None:
            node.detach()
        node.parent = self
        self.child.insert(index, node)
        self._reindex(index)
        return node

    def extend_before(self, index: int, nodes) -> "Node":
        """Insert many children at ``index``; a DocumentFragment is
        adopted (its children stolen) — reference ``node.py:342-374``."""
        if isinstance(nodes, Node) and nodes.name in (
            "#document",
            "#document-fragment",
        ):
            nodes = list(nodes.child or [])
        for off, n in enumerate(list(nodes)):
            self.insert_before(index + off, n)
        return self

    def extend_children(self, nodes) -> "Node":
        """Append many children (reference ``node.py:401-421``)."""
        return self.extend_before(len(self.child or []), nodes)

    def append_after(self, node: "Node | str") -> "Node":
        """Insert ``node`` as the sibling after self (``node.py:423-428``)."""
        return self.parent.insert_before(self.index + 1, node)

    def prepend_before(self, node: "Node | str") -> "Node":
        """Insert ``node`` as the sibling before self (``node.py:437-439``)."""
        return self.parent.insert_before(self.index, node)

    def __delitem__(self, key) -> None:
        """Slice/index child deletion (reference ``node.py:503-525``)."""
        assert self.child is not None
        victims = self.child[key] if isinstance(key, slice) else [self.child[key]]
        for v in victims:
            v.parent = None
        del self.child[key]
        self._reindex()

    def __getitem__(self, key):
        assert self.child is not None
        return self.child[key]

    def __len__(self) -> int:
        return len(self.child) if self.child else 0

    # -- structural predicates (reference Q6) ----------------------------
    def contains(self, other: "Node") -> bool:
        """Ancestry test (reference ``elements.py:293-302``, done by
        walking parents instead of maintained ``level`` counters)."""
        p = other
        while p is not None:
            if p is self:
                return True
            p = p.parent
        return False

    @property
    def element_index(self) -> int:
        """Index among Element siblings (reference ``node.py:133-141``)."""
        if self.parent is None or self.parent.child is None:
            return 0
        n = 0
        for sib in self.parent.child[: self.index]:
            if isinstance(sib, Element):
                n += 1
        return n

    @property
    def next_element(self):
        """Next sibling that is an Element (``node.py:184-192``)."""
        sib = self.next
        while sib is not None and not isinstance(sib, Element):
            sib = sib.next
        return sib

    @property
    def previous_element(self):
        """Previous sibling that is an Element (``node.py:156-164``)."""
        sib = self.prev
        while sib is not None and not isinstance(sib, Element):
            sib = sib.prev
        return sib

    def normalize(self) -> "Node":
        """Drop empty Text nodes, join adjacent Text siblings — the
        reference's ``Node.normalize`` (``node.py:445-469``). Span
        lists of merged runs are concatenated (coalescing contiguous
        ranges) so ``(start, end)`` fidelity survives."""
        if not self.child:
            return self
        out: list[Node] = []
        for node in self.child:
            if isinstance(node, Text):
                if node.data == "":
                    node.parent = None
                    continue
                if out and isinstance(out[-1], Text):
                    out[-1].merge(node)
                    node.parent = None
                    continue
            out.append(node)
        for i, node in enumerate(out):
            node.index = i
        self.child = out
        return self

    # -- queries ---------------------------------------------------------
    def iter(self):
        """Pre-order DFS over the subtree (self included)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            if node.child:
                stack.extend(reversed(node.child))

    def get_nodes_by_name(self, name: str) -> list["Node"]:
        """Reference: ``node.py:575-604``."""
        return [n for n in self.iter() if n.name == name]


class CharacterData(Node):
    """Leaf node holding character data (``elements.py:17-40``)."""

    __slots__ = ("data",)

    def __init__(self, data: str = "") -> None:
        super().__init__()
        self.data: str = data


class Text(CharacterData):
    """``#text`` leaf (``elements.py:43-55``) with span-run tracking."""

    __slots__ = ("spans",)

    def __init__(self, data: str = "", span: tuple[int, int] | None = None):
        super().__init__(data)
        self.name = "#text"
        self.spans: list[tuple[int, int]] = []
        if span is not None:
            self.span = span
            self.spans.append(span)

    def append_data(self, data: str, span: tuple[int, int]) -> None:
        """Extend this run with more source text; contiguous spans
        coalesce (parser merges adjacent Text eagerly,
        ``parser.py:342-355``)."""
        self.data += data
        if self.spans and self.spans[-1][1] == span[0]:
            self.spans[-1] = (self.spans[-1][0], span[1])
        else:
            self.spans.append(span)
        # spans is non-empty here; its first start is the true span
        # start even when this Text was constructed without a span
        # (reading self.span[0] there returned a stale 0 — r4 review)
        self.span = (self.spans[0][0], span[1])

    def merge(self, other: "Text") -> None:
        self.data += other.data
        for sp in other.spans:
            if self.spans and self.spans[-1][1] == sp[0]:
                self.spans[-1] = (self.spans[-1][0], sp[1])
            else:
                self.spans.append(sp)
        if self.spans:
            self.span = (self.spans[0][0], self.spans[-1][1])

    def clone_node(self) -> "Text":
        c = Text(self.data)
        c.span = self.span
        c.spans = list(self.spans)
        return c


class ProcessingInstruction(CharacterData):
    """``<?target data?>`` (``elements.py:58-81``)."""

    __slots__ = ()

    def __init__(self, target: str = "?", data: str = "") -> None:
        super().__init__(data)
        self.name = target

    def clone_node(self) -> "ProcessingInstruction":
        c = ProcessingInstruction(self.name, self.data)
        c.span = self.span
        return c


class Comment(CharacterData):
    """``<!-- ... -->`` (``elements.py:84-110``)."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__(data)
        self.name = "#comment"

    def clone_node(self) -> "Comment":
        c = Comment(self.data)
        c.span = self.span
        return c


class CData(CharacterData):
    """``<![CDATA[ ... ]]>`` (``elements.py:113-130``)."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__(data)
        self.name = "#cdata-section"

    def clone_node(self) -> "CData":
        c = CData(self.data)
        c.span = self.span
        return c


class Entity(CharacterData):
    """Special token (``&amp;``); ``data`` holds the *decoded* text,
    ``span`` the source range of the entity (``elements.py:133-161``).
    Keeping the decode separate from Text preserves the invariant that
    a Text run's data equals its source substring."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__(data)
        self.name = "#entity"

    def clone_node(self) -> "Entity":
        c = Entity(self.data)
        c.span = self.span
        return c


class DocumentType(CharacterData):
    """Doctype payload (``elements.py:164-186``)."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__(data)
        self.name = "#doctype"

    def clone_node(self) -> "DocumentType":
        c = DocumentType(self.data)
        c.span = self.span
        return c


class Element(Node):
    """Named node with children and ordered attributes
    (``elements.py:189-481``)."""

    __slots__ = ("attrs", "attr_order")

    def __init__(self, name: str, data: dict | None = None) -> None:
        super().__init__()
        self.name = name
        self.child = []
        self.attrs: dict[str, str] = {}
        self.attr_order: list[str] = []
        if data:
            for k, v in data.items():
                self[k] = v

    def __contains__(self, key: str) -> bool:
        return key in self.attrs

    def __getitem__(self, key):
        """String key → attribute (reference ``elements.py:231-271``);
        int/slice → child access (reference Node indexing)."""
        if isinstance(key, str):
            return self.attrs[key]
        assert self.child is not None
        return self.child[key]

    def __setitem__(self, key, val) -> None:
        if not isinstance(key, str):
            raise TypeError("child assignment goes through insert_before")
        if key not in self.attrs:
            self.attr_order.append(key)
        self.attrs[key] = val

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.attrs.get(key, default)

    def items(self):
        return [(k, self.attrs[k]) for k in self.attr_order]

    def class_list(self) -> list[str]:
        """Whitespace-split ``class`` attribute (``elements.py:403``)."""
        return self.attrs.get("class", "").split()

    def clone_node(self, deep: bool = False) -> "Element":
        """Shallow (or deep) clone (``elements.py:353-395``)."""
        c = self.__class__(self.name)
        c.attrs = dict(self.attrs)
        c.attr_order = list(self.attr_order)
        c.span = self.span
        if deep and self.child:
            for ch in self.child:
                c.append_child(
                    ch.clone_node(True) if isinstance(ch, Element) else ch.clone_node()
                )
        return c

    def get_elements_by_class_name(self, classes: str) -> list["Element"]:
        """Reference: ``elements.py:397-429``."""
        want = set(classes.split())
        return [
            n
            for n in self.iter()
            if isinstance(n, Element) and want.issubset(n.class_list())
        ]


class RawText(Element):
    """Element with raw character data and no children — ``<script>``,
    ``<style>`` bodies (``elements.py:484-498``)."""

    __slots__ = ("data",)

    def __init__(self, name: str, data: str = "") -> None:
        super().__init__(name)
        self.child = None
        self.data = data

    def clone_node(self, deep: bool = False) -> "RawText":
        c = RawText(self.name, self.data)
        c.attrs = dict(self.attrs)
        c.attr_order = list(self.attr_order)
        c.span = self.span
        return c


class Void(Element):
    """Childless element — ``<br>``, ``<img>`` (``elements.py:501-512``)."""

    __slots__ = ()

    def __init__(self, name: str, data: dict | None = None) -> None:
        super().__init__(name, data)
        self.child = None

    def clone_node(self, deep: bool = False) -> "Void":
        c = Void(self.name)
        c.attrs = dict(self.attrs)
        c.attr_order = list(self.attr_order)
        c.span = self.span
        return c


class Document(Element):
    """Root element (``elements.py:515-590``). ``meta`` is the open
    per-document dict; ``lang``/``style`` name the dialect."""

    __slots__ = ("lang", "style", "uri", "meta")

    def __init__(self, lang: str = "html", style: str = "default") -> None:
        super().__init__("#document")
        self.lang = lang
        self.style = style
        self.uri: str | None = None
        self.meta: dict = {}

    def clone_node(self, deep: bool = False) -> "Document":
        c = Document(self.lang, self.style)
        c.uri = self.uri
        c.meta = dict(self.meta)
        c.span = self.span
        if deep and self.child:
            for ch in self.child:
                c.append_child(
                    ch.clone_node(True) if isinstance(ch, Element) else ch.clone_node()
                )
        return c

    def get_element_by_id(self, idval: str):
        """O(n) DFS id lookup; the reference maintains an incremental
        ``id_dict`` (``elements.py:587-590``) which is unnecessary for
        per-row documents."""
        for n in self.iter():
            if isinstance(n, Element) and n.attrs.get("id") == idval:
                return n
        return None


class DocumentFragment(Document):
    """Temporary container (``elements.py:593-627``)."""

    __slots__ = ()

    def __init__(self, lang: str = "html", style: str = "default") -> None:
        super().__init__(lang, style)
        self.name = "#document-fragment"
