"""The reference's own 'lexor' markup — the fourth grammar.

The reference's embedded conformance corpus (``lexor/core/parser.py:
417-451``) shows three languages: HTML, LaTeX, and lexor's own
``%%{node}%%`` form (``Okay: %%{node}%%`` / ``E100: %%{node}``). This
micro-dialect implements that construct so that EVERY example in the
reference's embedded corpus is replayed through this engine
(tests/test_lexor_lang.py): ``%%{name}`` opens a node, ``%%`` closes
the innermost open node, unclosed nodes log E100 at EOF.
"""

from __future__ import annotations

import re

from ..core.dom import Element
from ..core.parser import NodeParser
from .registry import ConvertRule, Dialect, register_dialect

_OPEN = re.compile(r"%%\{([A-Za-z][A-Za-z0-9_-]*)\}")


class LexorNodeParser(NodeParser):
    """``%%{name}`` opens; the bare ``%%`` closing token is consumed
    by ``close()`` — engine stack semantics give W100 cascades for
    free if an outer node's close arrives first (not possible in this
    single-close-token grammar, but the machinery is shared)."""

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
        # the close token is %% NOT followed by '{' (which would be a
        # new open)
        if p.text.startswith("%%", p.caret) and not _OPEN.match(p.text, p.caret):
            pos = p.copy_pos()
            p.update(p.caret + 2)
            return pos
        return None


LEXOR_TEXT = register_dialect(
    Dialect(
        name="lexor-text",
        lang="lexor",
        parser_mapping={"__default__": ("%", [LexorNodeParser])},
        converters={"__default__": ConvertRule()},
        close_prefix="%%",
    )
)
