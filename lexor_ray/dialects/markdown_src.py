"""Markdown SOURCE dialect: parse markdown into the DOM.

The reference's default language aliases map ``.md`` to a markdown
parser style (``lexor/command/lang.py:24-37``); the style itself was
an external plugin. This dialect implements a lean CommonMark-ish
subset through the same engine: ATX headings, blockquote lines, list
items, fenced code blocks, inline code/strong/emphasis, links and
images. Node names are HTML element names, so the stock
``DefaultWriter`` serializes a parsed markdown document straight to
HTML (md → html), and the text-extraction converter produces clean
text (md → text) — completing the reference's conversion matrix with
a third grammar.

Deliberately out of scope (documented, like the reference's
unfinished selector paths): setext headings, nested lists, tables,
reference-style links, HTML blocks inside markdown.
"""

from __future__ import annotations

import re

from ..core.dom import Element, RawText, Text, Void
from ..core.parser import NodeParser
from .registry import ConvertRule, Dialect, register_dialect

_HEADING = re.compile(r"(#{1,6}) ")
_OL_ITEM = re.compile(r"[0-9]+\. ")
_LINK = re.compile(r"\[([^\]\n]*)\]\(([^)\n]*)\)")
_IMAGE = re.compile(r"!\[([^\]\n]*)\]\(([^)\n]*)\)")
_FENCE = re.compile(r"```[^\n]*\n")


def _at_line_start(p) -> bool:
    return p.caret == 0 or p.text[p.caret - 1] == "\n"


class _LineElement(NodeParser):
    """Shared behavior: an element opened at line start that closes at
    (and consumes) the end-of-line newline."""

    def close(self, node):
        p = self.parser
        if p.caret < p.end and p.text[p.caret] == "\n":
            pos = p.copy_pos()
            p.update(p.caret + 1)
            return pos
        return None


class HeadingParser(_LineElement):
    """``# `` .. ``###### `` at line start → h1..h6."""

    def make_node(self):
        p = self.parser
        if not _at_line_start(p):
            return None
        m = _HEADING.match(p.text, p.caret)
        if m is None:
            return None
        node = Element(f"h{len(m.group(1))}")
        node.span = (p.caret, m.end())
        node.pos = p.copy_pos()
        p.update(m.end())
        return node


class BlockquoteParser(_LineElement):
    def make_node(self):
        p = self.parser
        if not _at_line_start(p) or not p.text.startswith("> ", p.caret):
            return None
        node = Element("blockquote")
        node.span = (p.caret, p.caret + 2)
        node.pos = p.copy_pos()
        p.update(p.caret + 2)
        return node


class ListItemParser(_LineElement):
    """``- `` / ``* `` / ``1. `` at line start → li (flat — nesting is
    out of scope)."""

    def make_node(self):
        p = self.parser
        if not _at_line_start(p):
            return None
        text, caret = p.text, p.caret
        if text.startswith("- ", caret) or text.startswith("* ", caret):
            consumed = caret + 2
        else:
            m = _OL_ITEM.match(text, caret)
            if m is None:
                return None
            consumed = m.end()
        node = Element("li")
        node.span = (caret, consumed)
        node.pos = p.copy_pos()
        p.update(consumed)
        return node


class FencedCodeParser(NodeParser):
    """\\`\\`\\`lang fenced block → RawText('pre') (complete)."""

    def make_node(self):
        p = self.parser
        if not _at_line_start(p):
            return None
        m = _FENCE.match(p.text, p.caret)
        if m is None:
            return None
        pos = p.copy_pos()
        k = p.text.find("```", m.end())
        if k == -1:
            self.msg("E100", pos, ["pre"])
            data_end = consume_to = p.end
        else:
            data_end = k
            consume_to = k + 3
        node = RawText("pre", p.text[m.end() : data_end])
        node.span = (p.caret, consume_to)
        node.pos = pos
        p.update(consume_to)
        return node


class CodeSpanParser(NodeParser):
    """Inline `` `code` `` → RawText('code') (complete)."""

    def make_node(self):
        p = self.parser
        text, caret = p.text, p.caret
        if text[caret] != "`" or text.startswith("```", caret):
            return None
        k = text.find("`", caret + 1)
        nl = text.find("\n", caret + 1)
        if k == -1 or (nl != -1 and nl < k):
            return None  # unclosed on this line → literal backtick text
        node = RawText("code", text[caret + 1 : k])
        node.span = (caret, k + 1)
        node.pos = p.copy_pos()
        p.update(k + 1)
        return node


class StrongParser(NodeParser):
    """``**strong**`` — open at ``**``, closed by the engine at the
    next ``**``."""

    def make_node(self):
        p = self.parser
        if not p.text.startswith("**", p.caret):
            return None
        node = Element("strong")
        node.span = (p.caret, p.caret + 2)
        node.pos = p.copy_pos()
        p.update(p.caret + 2)
        return node

    def close(self, node):
        p = self.parser
        if p.text.startswith("**", p.caret):
            pos = p.copy_pos()
            p.update(p.caret + 2)
            return pos
        return None


class EmphParser(NodeParser):
    """``*em*`` (single asterisk; ``**`` is handled by StrongParser,
    which runs first)."""

    def make_node(self):
        p = self.parser
        text, caret = p.text, p.caret
        if text[caret] != "*" or text.startswith("**", caret):
            return None
        node = Element("em")
        node.span = (caret, caret + 1)
        node.pos = p.copy_pos()
        p.update(caret + 1)
        return node

    def close(self, node):
        p = self.parser
        if (
            p.caret < p.end
            and p.text[p.caret] == "*"
            and not p.text.startswith("**", p.caret)
        ):
            pos = p.copy_pos()
            p.update(p.caret + 1)
            return pos
        return None


class ImageParser(NodeParser):
    """``![alt](src)`` → Void('img')."""

    def make_node(self):
        p = self.parser
        m = _IMAGE.match(p.text, p.caret)
        if m is None:
            return None
        node = Void("img")
        node["src"] = m.group(2)
        node["alt"] = m.group(1)
        node.span = (p.caret, m.end())
        node.pos = p.copy_pos()
        p.update(m.end())
        return node


class LinkParser(NodeParser):
    """``[text](url)`` → Element('a', href) with a Text child
    (complete; inline markup inside link text is out of scope)."""

    def make_node(self):
        p = self.parser
        m = _LINK.match(p.text, p.caret)
        if m is None:
            return None
        node = Element("a")
        node["href"] = m.group(2)
        if m.group(1):
            node.append_child(Text(m.group(1), (m.start(1), m.end(1))))
        node.span = (p.caret, m.end())
        node.pos = p.copy_pos()
        p.update(m.end())
        return [node]


_MD_SRC_PARSERS = (
    r"\n#>*\-`\[!0-9",
    [
        HeadingParser,
        BlockquoteParser,
        ListItemParser,
        FencedCodeParser,
        CodeSpanParser,
        StrongParser,
        EmphParser,
        ImageParser,
        LinkParser,
    ],
)

#: parse-only dialect; DefaultWriter serializes it as HTML
MARKDOWN_SRC = register_dialect(
    Dialect(
        name="markdown",
        lang="markdown",
        parser_mapping={"__default__": _MD_SRC_PARSERS},
        converters={"__default__": ConvertRule()},
    )
)

#: extraction: clean text from markdown (code blocks/spans are code,
#: not content — RawText is never emitted by the text writer anyway)
MARKDOWN_TEXT = register_dialect(
    Dialect(
        name="markdown-text",
        lang="markdown",
        parser_mapping={"__default__": _MD_SRC_PARSERS},
        converters={"__default__": ConvertRule()},
    )
)


def md_to_html(text: str) -> str:
    """markdown → HTML via parse + the stock XML-ish writer."""
    from ..core.parser import Parser
    from ..core.writer import Writer

    doc = Parser(MARKDOWN_SRC).parse(text)
    return Writer(MARKDOWN_SRC).write(doc)
