"""Minimal LaTeX dialect — the second grammar of the plugin contract.

The reference's engine is language-agnostic: its own conformance
examples include LaTeX (``lexor/core/parser.py:424-432``: ``Okay:
\\begin{node}\\end{node}`` / ``E100: \\begin{node}``). This dialect
implements enough LaTeX to replay those examples and extract clean
text at scale:

- environments ``\\begin{name} ... \\end{name}`` → Element(name) with
  the engine's close()/auto-close machinery
- commands ``\\name[opt]{...}`` → OPEN Element closed at the matching
  ``}`` by the engine, so nested commands/groups nest through the
  open-node stack; bare commands are Void-like; bare ``{...}`` groups
  keep brace nesting correct
- ``%`` line comments → Comment (dropped on extraction)
- inline/display math ``$...$`` / ``$$...$$`` → RawText('#math')
  (dropped on extraction)

Text extraction drops comments, math and preamble-ish commands
(``\\usepackage``, ``\\documentclass``...), keeping body text.
"""

from __future__ import annotations

import re

from ..core.dom import Comment, Element, Entity, RawText, Void
from ..core.parser import NodeParser
from .registry import ConvertRule, Dialect, register_dialect

_BEGIN = re.compile(r"\\begin\{([A-Za-z][A-Za-z0-9*]*)\}")
_END_CACHE: dict[str, re.Pattern] = {}
_CMD = re.compile(r"\\([A-Za-z]+)(\[[^\]]*\])?")


def _end_re(name: str) -> re.Pattern:
    pat = _END_CACHE.get(name)
    if pat is None:
        pat = re.compile(r"\\end\{%s\}" % re.escape(name))
        _END_CACHE[name] = pat
    return pat


class EnvParser(NodeParser):
    """``\\begin{name}`` opens an Element; ``close()`` fires at the
    matching ``\\end{name}`` — the reference's LaTeX example shape."""

    def make_node(self):
        p = self.parser
        m = _BEGIN.match(p.text, p.caret)
        if m is None:
            return None
        node = Element(m.group(1))
        node.span = (p.caret, m.end())
        node.pos = p.copy_pos()
        p.update(m.end())
        return node

    def close(self, node):
        p = self.parser
        m = _end_re(node.name).match(p.text, p.caret)
        if m is None:
            return None
        pos = p.copy_pos()
        p.update(m.end())
        return pos


class CommandParser(NodeParser):
    """``\\name[opt]{`` opens an Element whose children are parsed by
    the ENGINE until the matching ``}`` (nested commands/groups nest
    through the open-node stack, exactly like HTML elements); bare
    ``\\name`` is a Void."""

    def make_node(self):
        p = self.parser
        m = _CMD.match(p.text, p.caret)
        if m is None:
            return None
        name = "\\" + m.group(1)
        pos = p.copy_pos()
        i = m.end()
        if i < p.end and p.text[i] == "{":
            node = Element(name)
            node.span = (p.caret, i + 1)
            node.pos = pos
            p.update(i + 1)
            return node  # open — close() fires at the matching '}'
        node = Void(name)
        node.span = (p.caret, i)
        node.pos = pos
        p.update(i)
        return node

    def close(self, node):
        p = self.parser
        if p.caret < p.end and p.text[p.caret] == "}":
            pos = p.copy_pos()
            p.update(p.caret + 1)
            return pos
        return None


class GroupParser(NodeParser):
    """Bare ``{ ... }`` group — keeps brace nesting correct through
    the same stack machinery."""

    def make_node(self):
        p = self.parser
        if p.text[p.caret] != "{":
            return None
        node = Element("#group")
        node.span = (p.caret, p.caret + 1)
        node.pos = p.copy_pos()
        p.update(p.caret + 1)
        return node

    def close(self, node):
        p = self.parser
        if p.caret < p.end and p.text[p.caret] == "}":
            pos = p.copy_pos()
            p.update(p.caret + 1)
            return pos
        return None


#: single-char escapes: ``\%`` etc. yield the literal character
_TEX_ESCAPES = "%$&#_{}"


class EscapeParser(NodeParser):
    """``\\%`` and the other single-char escapes — an Entity holding
    the literal character with the span of the two-char source escape
    (r5 review: ``\\%`` previously leaked the backslash as text and
    the ``%`` swallowed the rest of the line as a comment; ``\\{``
    similarly opened a spurious group)."""

    def make_node(self):
        p = self.parser
        if (
            p.text[p.caret] != "\\"
            or p.caret + 1 >= p.end
            or p.text[p.caret + 1] not in _TEX_ESCAPES
        ):
            return None
        node = Entity(p.text[p.caret + 1])
        node.span = (p.caret, p.caret + 2)
        node.pos = p.copy_pos()
        p.update(p.caret + 2)
        return node


class TexCommentParser(NodeParser):
    """``%`` to end of line."""

    def make_node(self):
        p = self.parser
        if p.text[p.caret] != "%":
            return None
        pos = p.copy_pos()
        k = p.text.find("\n", p.caret)
        endpos = p.end if k == -1 else k
        node = Comment(p.text[p.caret + 1 : endpos])
        node.span = (p.caret, endpos)
        node.pos = pos
        p.update(endpos)
        return node


class MathParser(NodeParser):
    """``$...$`` / ``$$...$$`` as raw math (dropped on extraction)."""

    def make_node(self):
        p = self.parser
        text, caret = p.text, p.caret
        if text[caret] != "$":
            return None
        pos = p.copy_pos()
        display = text.startswith("$$", caret)
        delim = "$$" if display else "$"
        k = text.find(delim, caret + len(delim))
        if k == -1:
            self.msg("E100", pos, ["#math"])
            data_end = consume_to = p.end
        else:
            data_end, consume_to = k, k + len(delim)
        node = RawText("#math", text[caret + len(delim) : data_end])
        node.span = (caret, consume_to)
        node.pos = pos
        p.update(consume_to)
        return node


#: preamble/control commands whose argument text is not content
_DROP_COMMANDS = (
    "\\documentclass \\usepackage \\input \\include \\label \\ref \\cite "
    "\\bibliography \\bibliographystyle \\pagestyle \\newcommand"
).split()

_TEX_CONVERTERS: dict[str, ConvertRule] = {"__default__": ConvertRule()}
_TEX_CONVERTERS["#comment"] = ConvertRule(copy=False)
_TEX_CONVERTERS["#math"] = ConvertRule(copy=False)
for _c in _DROP_COMMANDS:
    _TEX_CONVERTERS[_c] = ConvertRule(copy=False)

LATEX_TEXT = register_dialect(
    Dialect(
        name="latex-text",
        lang="latex",
        # candidate class: backslash (regex-escaped), %, $, braces.
        # '}' must be a candidate so the close-poll sees it before a
        # text run swallows it — the same reason the reference's
        # MAPPING classes include close characters.
        parser_mapping={
            "__default__": (
                r"\\%${}",
                [
                    EnvParser,
                    EscapeParser,
                    CommandParser,
                    GroupParser,
                    TexCommentParser,
                    MathParser,
                ],
            )
        },
        converters=_TEX_CONVERTERS,
        # closes fire at '}' AND at '\end{' — no common prefix, so the
        # shortcut stays off (close_prefix=None default): this dialect
        # exercises the reference's poll-every-iteration path.
    )
)
