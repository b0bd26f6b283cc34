"""Writer engine (XML default + wrap) , markdown style, selector subset."""

from lexor_ray.core.parser import Parser
from lexor_ray.core.selector import matches, remove_matching, select
from lexor_ray.core.writer import Writer, find_whitespace, replace
from lexor_ray.dialects.markdown import to_markdown
from lexor_ray.dialects.registry import get_dialect


def parse(text):
    return Parser(get_dialect("html")).parse(text)


def test_replace_one_pass():
    """The reference's doctest (writer.py:30-39)."""
    assert (
        replace("a < b && b < c", ("<", "&lt;"), ("&", "&amp;"))
        == "a &lt; b &amp;&amp; b &lt; c"
    )


def test_find_whitespace():
    assert find_whitespace("ab cd ef", 0, 4) == 2
    assert find_whitespace("abcdef", 0, 3) == 6


def test_default_writer_roundtrips_xmlish():
    doc = parse('<div class="x"><p>hi</p><br></div>')
    out = Writer().write(doc)
    assert out == '<div class="x"><p>hi</p><br></br></div>'


def test_wrap_engine():
    w = Writer()
    w._file.__init__()
    w.pos = [1, 1]
    w.prev_str = "\n"
    w._buffer = ""
    w._break_hint = []
    w._indent = ""
    w._indent_empty = False
    w.width = 20
    w._raw = False
    w._wrap = True
    w.write_str("aaa bbb ccc ddd eee fff ggg hhh")
    w.flush_buffer()
    out = w._file.getvalue()
    assert all(len(line) <= 20 for line in out.split("\n"))
    assert out.replace("\n", " ") == "aaa bbb ccc ddd eee fff ggg hhh"


MD_GOLDEN = [
    ("<h2>T</h2>", "## T"),
    ("<p>a <b>b</b> <i>c</i></p>", "a **b** *c*"),
    ('<a href="u">t</a>', "[t](u)"),
    ('<img src="s" alt="a">', "![a](s)"),
    ("<ul><li>x</li><li>y</li></ul>", "- x\n- y"),
    ("<ol><li>x</li><li>y</li></ol>", "1. x\n2. y"),
    ("<blockquote>q</blockquote>", "> q"),
    ("<pre>a\n b</pre>", "```\na\n b\n```"),
    ("<p>x &amp; y</p>", "x & y"),
    ("<script>drop</script><p>keep</p>", "keep"),
]


def test_markdown_golden():
    failures = []
    for src, want in MD_GOLDEN:
        got = to_markdown(src)
        if got != want:
            failures.append((src, want, got))
    assert not failures, failures


def test_selector_quick_paths():
    doc = parse(
        '<div id="main" class="a b"><p class="a">x</p>'
        '<span data-x="1">y</span><p>z</p></div>'
    )
    assert [n.name for n in select(doc, "#main")] == ["div"]
    assert [n.name for n in select(doc, ".a")] == ["div", "p"]
    assert [n.name for n in select(doc, "p")] == ["p", "p"]
    assert [n.name for n in select(doc, "p.a")] == ["p"]
    assert [n.name for n in select(doc, "[data-x]")] == ["span"]
    assert [n.name for n in select(doc, "[data-x=1]")] == ["span"]
    assert [n.name for n in select(doc, "p.a, span")] == ["p", "span"]
    assert not matches(doc.child[0], "#other")


def test_remove_matching_drops_subtree():
    doc = parse("<div><nav><a>m</a></nav><p>keep</p></div>")
    n = remove_matching(doc, "nav")
    assert n == 1
    from lexor_ray.extract import TextSpanWriter

    text, _ = TextSpanWriter.write(doc)
    assert text == "keep"


def test_scaffold_style_generates_working_dialect(tmp_path):
    """The `--scaffold` skeleton (reference `lexor paste` semantics)
    loads, registers, parses its own grammar, and its MSG examples
    conform."""
    from lexor_ray.__main__ import convert_one, scaffold_style
    from lexor_ray.dialects.registry import load_style_file
    from lexor_ray.testing import assert_msg_examples

    style, test = scaffold_style("demo_style", str(tmp_path))
    dialects = load_style_file(style)
    assert dialects[0].name == "demo_style-text"
    out = convert_one("@{b}hello@@ world", to="text", lang="demo_style")
    assert "hello" in out and "world" in out
    assert_msg_examples("demo_style-text", open(style).read())
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        scaffold_style("demo_style", str(tmp_path))
