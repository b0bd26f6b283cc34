"""Tree mutation (§2.3), parse-string splice (P10), selection
mutation (Q5), structural predicates (Q6), lifecycle hooks (§2.9)."""

from lexor_ray.core.dom import Element, Text
from lexor_ray.core.fragments import (
    Selection,
    children_str,
    parse_fragment,
    set_children_str,
)
from lexor_ray.core.parser import Parser
from lexor_ray.dialects.registry import ConvertRule, Dialect, get_dialect


def parse(text):
    return Parser(get_dialect("html")).parse(text)


def text_of(node):
    from lexor_ray.extract import TextSpanWriter

    return TextSpanWriter.write(node)[0]


def test_insert_before_and_reindex():
    doc = parse("<div><p>b</p></div>")
    div = doc.get_nodes_by_name("div")[0]
    div.insert_before(0, Element("span"))
    assert [c.name for c in div.child] == ["span", "p"]
    assert [c.index for c in div.child] == [0, 1]


def test_extend_before_adopts_fragment():
    doc = parse("<div></div>")
    frag = parse("<b>x</b><i>y</i>")
    div = doc.get_nodes_by_name("div")[0]
    div.extend_before(0, frag)
    assert [c.name for c in div.child] == ["b", "i"]
    assert all(c.parent is div for c in div.child)


def test_append_after_prepend_before():
    doc = parse("<div><p>m</p></div>")
    p = doc.get_nodes_by_name("p")[0]
    p.append_after(Element("a"))
    p.prepend_before(Element("b"))
    assert [c.name for c in p.parent.child] == ["b", "p", "a"]


def test_slice_delete():
    doc = parse("<ul><li>1</li><li>2</li><li>3</li></ul>")
    ul = doc.get_nodes_by_name("ul")[0]
    del ul[0:2]
    assert [text_of(c) for c in ul.child] == ["3"]
    assert ul.child[0].index == 0


def test_structural_predicates():
    doc = parse("<div>t<p>a</p>u<span>b</span></div>")
    div = doc.get_nodes_by_name("div")[0]
    p = doc.get_nodes_by_name("p")[0]
    span = doc.get_nodes_by_name("span")[0]
    assert div.contains(p) and not p.contains(div)
    assert p.element_index == 0 and span.element_index == 1
    assert p.next_element is span
    assert span.previous_element is p


def test_children_str_roundtrip():
    doc = parse("<div><b>x</b>mid</div>")
    div = doc.get_nodes_by_name("div")[0]
    assert children_str(div) == "<b>x</b>mid"
    set_children_str(div, "<i>new</i>")
    assert [c.name for c in div.child] == ["i"]


def test_selection_mutation_clone_per_target():
    doc = parse('<div><p class="t">1</p><p class="t">2</p></div>')
    sel = Selection(doc, "p.t")
    assert len(sel) == 2
    sel.append("<b>!</b>")
    bolds = doc.get_nodes_by_name("b")
    assert len(bolds) == 2
    assert bolds[0] is not bolds[1]
    sel.before("<hr>")
    div = doc.get_nodes_by_name("div")[0]
    assert [c.name for c in div.child] == ["hr", "p", "hr", "p"]


def test_selection_find_and_remove():
    doc = parse("<div><nav><a>x</a></nav><p><a>y</a></p></div>")
    links = Selection(doc).find("a")
    assert len(links.nodes) == 2
    Selection(doc, "nav").remove()
    assert doc.get_nodes_by_name("nav") == []
    assert len(Selection(doc).find("a").nodes) == 1


def test_parse_fragment_detached():
    nodes = parse_fragment("<b>x</b>tail")
    assert [n.name for n in nodes] == ["b", "#text"]
    assert all(n.parent is None for n in nodes)


def test_lifecycle_hooks_fire_in_order():
    calls = []
    d = Dialect(
        name="hooked-html",
        lang="html",
        parser_mapping=get_dialect("html").parser_mapping,
        converters={"__default__": ConvertRule()},
        hooks={
            "parser_pre": lambda p: calls.append("parser_pre"),
            "parser_post": lambda p: calls.append("parser_post"),
            "convert_init": lambda c, doc: calls.append("convert_init"),
            "convert_done": lambda c, doc: calls.append("convert_done"),
            "writer_pre": lambda w, n: calls.append("writer_pre"),
            "writer_post": lambda w, n: calls.append("writer_post"),
        },
    )
    from lexor_ray.core.converter import Converter
    from lexor_ray.core.writer import Writer

    doc = Parser(d).parse("<p>x</p>")
    out = Converter(d).convert(doc)
    Writer(d).write(out)
    assert calls == [
        "parser_pre",
        "parser_post",
        "convert_init",
        "convert_done",
        "writer_pre",
        "writer_post",
    ]


def test_hooked_dialect_not_fused():
    from lexor_ray.dialects.registry import register_dialect
    from lexor_ray.extract import Extractor

    d = Dialect(
        name="hooked-html-2",
        lang="html",
        parser_mapping=get_dialect("html").parser_mapping,
        converters={"__default__": ConvertRule()},
        hooks={"convert_init": lambda c, doc: None},
    )
    register_dialect(d)
    assert not Extractor("hooked-html-2")._pure
    assert Extractor("html")._pure


def test_children_str_honors_dialect():
    """children_str serializes with the DIALECT's writers, symmetric
    with set_children_str (r4 review: the dialect argument used to be
    ignored, always emitting DefaultWriter XML tags)."""
    from lexor_ray.core.dom import Element

    el = Element("div")
    set_children_str(el, "<strong>x</strong> mid", "html-markdown")
    assert children_str(el, "html-markdown") == "**x** mid"
    assert children_str(el) == "<strong>x</strong> mid"  # html default


def test_identity_fast_path_gated_on_hooks():
    """A hook-bearing dialect must NOT take the markup-free identity
    shortcut — its convert_done hook applies to every row (r4
    review: the shortcut used to bypass hooks silently)."""
    from lexor_ray.dialects.registry import register_dialect
    from lexor_ray.extract import Extractor

    def upcase(conv, doc):
        for n in doc.iter():
            if n.name == "#text":
                n.data = n.data.upper()
        return doc

    base = get_dialect("html-text")
    register_dialect(
        Dialect(
            name="html-text-upcase",
            lang="html",
            parser_mapping=base.parser_mapping,
            converters=base.converters,
            drop_classes=base.drop_classes,
            close_prefix=base.close_prefix,
            hooks={"convert_done": upcase},
        )
    )
    ex = Extractor("html-text-upcase")
    assert not ex._identity_ok and not ex._pure
    assert ex.extract_one("plain text")["extracted_text"] == "PLAIN TEXT"
    # the hookless flagship dialect keeps the shortcut
    assert Extractor()._identity_ok
