"""Property-based fuzzing: the scanner/DOM equivalence and span
invariants must hold for ARBITRARY input, not just well-formed markup."""

from hypothesis import given, settings, strategies as st

from lexor_ray.dialects.html import BOILERPLATE_CLASSES, BOILERPLATE_ELEMENTS
from lexor_ray.extract import Extractor, TextSpanWriter
from lexor_ray.fast_scan import scan_extract

# markup-dense alphabet: high probability of hitting parser edges
_MARKUPY = st.text(
    alphabet='<>&/!?"=\' abc-;#[]{}\nxp*`%$\\',
    max_size=200,
)
_ANY = st.text(max_size=120)

_EX = Extractor("html-text")


def _dom(text: str):
    doc = _EX.parser.parse(text)
    plog = list(_EX.parser.log)
    out = _EX.converter.convert(doc)
    extracted, spans = TextSpanWriter.write(out)
    return extracted, spans, plog + list(_EX.converter.log)


@settings(max_examples=400, deadline=None)
@given(_MARKUPY)
def test_scanner_equals_dom_on_fuzz(text):
    got = scan_extract(
        text, frozenset(BOILERPLATE_ELEMENTS), BOILERPLATE_CLASSES
    )
    want = _dom(text)
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == want[2]


@settings(max_examples=300, deadline=None)
@given(_ANY)
def test_span_invariants_on_any_unicode(text):
    res = _EX.extract_one(text)
    prev = 0
    for s, e in res["spans"]:
        assert 0 <= s <= e <= len(text)
        assert s >= prev  # non-decreasing starts
        prev = s
    # total extracted length >= sum of non-entity span widths is not
    # guaranteed (entities shrink), but extraction must never exceed
    # the source plus decoded-entity slack; cheap sanity:
    assert len(res["extracted_text"]) <= len(text) + 8


@settings(max_examples=200, deadline=None)
@given(_MARKUPY)
def test_latex_parser_never_crashes(text):
    ex = Extractor("latex-text")
    res = ex.extract_one(text)
    assert isinstance(res["extracted_text"], str)


@settings(max_examples=200, deadline=None)
@given(_MARKUPY)
def test_markdown_parser_never_crashes(text):
    ex = Extractor("markdown-text")
    res = ex.extract_one(text)
    assert isinstance(res["extracted_text"], str)


# --------------------------------------------------------------------------
# markdown_src dialect fuzz (r4, verdict item 7): the md→html→text
# chain had no property coverage.

from lexor_ray.dialects.markdown_src import md_to_html

_WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_WORDS = st.lists(_WORD, min_size=1, max_size=5).map(" ".join)


@st.composite
def _md_block(draw):
    kind = draw(st.integers(0, 5))
    w = draw(_WORDS)
    if kind == 0:
        return "#" * draw(st.integers(1, 4)) + " " + w
    if kind == 1:
        return "\n".join(f"- {draw(_WORDS)}" for _ in range(draw(st.integers(1, 3))))
    if kind == 2:
        return "\n".join(
            f"{i + 1}. {draw(_WORDS)}" for i in range(draw(st.integers(1, 3)))
        )
    if kind == 3:
        return "> " + w
    if kind == 4:
        # inline code is EXCLUDED: markdown-text drops `code` content
        # (code is boilerplate for text extraction) while html-text
        # keeps <code> text — a documented policy divergence, not a
        # round-trip bug (see test_markdown_src goldens)
        deco = draw(st.sampled_from(["**", "*"]))
        return f"{deco}{w}{deco} " + draw(_WORDS)
    return f"[{w}](u{draw(st.integers(0, 9))}) " + draw(_WORDS)


_MD_DOC = st.lists(_md_block(), min_size=1, max_size=5).map("\n".join)


@settings(max_examples=300, deadline=None)
@given(_MD_DOC)
def test_md_roundtrip_through_html(md):
    """Structured markdown must extract IDENTICAL text along both
    paths: md → text directly, and md → html (md_to_html) → text via
    the html dialect. This is the property that makes the
    generation-time markdown golden composable."""
    direct = Extractor("markdown-text").extract_one(md)["extracted_text"]
    via_html = Extractor("html-text").extract_one(md_to_html(md))[
        "extracted_text"
    ]
    assert direct == via_html


@settings(max_examples=300, deadline=None)
@given(_MARKUPY)
def test_md_to_html_never_crashes_and_reparses(text):
    """Adversarial input: md_to_html must always serialize, and its
    output must always be accepted by the html parser (the two
    dialects share the engine, so a malformed emission would surface
    as a downstream parse crash)."""
    html = md_to_html(text)
    assert isinstance(html, str)
    res = Extractor("html-text").extract_one(html)
    assert isinstance(res["extracted_text"], str)


@settings(max_examples=200, deadline=None)
@given(_ANY)
def test_md_span_invariants_on_any_unicode(text):
    """The markdown extractor's spans obey the same source-offset
    invariants the html extractor's do."""
    res = Extractor("markdown-text").extract_one(text)
    prev = 0
    for s, e in res["spans"]:
        assert 0 <= s <= e <= len(text)
        assert s >= prev
        prev = s
