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
