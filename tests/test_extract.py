"""Golden tests for the flagship extraction (text + spans).

Mirrors the reference's golden-output pattern
(``lexor/command/test.py:140-147`` ``compare_with`` /
``parse_convert_write``): snippet → expected extracted text, plus the
span invariants (non-entity spans are byte-exact source substrings)."""

import html

from lexor_ray.extract import extract_one


GOLDEN = [
    ("<p>Hello <b>world</b></p>", "Hello world"),
    ("plain text", "plain text"),
    ("<div><script>var x=1;</script>keep<style>.x{}</style></div>", "keep"),
    ("<head><title>t</title></head><body>body</body>", "body"),
    ("a &amp; b &lt;c&gt; &#65; &#x42;", "a & b <c> A B"),
    ("<!-- gone -->text<!-- gone -->", "text"),
    ("<!DOCTYPE html>x", "x"),
    ("<nav>menu</nav><p>content</p><footer>foot</footer>", "content"),
    ("<ul><li>a</li><li>b</li></ul>", "ab"),
    ("<p>unclosed", "unclosed"),
    ("<a><p>x</a>", "x"),
    ("<?python print 1 ?>y", "y"),
    ("<![CDATA[zap]]>w", "w"),
    ("</stray>ok", "ok"),
    ("<iframe>drop</iframe><template>drop</template>keep", "keep"),
    ("", ""),
    ("<br><img src=x.png>tail", "tail"),
    ("<P>UPPER</P>", "UPPER"),  # tag names case-folded
    ("<svg><circle r=1/>vector</svg>after", "after"),
]


def test_golden_extraction():
    failures = []
    for src, expected in GOLDEN:
        got = extract_one(src)["extracted_text"]
        if got != expected:
            failures.append((src, expected, got))
    assert not failures, failures


def test_span_invariants():
    """Every span is a valid source range; non-entity runs equal their
    source substring; total output = concatenation of runs."""
    for src, _ in GOLDEN:
        res = extract_one(src)
        out, spans = res["extracted_text"], res["spans"]
        pieces = []
        for s, e in spans:
            assert 0 <= s <= e <= len(src)
            piece = src[s:e]
            if piece.startswith("&"):
                piece = html.unescape(piece)
            pieces.append(piece)
        assert "".join(pieces) == out, (src, spans)


def test_spans_monotonic():
    res = extract_one("<p>a</p><div>b &amp; c</div>")
    spans = res["spans"]
    flat = [v for se in spans for v in se]
    assert flat == sorted(flat)


def test_entity_span_covers_source_entity():
    res = extract_one("x&amp;y")
    assert res["extracted_text"] == "x&y"
    assert res["spans"] == [(0, 1), (1, 6), (6, 7)]


def test_log_precedence_parser_before_converter():
    res = extract_one("<node>")
    assert res["log"][0]["code"] == "E100"


def test_class_based_boilerplate_drop():
    r = extract_one('<p>a</p><div class="ad wide">x</div><span class="banner">y</span>b')
    assert r["extracted_text"] == "ab"


def test_flat_scan_equals_converter_path_on_transcripts():
    """The production flat scanner must be byte-identical to the full
    Converter + TextSpanWriter path on random transcript documents
    (complements tests/test_fast_scan.py's adversarial corpus; this
    replaced the parity test for the removed _extract_fused third
    copy of the drop semantics)."""
    from lexor_ray.extract import Extractor, TextSpanWriter
    from lexor_ray.fast_scan import scan_extract
    from lexor_ray.transcripts import generate_transcripts

    ex = Extractor()
    assert ex._pure
    for t in generate_transcripts(300, seed=9).column("text").to_pylist():
        fused = scan_extract(
            t, ex._drop_names, ex.parser.dialect.drop_classes
        )[:2]
        full = TextSpanWriter.write(ex.converter.convert(ex.parser.parse(t)))
        assert fused == tuple(full), t[:120]


def test_fast_path_equals_parser_path():
    """Rows without markup chars take the identity fast path; verify it
    agrees with the full parse."""
    from lexor_ray.extract import Extractor

    ex = Extractor()
    src = "just words here"
    fast = ex.extract_one(src)
    doc = ex.parser.parse(src)
    slow_out = "".join(n.data for n in doc.iter() if n.name == "#text")
    assert fast["extracted_text"] == slow_out == src


def test_deep_nesting_converter_path_iterative():
    """~20k-deep nesting converts through the full Converter path
    without recursion (r4 review: recursion depth == DOM depth could
    overflow the C stack on pathological tool output)."""
    from lexor_ray.core.converter import Converter
    from lexor_ray.core.parser import Parser
    from lexor_ray.dialects.registry import get_dialect
    from lexor_ray.extract import TextSpanWriter

    d = get_dialect("html-text")
    depth = 20000
    doc = Parser(d).parse("<div>" * depth + "x" + "</div>" * depth)
    text, spans = TextSpanWriter.write(Converter(d).convert(doc))
    assert text == "x"
    assert spans == [(5 * depth, 5 * depth + 1)]


def test_unquoted_attr_value_keeps_trailing_slash():
    """HTML5 unquoted-attribute-value rule (r5 review): '/' is value
    data — the tag is NOT self-closing and the link text survives;
    explicit self-closing still works with a space before '/>'."""
    from lexor_ray.extract import Extractor

    e = Extractor("html-text")
    r = e.extract_one("<a href=http://x/>y</a>")
    assert r["extracted_text"] == "y"
    assert r["log"] == []  # no spurious W101 for the real </a>
    # spaced self-closing unchanged
    assert e.extract_one("<p a=1 />after")["extracted_text"] == "after"


def test_markdown_writer_unquoted_href_keeps_url():
    from lexor_ray.dialects.markdown import to_markdown

    got = to_markdown("<p>see <a href=http://example.com/>link</a></p>")
    assert got.strip() == "see [link](http://example.com/)"
