"""Property test: the flat scanner is byte-identical to the full
parse → convert → write path — text, spans, AND log records."""

from lexor_ray.dialects.html import BOILERPLATE_CLASSES, BOILERPLATE_ELEMENTS
from lexor_ray.extract import Extractor, TextSpanWriter
from lexor_ray.fast_scan import scan_extract
from lexor_ray.transcripts import generate_transcripts


def dom_reference(ex: Extractor, text: str):
    """The slow oracle: full parse + converter + writer, with logs."""
    ex.parser.rule_hits = {}
    doc = ex.parser.parse(text)
    plog = list(ex.parser.log)
    out = ex.converter.convert(doc)
    extracted, spans = TextSpanWriter.write(out)
    return extracted, spans, plog + list(ex.converter.log), dict(ex.parser.rule_hits)


def scan(text: str):
    hits: dict = {}
    extracted, spans, log = scan_extract(
        text, frozenset(BOILERPLATE_ELEMENTS), BOILERPLATE_CLASSES, rule_hits=hits
    )
    return extracted, spans, log, hits


EDGE_CASES = [
    "",
    "plain",
    "a < b & c",
    "<",
    "</",
    "<!",
    "<?",
    "&",
    "&amp",
    "&amp;",
    "x&amp;y&lt;z",
    "&amp;&lt;",
    "<p>a</p>",
    "<p>a",
    "<a><b><c>x</a>",
    "</stray>ok",
    "<br><img src=x>",
    "<div/>after",
    "<script>if(a<b)</script>tail",
    "<script>unterminated",
    "<style>.x{}</style><textarea>raw</textarea>k",
    "<!-- c -->t<!-- unterminated",
    "<!DOCTYPE html><p>x</p>",
    "<!doctype",
    "<![CDATA[z]]>w",
    "<![CDATA[open",
    "<?pi d ?>v",
    "<?pi open",
    "<?3 notpi",
    "<!3 bang",
    '<div class="ad">x</div>keep',
    '<div class="wide ad">x<div>deep</div></div>keep',
    '<p a=1 b="2" c=\'3\' checked>t</p>',
    "<p a=>t</p>",
    "<p a",
    '<p a="unterminated quote>t',
    "<p/>x<p />y",
    "<nav><p>inside</nav>after",
    "<div><nav>m</nav>c</div>",
    "<a href=http://x/>y</a>",
    "<UL><LI>one<LI>two</UL>",
    "deep" + "<div>" * 60 + "x" + "</div>" * 60,
    "<p>a\nb\nc</p>\n<node>",
    "<em>x</em></em>",
    "<div><p>a<p>b</div>",
    "< p>not a tag</ p>",
    "<p class=ad>dropcls</p>z",
    '<p class="keep" class="ad">x</p>tail',  # duplicate attr: last wins
    '<p class="ad" class="keep">x</p>tail',
    "text<pre>kept  raw</pre>more",
]


def _compare(text: str, ex: Extractor):
    want = dom_reference(ex, text)
    got = scan(text)
    assert got[0] == want[0], (text[:120], got[0], want[0])
    assert got[1] == want[1], (text[:120], got[1], want[1])
    assert got[2] == want[2], (text[:120], got[2], want[2])
    assert got[3] == want[3], (text[:120], got[3], want[3])


def test_edge_cases_match_dom():
    ex = Extractor("html-text")
    for case in EDGE_CASES:
        _compare(case, ex)


def test_random_corpus_matches_dom():
    ex = Extractor("html-text")
    texts = generate_transcripts(2000, seed=77).column("text").to_pylist()
    for t in texts:
        _compare(t, ex)


def test_extractor_uses_scanner_and_counts_hits():
    ex = Extractor("html-text")
    ex.parser.rule_hits = {}
    res = ex.extract_one("<p>a &amp; b</p><!-- c -->")
    assert res["extracted_text"] == "a & b"
    assert ex.parser.rule_hits["ElementParser"] == 1
    assert ex.parser.rule_hits["EntityParser"] == 1
    assert ex.parser.rule_hits["CommentParser"] == 1
