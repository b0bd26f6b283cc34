"""Markdown-source dialect: md → HTML via the default writer and
md → text via extraction — the third grammar through the same engine."""

from lexor_ray.dialects.markdown_src import md_to_html
from lexor_ray.extract import Extractor

HTML_GOLDEN = [
    ("# Title", "<h1>Title</h1>"),
    ("### Deep", "<h3>Deep</h3>"),
    ("a **b** c", "a <strong>b</strong> c"),
    ("a *i* c", "a <em>i</em> c"),
    ("x `code` y", "x <code>code</code> y"),
    ("- one\n- two", "<li>one</li><li>two</li>"),
    ("1. first\n2. second", "<li>first</li><li>second</li>"),
    ("> quote", "<blockquote>quote</blockquote>"),
    ("[t](u)", '<a href="u">t</a>'),
    ("![a](s)", '<img src="s" alt="a"></img>'),
    ("```\nraw < & >\n```", "<pre>raw < & >\n</pre>"),
    ("plain only", "plain only"),
    ("*unclosed", "<em>unclosed</em>"),  # E100-style at EOF, still serialized
]


def test_md_to_html_golden():
    failures = []
    for src, want in HTML_GOLDEN:
        got = md_to_html(src)
        if got != want:
            failures.append((src, want, got))
    assert not failures, failures


def test_md_text_extraction():
    ex = Extractor("markdown-text")
    r = ex.extract_one("# Head\nBody **strong** text\n```\ncode\n```\ntail")
    assert r["extracted_text"] == "HeadBody strong text\n\ntail"
    # spans point into the markdown source
    src = "# Head\nBody **strong** text\n```\ncode\n```\ntail"
    for s, e in r["spans"]:
        assert src[s:e] in r["extracted_text"] or src[s:e].strip() == ""


def test_md_line_constructs_only_at_line_start():
    assert md_to_html("a - b") == "a - b"
    assert md_to_html("a # b") == "a # b"
    assert md_to_html("5. roll") == "<li>roll</li>"


def test_md_fast_path_respects_candidate_class():
    """Regression: the identity fast path must interpret the dialect's
    candidate class as a REGEX class ('0-9' is a range, '\\n' an
    escape), not a literal char set — '1. first' contains a candidate
    ('1') and must be parsed, not passed through."""
    ex = Extractor("markdown-text")
    assert ex.extract_one("1. first")["extracted_text"] == "first"
    assert ex.extract_one("5. roll")["extracted_text"] == "roll"
    assert ex.extract_one("plain words")["extracted_text"] == "plain words"


def test_md_unclosed_fence_logs_e100():
    ex = Extractor("markdown-text")
    r = ex.extract_one("```\nnever closed")
    assert any(rec["code"] == "E100" for rec in r["log"])
