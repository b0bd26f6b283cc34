"""The reference's complete embedded conformance corpus
(lexor/core/parser.py:417-451), replayed: all three languages."""

from lexor_ray.extract import Extractor


def codes(res):
    return [r["code"] for r in res["log"]]


def test_reference_corpus_all_three_languages():
    html = Extractor("html-text")
    latex = Extractor("latex-text")
    lex = Extractor("lexor-text")
    # parser.py:426-428 Okay examples
    assert codes(html.extract_one("<node></node>")) == []
    assert codes(latex.extract_one(r"\begin{node}\end{node}")) == []
    assert codes(lex.extract_one("%%{node}%%")) == []
    # parser.py:430-432 E100 examples
    assert "E100" in codes(html.extract_one("<node>"))
    assert "E100" in codes(latex.extract_one(r"\begin{node}"))
    assert "E100" in codes(lex.extract_one("%%{node}"))
    # parser.py:445-449 HTML W100 examples
    assert codes(html.extract_one("<a><p>stuff</p><p>stuff</p></a>")) == []
    assert codes(html.extract_one("<a><p>stuff<p>stuff</p></a>")) == ["W100"]
    assert codes(html.extract_one("<a><p>stuff</p><p>stuff</a>")) == ["W100"]
    assert codes(html.extract_one("<a><p>stuff<p>stuff</a>")) == ["W100", "W100"]


def test_lexor_lang_extraction():
    lex = Extractor("lexor-text")
    res = lex.extract_one("before %%{em}inner%% after")
    assert res["extracted_text"] == "before inner after"
    # nesting closes innermost-first
    res = lex.extract_one("%%{a}x%%{b}y%%z%%")
    assert res["extracted_text"] == "xyz"
    assert codes(res) == []
