"""LaTeX dialect: the reference's own LaTeX conformance examples
(``lexor/core/parser.py:424-432``) plus extraction goldens — proving
the engine and plugin contract are language-agnostic (close_prefix
opt-in with a non-HTML close sequence)."""

from lexor_ray.extract import Extractor


def ex():
    return Extractor("latex-text")


def codes(res):
    return [l["code"] for l in res["log"]]


def test_reference_conformance_examples():
    """parser.py:426-432: 'Okay: \\begin{node}\\end{node}' parses with
    an empty log; 'E100: \\begin{node}' logs E100."""
    e = ex()
    assert codes(e.extract_one(r"\begin{node}\end{node}")) == []
    assert "E100" in codes(e.extract_one(r"\begin{node}"))


GOLDEN = [
    (r"plain text", "plain text", []),
    (r"Hello \textbf{bold} world", "Hello bold world", []),
    (r"\begin{itemize}\item one \item two\end{itemize}", " one  two", []),
    ("before % comment\nafter", "before \nafter", []),
    (r"x $a^2+b^2$ y", "x  y", []),
    (r"$$\int f$$ z", " z", []),
    (r"\usepackage{amsmath}body", "body", []),
    (r"\documentclass[12pt]{article}T", "T", []),
    (r"\begin{a}\begin{b}t\end{a}", "t", ["W100"]),
    (r"\section{Intro} text \cite{x}", "Intro text ", []),
    (r"nested \emph{\textbf{deep}} out", "nested deep out", []),
]


def test_latex_extraction_golden():
    e = ex()
    failures = []
    for src, want, want_codes in GOLDEN:
        res = e.extract_one(src)
        if res["extracted_text"] != want or codes(res) != want_codes:
            failures.append((src, res["extracted_text"], codes(res)))
    assert not failures, failures


def test_latex_spans_are_source_accurate():
    e = ex()
    src = r"Hello \textbf{bold} world"
    res = e.extract_one(src)
    for (s, t) in res["spans"]:
        assert src[s:t] in res["extracted_text"]


def test_latex_not_scanner_path():
    assert not ex()._pure  # non-HTML grammar must use the real engine


def test_latex_single_char_escapes():
    """``\\%`` etc. yield the literal character (r5 review: the
    backslash leaked as text and the % ate the rest of the line)."""
    e = ex()
    cases = [
        (r"50\% of cases", "50% of cases"),
        (r"a \{literal\} brace and \$5", "a {literal} brace and $5"),
        (r"an \& amp \# hash \_ under", "an & amp # hash _ under"),
        # unescaped % still comments to end of line
        ("body % comment\nnext", "body \nnext"),
    ]
    failures = []
    for src, want in cases:
        got = e.extract_one(src)["extracted_text"]
        if got != want:
            failures.append((src, got, want))
    assert not failures, failures


def test_latex_escape_spans_cover_source():
    e = ex()
    src = r"50\% done"
    res = e.extract_one(src)
    # the '%' run's span covers the two-char source escape
    assert (2, 4) in res["spans"]
