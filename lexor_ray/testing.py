"""Style-author test helpers — the reference's plugin-testing
contract re-expressed for pytest.

The reference ships three mechanisms (``lexor/command/test.py``):
labeled message-example snippets parsed out of docstrings
(``parse_msg`` ``test.py:150-195``; asserted by ``find_failed``
``test.py:198-215``), diff-friendly golden comparison
(``compare_with`` ``test.py:140-147``), and parse→write roundtrips
(``parse_write`` ``test.py:254-271``). A style installed with
``python -m lexor_ray --install`` can test itself with the same
surface::

    from lexor_ray.testing import assert_msg_examples

    EXAMPLES = '''
    Okay: <node></node>
    E100: <node>
    W101: </stray>
    '''

    def test_my_dialect():
        assert_msg_examples("my-dialect", EXAMPLES)
"""

from __future__ import annotations

import difflib


def compare_with(got: str, expected: str) -> None:
    """Assert string equality with a diff-friendly message (the
    reference's ``compare_with``, ``test.py:140-147``)."""
    if got != expected:
        diff = "\n".join(
            difflib.unified_diff(
                expected.splitlines(),
                got.splitlines(),
                fromfile="expected",
                tofile="got",
                lineterm="",
            )
        )
        raise AssertionError(f"strings differ:\n{diff}")


def parse_msg_examples(text: str) -> list[tuple[str, str | None]]:
    """Parse the reference's labeled-snippet format (``parse_msg``,
    ``test.py:150-195``): each non-empty line is ``LABEL: snippet``
    where LABEL is ``Okay`` (expect an empty log) or a diagnostic
    code (expect that code in the log). Returns (snippet, code|None)
    pairs; lines without a recognized label are ignored (prose)."""
    out: list[tuple[str, str | None]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        label, _, snippet = line.partition(":")
        label = label.strip()
        snippet = snippet.strip()
        if not snippet:
            continue
        if label == "Okay":
            out.append((snippet, None))
        elif (
            len(label) == 4
            and label[0] in "EWI"
            and label[1:].isdigit()
        ):
            out.append((snippet, label))
    return out


def find_failed(
    examples: list[tuple[str, str | None]], dialect: str
) -> list[tuple[str, str, list[str]]]:
    """Run labeled snippets through the parser of ``dialect``
    (installed styles resolve via the search path): ``Okay`` snippets
    must log NOTHING, code-labeled snippets must log that code.
    Returns failures as (snippet, expectation, got_codes) — empty
    means conformance (the reference's ``find_failed``,
    ``test.py:198-215``)."""
    from .core.parser import Parser
    from .dialects.registry import get_dialect

    d = get_dialect(dialect)
    failures: list[tuple[str, str, list[str]]] = []
    for snippet, expected in examples:
        p = Parser(d)
        p.parse(snippet)
        codes = [rec["code"] for rec in p.log]
        if expected is None:
            if codes:
                failures.append((snippet, "expected clean log", codes))
        elif expected not in codes:
            failures.append((snippet, f"expected {expected}", codes))
    return failures


def assert_msg_examples(dialect: str, examples: str) -> None:
    """pytest-friendly wrapper: parse the docstring-format examples
    and assert full conformance."""
    failures = find_failed(parse_msg_examples(examples), dialect)
    assert not failures, failures


def parse_write_roundtrip(text: str, dialect: str) -> str:
    """Parse → default-write roundtrip (the reference's
    ``parse_write``, ``test.py:254-271``): returns the serialized
    form for golden comparison with :func:`compare_with`."""
    from .core.parser import Parser
    from .core.writer import Writer
    from .dialects.registry import get_dialect

    d = get_dialect(dialect)
    return Writer().write(Parser(d).parse(text))
