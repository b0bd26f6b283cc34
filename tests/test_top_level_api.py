"""The reference's library one-shot API surface (lexor/__init__.py
parse/read/convert/write helpers, SURVEY.md §3.2), re-expressed."""

import lexor_ray


def test_parse_returns_doc_and_log():
    doc, log = lexor_ray.parse("<p>x</p><node>")
    assert doc.get_nodes_by_name("p")
    assert [r["code"] for r in log] == ["E100"]


def test_read_infers_dialect_from_extension(tmp_path):
    f = tmp_path / "doc.tex"
    f.write_text(r"\textbf{hi} there % note")
    doc, log = lexor_ray.read(str(f))
    assert doc.get_nodes_by_name("\\textbf")
    f2 = tmp_path / "doc.md"
    f2.write_text("# Title\nbody")
    doc2, _ = lexor_ray.read(str(f2))
    assert doc2.get_nodes_by_name("h1")


def test_convert_then_write_pipeline():
    doc, _ = lexor_ray.parse("<nav>menu</nav><p>keep</p>")
    out, clog = lexor_ray.convert(doc, "html-text")
    assert clog == []
    from lexor_ray.extract import TextSpanWriter

    assert TextSpanWriter.write(out)[0] == "keep"
    xml = lexor_ray.write(doc)
    assert "<nav>" in xml and "<p>keep</p>" in xml


def test_write_with_markdown_dialect():
    doc, _ = lexor_ray.parse("<h1>T</h1>")
    out, _ = lexor_ray.convert(doc, "html-markdown")
    md = lexor_ray.write(out, "html-markdown")
    assert md.strip() == "# T"
