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


def test_parse_xml_alias_matches_reference_default():
    """Reference users call parse(text, 'xml') — alias to html. Must
    exhibit HTML semantics, not merely parse (r5 review: `is not
    None` passed for ANY alias target)."""
    doc, log = lexor_ray.parse("<p>hi</p>", "xml")
    assert [n.name for n in doc.get_nodes_by_name("p")] == ["p"]
    assert log == []


def test_read_unknown_extension_warns(tmp_path):
    import warnings

    p = tmp_path / "doc.rst"
    p.write_text("plain text")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        doc, log = lexor_ray.read(str(p))
        assert any("no dialect registered" in str(x.message) for x in w)


def test_markdown_extension_aliases():
    for ext in (".mdown", ".mkdn", ".mkd", ".mdwn", ".mdtxt", ".mdtext", ".text"):
        assert lexor_ray.EXTENSION_DIALECTS[ext] == "markdown"


def test_cli_target_spec_grammar():
    from lexor_ray.__main__ import parse_target_spec, split_targets

    assert parse_target_spec("markdown[width=100]") == ("markdown", {"width": "100"})
    assert parse_target_spec("md") == ("markdown", {})
    assert split_targets("markdown[width=100,drop=ad|x],xml") == [
        ("markdown", {"width": "100", "drop": "ad|x"}),
        ("xml", {}),
    ]


def test_cli_multi_target_with_style_parameter(tmp_path, capsys):
    """One invocation converts one file to two targets; the markdown
    target takes a style parameter (reference to.py:51-165, 271-291)."""
    import json

    from lexor_ray.__main__ import main

    src = tmp_path / "doc.html"
    src.write_text("<p>" + " ".join(["word"] * 40) + " <b>bold</b></p>")
    rc = main([str(src), "--to", "markdown[width=100],text", "--out-dir", str(tmp_path)])
    assert rc == 0
    # reference '<base>.<style>.<lang>' output naming (to.py:332,352)
    md = (tmp_path / "doc.default.markdown").read_text()
    txt = json.loads((tmp_path / "doc.default.text").read_text())
    assert "**bold**" in md
    # the markdown style never wraps (golden composability contract),
    # so the long paragraph survives as one line; width= is parsed
    # through the style grammar but inert
    assert max(len(line) for line in md.splitlines()) > 70
    assert "bold" in txt["extracted_text"]


_STYLE_SRC = '''
"""Test style plugin: html parse, but the text converter also drops
any element carrying class "spoiler" (a user-site dialect — the
reference's S7 install surface)."""
from dataclasses import replace

from lexor_ray.dialects.registry import get_dialect

_base = get_dialect("html-text")
DIALECT = replace(
    _base,
    name="html-nospoiler",
    drop_classes=_base.drop_classes | {"spoiler"},
)
'''


def test_style_install_and_discovery(tmp_path, monkeypatch, capsys):
    """S7 (`lexor install`): installing a style module makes its
    dialect resolvable BY NAME in any later call — including the CLI
    and extract_one — via the styles search path."""
    import lexor_ray.dialects.registry as reg
    from lexor_ray.__main__ import main
    from lexor_ray.extract import extract_one

    src = tmp_path / "mystyle.py"
    src.write_text(_STYLE_SRC)
    styles = tmp_path / "styles"
    monkeypatch.setenv("LEXOR_RAY_STYLE_PATH", str(styles))

    assert main(["--install", str(src)]) == 0
    installed = capsys.readouterr().out.strip()
    assert installed.endswith("html-nospoiler.py")
    # simulate a FRESH process (worker-side resolution): wipe the
    # in-process registration and resolve purely via the search path
    reg._REGISTRY.pop("html-nospoiler", None)
    d = reg.get_dialect("html-nospoiler")
    assert "spoiler" in d.drop_classes
    res = extract_one(
        '<p>keep</p>\n<div class="spoiler">drop me</div>',
        dialect="html-nospoiler",
    )
    assert res["extracted_text"] == "keep\n"


def test_style_develop_and_dist(tmp_path, monkeypatch, capsys):
    """--develop registers an in-place style path in the config's
    [develop] section (resolution prefers it over installed copies,
    reference lang.py:145-152); --dist zips the style with its sibling
    conformance test (reference dist.py:59-103)."""
    import zipfile

    import lexor_ray.dialects.registry as reg
    from lexor_ray.__main__ import main
    from lexor_ray.extract import extract_one

    src = tmp_path / "devstyle.py"
    src.write_text(_STYLE_SRC.replace("html-nospoiler", "html-devspoiler"))
    (tmp_path / "test_devstyle.py").write_text("def test_ok():\n    pass\n")
    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    (cfgdir / "lexor.config").write_text("")
    monkeypatch.setenv("LEXOR_CONFIG_PATH", str(cfgdir))
    # no installed copy anywhere
    monkeypatch.setenv("LEXOR_RAY_STYLE_PATH", str(tmp_path / "styles"))
    monkeypatch.chdir(tmp_path / "cfg")

    assert main(["--develop", str(src)]) == 0
    out = capsys.readouterr().out
    assert f"html-devspoiler --> {src}" in out
    assert "html-devspoiler" in (cfgdir / "lexor.config").read_text()

    # fresh-process resolution: wipe the in-process registration and
    # resolve purely via the [develop] entry (no installed file exists)
    reg._REGISTRY.pop("html-devspoiler", None)
    d = reg.get_dialect("html-devspoiler")
    assert "spoiler" in d.drop_classes
    res = extract_one(
        '<p>keep</p>\n<div class="spoiler">drop</div>',
        dialect="html-devspoiler",
    )
    assert res["extracted_text"] == "keep\n"

    # edits to the developed file take effect WITHOUT re-registering
    src.write_text(
        _STYLE_SRC.replace("html-nospoiler", "html-devspoiler").replace(
            '{"spoiler"}', '{"spoiler", "promo"}'
        )
    )
    reg._REGISTRY.pop("html-devspoiler", None)
    assert "promo" in reg.get_dialect("html-devspoiler").drop_classes

    # dist: zip holds the style module + its sibling test
    assert main(["--dist", str(src), "--out-dir", str(tmp_path / "d")]) == 0
    zpath = capsys.readouterr().out.strip()
    assert zpath.endswith("lexor_ray.html.html-devspoiler.zip")
    names = set(zipfile.ZipFile(zpath).namelist())
    assert names == {"devstyle.py", "test_devstyle.py"}


def test_cli_list_dialects(tmp_path, monkeypatch, capsys):
    """--list shows built-ins and installed styles (the reference's
    `lexor lang` display)."""
    from lexor_ray.__main__ import main

    styles = tmp_path / "styles"
    styles.mkdir()
    (styles / "myd.py").write_text(_STYLE_SRC)
    monkeypatch.setenv("LEXOR_RAY_STYLE_PATH", str(styles))
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "html-text\tlang=html\tbuilt-in" in out
    assert "myd\tinstalled" in out


def test_cli_config_file_merge_chain(tmp_path, capsys, monkeypatch):
    """Config-file section values override module DEFAULTS and are in
    turn overridden by CLI style parameters (the reference's
    set_style_cfg precedence, lexor/command/config.py:163-210)."""
    from lexor_ray.__main__ import main

    src = tmp_path / "doc.html"
    src.write_text("<p>hello <b>world</b></p>")
    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    (cfgdir / "lexor.config").write_text(
        "[html-writer-markdown]\nwidth = 33\nstyle = custom\n"
    )
    monkeypatch.setenv("LEXOR_CONFIG_PATH", str(cfgdir))
    monkeypatch.chdir(tmp_path)

    # file default (style=custom) drives the output NAME; width=33
    # comes from the file section
    rc = main([str(src), "--to", "markdown", "--write", "--nodisplay"])
    assert rc == 0
    assert (tmp_path / "doc.custom.markdown").exists()

    # CLI style parameter overrides the file value
    rc = main([str(src), "--to", "markdown[style=cli]", "-w", "-n"])
    assert rc == 0
    assert (tmp_path / "doc.cli.markdown").exists()


def test_cli_write_append_mode(tmp_path, capsys, monkeypatch):
    """--write emits '<base>.<style>.<lang>' beside the source and
    --append reopens it in mode 'a' (reference Writer.write modes,
    core/writer.py:355-404)."""
    from lexor_ray.__main__ import main

    monkeypatch.chdir(tmp_path)
    src = tmp_path / "doc.html"
    src.write_text("<p>once</p>")
    assert main([str(src), "--to", "markdown", "-w", "-n"]) == 0
    out = tmp_path / "doc.default.markdown"
    assert out.read_text() == "once\n"
    assert main([str(src), "--to", "markdown", "-w", "-n", "--append"]) == 0
    assert out.read_text() == "once\nonce\n"
    # display suppressed by -n both times
    assert capsys.readouterr().out == ""


def test_cli_drop_classes_style_parameter(tmp_path, capsys):
    from lexor_ray.__main__ import main

    src = tmp_path / "d.html"
    src.write_text('<p>keep</p>\n<div class="promo">drop me</div>')
    rc = main([str(src), "--to", "text[drop=promo]"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert "drop me" not in out["extracted_text"]
    assert "keep" in out["extracted_text"]


def test_cli_xml_accepts_inferred_lexor_lang(tmp_path, capsys):
    from lexor_ray.__main__ import main

    src = tmp_path / "t.lex"
    src.write_text("hello %%{b}world%%")
    rc = main([str(src), "--to", "xml"])
    assert rc == 0
    assert "world" in capsys.readouterr().out


def test_resolve_input_search_path(tmp_path, monkeypatch):
    """S3: LEXORINPUTS search-path resolution (reference
    lexor/__init__.py:32-49, command/to.py:196-222)."""
    d1 = tmp_path / "a"
    d1.mkdir()
    (d1 / "doc.html").write_text("<p>x</p>")
    monkeypatch.setenv("LEXORINPUTS", f"/nonexistent:{d1}")
    assert lexor_ray.resolve_input("doc.html") == str(d1 / "doc.html")
    assert lexor_ray.resolve_input("missing.html") is None
    doc, log = lexor_ray.read("doc.html")
    assert doc is not None
    monkeypatch.chdir(tmp_path)
    from lexor_ray.__main__ import main
    assert main(["doc.html", "--to", "text"]) == 0


def test_cli_document_command(capsys):
    """The reference's `lexor document` API-doc emission."""
    from lexor_ray.__main__ import main

    rc = main(["--document", "html-text"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# dialect `html-text`" in out
    assert "node parsers" in out
    assert "converter rules" in out


def test_cli_defaults_command():
    """The reference's `lexor defaults` restated: print a section's
    resolved default values; unknown sections say NO DEFAULTS."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "lexor_ray", "--defaults",
         "html-writer-markdown"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "width = '70'" in out
    out = subprocess.run(
        [sys.executable, "-m", "lexor_ray", "--defaults", "nope"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert out.strip() == "NO DEFAULTS"


def test_stray_li_renders_instead_of_crashing():
    """Messy real-world HTML with an <li> outside any list must render
    as a depth-1 unordered item, not crash on missing list state
    (r4 review)."""
    from lexor_ray.dialects.markdown import to_markdown

    assert to_markdown("<li>stray item</li>") == "- stray item"
    # and lists after the stray item still number correctly
    out = to_markdown("<li>s</li><ol><li>a</li><li>b</li></ol>")
    assert "1. a" in out and "2. b" in out


def test_table_mode_rejects_non_text_targets(tmp_path):
    """--table emits text+spans only; asking for another style must
    error loudly instead of silently running html-text (r4 review)."""
    import pytest

    from lexor_ray.__main__ import main

    with pytest.raises(SystemExit):
        main(
            ["--table", str(tmp_path), "--out", str(tmp_path / "o"),
             "--to", "markdown"]
        )
    with pytest.raises(SystemExit):
        main(
            ["--table", str(tmp_path), "--out", str(tmp_path / "o"),
             "--lang", "nosuch"]
        )
