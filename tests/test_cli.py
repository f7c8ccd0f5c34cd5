"""CLI driver argument/validation parity (S1 — reference index.js:13-31).

Error-path tests run without a SparkSession; the full-run paths are
exercised by the CLI smoke in the build logs (both sinks + --test)."""

from __future__ import annotations

from ocds_entity_extract_spark.__main__ import build_parser, main


def test_missing_database_or_collection_errors(capsys):
    assert main([]) == 1
    assert "no database or collection" in capsys.readouterr().out
    assert main(["-d", "/tmp/x"]) == 1
    assert main(["-c", "pages"]) == 1


def test_unsupported_output_value_errors(capsys):
    assert main(["-d", "/tmp/x", "-c", "pages", "-o", "mongo"]) == 1
    out = capsys.readouterr().out
    assert "unsupported output value mongo" in out
    assert "* db" in out and "* stream" in out


def test_option_surface_parity():
    """Reference option names/aliases all parse (classifiers multi-valued)."""
    ns = build_parser().parse_args(
        ["-d", "wh", "-c", "pages", "-o", "db", "-x", "a.csv", "b.csv", "-t"]
    )
    assert ns.database == "wh" and ns.collection == "pages"
    assert ns.output == "db"
    assert ns.classifiers == ["a.csv", "b.csv"]
    assert ns.test is True
    long = build_parser().parse_args(
        ["--database", "wh", "--collection", "pages", "--output", "stream",
         "--classifiers", "x.csv"]
    )
    assert long.output == "stream" and long.classifiers == ["x.csv"]


def test_pyfiles_artifact_complete(tmp_path):
    """The --py-files zip must carry every package module (an executor
    resolves all UDF code from it) and no tests/caches."""
    import pathlib
    import zipfile

    from tools.make_pyfiles import PKG, build

    out = build(tmp_path)
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
    on_disk = {
        str(p.relative_to(PKG.parent))
        for p in pathlib.Path(PKG).rglob("*.py")
        if "__pycache__" not in p.parts
    }
    assert on_disk <= names
    assert not [n for n in names if "test" in n or "__pycache__" in n]
    assert "ocds_entity_extract_spark/plans/pipeline.py" in names
