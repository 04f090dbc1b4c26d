"""CLI lifecycle: import command → canonical store → rebuild command —
the reference's impresso-txt-importer / impresso-rebuilder surface."""

import subprocess
import sys

from tests.test_importer_mets_alto import ALTO_PAGE, METS


def _make_corpus(base):
    for d in ("02", "03"):
        issue_dir = base / "GAZ" / "1900" / "01" / d / "a"
        (issue_dir / "text").mkdir(parents=True)
        (issue_dir / "issue-mets.xml").write_text(METS)
        (issue_dir / "text" / "0001.xml").write_text(ALTO_PAGE)


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "impresso_ta.cli", *argv],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_cli_import_then_rebuild(tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _make_corpus(corpus)
    store = tmp_path / "store"

    r = _run(
        "import",
        "--input-dir", str(corpus),
        "--format", "mets_alto",
        "--output-dir", str(store),
        "--date-ranges", "GAZ=1900-01-01:1900-01-02",
        "--ts", "2024-01-01T00:00:00Z",
        "--store-format", "parquet",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "GAZ-1900: 1 issues, 2 content items, 1 pages" in r.stdout
    # manifest is written through the sink, not just echoed
    import glob
    import json as _json

    manifest_rows = []
    for f in glob.glob(str(store / "manifest" / "part-*")):
        manifest_rows += [
            _json.loads(line) for line in open(f) if line.strip()
        ]
    assert any(
        m["alias"] == "GAZ" and m["n_issues"] == 1 for m in manifest_rows
    )

    r2 = _run(
        "rebuild",
        "--issues", str(store / "issues"),
        "--supports", str(store / "pages"),
        "--output-dir", str(tmp_path / "out"),
        "--default-language", "fr",
        "--ts", "2024-01-01T00:00:00Z",
        "--store-format", "parquet",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "rebuilt 2 content items" in r2.stdout


def test_rebuild_config_filter_batches(spark):
    from impresso_ta.schemas import ISSUE_SCHEMA
    from impresso_ta.sources.discovery import rebuild_config_filter
    from tests.fixtures import content_item, issue

    issues = [
        issue(i_id, [content_item(f"{i_id}-i0001", pp=[1])], pp=[f"{i_id}-p0001"])
        for i_id in [
            "GDL-1900-01-02-a",
            "GDL-1949-01-02-a",
            "GDL-1999-01-02-a",
            "IMP-1900-01-02-a",
        ]
    ]
    df = spark.createDataFrame(issues, ISSUE_SCHEMA)
    # reference shape: end year EXCLUSIVE (range(start, end))
    out = rebuild_config_filter(
        df, [{"GDL": [1900, 1949]}, {"IMP": [1900, 1901]}]
    )
    assert {r["id"] for r in out.collect()} == {
        "GDL-1900-01-02-a",
        "IMP-1900-01-02-a",
    }
