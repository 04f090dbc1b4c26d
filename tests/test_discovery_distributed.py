"""Parity: the distributed binaryFile-listing discovery vs the POSIX
walker (SURVEY S1) — same rows on the same tree, including the walker's
edition semantics (editions win over stray date-level files) and nested
per-issue subdirectories. The distributed form is the object-store path:
no driver-side walk, no byte reads (content column pruned)."""

from impresso_ta.sources.discovery import (
    detect_issues,
    detect_issues_distributed,
)


def _tree(tmp_path):
    files = [
        # two editions on one date (+ a stray date-level file that the
        # walker ignores once edition dirs exist)
        "GDL/1900/01/02/a/mets.xml",
        "GDL/1900/01/02/b/mets.xml",
        "GDL/1900/01/02/stray.txt",
        # editionless date — the date dir IS the issue
        "JDG/1910/05/06/page.xml",
        # nested per-issue subdirectory (ALTO text/ level)
        "GDL/1900/01/03/a/text/00001.xml",
        # non-conforming path: ignored by both
        "README.txt",
    ]
    for f in files:
        p = tmp_path / f
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("x")
    return str(tmp_path)


def _rows(df):
    return sorted(
        (r["alias"], str(r["date"]), r["edition"], r["path"], r["format"])
        for r in df.collect()
    )


def test_distributed_matches_walker(spark, tmp_path):
    base = _tree(tmp_path)
    walker = _rows(detect_issues(spark, base, "mets_alto"))
    dist = _rows(detect_issues_distributed(spark, base, "mets_alto"))
    assert walker == dist
    assert len(walker) == 4  # 2 GDL editions + 1 GDL next-day + 1 JDG


def test_distributed_accepts_non_normalized_base(spark, tmp_path):
    """A relative/symlinked/dot-dotted base must not silently yield zero
    rows (round-8 review): scheme-less bases are realpath-normalized
    before the prefix regex is built."""
    base = _tree(tmp_path)
    clean = _rows(detect_issues_distributed(spark, base, "mets_alto"))
    dotted = _rows(
        detect_issues_distributed(spark, base + "/GDL/..", "mets_alto")
    )
    assert dotted == clean and len(dotted) == 4
    link = tmp_path.parent / (tmp_path.name + "_link")
    link.symlink_to(tmp_path)
    linked = _rows(detect_issues_distributed(spark, str(link), "mets_alto"))
    assert linked == clean


def test_distributed_raises_on_layout_mismatch(spark, tmp_path):
    """Files exist but none match the issue grammar → loud ValueError,
    never a silently empty discovery (round-8 review)."""
    import pytest

    (tmp_path / "misc").mkdir()
    (tmp_path / "misc" / "notes.txt").write_text("x")
    with pytest.raises(ValueError, match="NONE match"):
        detect_issues_distributed(spark, str(tmp_path), "mets_alto").count()

    from impresso_ta.importers.base import import_issues_distributed

    with pytest.raises(ValueError, match="NONE match"):
        import_issues_distributed(spark, str(tmp_path), "mets_alto").issues.count()


def test_distributed_accepts_unpadded_date_dirs(spark, tmp_path):
    """The walker accepts any all-digit date dirs (986/1/1); the
    distributed grammar must too (round-8 review)."""
    p = tmp_path / "OLD" / "986" / "1" / "1" / "a"
    p.mkdir(parents=True)
    (p / "m.xml").write_text("x")
    walker = _rows(detect_issues(spark, str(tmp_path), "mets_alto"))
    dist = _rows(detect_issues_distributed(spark, str(tmp_path), "mets_alto"))
    assert walker == dist
    assert dist[0][:3] == ("OLD", "0986-01-01", "a")


def test_distributed_listing_prunes_content(spark, tmp_path):
    """The listing stage must never read file bytes: the binaryFile scan's
    ReadSchema carries only path (same contract the S9 PDF listing is
    plan-tested on)."""
    base = _tree(tmp_path)
    plan = detect_issues_distributed(spark, base, "mets_alto")._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
