"""CI-level rebuild (skew-safe twin of the issue-level plan) produces
byte-identical output on every corpus shape: the simple multi-page
fixture (incl. missing-page errors and img CIs), the audio path, the
zipfian synthetic profile whose hot issues motivated it, and the
reference's own shipped canonical outputs."""

import os

import pytest

from impresso_ta.rebuild.solr import (
    rebuild_issues_solr,
    rebuild_issues_solr_ci,
)
from impresso_ta.schemas import AUDIO_RECORD_SCHEMA, ISSUE_SCHEMA, PAGE_SCHEMA
from tests.fixtures import (
    audio_issue_and_record,
    content_item,
    simple_issue_and_pages,
)


def _by_id(df):
    return {r["id"]: r.asDict(recursive=True) for r in df.collect()}


def _assert_parity(issues_df, supports_df, **kw):
    a = _by_id(rebuild_issues_solr(issues_df, supports_df, **kw))
    b = _by_id(rebuild_issues_solr_ci(issues_df, supports_df, **kw))
    assert set(a) == set(b)
    for ci_id in a:
        assert b[ci_id] == a[ci_id], ci_id
    return a


def test_parity_simple_fixture(spark):
    iss, pages = simple_issue_and_pages()
    # add a missing-page CI so the error path is compared too
    iss["i"].append(
        content_item("GDL-1900-01-02-a-i0004", pp=[7], tp="article")
    )
    issues_df = spark.createDataFrame([iss], ISSUE_SCHEMA)
    pages_df = spark.createDataFrame(pages, PAGE_SCHEMA)
    rows = _assert_parity(
        issues_df, pages_df, ts="2024-01-01T00:00:00Z"
    )
    # sanity: the fixture's known shapes all present
    assert rows["GDL-1900-01-02-a-i0001"]["ft"].startswith("Bonjour")
    assert rows["GDL-1900-01-02-a-i0004"]["has_problem"] is True


def test_parity_without_sm_and_rr(spark):
    """sm / rr are optional in the canonical schema: a print-only store
    lacking the `sm` column and whose CI structs carry only `pp` must
    still plan and rebuild identically on both twins (the issue-level
    form reads them as optional dict keys; the CI-level form guards on
    column/field presence)."""
    from pyspark.sql import functions as F

    iss, pages = simple_issue_and_pages()
    issues_df = spark.createDataFrame([iss], ISSUE_SCHEMA)
    reduced = issues_df.drop("sm").withColumn(
        "i",
        F.transform(
            "i", lambda ci: ci.withField("m", ci["m"].dropFields("rr"))
        ),
    )
    pages_df = spark.createDataFrame(pages, PAGE_SCHEMA)
    rows = _assert_parity(reduced, pages_df, ts="2024-01-01T00:00:00Z")
    assert rows["GDL-1900-01-02-a-i0001"]["ft"].startswith("Bonjour")


def test_parity_audio(spark):
    iss, recs = audio_issue_and_record()
    issues_df = spark.createDataFrame([iss], ISSUE_SCHEMA)
    records_df = spark.createDataFrame(recs, AUDIO_RECORD_SCHEMA)
    _assert_parity(issues_df, records_df, ts="2024-01-01T00:00:00Z")


def test_parity_zipfian_synthetic(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from impresso_ta.plans.synthetic import synthetic_canonical_corpus
    from tools.skewed_docs import zipfian_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    skewed = zipfian_documents(docs, n_issues=16)  # hot groups at tiny sf
    issues_df, pages_df = synthetic_canonical_corpus(skewed)
    rows = _assert_parity(issues_df, pages_df)
    assert len(rows) == docs.count()  # every doc's CI rebuilt exactly once
    assert not any(r["has_problem"] for r in rows.values())


BASE = "/root/reference/text_preparation/data/out/canonical_out"


@pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference canonical outputs absent"
)
def test_parity_reference_canonical(spark):
    from impresso_ta.sources.readers import read_issues, read_pages

    issues = read_issues(spark, f"{BASE}/*-issues.jsonl.bz2")
    pages = read_pages(spark, f"{BASE}/pages/*-pages.jsonl.bz2")
    rows = _assert_parity(issues, pages)
    assert len(rows) == 726  # all CIs across the 12 shipped issues
