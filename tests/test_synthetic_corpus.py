"""Synthetic canonical corpus builder feeds the rebuilder correctly."""

from impresso_ta.plans import synthetic_canonical_corpus
from impresso_ta.rebuild import rebuild_issues_solr


def test_synthetic_rebuild_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    issues, pages = synthetic_canonical_corpus(docs)
    assert issues.count() == 20 and pages.count() == 20

    rebuilt = rebuild_issues_solr(issues, pages)
    rows = rebuilt.collect()
    assert len(rows) == 20
    by_id = {r["id"]: r for r in rows}
    src = {r["doc_id"]: r for r in docs.collect()}
    # each doc's fulltext reconstructs its word sequence (en has rules →
    # single spaces; no trailing-token punctuation in the corpus)
    for doc in src.values():
        words = doc["text"].split()
        # find the rebuilt CI for this doc via deterministic id minting
        import datetime
        d = datetime.date(1900, 1, 1) + datetime.timedelta(days=doc["doc_id"] % 3650)
        ed = f"a{doc['doc_id'] // 3650}"
        ci_id = f"SYN-{d.isoformat()}-{ed}-i0001"
        row = by_id[ci_id]
        if doc["lang"] in ("fr", "de", "en", "it"):
            assert row["ft"].split() == words
        assert len(row["ppreb"][0]["t"]) == len(words)


def test_zipfian_synthetic_rebuild_roundtrip(spark, sf_dir):
    """The skewed profile (tools.skewed_docs) mints multi-CI issues with
    unique page/CI ids and the rebuild reconstructs every doc's text
    exactly as in the uniform profile — skew changes group sizes, never
    results."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from pyspark.sql import functions as F

    from tools.skewed_docs import zipfian_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    sk = zipfian_documents(docs, n_issues=16)
    issues, pages = synthetic_canonical_corpus(sk)
    n_issues = issues.count()
    assert n_issues < 200 and pages.count() == 200  # real grouping
    # zipf shape: hottest issue holds a disproportionate share
    hot = (
        issues.select(F.size("pp").alias("n"))
        .orderBy(F.desc("n"))
        .first()["n"]
    )
    assert hot >= 200 // 16 * 2

    rebuilt = rebuild_issues_solr(issues, pages).collect()
    assert len(rebuilt) == 200
    assert not any(r["has_problem"] for r in rebuilt)
    assert len({r["id"] for r in rebuilt}) == 200  # unique CI ids
    # every doc's words survive assembly (match docs to CIs by text;
    # token count always, exact word sequence where whitespace rules
    # exist for the language)
    by_words = {}
    for row in docs.select("text", "lang").collect():
        by_words.setdefault(len(row["text"].split()), set()).add(
            tuple(row["text"].split())
        )
    for r in rebuilt:
        n = len(r["ppreb"][0]["t"])
        assert n in by_words
        if r["lg"] in ("fr", "de", "en", "it"):
            assert tuple(r["ft"].split()) in by_words[n]
