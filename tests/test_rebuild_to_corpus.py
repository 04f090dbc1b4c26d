"""Integration: the engine's two halves compose — canonical newspaper
data is rebuilt into fulltext CIs, and that rebuilt corpus flows
straight into the LLM corpus-preparation operators (the workflow a
reference user gains by switching)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from impresso_ta.operators.pipeline import prepare_corpus
from impresso_ta.operators.text_analysis import lang_id
from impresso_ta.plans import synthetic_canonical_corpus
from impresso_ta.rebuild import rebuild_issues_solr


def test_rebuilt_fulltext_feeds_corpus_pipeline(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    issues_df, pages_df = synthetic_canonical_corpus(docs)
    rebuilt = rebuild_issues_solr(issues_df, pages_df)

    # rebuilt CIs → corpus-shaped frame: stable numeric id + fulltext
    corpus = rebuilt.filter(F.length("ft") > 0).select(
        F.row_number().over(Window.orderBy("id")).cast("long").alias("doc_id"),
        F.col("ft").alias("text"),
        F.col("id").alias("ci_id"),
    )
    n_in = corpus.count()
    assert n_in > 0

    res = prepare_corpus(
        corpus, c4=False, gopher=True, line_spans=10, doc_dedup=True,
        collect_stats=True,
    )
    out = res.docs
    n_out = out.count()
    assert 0 < n_out <= n_in
    # the canonical ci id survives the pipeline for lineage
    assert "ci_id" in out.columns
    # language ID runs over the rebuilt text
    langs = {
        r["l"]
        for r in out.select(lang_id(F.col("text")).alias("l")).collect()
    }
    assert langs  # non-empty, all values from the known set
    assert langs <= {"de", "en", "es", "fr", "zh", "und"}
