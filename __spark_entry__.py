"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-join corpus-analytics query at sf0.001.
``queries()`` / ``oracle_sql()`` — the SURVEY §2 operator inventory as
oracle-checked queries; see impresso_ta/queries.py for the catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from impresso_ta import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize a canonical
    corpus from the documents table (one issue/page/CI per doc, pure JVM
    expressions) and run the REBUILD engine over it — joins, reading
    order, offset accumulation, whitespace rules, IIIF links, the
    JSON-transport UDTF. Returns the rebuilt-CI DataFrame."""
    from impresso_ta.plans import synthetic_canonical_corpus
    from impresso_ta.rebuild import rebuild_issues_solr

    docs = _catalog.t(spark, "/root/testdata/sf0.001", "documents")
    issues_df, pages_df = synthetic_canonical_corpus(docs)
    return rebuild_issues_solr(issues_df, pages_df)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
