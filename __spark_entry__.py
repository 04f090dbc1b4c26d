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
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
