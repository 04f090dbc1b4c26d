"""SQL surface over the canonical store: registered views are queryable
and (alias, year) partition filters prune the scan."""

from pyspark.sql import functions as F

from impresso_ta.schemas import ISSUE_SCHEMA
from impresso_ta.sources.readers import register_tables
from impresso_ta.sources.sinks import write_issues
from tests.fixtures import content_item, issue


def test_register_and_query_with_partition_pruning(spark, tmp_path):
    issues = [
        issue("GDL-1900-01-02-a", [content_item("GDL-1900-01-02-a-i0001", pp=[1])],
              pp=["GDL-1900-01-02-a-p0001"]),
        issue("IMP-1901-05-06-a", [content_item("IMP-1901-05-06-a-i0001", pp=[1])],
              pp=["IMP-1901-05-06-a-p0001"]),
    ]
    df = spark.createDataFrame(issues, ISSUE_SCHEMA)
    store = str(tmp_path / "issues_store")
    write_issues(df, store, fmt="parquet")

    views = register_tables(spark, issues_path=store)
    assert views == ["issues"]

    out = spark.sql(
        "SELECT id FROM issues WHERE alias = 'GDL' AND year = 1900"
    )
    assert [r["id"] for r in out.collect()] == ["GDL-1900-01-02-a"]

    # partition filters reach the scan: no row-level filter on alias/year
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "alias" in plan.split("PartitionFilters")[1][:200]
