"""SQL surface over the canonical store: registered views are queryable
and (alias, year) partition filters prune the scan."""

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


def test_legacy_bnf_line_nesting_repaired(spark, tmp_path):
    """Pages whose paragraphs store l = [[line, notes], ...] (the legacy
    BNF exporter shape found in the reference's shipped canonical
    outputs) parse into the strict schema with their tokens intact."""
    import json

    legacy_page = {
        "id": "XXX-1900-01-02-a-p0001",
        "cc": True,
        "r": [
            {
                "c": [0, 0, 10, 10],
                "pOf": "XXX-1900-01-02-a-i0001",
                "p": [
                    {
                        "c": [0, 0, 10, 10],
                        "l": [
                            [{"c": [0, 0, 5, 5],
                              "t": [{"c": [0, 0, 2, 2], "tx": "Hello"}]}, []],
                            [{"c": [0, 5, 5, 5],
                              "t": [{"c": [0, 5, 2, 2], "tx": "world"}]}, []],
                        ],
                    }
                ],
            }
        ],
    }
    path = tmp_path / "pages.jsonl"
    path.write_text(json.dumps(legacy_page) + "\n")

    from impresso_ta.sources.readers import read_pages

    rows = read_pages(spark, str(path)).collect()
    assert len(rows) == 1
    lines = rows[0]["r"][0]["p"][0]["l"]
    assert len(lines) == 2
    assert [t["tx"] for ln in lines for t in ln["t"]] == ["Hello", "world"]
