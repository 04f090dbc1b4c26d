"""Structured Streaming incremental ingest: availableNow drains the drop
zone exactly once; re-running with the same checkpoint imports nothing new
(the streaming replacement for the F3 anti-join)."""

import json

from impresso_ta.streaming import stream_canonical_issues
from tests.fixtures import issue, content_item


def _write_issue_jsonl(path, issue_id):
    doc = issue(issue_id, [content_item(f"{issue_id}-i0001", pp=[1])],
                pp=[f"{issue_id}-p0001"])
    with open(path, "w") as f:
        f.write(json.dumps(doc) + "\n")


def test_available_now_exactly_once(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _write_issue_jsonl(drop / "a.jsonl", "GDL-1900-01-02-a")
    q = stream_canonical_issues(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 1

    # second batch: only the new file is processed
    _write_issue_jsonl(drop / "b.jsonl", "GDL-1900-01-03-a")
    q = stream_canonical_issues(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 2
    assert {r["id"] for r in df.select("id").collect()} == {
        "GDL-1900-01-02-a",
        "GDL-1900-01-03-a",
    }

    # idempotent re-run: checkpoint prevents re-import
    q = stream_canonical_issues(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2
