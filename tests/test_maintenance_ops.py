"""Lake-maintenance + diagnostics operators: compaction planning
(layout.py), key-skew profiling (skew.py), weighted sampling
(corpus.py)."""

import pytest

from pyspark.sql import functions as F

from impresso_ta.operators.corpus import weighted_sample
from impresso_ta.operators.layout import compaction_plan
from impresso_ta.operators.skew import profile_key_skew


def _listing(spark, rows):
    return spark.createDataFrame(rows, "path string, bytes long, part string")


def test_compaction_plan_flags_small_file_partitions(spark):
    rows = [(f"a/{i}", 10, "a") for i in range(100)]  # 100×10B → 1 file
    rows += [("b/0", 1000, "b")]  # one right-sized file
    plan = {
        r.part: r
        for r in compaction_plan(
            _listing(spark, rows), ["part"], target_bytes=1000
        ).collect()
    }
    a, b = plan["a"], plan["b"]
    assert (a.n_files, a.total_bytes, a.target_files) == (100, 1000, 1)
    assert a.files_to_merge == 99 and a.needs_compaction
    assert b.files_to_merge == 0 and not b.needs_compaction


def test_compaction_plan_integer_ceil_and_floor_partition(spark):
    # 2500 bytes at target 1000 → ceil = 3 target files
    rows = [(f"c/{i}", 250, "c") for i in range(10)]
    (r,) = compaction_plan(
        _listing(spark, rows), ["part"], target_bytes=1000
    ).collect()
    assert r.target_files == 3 and r.files_to_merge == 7


def test_compaction_plan_leaves_compacted_large_files_alone(spark):
    # many LARGE files: files_to_merge > 0 but no small files → no-op
    rows = [(f"d/{i}", 900, "d") for i in range(10)]  # 9000B → 9 targets
    (r,) = compaction_plan(
        _listing(spark, rows), ["part"], target_bytes=1000
    ).collect()
    assert r.files_to_merge == 1 and r.n_small_files == 0
    assert not r.needs_compaction


def test_profile_key_skew_counts_and_ranks(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = profile_key_skew(df, "k", n_partitions=4, top_k=2).collect()
    assert [(r.key, r.n_rows, r.rank) for r in got] == [
        ("hot", 70, 1),
        ("warm", 20, 2),
    ]
    assert got[0].share_ppm == 70 * 1_000_000 // 100
    assert all(0 <= r.hash_partition < 4 for r in got)


def test_profile_key_skew_tie_break_on_key(spark):
    df = spark.createDataFrame([("b",), ("a",)], "k string")
    got = profile_key_skew(df, "k", top_k=2).collect()
    assert [r.key for r in got] == ["a", "b"]


def test_weighted_sample_bias_and_determinism(spark):
    # 500 rows, half weight 1, half weight 1000: heavy rows dominate
    rows = [(i, 1000 if i % 2 == 0 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got1 = weighted_sample(df, "doc_id", "w", n=50).collect()
    got2 = weighted_sample(df.repartition(7), "doc_id", "w", n=50).collect()
    assert got1 == got2  # partitioning-invariant
    heavy = sum(1 for r in got1 if r.doc_id % 2 == 0)
    assert heavy >= 45  # ~1000:1 odds per slot
    assert len(got1) == 50
    # priorities really are the n smallest
    all_pri = weighted_sample(df, "doc_id", "w", n=500).collect()
    assert [r.doc_id for r in got1] == [r.doc_id for r in all_pri[:50]]


def test_weighted_sample_rejects_nonpositive_weight(spark):
    df = spark.createDataFrame([(1, 5), (2, 0)], "doc_id long, w long")
    with pytest.raises(Exception, match="weights must be positive"):
        weighted_sample(df, "doc_id", "w", n=2).collect()
    with pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", n=0)


def test_profile_columns_counts(spark):
    from impresso_ta.operators.validate import profile_columns

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 3), (None, 3)],
        "s string, x int",
    )
    got = {r.column: r for r in profile_columns(df, ["s", "x"]).collect()}
    assert (got["s"].n_rows, got["s"].n_null, got["s"].n_distinct) == (4, 1, 2)
    assert (got["s"].min_val, got["s"].max_val) == ("a", "b")
    assert (got["x"].n_rows, got["x"].n_null, got["x"].n_distinct) == (4, 1, 2)
    assert (got["x"].min_val, got["x"].max_val) == ("1", "3")


def test_debounce_keeps_first_and_gapped(spark):
    from pyspark.sql import functions as F

    from impresso_ta.operators.windows import debounce

    rows = [(1, "k", 0.0), (2, "k", 30.0), (3, "k", 61.0), (4, "k", 200.0),
            (5, "other", 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, k string, tsec double"
    ).withColumn("ts", F.timestamp_seconds("tsec"))
    kept = sorted(
        r.event_id
        for r in debounce(
            df, ["k"], "ts", 60, tie_cols=["event_id"]
        ).collect()
    )
    # 1 kept (first); 2 dropped (30s after 1); 3 dropped (31s after 2 —
    # lag-based: judged vs IMMEDIATE predecessor, not last kept, so a
    # burst suppresses its own tail); 4 kept (139s); 'other' independent
    assert kept == [1, 4, 5]


def test_debounce_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from impresso_ta.operators.windows import debounce

    rows = [(i, "k", float(i * 37 % 500)) for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_id long, k string, tsec double"
    ).withColumn("ts", F.timestamp_seconds("tsec"))
    a = sorted(r.event_id for r in debounce(df, ["k"], "ts", 10, tie_cols=["event_id"]).collect())
    b = sorted(r.event_id for r in debounce(df.repartition(9), ["k"], "ts", 10, tie_cols=["event_id"]).collect())
    assert a == b
