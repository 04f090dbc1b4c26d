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
