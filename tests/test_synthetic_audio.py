"""The synthetic audio corpus generator (bench twin of the print
synthesis): JVM-only synthesis, valid canonical audio shapes, and the
ssb/ub/sb offset structure the rebuild produces from it."""

import math

from pyspark.sql import functions as F

from impresso_ta.plans import synthetic_audio_corpus
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.rebuild.solr import split_errors


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def test_audio_synthesis_shapes_and_offsets(spark):
    # 120 'en' words → 3 utterances of <=50 words, one section
    text = " ".join(f"w{i}" for i in range(120))
    iss, recs = synthetic_audio_corpus(_docs(spark, [(text, "en")]))
    rec = recs.collect()[0].asDict(recursive=True)
    assert rec["dur"] == "00:01:00"  # 120 * 0.5s
    sec = rec["s"][0]
    assert sec["tc"] == [0.0, 60.0]
    assert [len(u["ss"][0]["t"]) for u in sec["u"]] == [50, 50, 20]
    assert sec["u"][1]["tc"] == [25.0, 25.0]  # words 50-99 at 0.5s each
    assert sec["u"][0]["ss"][0]["t"][3] == {"tx": "w3", "tc": [1.5, 0.4]}

    ok, err = split_errors(rebuild_issues_solr(iss, recs, ts="2024-01-01T00:00:00Z"))
    assert err.count() == 0
    row = ok.collect()[0].asDict(recursive=True)
    # 'en' has whitespace rules: plain words → single-space joined
    assert row["ft"].rstrip() == text
    n_utts = math.ceil(120 / 50)
    assert len(row["ssb"]) == n_utts  # one speech-seg END per segment
    assert len(row["ub"]) == n_utts - 1  # offsets appended after first
    assert row["sb"] == []  # single section
    assert len(row["rreb"][0]["t"]) == 120


def test_audio_synthesis_is_jvm_only(spark):
    """Synthesis must stay in whole-stage codegen/JVM expressions — no
    Python UDF stage (the benchmark measures the rebuild engine)."""
    text = " ".join(f"w{i}" for i in range(10))
    iss, recs = synthetic_audio_corpus(_docs(spark, [(text, "en")] * 4))
    for df in (iss, recs):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_audio_synthesis_unique_ids(spark):
    rows = [("hello world", "en")] * 200
    iss, recs = synthetic_audio_corpus(_docs(spark, rows))
    assert iss.select("id").distinct().count() == 200
    assert recs.select("id").distinct().count() == 200
    # issue rr points at its own record
    joined = iss.select(F.explode("rr").alias("rid")).join(
        recs.select(F.col("id").alias("rid")), "rid"
    )
    assert joined.count() == 200
