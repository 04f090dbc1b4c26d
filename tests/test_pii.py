"""PII detection/redaction: known-plant recall, clean-doc precision,
redaction idempotence and completeness."""

from pyspark.sql import functions as F

from impresso_ta.operators.pii import (
    inject_pii,
    pii_features,
    pii_scan,
    redact_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_detects_each_category(spark):
    d = _docs(
        spark,
        [
            (1, "write to a.b-c_d@sub.domain.org today"),
            (2, "dial +41 21 555 01 23 now"),
            (3, "server at 10.0.255.1 replied"),
            (4, "plain text with no personal data"),
            (5, "x@y.io and 1.2.3.4 and +33 61 234 56 78"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_features(d).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 1, 0)
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 1)
    assert not out[4]["has_pii"]
    assert (out[5]["n_email"], out[5]["n_phone"], out[5]["n_ipv4"]) == (1, 1, 1)


def test_injection_counts_follow_doc_id_arithmetic(spark):
    d = _docs(spark, [(i, f"doc {i} body") for i in range(60)])
    out = {r["doc_id"]: r for r in pii_scan(inject_pii(d)).collect()}
    for i in range(60):
        assert out[i]["n_email"] == (1 if i % 3 == 0 else 0), i
        assert out[i]["n_phone"] == (1 if i % 4 == 0 else 0), i
        assert out[i]["n_ipv4"] == (1 if i % 5 == 0 else 0), i
        assert out[i]["has_pii"] == (i % 3 == 0 or i % 4 == 0 or i % 5 == 0)


def test_redaction_complete_and_idempotent(spark):
    d = inject_pii(_docs(spark, [(i, f"doc {i} body") for i in range(0, 120, 12)]))
    red = d.select("doc_id", redact_pii(F.col("text")).alias("text"))
    # nothing detectable remains after redaction
    assert red.where(
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9._%+-]+@"))
        + F.regexp_count(F.col("text"), F.lit(r"\+\d{2} \d{2}"))
        + F.regexp_count(F.col("text"), F.lit(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"))
        > 0
    ).count() == 0
    # second pass is a no-op
    twice = d.select(
        "doc_id",
        (redact_pii(redact_pii(F.col("text"))) == redact_pii(F.col("text"))).alias("same"),
    )
    assert twice.where(~F.col("same")).count() == 0
    # tokens present where PII was planted (doc_ids all ≡ 0 mod 12)
    row = red.where(F.col("doc_id") == 60).collect()[0]
    assert "[EMAIL]" in row["text"] and "[PHONE]" in row["text"] and "[IP]" in row["text"]
