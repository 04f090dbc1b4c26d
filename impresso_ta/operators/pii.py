"""PII detection and redaction over document text.

A training-data pipeline has to find and strip personal data (emails,
phone numbers, IP addresses) before export. Detection and redaction are
pure column expressions — `regexp_count` / `regexp_replace` run inside
whole-stage codegen, so the corpus is scanned once with no Python in the
hot path, and the scan prunes to (id, text).

The synthetic corpus is PII-free word soup, so `inject_pii` plants
deterministic, doc_id-derived PII in a known subset of documents —
every piece of it reproducible from doc_id arithmetic alone, which is
what lets a SQL oracle (and a test) compute the expected counts
independently. Patterns stick to the regex subset Java and RE2 agree
on (character classes, bounded repetition, `\\b`).

Generalizes the reference's value-rule validation stage
(text_preparation/utils.py `validate_format`-style checks) from schema
conformance to content scrubbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{2} \d{2} \d{3} \d{2} \d{2}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# redaction order: email first (it can contain digit runs), then phone,
# then IP — each replacement token contains no digits or '@', so later
# passes can't re-match earlier redactions
_CATEGORIES = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ipv4", IPV4_RE, "[IP]"),
)


def inject_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Append deterministic doc_id-derived PII to a known subset:
    emails on id%3==0, phones on id%4==0, IPv4s on id%5==0 (subsets
    overlap, so some docs carry several kinds and most carry none)."""
    i = F.col(id_col)

    def pad(expr: Column, width: int) -> Column:
        return F.lpad(expr.cast("string"), width, "0")

    email = F.concat(F.lit(" Reach user"), i.cast("string"), F.lit("@example.com now."))
    phone = F.concat(
        F.lit(" Call +41 21 "),
        pad((i * 7) % 1000, 3),
        F.lit(" "),
        pad((i * 13) % 100, 2),
        F.lit(" "),
        pad((i * 17) % 100, 2),
        F.lit("."),
    )
    ipv4 = F.concat(
        F.lit(" Host 192.168."),
        (i % 256).cast("string"),
        F.lit("."),
        ((i * 3) % 256).cast("string"),
        F.lit(" up."),
    )
    blank = F.lit("")
    return docs.withColumn(
        text_col,
        F.concat(
            F.col(text_col),
            F.when(i % 3 == 0, email).otherwise(blank),
            F.when(i % 4 == 0, phone).otherwise(blank),
            F.when(i % 5 == 0, ipv4).otherwise(blank),
        ),
    )


def pii_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII counts by category plus a has_pii flag."""
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pattern)).cast("long").alias(f"n_{name}")
        for name, pattern, _ in _CATEGORIES
    ]
    out = docs.select(F.col(id_col).alias("doc_id"), *counts)
    total = sum((F.col(f"n_{name}") for name, _, _ in _CATEGORIES), F.lit(0))
    return out.withColumn("has_pii", total > 0)


def redact_pii(text: Column) -> Column:
    """Replace every detected PII span with its category token."""
    for _, pattern, token in _CATEGORIES:
        text = F.regexp_replace(text, pattern, token)
    return text


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Detection + redaction in one pass: category counts, has_pii, and
    a fingerprint of the redacted text (md5 — the full redacted corpus
    would be the sink payload; the fingerprint is the checkable part)."""
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pattern)).cast("long").alias(f"n_{name}")
        for name, pattern, _ in _CATEGORIES
    ]
    total = sum(
        (F.regexp_count(text, F.lit(p)) for _, p, _ in _CATEGORIES), F.lit(0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        (total > 0).alias("has_pii"),
        F.md5(redact_pii(text)).alias("redacted_fp"),
    )
