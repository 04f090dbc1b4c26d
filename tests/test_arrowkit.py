"""Unit tests for the round-12 Arrow fast-path helpers: the round-cutoff
algebra is checked against a literal re-implementation of Spark's
Round(DoubleType) semantics (BigDecimal.valueOf == shortest decimal,
HALF_UP), and java_tokens against Spark's split(trim(...)) on
adversarial strings (Spark test lives in test_arrowkit_spark below and
runs under the shared session fixture used by the other suites)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from impresso_ta.operators.arrowkit import (
    ge_round_cutoff,
    java_tokens,
    le_round_cutoff,
)


def spark_round(x: float, r: int) -> float:
    """Literal Spark Round(DoubleType): BigDecimal.valueOf(x) (shortest
    decimal repr) .setScale(r, HALF_UP) .toDouble."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-r), ROUND_HALF_UP)
    )


def _probe_values(threshold: float, r: int) -> list[float]:
    """Doubles clustered around every rounding boundary near threshold."""
    out = []
    step = 10.0**-r
    for k in range(-3, 4):
        for base in (
            threshold + k * step,
            threshold + (k + 0.5) * step,
            threshold + (k - 0.5) * step,
        ):
            v = base
            for _ in range(3):
                v = math.nextafter(v, -math.inf)
            for _ in range(7):
                out.append(v)
                v = math.nextafter(v, math.inf)
    return [v for v in out if v > 0]


@pytest.mark.parametrize(
    "threshold,r",
    [(0.35, 4), (0.7, 4), (0.8, 4), (0.15, 4), (0.5, 6), (0.123456, 4),
     (0.1, 2), (0.99995, 4), (1.0, 4)],
)
def test_ge_cutoff_matches_spark_round(threshold, r):
    c = ge_round_cutoff(threshold, r)
    for v in _probe_values(threshold, r):
        assert (spark_round(v, r) >= threshold) == (v >= c), (
            v.hex(),
            spark_round(v, r),
            c.hex(),
        )


@pytest.mark.parametrize(
    "threshold,r",
    [(0.15, 4), (0.10, 4), (0.05, 4), (0.35, 4), (0.123456, 4), (1.0, 4)],
)
def test_le_cutoff_matches_spark_round(threshold, r):
    c = le_round_cutoff(threshold, r)
    for v in _probe_values(threshold, r):
        assert (spark_round(v, r) <= threshold) == (v <= c), (
            v.hex(),
            spark_round(v, r),
            c.hex(),
        )


ADVERSARIAL = [
    "",
    " ",
    "   ",
    "\t",
    "\ta b",
    "a  b\tc",
    " a b ",
    "a b",          # NBSP is NOT Java \s — stays inside the token
    "x y\r\n z",
    "one",
    "a " * 5,
    "\t\t",
    "x\ty\t",
    "7 !! ?? a1",
]


def test_java_tokens_shapes():
    assert java_tokens("") == [""]
    assert java_tokens("   ") == [""]
    assert java_tokens("\ta b") == ["", "a", "b"]
    assert java_tokens("a  b") == ["a", "b"]
    assert java_tokens("a b ") == ["a", "b"]
    assert java_tokens("a b") == ["a b"]
    # Spark split has limit=-1 (Pattern.split(input, -1)): trailing
    # empties are KEPT; trim strips only 0x20, so a trailing tab leaves
    # one behind
    assert java_tokens("\t") == ["", ""]
    assert java_tokens("a\t") == ["a", ""]


def test_java_tokens_vs_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "text string")
    rows = df.select(
        "text", F.split(F.trim("text"), r"\s+").alias("toks")
    ).collect()
    for row in rows:
        assert java_tokens(row["text"]) == row["toks"], repr(row["text"])
