"""Binned range join — point-in-interval matching as an EQUI-join.

Spark executes an inequality join condition (``r.ts BETWEEN l.start AND
l.end``) as BroadcastNestedLoopJoin — O(|L|·|R|) and a non-starter at
scale. The standard fix is temporal binning: both sides map to fixed
time bins, the join becomes an equi-join on (key, bin) that Catalyst
shuffles normally, and the exact inequality runs as a residual filter on
the (small) candidate set. Candidate volume is |R| · (1 + len/W) for
intervals of length ``len`` and bin width ``W`` — pick W ≈ the typical
interval length.

DuckDB's optimizer has a native IEJoin for this (the oracle
``j13_range_join_binned`` uses the plain inequality form) — two
independent strategies agreeing on every row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_seconds(df: DataFrame, name: str) -> Column:
    """Column as epoch seconds. TIMESTAMP_NTZ can't cast straight to
    BIGINT (ANSI); route it through TIMESTAMP (session tz is pinned UTC,
    so the reinterpretation is identity)."""
    if dict(df.dtypes).get(name, "").startswith("timestamp"):
        return F.col(name).cast("timestamp").cast("long")
    return F.col(name).cast("long")


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    point_ts: str = "ts",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point to every interval of the same key containing
    it (``start <= ts < end``). Returns interval columns + point columns.

    Interval rows explode to the bins they overlap (``sequence`` over
    truncated epoch seconds — bins COVER the interval, the residual
    predicate trims the edges), points map to one bin each.
    """
    w = F.lit(bin_seconds)
    i_binned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(intervals, start_col) / w),
                F.floor(_epoch_seconds(intervals, end_col) / w),
            )
        ),
    )
    p_binned = points.withColumn(
        "_bin", F.floor(_epoch_seconds(points, point_ts) / w)
    )
    return (
        i_binned.join(p_binned, [key, "_bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str = "l_start",
    left_end: str = "l_end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join (half-open: ``l_start < r_end AND
    r_start < l_end``) as an equi-join — the other member of the
    temporal-join family (:func:`point_in_interval_join` is the
    degenerate point case).

    Both sides explode to the bins they cover and equi-join on
    (key, bin). A pair overlapping in SEVERAL shared bins would emit
    once per bin; instead of a distinct (an extra shuffle of the whole
    result), each match is kept only in its FIRST shared bin — the bin
    containing ``greatest(l_start, r_start)``, which every genuinely
    overlapping pair shares by construction. Candidate volume is
    Σ intervals·(1 + len/W); no BNLJ, no result-wide dedup shuffle.
    """
    w = F.lit(bin_seconds)
    l_binned = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(left, left_start) / w),
                F.floor(_epoch_seconds(left, left_end) / w),
            )
        ),
    )
    r_binned = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(right, right_start) / w),
                F.floor(_epoch_seconds(right, right_end) / w),
            )
        ),
    )
    overlap_start_bin = F.floor(
        F.greatest(
            _epoch_seconds(left, left_start),
            _epoch_seconds(right, right_start),
        )
        / w
    )
    return (
        l_binned.join(r_binned, [key, "_bin"])
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
        .filter(F.col("_bin") == overlap_start_bin)
        .drop("_bin")
    )
