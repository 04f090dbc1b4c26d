"""As-of (backward) join — an operator Spark's DataFrame API lacks.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (market-data / event-state
semantics; DuckDB and kdb expose it natively as ASOF JOIN).

Implementation is the SCALABLE composition, not a per-key range join:
tag both sides, union, and run one ``last_value(..., ignorenulls)``
window per key ordered by (ts, side) — right rows sort before left rows
at equal timestamps so a same-instant state is visible. One shuffle on
the key, no range-explode, no per-key cross product; skew is bounded by
the window (a hot key's rows stay one partition but the scan is linear).
The DuckDB oracle runs its NATIVE ``ASOF LEFT JOIN`` against this plan
(query ``j12_asof_join``) — an independent implementation agreeing on
every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_col: str = "value",
    out_col: str = "asof_value",
) -> DataFrame:
    """Backward as-of join: left rows + latest right ``value_col`` at or
    before each left timestamp (null when no prior right row).

    ``right`` must be unique per (key, ts) — pre-aggregate if not (the
    tie value would otherwise be engine-dependent).
    """
    # The carried state is a non-null *presence struct*, not the bare
    # value: a right row whose value is NULL must still be "the match"
    # (native ASOF JOIN returns that row's NULL), so ignorenulls must
    # skip only left rows, never a right row.
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None)
        .cast(f"struct<v:{right.schema[value_col].dataType.simpleString()}>")
        .alias("_m"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        F.struct(F.col(value_col).alias("v")).alias("_m"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_asof", F.last("_m", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(F.col("_row.*"), F.col("_asof.v").alias(out_col))
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_col: str = "value",
    out_col: str = "asof_value",
) -> DataFrame:
    """Forward as-of join: left rows + EARLIEST right ``value_col`` at or
    after each left timestamp (null when no later right row) — the
    next-event / time-to-event direction. Same single key-window plan as
    the backward form, mirrored: the frame looks forward and right rows
    sort AFTER left rows at equal timestamps so a same-instant right row
    is visible as the match.
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None)
        .cast(f"struct<v:{right.schema[value_col].dataType.simpleString()}>")
        .alias("_m"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        F.struct(F.col(value_col).alias("v")).alias("_m"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        unioned.withColumn("_asof", F.first("_m", ignorenulls=True).over(w))
        .filter(F.col("_side") == 0)
        .select(F.col("_row.*"), F.col("_asof.v").alias(out_col))
    )
