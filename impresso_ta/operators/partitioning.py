"""Partitioning utilities shared by the compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when the scan yields
    fewer partitions than cores.

    Parquet parallelism is bounded by ROW GROUPS, not byte splits — a
    small single-row-group file pins every narrow transform fused onto
    its scan (shingle md5, tokenization, 64-dim dot products) to ONE
    core no matter what ``maxPartitionBytes`` says. When the downstream
    work per row dwarfs the row (explodes, per-centroid scoring), paying
    one shuffle of the raw rows to unlock N-way compute is the right
    trade — measured 3× on the sf0.1 shingle explode. At 100 TB the
    scan already has ~10⁶ splits and this is an explicit no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
