"""Count-min sketch heavy hitters — sublinear-memory frequency
estimation (Cormode & Muthukrishnan 2005), the mergeable-sketch
companion to the HLL++ distinct-count path (see tests/test_sketches.py).

At 100 TB the exact word histogram is vocabulary-sized and already
cheap, but per-(domain, time-bucket) histograms multiply that by the
grouping cardinality; a d×w count-min table per group is fixed-size,
map-side mergeable (cell-wise sum — the same partial-aggregation shape
Spark's own sketches use), and never underestimates. Hashing is
md5-derived so the sketch is bit-identical across engines — the DuckDB
oracle rebuilds the exact same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from impresso_ta.operators.partitioning import spread_small_input


def _cm_col(word, row: int, w: int):
    """Column index of ``word`` in sketch row ``row`` (md5-derived)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{row}:"), word)), 1, 12),
            16,
            10,
        ).cast("long")
        % w
    )


def count_min_sketch(
    docs: DataFrame,
    text_col: str = "text",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Build the d×w sketch over the corpus token stream: one explode,
    one groupBy on (row, col) — only d·w distinct groups, so map-side
    combine collapses each task's stream to ≤ d·w rows before the
    exchange regardless of corpus size."""
    words = spread_small_input(docs).select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    )
    cells = words.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_col(F.col("word"), r, w).alias("col"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell")
    ).select(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return cells.groupBy("row", "col").agg(F.count("*").alias("c"))


def heavy_hitter_estimates(
    docs: DataFrame,
    text_col: str = "text",
    d: int = 4,
    w: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """Exact top-k words with their count-min estimates: (word, tf,
    cm_estimate). The estimate is min over the d rows — never below the
    true count (CM guarantee; the overestimate bound is εN with
    ε = e/w at δ = e^-d).

    The sketch (d·w rows) broadcasts to the probe join; probes are the
    exact top-k from the vocabulary aggregate, so the output doubles as
    a collision audit: cm_estimate == tf exactly when no heavier word
    shares all d cells.
    """
    from impresso_ta.operators.corpus import vocabulary

    sketch = count_min_sketch(docs, text_col, d, w)
    probes = vocabulary(docs, text_col=text_col, top_k=top_k).select(
        "word", "tf"
    )
    probe_cells = probes.select(
        "word",
        "tf",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_col(F.col("word"), r, w).alias("col"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell"),
    ).select("word", "tf", F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("word")
        .agg(
            F.first("tf").alias("tf"),
            F.min("c").cast("long").alias("cm_estimate"),
        )
        .select("word", "tf", "cm_estimate")
    )
