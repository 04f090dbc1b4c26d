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


def _sketch_and_counts_arrow(
    docs: DataFrame, text_col: str, d: int, w: int
) -> DataFrame:
    """One ``mapInArrow`` corpus pass emitting BOTH count-min cell
    partials and word-count partials (guide §4.2): per batch, one
    tokenization feeds a word ``Counter``; each DISTINCT word's d
    md5-derived cells (memoized per task) accumulate its count into a
    local d×w table. Rows: ``(word, NULL, NULL, c)`` word partials and
    ``(NULL, row, col, c)`` cell partials — ≤ |distinct words| + d·w
    rows per batch, map-side-combined by the downstream groupBys.
    Arithmetic is exact integers; the md5→col derivation is the
    bit-identical Python twin of :func:`_cm_col` (same bytes hashed,
    same 48-bit prefix, same modulus)."""
    from hashlib import md5

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from impresso_ta.operators.partitioning import spread_small_input

    out_schema = StructType(
        [
            StructField("word", StringType()),
            StructField("row", IntegerType()),
            StructField("col", LongType()),
            StructField("c", LongType()),
        ]
    )
    base = spread_small_input(docs.select(F.col(text_col).alias("_t")))

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from collections import Counter

        from pyspark.sql.pandas.types import to_arrow_schema

        from impresso_ta.operators.arrowkit import java_tokens

        arrow_schema = to_arrow_schema(out_schema)
        cols_memo: dict[str, list[int]] = {}

        def cells_of(word: str) -> list[int]:
            cs = cols_memo.get(word)
            if cs is None:
                if len(cols_memo) > 1_000_000:
                    cols_memo.clear()
                cs = [
                    int.from_bytes(
                        md5(f"cm{r}:{word}".encode("utf-8")).digest()[:6],
                        "big",
                    )
                    % w
                    for r in range(d)
                ]
                cols_memo[word] = cs
            return cs

        for batch in batches:
            wc: Counter = Counter()
            for text in batch.column(0).to_pylist():
                if text is None:
                    continue
                wc.update(java_tokens(text))
            if not wc:
                continue
            table = np.zeros((d, w), dtype=np.int64)
            for word, c in wc.items():
                for r, col in enumerate(cells_of(word)):
                    table[r, col] += c
            rs, cs = np.nonzero(table)
            n_words = len(wc)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        list(wc.keys()) + [None] * len(rs), type=pa.string()
                    ),
                    pa.array([None] * n_words + list(rs), type=pa.int32()),
                    pa.array([None] * n_words + list(cs), type=pa.int64()),
                    pa.array(
                        list(wc.values()) + list(table[rs, cs]),
                        type=pa.int64(),
                    ),
                ],
                schema=arrow_schema,
            )

    return base.mapInArrow(fn, schema=out_schema)


def heavy_hitter_estimates(
    docs: DataFrame,
    text_col: str = "text",
    d: int = 4,
    w: int = 256,
    top_k: int = 20,
    engine: str = "arrow",
) -> DataFrame:
    """Exact top-k words with their count-min estimates: (word, tf,
    cm_estimate). The estimate is min over the d rows — never below the
    true count (CM guarantee; the overestimate bound is εN with
    ε = e/w at δ = e^-d).

    The sketch (d·w rows) broadcasts to the probe join; probes are the
    exact top-k from the vocabulary aggregate, so the output doubles as
    a collision audit: cm_estimate == tf exactly when no heavier word
    shares all d cells.

    ``engine="arrow"`` (r12, guide §4.2): sketch-cell and word-count
    partials come from ONE fused Arrow corpus pass
    (:func:`_sketch_and_counts_arrow`) — one tokenization instead of
    two JVM scans, md5 per distinct word per task instead of 4 md5
    expressions per token occurrence. Probe top-k keeps vocabulary's
    (tf desc, word asc) order; ``df`` is not computed (this output
    never used it). ``"expr"`` keeps the two-scan JVM reference form.
    """
    from impresso_ta.operators.corpus import vocabulary

    if engine == "arrow":
        # persisted: BOTH aggregates below hang off the one Arrow pass —
        # unpersisted, the corpus would ship through Python twice. The
        # frame is partial-aggregate-sized (≤ distinct-words + d·w rows
        # per batch), not corpus-sized; same action-scoped residency
        # trade as the MinHash signature persist.
        fused = _sketch_and_counts_arrow(docs, text_col, d, w).persist()
        sketch = (
            fused.filter(F.col("row").isNotNull())
            .groupBy("row", "col")
            .agg(F.sum("c").alias("c"))
        )
        probes = (
            fused.filter(F.col("row").isNull())
            .groupBy("word")
            .agg(F.sum("c").cast("long").alias("tf"))
            .orderBy(F.desc("tf"), F.asc("word"))
            .limit(top_k)
        )
    else:
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
