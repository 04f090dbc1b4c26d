"""Decompose the r12 exact_substring rewrite: time each variant of the
two changed stages independently (noop sink, min of N, clearCache).

Variants:
  win_old   - transform(sequence)+slice+array_join+md5 lambda (r11)
  win_new   - zip_with gram chain + posexplode + codegen md5 + unhex
  win_hex   - zip_with gram chain + posexplode + codegen md5 (hex key)
  win_seqbin- r11 lambda but unhex(md5) binary key
  gap_old   - flatten kept indices + element_at per token (r11)
  gap_new   - per-gap slice+array_join (r12)
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from impresso_ta import queries as catalog
from impresso_ta.operators.dedup import _word_grams
from impresso_ta.session import get_spark

K = 8


def win_old(base: DataFrame) -> DataFrame:
    return base.filter(F.size("_w") >= K).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - (K - 1)),
                lambda p: F.struct(
                    p.alias("p"),
                    F.md5(
                        F.array_join(F.slice(F.col("_w"), p, K), " ")
                    ).alias("h"),
                ),
            )
        ).alias("_s"),
    ).select("doc_id", "_s.p", "_s.h")


def win_seqbin(base: DataFrame) -> DataFrame:
    return base.filter(F.size("_w") >= K).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - (K - 1)),
                lambda p: F.struct(
                    p.alias("p"),
                    F.unhex(F.md5(
                        F.array_join(F.slice(F.col("_w"), p, K), " ")
                    )).alias("h"),
                ),
            )
        ).alias("_s"),
    ).select("doc_id", "_s.p", "_s.h")


def win_new(base: DataFrame) -> DataFrame:
    return (
        base.filter(F.size("_w") >= K)
        .select(
            "doc_id",
            F.posexplode(_word_grams(F.col("_w"), K)).alias("p0", "_g"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("int").alias("p"),
            F.unhex(F.md5("_g")).alias("h"),
        )
    )


def win_hex(base: DataFrame) -> DataFrame:
    return (
        base.filter(F.size("_w") >= K)
        .select(
            "doc_id",
            F.posexplode(_word_grams(F.col("_w"), K)).alias("p0", "_g"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("int").alias("p"),
            F.md5("_g").alias("h"),
        )
    )


def rewrite_old(base: DataFrame, marked: DataFrame) -> DataFrame:
    ps = F.array_sort(F.col("_ps"))
    n = F.size("_w")
    gap_starts = F.concat(F.array(F.lit(1)), F.transform(ps, lambda p: p + K))
    gap_ends = F.concat(F.transform(ps, lambda p: p - 1), F.array(n))
    kept_idx = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda s, e: F.when(e >= s, F.sequence(s, e)).otherwise(
                F.array().cast("array<int>")
            ),
        )
    )
    kept = F.transform(kept_idx, lambda i: F.element_at(F.col("_w"), i))
    return (
        base.join(marked, "doc_id", "left")
        .withColumn("_ps", F.coalesce(F.col("_ps"), F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.size("_w").cast("long").alias("n_tokens"),
            (F.size("_w") - F.size(kept)).cast("long").alias("n_removed"),
            F.array_join(kept, " ").alias("kept_text"),
        )
    )


def rewrite_new(base: DataFrame, marked: DataFrame) -> DataFrame:
    ps = F.array_sort(F.col("_ps"))
    n = F.size("_w")
    gap_starts = F.concat(F.array(F.lit(1)), F.transform(ps, lambda p: p + K))
    gap_ends = F.concat(F.transform(ps, lambda p: p - 1), F.array(n))
    gap_strs = F.zip_with(
        gap_starts,
        gap_ends,
        lambda s, e: F.when(
            e >= s, F.array_join(F.slice(F.col("_w"), s, e - s + 1), " ")
        ),
    )
    n_kept = F.aggregate(
        F.zip_with(
            gap_starts, gap_ends, lambda s, e: F.greatest(e - s + 1, F.lit(0))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    kept_text = F.array_join(F.filter(gap_strs, lambda g: g.isNotNull()), " ")
    return (
        base.join(marked, "doc_id", "left")
        .withColumn("_ps", F.coalesce(F.col("_ps"), F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.size("_w").cast("long").alias("n_tokens"),
            (F.size("_w") - n_kept).cast("long").alias("n_removed"),
            kept_text.alias("kept_text"),
        )
    )


def full(base: DataFrame, win_fn, rewrite_fn) -> DataFrame:
    win = win_fn(base)
    firsts = win.groupBy("h").agg(
        F.min(F.struct("doc_id", "p")).alias("first"),
        F.count("*").alias("cnt"),
    )
    marked = (
        win.join(firsts, "h")
        .filter(
            (F.col("cnt") > 1)
            & ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("p") == F.col("first.p"))
            )
        )
        .groupBy("doc_id")
        .agg(F.collect_list("p").alias("_ps"))
    )
    return rewrite_fn(base, marked)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    which = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    spark = get_spark(
        app_name="r12-variants-exact-substring",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.t(spark, sf, "documents")
    docs.count()
    base = docs.select(
        F.col("doc_id").alias("doc_id"),
        F.split(F.trim(F.col("text")), r"\s+").alias("_w"),
    )

    wins = {"win_old": win_old, "win_seqbin": win_seqbin,
            "win_new": win_new, "win_hex": win_hex}
    rewrites = {"gap_old": rewrite_old, "gap_new": rewrite_new}

    # stage A: window frame alone (explode+hash), no downstream
    for name, fn in wins.items():
        if which and name not in which:
            continue
        times = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            fn(base).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(f"STAGE-A {name}: min={min(times)} all={times}", flush=True)

    # full pipeline combos
    for (wn, wf), (rn, rf) in itertools.product(
        wins.items(), rewrites.items()
    ):
        combo = f"{wn}+{rn}"
        if which and combo not in which:
            continue
        times = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{combo} run{i}")
            t0 = time.time()
            full(base, wf, rf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(f"FULL {combo}: min={min(times)} all={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
