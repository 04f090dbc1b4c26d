"""One-off probe (VERDICT r10 "What's missing" #3): the contracted
exact-Jaccard output contract at HIGH clone multiplicity — the regime
`jaccard_prefix_contracted`'s docstring names for its 100 TB claim.

The sf1 bench corpus carries only 10x exact clones per text, and there
both forms time ~11 s because the prefix VERIFY dominates. The claim
under test is about EMISSION: the expanded pair set grows with
clone_multiplicity² (every near-dup text pair fans out n_a x n_b ways,
every clone group emits m·(m-1)/2 intra pairs), while the contracted
set's size is the number of DISTINCT near-dup text pairs — flat in
multiplicity. This probe builds clone corpora at 10x and 100x over the
sf0.1 distinct texts (5,000 texts -> 50k / 500k rows; at 100x the
expanded intra emission alone is 5,000 x C(100,2) ≈ 24.7M rows) and
measures wall time (noop sink — full output materialization) and
output rows for both forms.

Usage: python tools/probe_contracted_jaccard.py
Writes tools/contracted_jaccard_results.json; prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1/documents.parquet"


def clone_corpus(spark, mult: int, path: str):
    """Every sf0.1 text repeated ``mult`` times under distinct doc ids
    (the gen_bigsf clone convention: id = orig_id * mult + copy)."""
    from pyspark.sql import functions as F

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(SRC).select("doc_id", "text")
        (
            docs.select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(mult - 1))
                ).alias("_c"),
                "doc_id",
                "text",
            )
            .select(
                (F.col("doc_id") * mult + F.col("_c")).alias("doc_id"),
                "text",
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def main() -> None:
    from impresso_ta.operators.dedup import (
        jaccard_prefix_contracted,
        jaccard_prefix_pairs,
    )
    from impresso_ta.session import get_spark

    spark = get_spark(
        app_name="impresso_ta-contracted-probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {"params": {"n_distinct_texts": 5000}}

    def timed_once(build) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for mult in (10, 100):
        tag = f"{mult}x_clones"
        corpus = clone_corpus(
            spark, mult, os.path.join(REPO, "testdata", f"clones{mult}")
        )
        n = corpus.count()
        # single runs: the expanded form's number IS output volume, and
        # the contracted form is seconds-scale — min-of-N would double a
        # multi-minute emission measurement to protect nothing
        expanded_s = timed_once(lambda: jaccard_prefix_pairs(corpus))
        contracted_s = timed_once(lambda: jaccard_prefix_contracted(corpus))
        spark.catalog.clearCache()
        expanded_rows = jaccard_prefix_pairs(corpus).count()
        spark.catalog.clearCache()
        contracted_rows = jaccard_prefix_contracted(corpus).count()
        results[tag] = {
            "corpus_rows": n,
            "expanded_sec": expanded_s,
            "contracted_sec": contracted_s,
            "expanded_rows": expanded_rows,
            "contracted_rows": contracted_rows,
        }
        print(
            f"{tag}: corpus={n} expanded {expanded_s}s/{expanded_rows} "
            f"rows vs contracted {contracted_s}s/{contracted_rows} rows",
            flush=True,
        )

    with open(
        os.path.join(REPO, "tools", "contracted_jaccard_results.json"), "w"
    ) as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
