"""One-session A/B of the r3 final-commit perf changes (VERDICT r3
"What's wrong" #1/#2): same JVM, same data, alternating forms so
environment drift cannot masquerade as a code delta.

A) prepare_corpus spread placement: "input" (r3 form — repartition the
   raw scan before the filters) vs "after_filters" (filter fused onto
   the scan, widen survivors) vs "none", with the multi-use persist fix
   in place for all three.
B) spark.sql.files.maxPartitionBytes 4 MB vs 128 MB (runtime SQL conf —
   alternated per read) on scan-bound queries.
C) sf1 documents row-group size: 1024 rows (r3 layout) vs the standard
   ROW_GROUP (128k → one group per copy), via a sibling dir that
   symlinks every table except a regenerated documents.parquet.

Usage: python tools/ab_pipeline.py [rounds]   (default 3; min-of-rounds)
Prints one JSON blob; paste the summary into PLANS.md §7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from impresso_ta import queries as catalog
from impresso_ta.operators import dedup
from impresso_ta.operators.corpus import temperature_sample
from impresso_ta.operators.pipeline import prepare_corpus
from impresso_ta.session import get_spark


def pipeline_query(spark, sf_dir: str, spread: str):
    """corpus_prepare_pipeline's exact body, spread parameterized."""
    res = prepare_corpus(
        catalog.t(spark, sf_dir, "documents"),
        c4=True,
        gopher=True,
        line_spans=None,
        doc_dedup=False,
        temperature_alpha=None,
        spread=spread,
    )
    fp = dedup.text_fingerprint(F.col("text"))
    w = Window.partitionBy(fp).orderBy("doc_id")
    exact = (
        res.docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    mixed = temperature_sample(exact, alpha=0.5, target_rows=150, domain_col="lang")
    return mixed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_id"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
        .alias("total_words"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf01 = "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.path.join(repo, "testdata", "sf1")
    spark = get_spark(
        app_name="impresso_ta-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in catalog.TABLES:
        catalog.t(spark, sf01, name).count()
        catalog.t(spark, sf1, name).count()

    def run_once(build) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results: dict = {"rounds": rounds}

    # ---- A: spread placement, interleaved ----
    forms = ["input", "after_filters", "none"]
    for sf_dir, tag in ((sf01, "sf0.1"), (sf1, "sf1")):
        best = {f: float("inf") for f in forms}
        for _ in range(rounds):
            for f in forms:
                best[f] = min(
                    best[f],
                    run_once(lambda f=f: pipeline_query(spark, sf_dir, f)),
                )
        results[f"A_spread_{tag}"] = {k: round(v, 3) for k, v in best.items()}

    # ---- B: maxPartitionBytes, interleaved ----
    registry = catalog.queries()
    bq = [
        "q1_pricing_summary",
        "text_quality",
        "dedup_minhash_lsh",
        "text_repetition_stats",
        "w3_running_offsets",
    ]
    for sf_dir, tag in ((sf01, "sf0.1"), (sf1, "sf1")):
        out: dict[str, dict[str, float]] = {q: {} for q in bq}
        for mb in (4, 128):
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(mb * 1024 * 1024)
            )
            for q in bq:
                best = float("inf")
                for _ in range(rounds):
                    best = min(
                        best, run_once(lambda q=q: registry[q](spark, sf_dir))
                    )
                out[q][f"{mb}MB"] = round(best, 3)
        results[f"B_maxpart_{tag}"] = out
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))

    # ---- C: sf1 documents row-group layout ----
    # sf1 is generated at the standard ROW_GROUP since r4 (gen_bigsf);
    # the ALT layout regenerates documents with the r3 1024-row groups
    # so the comparison stays live in both directions.
    alt = os.path.join(repo, "testdata", "sf1_rg1024")
    if not os.path.exists(os.path.join(alt, "documents.parquet")):
        os.makedirs(alt, exist_ok=True)
        import pyarrow.parquet as pq

        from tools.gen_bigsf import _clone, _max_keys

        maxes = _max_keys(sf01)
        t = pq.read_table(os.path.join(sf01, "documents.parquet"))
        with pq.ParquetWriter(
            os.path.join(alt, "documents.parquet"), t.schema
        ) as w:
            for i in range(10):
                w.write_table(
                    _clone("documents", t, i, maxes), row_group_size=1024
                )
        for name in catalog.TABLES:
            if name == "documents":
                continue
            src = os.path.join(sf1, f"{name}.parquet")
            dst = os.path.join(alt, f"{name}.parquet")
            if not os.path.exists(dst):
                os.symlink(src, dst)
    cq = [
        "text_quality",
        "text_repetition_stats",
        "dedup_minhash_lsh",
        "text_doc_vectors",
    ]
    out = {q: {} for q in cq}
    for q in cq:
        for d, tag in ((sf1, "rg128k"), (alt, "rg1024")):
            best = float("inf")
            for _ in range(rounds):
                best = min(best, run_once(lambda q=q, d=d: registry[q](spark, d)))
            out[q][tag] = round(best, 3)
    out["pipeline_after_filters"] = {}
    for d, tag in ((sf1, "rg128k"), (alt, "rg1024")):
        best = float("inf")
        for _ in range(rounds):
            best = min(
                best,
                run_once(lambda d=d: pipeline_query(spark, d, "after_filters")),
            )
        out["pipeline_after_filters"][tag] = round(best, 3)
    results["C_rowgroup_sf1"] = out

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
