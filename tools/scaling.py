"""Core-count scaling probe: run the heavy operators at 4/8/16/32 local
cores and print the speedup curve. Evidence that the plans parallelize —
a flat curve means a serial bottleneck (single-split scan, driver-side
loop, one hot partition).

Each core count runs in a FRESH subprocess: local mode reuses the py4j
gateway JVM across sessions, so heap settings and GC/shuffle state would
otherwise bleed between measurements.

Usage: python tools/scaling.py [sf_dir]   (one JSON line per operator)
       python tools/scaling.py --single CORES SF_DIR   (internal)

CAVEAT: on a noisy/shared host the run-to-run variance (observed ±30%
and worse on this container) can swamp the curve — treat results as
valid only when repeated runs agree. The per-plan parallelism evidence
that does NOT depend on wall clock lives in tests/test_plans.py.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CORES = [4, 8, 16, 32]
REPEATS = 3


def run_single(cores: int, sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from impresso_ta.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            # 8× corpus → broadcast hash tables outgrow the 1g default
            # heap (local mode: driver == executor JVM)
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from impresso_ta.operators import dedup
    from impresso_ta.plans import synthetic_canonical_corpus
    from impresso_ta.rebuild import rebuild_issues_solr

    # 8× corpus with perturbed text (a prefix token shifts every shingle)
    # so compute dominates fixed overhead WITHOUT giving each doc 7
    # exact near-dups (that would measure a candidate explosion instead)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()
    docs = base
    for i in range(1, 8):
        docs = docs.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10 * n))
            .withColumn("text", F.concat(F.lit(f"copy{i} of "), F.col("text")))
        )

    def timed(build) -> float:
        best = float("inf")
        for _ in range(REPEATS):
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    out = {"minhash_lsh": timed(lambda: dedup.minhash_lsh_pairs(docs))}
    issues_df, pages_df = synthetic_canonical_corpus(docs)
    out["rebuild_solr"] = timed(lambda: rebuild_issues_solr(issues_df, pages_df))
    print("RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]), sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results: dict[str, dict[int, float]] = {}
    for cores in CORES:
        proc = subprocess.run(
            [sys.executable, __file__, "--single", str(cores), sf_dir],
            capture_output=True,
            text=True,
            timeout=600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                for op, sec in json.loads(line[len("RESULT "):]).items():
                    results.setdefault(op, {})[cores] = sec
    for op, curve in results.items():
        base = curve[CORES[0]]
        print(
            json.dumps(
                {
                    "op": op,
                    "sec_by_cores": curve,
                    "speedup_vs_4": {
                        c: round(base / v, 2) for c, v in curve.items()
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
