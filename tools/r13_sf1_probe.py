"""r13 sf1 probe (VERDICT r12 item 6 + in-suite adjudication).

Two jobs in one harness:
1. SCALING — the driver's scaling block only covers sf0.1, where every
   query is overhead-bound (five rows ran FASTER at 8 cores in r12).
   This probe times the heavy sf1 extended rows ISOLATED (fresh
   min-of-3, clearCache between runs, noop sink — bench methodology)
   at local[32] and local[8] so parallelism at the SF that matters is
   on the record. Run once per core count:
       SPARK_GRAFT_CPUS=32 python tools/r13_sf1_probe.py
       SPARK_GRAFT_CPUS=8  python tools/r13_sf1_probe.py
   Results merge into tools/r13_sf1_probe_results.json keyed by cpus.
2. ADJUDICATION — the round-close full-bench sf1 extended section is
   IN-SUITE (70+ queries share one JVM; heap/GC context migrates
   between neighbours — the documented r11/r12 class). Rows that moved
   against this round's committed interleaved A/Bs (jaccard prefix /
   contracted, pagerank, lr_filter) are re-measured here isolated; the
   isolated min-of-3 is the adjudicating number.

Methodology matches bench.py: shuffle_partitions = cpus, tables +
Python workers warmed before any timed run, min of 3, clearCache
between runs, noop sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark, warm_python_workers

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "r13_sf1_probe_results.json")

# The heavy sf1 rows (everything >= ~3 s at the r13 baseline bench)
# plus this round's touched paths — scaling evidence AND adjudication.
QUERIES = [
    "dedup_jaccard_prefix",
    "dedup_jaccard_contracted",
    "dedup_exact_substring",
    "corpus_prepare_dedup_auto",
    "dedup_minhash_survivors",
    "dedup_minhash_lsh",
    "text_lr_classifier_rowlocal",
    "corpus_prepare_lr_filter",
    "text_lr_classifier",
    "graph_connected_components",
    "graph_pagerank",
    "text_lm_perplexity",
    "dedup_shingle_containment",
    "similarity_training_triplets_lsh",
    "similarity_hard_negatives_lsh",
    "dedup_incremental_lsh",
    "retrieval_bm25_topk",
    "dedup_semantic_lsh_auto",
    "corpus_semantic_decontamination",
]


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "testdata", "sf1")
    )
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    spark = get_spark(
        app_name=f"impresso_ta-r13-sf1-probe-c{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in catalog.TABLES:
        catalog.t(spark, sf1_dir, name).count()
    warm_python_workers(spark)

    registry = catalog.queries()
    section: dict = {"cpus": cpus, "runs": runs, "queries": {}}
    for name in QUERIES:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"r13-probe:{name}")
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf1_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        section["queries"][name] = {
            "min": min(samples),
            "samples": samples,
        }
        print(f"{name:42s} c{cpus} min={min(samples):7.3f} {samples}",
              flush=True)

    merged: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged[f"c{cpus}"] = section
    if "c8" in merged and "c32" in merged:
        merged["ratio_c8_over_c32"] = {
            q: round(
                merged["c8"]["queries"][q]["min"]
                / max(merged["c32"]["queries"][q]["min"], 1e-9),
                2,
            )
            for q in merged["c32"]["queries"]
            if q in merged["c8"]["queries"]
        }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"written": OUT, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
