"""A/B the engine's session-conf defaults (round 4): the r3 defaults
(parallelismFirst=false + 64 MB advisory + 64 MB broadcast threshold)
were tuned on TPC-H shapes and starve CPU-dense UDTF/text stages —
post-shuffle token trees compress ~10:1, so 64 MB byte targets fuse
minutes of assembly CPU into one task, and a 64 MB broadcast threshold
lets the whole grouped corpus ride a broadcast (OOM at scale).

Each variant runs in a FRESH session over the same suite:
headline queries + both rebuilds at sf0.1 and sf1, the zipfian rebuild,
and the corpus pipeline. min-of-2 per query.

Usage: python tools/ab_confs.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "r3_defaults": {},
    "pfirst_64k": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    },
    "pfirst_64k_bcast10m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    },
    "spark_stock_aqe": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    },
}


def run_variant(confs: dict) -> dict:
    from impresso_ta import queries as catalog
    from impresso_ta.session import get_spark

    spark = get_spark(
        app_name="impresso_ta-abconf",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
            "spark.ui.enabled": "false",
            **confs,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(build) -> float:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    from impresso_ta.plans.synthetic import synthetic_canonical_corpus
    from impresso_ta.rebuild import rebuild_issues_passim, rebuild_issues_solr
    from tools.skewed_docs import zipfian_documents

    registry = catalog.queries()
    import bench as B

    out: dict = {}
    for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"),
                        (os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf1"), "sf1")):
        for name in catalog.TABLES:
            catalog.t(spark, sf_dir, name).count()
        t = {}
        for name in B.BENCH_QUERIES:
            t[name] = timed(lambda name=name: registry[name](spark, sf_dir))
        docs = catalog.t(spark, sf_dir, "documents")
        iss, pg = synthetic_canonical_corpus(docs)
        t["rebuild_solr"] = timed(lambda: rebuild_issues_solr(iss, pg))
        t["rebuild_passim"] = timed(lambda: rebuild_issues_passim(iss, pg))
        zi, zp = synthetic_canonical_corpus(zipfian_documents(docs, n_issues=1024))
        t["rebuild_solr_zipfian"] = timed(lambda: rebuild_issues_solr(zi, zp))
        t["corpus_prepare_pipeline"] = timed(
            lambda: registry["corpus_prepare_pipeline"](spark, sf_dir)
        )
        out[tag] = {"total_headline": round(sum(v for k, v in t.items()
                    if k in B.BENCH_QUERIES), 3), **t}
    spark.stop()
    return out


def main() -> None:
    results = {}
    for vname, confs in VARIANTS.items():
        results[vname] = run_variant(confs)
        print(json.dumps({vname: results[vname]}), flush=True)
    with open("/tmp/ab_confs.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
