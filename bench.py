"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are forced with the noop sink (full computation of every output
column, no driver collect). Each query timed individually after a warm-up
of the session (JVM + parquet footer caches).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark

# Representative mix: full-scan agg, multi-join, window, LSH dedup,
# similarity search, text analysis, exact dedup, streaming-style window.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j2_attach_supports",
    "w3_running_offsets",
    "o2_sort_dedup_pages",
    "events_hourly_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_cosine",
    "similarity_ivf_topk",
    "text_quality",
    "corpus_pack_sequences",
    "corpus_contamination",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    spark = get_spark(
        app_name="impresso_ta-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch every table so JVM/parquet-footer costs are excluded
    for name in catalog.TABLES:
        catalog.t(spark, sf_dir, name).count()

    def timed(build) -> float:
        # min of 2 runs, cache cleared between queries: isolates each
        # query from frames persisted by earlier operators and from
        # one-off JIT/GC noise.
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    registry = catalog.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry[name]
        timings[name] = timed(lambda fn=fn: fn(spark, sf_dir))

    # Flagship engine benchmark: rebuild a synthetic canonical corpus
    # derived from the documents table (one issue+page+CI per doc).
    from impresso_ta.plans import synthetic_canonical_corpus
    from impresso_ta.rebuild import rebuild_issues_passim, rebuild_issues_solr

    docs = catalog.t(spark, sf_dir, "documents")
    issues_df, pages_df = synthetic_canonical_corpus(docs)
    timings["rebuild_solr_synthetic"] = timed(
        lambda: rebuild_issues_solr(issues_df, pages_df)
    )
    timings["rebuild_passim_synthetic"] = timed(
        lambda: rebuild_issues_passim(issues_df, pages_df)
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
