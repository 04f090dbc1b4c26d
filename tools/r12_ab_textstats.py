"""A/B the r12 Arrow text-stats fast paths against the r11 JVM
expression forms (same session, noop sink, clearCache, min-of-N) and
assert survivor/row parity at the same time.

Usage: python tools/r12_ab_textstats.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r12-ab-textstats",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in catalog.TABLES:
        catalog.t(spark, sf_dir, name).count()

    from impresso_ta.operators import text_analysis as ta
    from impresso_ta.operators import text_arrow as tx
    from impresso_ta.operators.pipeline import prepare_corpus

    docs = lambda: catalog.t(spark, sf_dir, "documents")  # noqa: E731

    def timed(build) -> float:
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def jvm_filter_chain():
        d = docs()
        return d.filter(ta.c4_signals(F.col("text"))["keep"]).filter(
            ta.repetition_signals(F.col("text"))["keep"]
        )

    cases = {
        "c4_expr": lambda: ta.c4_filters(docs(), engine="expr"),
        "c4_arrow": lambda: tx.c4_filters_arrow(docs()),
        "rep_expr": lambda: ta.repetition_features(docs(), engine="expr"),
        "rep_arrow": lambda: tx.repetition_features_arrow(docs()),
        "quality_expr": lambda: ta.quality_features(docs(), engine="expr"),
        "quality_arrow": lambda: tx.quality_features_arrow(docs()),
        "filter_chain_expr": jvm_filter_chain,
        "filter_chain_arrow": lambda: tx.filter_keep_arrow(
            docs(), c4=True, gopher=True
        ),
    }
    out: dict[str, float] = {}
    for name, build in cases.items():
        spark.sparkContext.setJobDescription(f"ab:{name}")
        out[name] = timed(build)
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    # parity spot checks (cheap, full-frame order-insensitive)
    n_expr = jvm_filter_chain().count()
    n_arrow = tx.filter_keep_arrow(docs(), c4=True, gopher=True).count()
    assert n_expr == n_arrow, (n_expr, n_arrow)
    out["filter_chain_rows"] = n_expr

    # the full pipeline query (arrow path is live in prepare_corpus)
    spark.sparkContext.setJobDescription("ab:pipeline_arrow")
    out["corpus_prepare_pipeline_now"] = timed(
        lambda: catalog.queries()["corpus_prepare_pipeline"](spark, sf_dir)
    )
    print(json.dumps({"sf": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
