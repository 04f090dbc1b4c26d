"""Data-scaling probe for the graph operator family (operators/graph.py):
connected components, PageRank, triangle counting at 1x/10x/100x.

The catalog oracles prove CORRECTNESS at sf0.01; this probe answers
"would the plan survive 100x?" with a measurement. Graphs are generated
DISTRIBUTED (spark.range — no driver-side edge list) and deterministic:

  * chain edges (i, i+1) within blocks of 1,000 → long paths, the
    diameter stress that kills hash-min label propagation (the measured
    CC round count staying ~flat across 1x→100x IS the O(log n) claim);
  * cross edges i → (i·2654435761) mod n for i % 7 == 0 → random-ish
    long-range links merging blocks into big components;
  * closure edges (i, i+2) for i % 13 == 0 → triangles with the chain.

Scales: n = 1e5 / 1e6 / 1e7 nodes (~1.23 edges per node).
PageRank is fixed at 4 iterations (the catalog shape); its cost model
is iterations × (join + agg) over the edge set — linear in edges.

Usage: python tools/scale_graph.py    # writes tools/scale_graph_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from impresso_ta.operators.graph import (  # noqa: E402
    connected_components,
    pagerank,
    triangle_counts,
)
from impresso_ta.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "scale_graph_results.json")

BLOCK = 1_000
MULT = 2654435761  # Knuth multiplicative hash


def gen_edges(spark, n: int):
    """Deterministic synthetic graph, generated executor-side."""
    ids = spark.range(n).select(F.col("id").alias("i"))
    chain = ids.where((F.col("i") + 1) % BLOCK != 0).select(
        F.col("i").alias("src"), (F.col("i") + 1).alias("dst")
    )
    cross = ids.where(F.col("i") % 7 == 0).select(
        F.col("i").alias("src"),
        ((F.col("i") * MULT) % n).alias("dst"),
    )
    closure = ids.where((F.col("i") % 13 == 0) & ((F.col("i") + 2) % BLOCK > 1)).select(
        F.col("i").alias("src"), (F.col("i") + 2).alias("dst")
    )
    return chain.union(cross).union(closure)


def main() -> None:
    spark = get_spark(
        app_name="scale-graph",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_confs={
            # bench.py's rationale: the 1g default heap has no headroom;
            # the 100x pass shuffles ~1.2e7-edge rounds
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for label, n in (("1x", 100_000), ("10x", 1_000_000), ("100x", 10_000_000)):
        edges = gen_edges(spark, n).persist()
        n_edges = edges.count()
        rec: dict = {"nodes": n, "edges": n_edges}

        stats: dict = {}
        t0 = time.time()
        cc = connected_components(edges, stats=stats)
        n_comp = cc.select("component").distinct().count()
        rec["cc_sec"] = round(time.time() - t0, 2)
        rec["cc_rounds"] = stats.get("rounds")
        rec["cc_components"] = n_comp

        t0 = time.time()
        pr = pagerank(edges, iterations=4)
        rec["pr_top"] = pr.orderBy(F.col("rank_scaled").desc()).limit(3).collect()[0][
            "rank_scaled"
        ]
        rec["pagerank_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        tri_total = triangle_counts(edges).agg(F.sum("n_triangles")).collect()[0][0]
        rec["triangles_sec"] = round(time.time() - t0, 2)
        rec["triangle_corner_sum"] = tri_total

        edges.unpersist()
        results[label] = rec
        print(label, json.dumps(rec))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
