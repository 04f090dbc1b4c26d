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


def _two_level_large_star(edges):
    """Large-Star with the per-node min via groupBy + join-back instead
    of a window: partial (map-side) aggregation removes the one-wide-
    partition straggler a 10^7-degree hub creates under
    Window.partitionBy, and the join-back is an equi-join AQE CAN
    skew-split (window partitions it cannot)."""
    bidir = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("_mn"))
    return (
        bidir.join(mins, "u")
        .select(
            "u",
            "v",
            F.least(F.col("u"), F.col("_mn")).alias("m"),
        )
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _two_level_small_star(edges):
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("_mn"))
    with_m = oriented.join(mins, "u").select(
        "u", "v", F.col("_mn").alias("m")
    )
    to_min = with_m.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_link = with_m.select("u", F.col("m").alias("v"))
    return to_min.union(self_link).distinct()


def gen_star(spark, hub_degree: int, tail: int = 10_000):
    """One hub (node 0) with ``hub_degree`` spokes + a chain tail on a
    separate id range — the adversarial shape for the window-based min
    (all of node 0's bidir rows land in ONE window partition)."""
    spokes = spark.range(1, hub_degree + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    base = 10 * hub_degree
    chain = spark.range(base, base + tail - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return spokes.union(chain)


def star_probe() -> None:
    import impresso_ta.operators.graph as g

    spark = get_spark(
        app_name="scale-graph-star",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_confs={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    probe: dict = {}
    for label, h in (("hub_1e6", 1_000_000), ("hub_5e6", 5_000_000)):
        edges = gen_star(spark, h).persist()
        edges.count()
        rec: dict = {"hub_degree": h}

        orig = (g._large_star, g._small_star)
        for name, funcs in (
            ("window", orig),
            ("two_level", (_two_level_large_star, _two_level_small_star)),
        ):
            g._large_star, g._small_star = funcs
            stats: dict = {}
            t0 = time.time()
            cc = g.connected_components(edges, stats=stats)
            n_comp = cc.select("component").distinct().count()
            rec[f"{name}_sec"] = round(time.time() - t0, 2)
            rec[f"{name}_rounds"] = stats.get("rounds")
            rec[f"{name}_components"] = n_comp
        g._large_star, g._small_star = orig
        edges.unpersist()
        probe[label] = rec
        print(label, json.dumps(rec))
    results["star_probe"] = probe
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    if "--star" in sys.argv:
        star_probe()
    else:
        main()
