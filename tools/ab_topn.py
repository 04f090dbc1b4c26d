"""A/B: per-domain top-n on a zipfian key — plain single window vs
topn_per_key_salted (VERDICT r5 task 3).

Spark's rank-limit pushdown (WindowGroupLimit, 3.5+) already inserts a
per-partition group-limit BEFORE the shuffle for ``row_number() <= n``
filters, so the plain form's hot-key task receives at most
n x input_partitions rows — small for small n. This probe measures
where the salted two-stage form still earns its extra shuffle:
growing cap n (the pushdown bound n x partitions stops being small)
on a heavily zipfian domain distribution.

Usage: python tools/ab_topn.py [rows]   (default 5_000_000)
Writes tools/ab_topn_results.json; findings summarized in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def zipf_domains(spark, n_rows: int):
    """(domain, doc_id) with ~zipf(1.1) domain sizes, deterministic.
    Inverse-CDF on a uniform md5 hash: domain rank r ~ u^(-1/(s-1))."""
    u = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        / float(16**12)
    )
    # s=1.1 -> r = ceil(u^-10) capped; hot domain r=1 holds ~ P(u>0.5^0.1)
    rank = F.least(
        F.ceil(F.pow(F.greatest(u, F.lit(1e-12)), F.lit(-10.0))),
        F.lit(1_000_000),
    ).cast("long")
    return (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("d"), rank).alias("domain"),
            F.col("id").alias("doc_id"),
        )
        .repartition(32)
    )


def main() -> None:
    from impresso_ta.operators.skew import topn_per_key_salted
    from impresso_ta.session import get_spark
    from pyspark.sql.window import Window

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(
        app_name="impresso_ta-ab-topn",
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

    base = zipf_domains(spark, n_rows)

    def timed(build) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    results: dict = {"rows": n_rows, "scenarios": {}}
    # the map-partition count is the variable WindowGroupLimit's bound
    # depends on (hot reducer task receives ~ n x map_partitions rows);
    # 1024 partitions emulates a wide cluster scan on this box
    for parts in (32, 1024):
        d = base.repartition(parts).persist()
        total = d.count()
        hot = d.groupBy("domain").count().orderBy(F.desc("count")).first()
        print(f"parts={parts} rows={total} hot_rows={hot['count']}")

        def plain(n):
            w = Window.partitionBy("domain").orderBy("doc_id")
            return (
                d.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= n)
            )

        sc = {"hot_domain_rows": hot["count"], "caps": {}}
        for n in (10, 1000, 100_000):
            sc["caps"][str(n)] = {
                "plain_window_sec": timed(lambda: plain(n)),
                "salted_sec": timed(
                    lambda: topn_per_key_salted(
                        d, ["domain"], "doc_id", n=n, n_salts=16
                    )
                ),
            }
            print(parts, n, sc["caps"][str(n)])
        results["scenarios"][str(parts)] = sc
        d.unpersist()
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ab_topn_results.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
