"""A/B parity + timing: MinHash arrow signature pass vs expr form.

Usage: python tools/r12_ab_minhash_arrow.py [--sf DIR] [--runs N] [--cpus N]
Asserts bit-identical outputs for minhash_lsh_pairs,
minhash_dedup_survivors and incremental_minhash_dedup, then times both
engines with the bench methodology (noop sink, clearCache, min-of-N).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from impresso_ta import queries as catalog
from impresso_ta.operators import dedup
from impresso_ta.session import get_spark


def frame_md5(df):
    cols = [F.col(c).cast("string") for c in df.columns]
    row = F.md5(F.concat_ws("\x01", *cols))
    # modular sum keeps the aggregate inside int64 at any row count
    # (2^48-scale summands overflowed the plain sum at sf1)
    h = F.conv(F.substring(row, 1, 12), 16, 10).cast("long") % F.lit(
        999999937
    )
    agg = df.select(
        F.count("*").alias("n"), F.sum(h).alias("s")
    ).collect()[0]
    return agg["n"], agg["s"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--plan", default=None, help="plan output dir")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        app_name="r12-ab-minhash-arrow",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.t(spark, args.sf, "documents")
    docs.count()

    # catalog shapes: dedup_incremental_lsh splits odd (new) / even (ex)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    ex = docs.filter(F.col("doc_id") % 2 == 0)

    def prepare_dedup_auto(eng):
        # the prepare_corpus doc_dedup branch at >= auto threshold:
        # persist + sizing count + survivors + left-anti (pipeline.py)
        from pyspark import StorageLevel

        cur = docs.persist(StorageLevel.MEMORY_AND_DISK)
        cur.count()
        drops = (
            dedup.minhash_dedup_survivors(
                cur, id_col="doc_id", text_col="text", engine=eng
            )
            .filter(~F.col("is_rep"))
            .select(F.col("doc_id"))
        )
        return cur.join(drops, "doc_id", "left_anti").select(
            "doc_id", "lang", "n_chars"
        )

    builds = {
        "lsh_pairs": lambda eng: dedup.minhash_lsh_pairs(
            docs, k=3, num_perm=24, bands=8, threshold=0.8, engine=eng
        ),
        "survivors": lambda eng: dedup.minhash_dedup_survivors(
            docs, k=3, num_perm=24, bands=8, engine=eng
        ),
        "incremental": lambda eng: dedup.incremental_minhash_dedup(
            new, ex, threshold=0.8, engine=eng
        ).select("doc_id", "lang"),
        "prepare_dedup_auto": prepare_dedup_auto,
    }
    if not args.skip_parity:
        for name, build in builds.items():
            spark.catalog.clearCache()
            a = frame_md5(build("arrow"))
            spark.catalog.clearCache()
            e = frame_md5(build("expr"))
            status = "OK " if a == e else "MISMATCH"
            print(f"{status} {name}: arrow={a} expr={e}", flush=True)
            assert a == e, name

    if args.plan:
        os.makedirs(args.plan, exist_ok=True)
        tags = {"expr": "before", "arrow": "after"}
        names = {
            "lsh_pairs": "dedup_minhash_lsh_sigarrow",
            "survivors": "dedup_minhash_survivors",
            "incremental": "dedup_incremental_lsh",
            "prepare_dedup_auto": "corpus_prepare_dedup_auto",
        }
        for name, build in builds.items():
            for eng, tag in tags.items():
                spark.catalog.clearCache()
                df = build(eng)
                path = os.path.join(args.plan, f"{names[name]}_{tag}.txt")
                with open(path, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")
                    ))
                print(f"wrote {path}", flush=True)

    if args.timing:
        for name, build in builds.items():
            for eng in ("expr", "arrow"):
                best = float("inf")
                for _ in range(args.runs):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    build(eng).write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
                print(f"{name} {eng}: {best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
