"""Backfill bytes_read/bytes_total for the committed raw-vector
ivf_indexed_files rows (the r11 ivfpq probe records filesSize; the raw
rows predate it). Reuses the EXISTING stores — no re-ingest, so the
committed ingest/query timings stay the same-code record."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORES = os.path.join(REPO, "testdata", "ivf_stores")


def main() -> None:
    from pyspark.sql import functions as F

    from impresso_ta.operators import similarity
    from impresso_ta.session import get_spark
    from tools.scale_mining import SF01, SF1, SF10, scan_metrics

    spark = get_spark(
        app_name="impresso_ta-backfill-bytes", master="local[32]",
        shuffle_partitions=32,
        extra_confs={"spark.ui.showConsoleProgress": "false",
                     "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    res_path = os.path.join(REPO, "tools", "scale_mining_results.json")
    with open(res_path) as f:
        results = json.load(f)
    for tag, d in (("1x", SF01), ("10x", SF1), ("100x", SF10)):
        store = os.path.join(STORES, tag)
        if not os.path.exists(store):
            continue
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        nlist = results["params"][tag]["nlist"]
        seeds = [
            (int(r.vec_id), list(r.embedding))
            for r in emb.orderBy("vec_id").limit(nlist).collect()
        ]
        index = spark.read.parquet(store)
        qbatch = emb.filter(F.col("vec_id") < 2000).limit(200)
        df = similarity.ivf_topk_indexed(index, qbatch, seeds, nprobe=2, k=3)
        df.collect()
        scans = scan_metrics(df)
        biggest = max(scans, key=lambda s: s.get("numFiles", 0), default={})
        row = results["ivf_indexed_files"].setdefault(tag, {})
        row["bytes_read"] = biggest.get("filesSize")
        row["bytes_total"] = sum(
            os.path.getsize(os.path.join(r, fn))
            for r, _d, fs in os.walk(store)
            for fn in fs if fn.endswith(".parquet")
        )
        print(tag, row, flush=True)
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
