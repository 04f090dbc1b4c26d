"""A/B parity + timing for the r12 minhash_lsh_pairs row-local verify.

Old (r11) implementation loaded from /tmp/dedup_r11.py (git show HEAD).
Catalog args mirrored from queries.dedup_minhash_lsh.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from impresso_ta import queries as catalog
from impresso_ta.operators import dedup as dedup_new
from impresso_ta.session import get_spark


def load_old(path: str = "/tmp/dedup_r11.py"):
    spec = importlib.util.spec_from_file_location("dedup_r11", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def frame_hash(df) -> tuple[int, str]:
    rows = df.select(
        F.md5(
            F.concat_ws(
                "\x1f", *[F.col(c).cast("string") for c in df.columns]
            )
        ).alias("h")
    ).collect()
    h = hashlib.md5()
    for line in sorted(r["h"] for r in rows):
        h.update(line.encode())
    return len(rows), h.hexdigest()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        app_name="r12-ab-minhash",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.t(spark, sf, "documents")
    docs.count()

    dedup_old = load_old()
    for tag, mod in (("old", dedup_old), ("new", dedup_new)):
        times = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"minhash {tag} run{i}")
            t0 = time.time()
            mod.minhash_lsh_pairs(
                docs, k=3, num_perm=24, bands=8, threshold=0.8
            ).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(f"{tag}: min={min(times)} all={times}", flush=True)

    spark.catalog.clearCache()
    n_old, h_old = frame_hash(
        dedup_old.minhash_lsh_pairs(docs, k=3, num_perm=24, bands=8,
                                    threshold=0.8)
    )
    spark.catalog.clearCache()
    n_new, h_new = frame_hash(
        dedup_new.minhash_lsh_pairs(docs, k=3, num_perm=24, bands=8,
                                    threshold=0.8)
    )
    print(f"old rows={n_old} hash={h_old}")
    print(f"new rows={n_new} hash={h_new}")
    print("PARITY:", "OK" if (n_old, h_old) == (n_new, h_new) else "MISMATCH")
    spark.stop()


if __name__ == "__main__":
    main()
