"""Interleaved same-session A/B of the r13 vectorized brute_scored_arrow
vs the committed r12 form (loaded from a file copy of HEAD), per the r12
§17 lesson: the baseline must be the exact committed function, and both
variants must run interleaved in one session so drift cannot masquerade
as a delta.

Usage: python tools/r13_ab_cosine.py OLD_MODULE_PATH [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark

QUERIES = [
    "similarity_topk_cosine",
    "similarity_hard_negatives",
    "similarity_training_triplets",
    "similarity_semihard_triplets",
    "retrieval_mmr_rerank",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_module")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import impresso_ta.operators.cosine_arrow as new_mod

    spec = importlib.util.spec_from_file_location(
        "cosine_arrow_old", args.old_module
    )
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)

    spark = get_spark(
        app_name="r13-ab-cosine",
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
    for name in catalog.TABLES:
        catalog.t(spark, args.sf, name).count()

    registry = catalog.queries()
    mods = {"old": old_mod, "new": new_mod}
    times: dict[str, dict[str, list[float]]] = {
        q: {t: [] for t in mods} for q in QUERIES
    }
    key = "impresso_ta.operators.cosine_arrow"
    for rnd in range(args.rounds):
        for tag in ("old", "new") if rnd % 2 == 0 else ("new", "old"):
            sys.modules[key] = mods[tag]
            for q in QUERIES:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{q} {tag} r{rnd}")
                t0 = time.time()
                registry[q](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[q][tag].append(round(time.time() - t0, 3))
    sys.modules[key] = new_mod
    out = {
        q: {
            tag: {"min": min(v), "all": v}
            for tag, v in by.items()
        }
        for q, by in times.items()
    }
    print(json.dumps({"sf": args.sf, "results": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
