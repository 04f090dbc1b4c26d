"""Generic interleaved same-session A/B: patch named functions on a live
operator module with the committed (HEAD) versions loaded from a file
copy, alternating old/new per round (r12 §17 lesson: the baseline must
be the exact committed function, same session).

Usage:
    python tools/r13_ab_patch.py OLD_FILE MODULE_NAME FN[,FN...] \
        --queries q1,q2 [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_file")
    ap.add_argument("module")
    ap.add_argument("fns")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    live = importlib.import_module(args.module)
    spec = importlib.util.spec_from_file_location("ab_old_mod", args.old_file)
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)
    fns = args.fns.split(",")
    saved = {f: getattr(live, f) for f in fns}
    queries = args.queries.split(",")

    spark = get_spark(
        app_name="r13-ab-patch",
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
    times: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in queries
    }
    for rnd in range(args.rounds):
        for tag in ("old", "new") if rnd % 2 == 0 else ("new", "old"):
            for f in fns:
                setattr(live, f, getattr(old_mod if tag == "old" else None, f)
                        if tag == "old" else saved[f])
            for q in queries:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{q} {tag} r{rnd}")
                t0 = time.time()
                registry[q](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[q][tag].append(round(time.time() - t0, 3))
    for f in fns:
        setattr(live, f, saved[f])
    out = {
        q: {tag: {"min": min(v), "all": v} for tag, v in by.items()}
        for q, by in times.items()
    }
    print(json.dumps({"sf": args.sf, "results": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
