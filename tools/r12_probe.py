"""Round-12 optimization probe: time any catalog query in isolation with
the noop sink (guide §1.4) and dump its .explain("formatted") plan.

Usage:
    python tools/r12_probe.py [--sf DIR] [--runs N] [--plan OUT_DIR] \
        [--tag before|after] query [query ...]

Times use the bench methodology (clearCache between runs, min of N,
noop sink, job description labels) so numbers are comparable to
bench.py rows. Plans land in plans/r12/<query>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="plan output dir")
    ap.add_argument("--tag", default=None, help="plan filename suffix")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        app_name="r12-probe",
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
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = registry[name]
        times = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "all": times}
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            suffix = f"_{args.tag}" if args.tag else ""
            with open(
                os.path.join(args.plan, f"{name}{suffix}.txt"), "w"
            ) as f:
                f.write(f"# {name} @ {args.sf} (cpus={args.cpus})\n")
                f.write(buf.getvalue())
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
