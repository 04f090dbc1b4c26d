"""Straggler-tail measurement for the zipfian rebuild (VERDICT r3
task 7): run rebuild_solr over the uniform and zipfian sf1 document
profiles in one session, then pull per-task durations from the Spark
UI REST API and report max/median per stage. "No straggler tail" =
max/median ≤ ~3 on the text-assembly stages.

Usage: python tools/skew_tail.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impresso_ta.session import get_spark


def task_tail(ui: str, app: str, min_submit_ms: int) -> list[dict]:
    """max/median task duration per stage submitted after min_submit_ms."""
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    out = []
    for st in stages:
        sub = st.get("submissionTime")
        if not sub:
            continue
        t = time.strptime(sub.split(".")[0], "%Y-%m-%dT%H:%M:%S")
        if time.mktime(t) * 1000 < min_submit_ms - 1000:
            continue
        sid, att = st["stageId"], st["attemptId"]
        detail = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary?quantiles=0.0,0.5,1.0"
            )
        )
        lo, med, hi = detail["duration"]
        if hi < 200:  # ignore trivial stages — tail math on noise
            continue
        out.append(
            {
                "stage": sid,
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "med_ms": med,
                "max_ms": hi,
                "tail": round(hi / max(med, 1.0), 2),
            }
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata",
        "sf1",
    )
    spark = get_spark(
        app_name="impresso_ta-skewtail",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from impresso_ta.plans.synthetic import synthetic_canonical_corpus
    from impresso_ta.rebuild import rebuild_issues_solr
    from impresso_ta.rebuild.solr import rebuild_issues_solr_ci
    from tools.skewed_docs import zipfian_documents

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()  # warm

    zipf = zipfian_documents(docs, n_issues=1024)
    results = {}
    for tag, frame, rebuild in (
        ("uniform", docs, rebuild_issues_solr),
        ("zipfian", zipf, rebuild_issues_solr),
        ("zipfian_ci_level", zipf, rebuild_issues_solr_ci),
    ):
        spark.catalog.clearCache()
        issues_df, pages_df = synthetic_canonical_corpus(frame)
        t0 = time.time()
        mark = int(time.time() * 1000)
        rebuild(issues_df, pages_df).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.time() - t0, 3)
        stages = task_tail(ui, app, mark)
        results[tag] = {
            "wall_sec": wall,
            "worst_tail": max((s["tail"] for s in stages), default=None),
            "stages": stages,
        }
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
