"""Scaling probe for the import paths: POSIX walk+open vs the fully
distributed (binaryFile byte-flow) import, at growing issue counts on
the same synthetic METS/ALTO trees.

Answers two questions with measurements instead of arguments:
1. does the distributed path's one-extra-byte-shuffle cost stay small
   relative to the parse work it moves off the shared-mount assumption?
2. do both paths scale linearly in issue count (the unit of work)?

Usage: python tools/scale_import.py [counts ...]   # default 200 2000
Writes tools/scale_import_results.json; prints a ratio table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREES = os.path.join(REPO, "testdata", "import_trees")

# the same synthetic issue the mets_alto lifecycle tests use, with the
# article body padded so each issue is a realistic few tens of KB
_PAD = " ".join(f'<String HPOS="{10+i}" VPOS="120" WIDTH="50" HEIGHT="30" '
                f'CONTENT="w{i}"/>' for i in range(200))
ALTO_PAGE = f"""<?xml version="1.0" encoding="UTF-8"?>
<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
  <Layout><Page ID="P1"><PrintSpace HPOS="0" VPOS="0" WIDTH="2000" HEIGHT="3000">
    <TextBlock ID="TB1" HPOS="10" VPOS="10" WIDTH="800" HEIGHT="600">
      <TextLine HPOS="10" VPOS="10" WIDTH="800" HEIGHT="40">
        <String HPOS="10" VPOS="12" WIDTH="90" HEIGHT="30" CONTENT="Bonjour"/>
        {_PAD}
      </TextLine>
    </TextBlock>
  </PrintSpace></Page></Layout>
</alto>
"""
METS = """<?xml version="1.0" encoding="UTF-8"?>
<mets xmlns="http://www.loc.gov/METS/" xmlns:xlink="http://www.w3.org/1999/xlink">
  <fileSec><fileGrp>
    <file ID="ALTO1" SEQ="1"><FLocat xlink:href="text/0001.xml"/></file>
  </fileGrp></fileSec>
  <structMap TYPE="LOGICAL">
    <div TYPE="ISSUE" ID="ISS1">
      <div TYPE="ARTICLE" ID="ART1" ORDER="1" LABEL="Un article">
        <fptr><area FILEID="ALTO1" BEGIN="TB1"/></fptr>
      </div>
    </div>
  </structMap>
</mets>
"""


def build_tree(n_issues: int) -> str:
    base = os.path.join(TREES, f"n{n_issues}")
    if os.path.exists(os.path.join(base, "_DONE")):
        return base
    shutil.rmtree(base, ignore_errors=True)
    # 8 aliases, dates rolling over months/days — exercises the
    # date-key grouping with many distinct keys
    for i in range(n_issues):
        alias = f"T{i % 8}"
        y, m, d = 1900 + (i // 336), 1 + (i // 28) % 12, 1 + i % 28
        issue = os.path.join(
            base, alias, f"{y:04d}", f"{m:02d}", f"{d:02d}", "a"
        )
        os.makedirs(os.path.join(issue, "text"), exist_ok=True)
        with open(os.path.join(issue, "issue-mets.xml"), "w") as f:
            f.write(METS)
        with open(os.path.join(issue, "text", "0001.xml"), "w") as f:
            f.write(ALTO_PAGE)
    with open(os.path.join(base, "_DONE"), "w") as f:
        f.write("ok")
    return base


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [200, 2000]

    from impresso_ta.importers import import_issues
    from impresso_ta.importers.base import import_issues_distributed
    from impresso_ta.session import get_spark
    from impresso_ta.sources.discovery import (
        detect_issues,
        detect_issues_distributed,
    )

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(fn) -> tuple[float, int]:
        # min of 2 (bench.py methodology): first run absorbs JVM/footer
        # warm-up that would otherwise masquerade as a scaling signal
        best, val = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            val = fn()
            best = min(best, time.time() - t0)
        return round(best, 3), val

    # JVM warm-up outside any measurement
    warm = build_tree(counts[0])
    import_issues(
        detect_issues(spark, warm, "mets_alto"), ts="2024-01-01T00:00:00Z"
    ).issues.count()

    results: dict = {}
    for n in counts:
        base = build_tree(n)
        row: dict = {}

        row["detect_posix_sec"], n_disc = timed(
            lambda: detect_issues(spark, base, "mets_alto").count()
        )
        row["detect_distributed_sec"], n_dist = timed(
            lambda: detect_issues_distributed(spark, base, "mets_alto").count()
        )
        assert n_disc == n_dist == n, (n_disc, n_dist, n)

        disc = detect_issues(spark, base, "mets_alto")
        row["import_posix_sec"], row["import_posix_issues"] = timed(
            lambda: import_issues(
                disc, ts="2024-01-01T00:00:00Z"
            ).issues.count()
        )
        row["import_distributed_sec"], row["import_distributed_issues"] = (
            timed(
                lambda: import_issues_distributed(
                    spark, base, "mets_alto", ts="2024-01-01T00:00:00Z"
                ).issues.count()
            )
        )
        assert row["import_posix_issues"] == row["import_distributed_issues"] == n

        results[f"n{n}"] = row
        print(json.dumps({f"n{n}": row}))

    if len(counts) >= 2:
        a, b = f"n{counts[0]}", f"n{counts[-1]}"
        scale = counts[-1] / counts[0]
        for k in ("import_posix_sec", "import_distributed_sec"):
            r = results[b][k] / results[a][k]
            print(f"{k}: {results[a][k]} -> {results[b][k]} "
                  f"({r:.1f}x wall at {scale:.0f}x issues)")
        results["_meta"] = {"counts": counts, "scale": scale}

    out = os.path.join(REPO, "tools", "scale_import_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
