"""Pre-snapshot gate: refuse to end a round with silent evidence drift.

Round 5's only process fault was an end-of-round commit that added two new
catalog queries without running the suite — one missing COVERAGE.md row and
one brittle plan assertion shipped red.  This gate makes that impossible to
do silently.  Run it before ANY end-of-round / snapshot commit:

    python tools/preflight.py            # fast gate (consistency + new queries)
    python tools/preflight.py --full     # + the whole pytest suite

Fast gate =
  1. ``pytest -q tests/test_coverage_consistency.py`` — every registry query
     has a COVERAGE.md row, every oracle key resolves, etc.
  2. ``tools/check.py`` on every registry query that is NOT in the newest
     committed ``CHECK_r*.json`` snapshot — i.e. exactly the queries added
     since the last full-catalog verification, the ones a snapshot commit
     would otherwise ship unverified.

Exit 0 = safe to snapshot.  Non-zero = fix before committing.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def newest_check_snapshot() -> tuple[str | None, set[str]]:
    """Names already verified by the latest committed CHECK_r*.json."""
    paths = glob.glob(os.path.join(REPO, "CHECK_r*.json"))
    if not paths:
        return None, set()

    def round_no(p: str) -> int:
        m = re.search(r"CHECK_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    latest = max(paths, key=round_no)
    with open(latest) as f:
        data = json.load(f)
    return latest, set(data.get("queries", data).keys())


def main() -> int:
    full = "--full" in sys.argv

    print("[preflight 1/3] consistency suite")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         "tests/test_coverage_consistency.py"],
        cwd=REPO,
    )
    if r.returncode != 0:
        print("PREFLIGHT FAIL: consistency suite red — fix before snapshot")
        return 1

    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    latest, verified = newest_check_snapshot()
    new = [q for q in registry if q not in verified]
    if new:
        print(f"[preflight 2/3] {len(new)} quer{'y' if len(new)==1 else 'ies'} "
              f"not in {os.path.basename(latest) if latest else '<none>'}: "
              f"{', '.join(new)}")
        r = subprocess.run(
            [sys.executable, "tools/check.py", "/root/testdata/sf0.01", *new],
            cwd=REPO,
        )
        if r.returncode != 0:
            print("PREFLIGHT FAIL: new-query oracle check red")
            return 1
    else:
        print(f"[preflight 2/3] no queries newer than "
              f"{os.path.basename(latest) if latest else '<none>'} — skip")

    if full:
        print("[preflight 3/3] full pytest suite (--full)")
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "tests/"],
                           cwd=REPO)
        if r.returncode != 0:
            print("PREFLIGHT FAIL: pytest red")
            return 1
    else:
        print("[preflight 3/3] full suite skipped (pass --full to include)")

    print("PREFLIGHT OK — safe to snapshot")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
