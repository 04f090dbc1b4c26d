"""Zipfian (alias, year) document profile for skew benching (SURVEY
hard-part #4 / VERDICT r3 task 7).

The driver-generated documents table is uniform: every synthetic issue
gets exactly one page+CI, so the rebuild's text-assembly groupBy never
sees a hot key. Real newspaper corpora are zipfian — one national daily
contributes orders of magnitude more pages per issue-year than a
parish weekly. This module deterministically remaps documents onto a
zipf-like issue profile so the rebuild benchmark exercises the skewed
shuffle.

Inverse-CDF construction, no RNG (Date.now/random are banned in the
bench path and determinism keeps runs comparable): u = md5(doc_id) / 2^48
is uniform in [0,1); issue = floor(N^u) is log-uniform on [1, N), i.e.
P(issue = k) ≈ 1/(k ln N) — the classic zipf(s=1) mass. With N = 1024
over 50k docs the hottest issue holds ~8-10% of all documents while the
median issue holds a handful: a >500x group-size spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zipfian_documents(
    docs: DataFrame, n_issues: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """documents + (_issue, _seq): a zipf-distributed issue index and a
    dense per-issue sequence number (consumed by
    ``synthetic_canonical_corpus`` to mint multi-CI issues with unique
    page/CI ids). One window shuffle on _issue — the same key the
    rebuild groups on, so the benched shuffle sees exactly this skew."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(1 << 48))
    )
    issue = F.floor(F.pow(F.lit(float(n_issues)), u)).cast("long")
    w = Window.partitionBy("_issue").orderBy(id_col)
    return docs.withColumn("_issue", issue).withColumn(
        "_seq", F.row_number().over(w)
    )
