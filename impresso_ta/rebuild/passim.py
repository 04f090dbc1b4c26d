"""Canonical → passim-document pipeline (ref: rebuilders/helpers.py:262-311
``rebuild_for_passim`` + paper_rebuilders.py:233-269).

Same cogroup shape as the solr pipeline; only the per-CI assembly differs
(every token becomes a region with start/length/xywh coords, lines end with
``\\n``, hyphenated parts are kept verbatim).
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from impresso_ta.schemas import PASSIM_SCHEMA, TYPE_MAPPINGS
from impresso_ta.rebuild.text import rebuild_text_passim
from impresso_ta.rebuild.solr import (
    _find_support,
    json_rebuild_input,
    support_issue_id,
)

PASSIM_WITH_ERRORS_SCHEMA = StructType(
    PASSIM_SCHEMA.fields
    + [
        StructField("has_problem", BooleanType(), False),
        StructField("error", StringType(), True),
    ]
)

_FIELD_NAMES = [f.name for f in PASSIM_WITH_ERRORS_SCHEMA.fields]


def rebuild_issue_passim(
    issue: dict, supports: list[dict]
) -> Iterable[dict]:
    """Passim documents for one (print) issue's content items."""
    supports = sorted(supports, key=lambda d: d.get("id") or "")
    issue_id = issue.get("id") or ""
    id_parts = issue_id.split("-")
    alias, date_str = "-".join(id_parts[:-4]), "-".join(id_parts[-4:-1])

    for ci in issue.get("i") or []:
        m = ci.get("m") or {}
        ci_id = m.get("id") or f"{issue_id}-i????"
        try:
            tp = m.get("tp")
            mapped_type = TYPE_MAPPINGS.get(tp, tp)
            doc: dict[str, Any] = {
                "series": alias,
                "date": date_str,
                "id": ci_id,
                "cc": None,
                "tp": mapped_type,
                "lg": m.get("lg"),
                "title": m.get("t"),
                "pages": [],
            }

            page_nos = sorted({int(p) for p in (m.get("pp") or [])})
            fulltext = ""
            missing: list[str] = []
            for no in page_nos:
                marker = f"p{str(no).zfill(4)}"
                page = _find_support(supports, marker)
                if page is None:
                    missing.append(marker)
                    continue
                regions = [
                    r for r in (page.get("r") or []) if r.get("pOf") == ci_id
                ]
                fulltext, out_regions = rebuild_text_passim(
                    regions, m.get("lg"), fulltext or None
                )
                doc["pages"].append(
                    {
                        "id": f"{issue_id}-{marker}",
                        "seq": no,
                        "regions": out_regions,
                    }
                )
            if missing:
                doc["has_problem"] = True
                doc["error"] = f"Page {','.join(missing)} not found for item {ci_id}"
                yield doc
                continue
            doc["text"] = fulltext
            doc["has_problem"] = False
            doc["error"] = None
            yield doc
        except Exception as exc:  # noqa: BLE001
            yield {
                "series": alias,
                "date": date_str,
                "id": ci_id,
                "has_problem": True,
                "error": f"{type(exc).__name__}: {exc}",
            }


def _batch_fn(arrow_schema):
    """JSON-transport UDTF body — see solr.json_rebuild_input for why the
    input crosses the boundary as text rather than nested Arrow structs."""
    import json

    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            out: list[dict] = []
            for js in batch.column(0).to_pylist():
                issue = json.loads(js)
                supports = issue.pop("_supports", None) or []
                for doc in rebuild_issue_passim(issue, supports):
                    out.append({k: doc.get(k) for k in _FIELD_NAMES})
            yield pa.RecordBatch.from_pylist(out, schema=arrow_schema)

    return fn


def rebuild_issues_passim(
    issues_df: DataFrame, supports_df: DataFrame
) -> DataFrame:
    """Passim rebuild: supports grouped per issue + batch-level UDTF (same
    plan shape as the solr pipeline)."""
    _USED = {"id", "cc", "r"}
    support_cols = [
        F.col(f.name) for f in supports_df.schema.fields if f.name in _USED
    ]
    keyed = supports_df.withColumn(
        "issue_id", support_issue_id(F.col("id"))
    )
    # explicit keyed repartition: same single shuffle, but exempt from
    # AQE byte-based coalescing, which under-parallelizes the per-row
    # compute-heavy assembly UDTF (see rebuild_issues_solr)
    grouped = (
        keyed.repartition(
            int(keyed.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "issue_id",
        )
        .groupBy("issue_id")
        .agg(F.collect_list(F.struct(*support_cols)).alias("_supports"))
    )
    joined = issues_df.join(
        grouped, issues_df["id"] == grouped["issue_id"], "left"
    ).drop("issue_id")
    from pyspark.sql.pandas.types import to_arrow_schema

    return json_rebuild_input(joined).mapInArrow(
        _batch_fn(to_arrow_schema(PASSIM_WITH_ERRORS_SCHEMA)),
        schema=PASSIM_WITH_ERRORS_SCHEMA,
    )
