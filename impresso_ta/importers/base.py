"""Importer plugin protocol + the distributed import pipeline.

The reference's import driver (ref: importers/core.py:330-527) hand-builds
Dask bags with tuned partition sizes, two shuffles, FileLock-guarded
appends and manual memory release. Here the whole import is ONE
``mapInPandas`` pass over the discovery DataFrame: each task parses a
batch of issue directories (executor-side IO, like the reference's
workers) and emits a combined (issue, pages[], error) row; downstream
splits and partitioned writes replace the Dask groupby shuffles
(SURVEY A1/A3 → partitioned write).

Errors-as-data: a failing issue becomes an error row (canonical_path +
message, matching ref core.py:54-88 formatting), never a task failure.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from impresso_ta.schemas import (
    AUDIO_RECORD_SCHEMA,
    ERROR_SCHEMA,
    ISSUE_SCHEMA,
    PAGE_SCHEMA,
)

_PLUGINS: dict[str, "FormatPlugin"] = {}


class FormatPlugin:
    """A format importer: one issue directory → canonical issue + pages.

    Subclasses implement ``parse_issue_dir`` returning the canonical issue
    dict with an extra ``_pages`` key holding the canonical page dicts.
    Implementations must be deterministic (stable CI numbering over
    explicitly sorted inputs — SURVEY W2) and must raise on unparseable
    input (the pipeline converts raises into error rows).
    """

    name: str = "abstract"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        raise NotImplementedError


def register(plugin: FormatPlugin) -> None:
    _PLUGINS[plugin.name] = plugin


def get_plugin(name: str) -> FormatPlugin:
    if name not in _PLUGINS:
        raise KeyError(
            f"Unknown importer format {name!r}; registered: {sorted(_PLUGINS)}"
        )
    return _PLUGINS[name]


IMPORT_ROW_SCHEMA = StructType(
    [
        StructField("issue", ISSUE_SCHEMA, True),
        StructField("pages", ArrayType(PAGE_SCHEMA), True),
        StructField("records", ArrayType(AUDIO_RECORD_SCHEMA), True),
        StructField("canonical_path", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def _import_udtf(ts: Optional[str]):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from impresso_ta.importers import get_plugin as _get

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                date_str = (
                    row.date.strftime("%Y-%m-%d")
                    if hasattr(row.date, "strftime")
                    else str(row.date)
                )
                canonical_path = f"{row.alias}-{date_str}-{row.edition}"
                try:
                    plugin = _get(row.format)
                    issue = plugin.parse_issue_dir(
                        row.alias, date_str, row.edition, row.path
                    )
                    supports = issue.pop("_pages", [])
                    is_audio = issue.get("sm") == "audio"
                    if ts is not None:
                        issue.setdefault("cdt", ts)
                        issue.setdefault("ts", ts)
                        for p in supports:
                            p.setdefault("cdt", ts)
                            p.setdefault("ts", ts)
                    out.append(
                        {
                            "issue": issue,
                            "pages": None if is_audio else supports,
                            "records": supports if is_audio else None,
                            "canonical_path": canonical_path,
                            "error": None,
                        }
                    )
                except Exception as exc:  # noqa: BLE001 errors-as-data
                    out.append(
                        {
                            "issue": None,
                            "pages": None,
                            "records": None,
                            "canonical_path": canonical_path,
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["issue", "pages", "records", "canonical_path", "error"],
            )

    return fn


def import_issues(
    discovery_df: DataFrame, ts: Optional[str] = None
) -> "ImportResult":
    """Run the import: discovery rows → ImportResult(issues, pages,
    records, errors). Unpacks as a 3-tuple (issues, supports, errors)
    for print-only corpora.

    One UDTF pass, no shuffle; at 100 TB the discovery frame is
    repartitioned so each task holds a handful of issues (an issue is a
    few MB of XML; the reference used 20 issues/partition, core.py:394 —
    here AQE-sized input splits achieve the same without tuning).
    """
    combined = discovery_df.mapInPandas(
        _import_udtf(ts), schema=IMPORT_ROW_SCHEMA
    )
    ok = combined.filter(F.col("error").isNull())
    issues_df = ok.select("issue.*")
    pages_df = (
        ok.filter(F.col("pages").isNotNull())
        .select(F.explode("pages").alias("page"))
        .select("page.*")
    )
    records_df = (
        ok.filter(F.col("records").isNotNull())
        .select(F.explode("records").alias("record"))
        .select("record.*")
    )
    errors_df = combined.filter(F.col("error").isNotNull()).select(
        "canonical_path",
        F.lit("import").alias("stage"),
        "error",
    )
    return ImportResult(issues_df, pages_df, records_df, errors_df)


class ImportResult:
    """Named result: .issues, .pages, .records, .errors. Also unpacks as
    ``issues, pages, errors = import_issues(...)`` for print-only corpora
    (audio corpora use the named ``.records``)."""

    def __init__(self, issues, pages, records, errors):
        self.issues = issues
        self.pages = pages
        self.records = records
        self.errors = errors

    def __iter__(self):
        return iter((self.issues, self.pages, self.errors))


def empty_errors_df(spark) -> DataFrame:
    return spark.createDataFrame([], ERROR_SCHEMA)


def read_bytes_with_retries(
    path: str, attempts: int = 3, _opener=open
) -> bytes:
    """Read a file, retrying transient IOErrors up to ``attempts`` times
    (ref: mets_alto/classes.py:81-99,196-226 — 3 attempts per XML read,
    written for flaky network filesystems/S3 mounts). Non-IO errors
    (parse failures) propagate immediately to the error channel."""
    last: IOError | None = None
    for _ in range(attempts):
        try:
            with _opener(path, "rb") as f:
                return f.read()
        except IOError as exc:
            last = exc
    raise last
