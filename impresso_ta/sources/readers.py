"""Canonical store readers (SURVEY S7/S8).

The reference fetches issues and pages object-by-object from S3 inside
workers (ref: rebuilders/helpers.py:80-173). Here a canonical store is
just a path (local, s3a://, ...) read with the fixed schemas — Catalyst
prunes columns and pushes partition filters into the listing, replacing
the hand-rolled per-issue fetch loop with one distributed scan + the J2
join in the rebuild pipeline.

Both jsonl(.bz2) — the reference's packaging — and parquet are supported;
parquet is the engine-internal format (columnar pruning at 100 TB),
jsonl.bz2 the interchange/parity format (bz2 is splittable on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from impresso_ta.schemas import AUDIO_RECORD_SCHEMA, ISSUE_SCHEMA, PAGE_SCHEMA


def _is_parquet_store(path: str) -> bool:
    if ".parquet" in path:
        return True
    import glob
    import os

    if not os.path.isdir(path):
        return False
    return bool(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def _read(spark: SparkSession, path: str, schema) -> DataFrame:
    if _is_parquet_store(path):
        return spark.read.schema(schema).parquet(path)
    return spark.read.schema(schema).json(path)


def read_issues(spark: SparkSession, path: str) -> DataFrame:
    """Canonical issues from jsonl(.bz2) or parquet with the fixed schema
    (never inferred — IDs and shapes are contractual)."""
    return _read(spark, path, ISSUE_SCHEMA)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, PAGE_SCHEMA)


def read_audio_records(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, AUDIO_RECORD_SCHEMA)


def register_tables(
    spark: SparkSession,
    issues_path: str | None = None,
    pages_path: str | None = None,
    rebuilt_path: str | None = None,
    prefix: str = "",
) -> list[str]:
    """Expose the canonical stores as SQL temp views so users can
    ``spark.sql(...)`` over them (the reference has no query surface at
    all — consumers re-parse jsonl by hand).

    Returns the list of view names registered. Partition columns of the
    (alias, year)-partitioned stores participate in pruning: a
    ``WHERE alias = 'GDL' AND year = 1900`` reaches the file listing.
    """
    registered = []
    for name, path, reader in (
        ("issues", issues_path, read_issues),
        ("pages", pages_path, read_pages),
        ("rebuilt", rebuilt_path, None),
    ):
        if path is None:
            continue
        df = (
            spark.read.parquet(path)
            if reader is None
            else reader(spark, path)
        )
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        registered.append(view)
    return registered
