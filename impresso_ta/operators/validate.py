"""Canonical-schema validation as expectation columns (errors-as-data).

The reference validates every serialized issue/page against external JSON
Schemas at write time (ref: utils.py:71-89 called from core.py:280-292,
:618) and can bypass validation for speed (classes.py:78-83). Here
validation is a DataFrame → DataFrame stage producing a ``_violations``
array column — structural conformance is already guaranteed by the fixed
StructTypes (a row cannot exist off-schema), so this stage checks the
VALUE-level rules the JSON Schemas encode: ID shapes, enum membership,
required fields, referential consistency between ``i``/``pp``.

All checks are column expressions (no UDF, no shuffle); `split_valid`
routes violating rows to the error channel without failing the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impresso_ta.schemas import SOURCE_MEDIUMS, SOURCE_TYPES

ISSUE_ID_RE = r"^[A-Za-z0-9_]+(-[A-Za-z0-9_]+)*-\d{4}-\d{2}-\d{2}-[a-z]\d*$"
PAGE_ID_RE = ISSUE_ID_RE[:-1] + r"-p\d{4}$"
RECORD_ID_RE = ISSUE_ID_RE[:-1] + r"-r\d{4}$"
CI_ID_RE = ISSUE_ID_RE[:-1] + r"-i\d{4}$"


def _rule(name: str, ok: Column) -> Column:
    """A violation entry (null when the rule passes)."""
    return F.when(~ok, F.lit(name))


def validate_issues(issues_df: DataFrame) -> DataFrame:
    """Attach ``_violations: array<string>`` to canonical issue rows."""
    ci_ids = F.transform(F.coalesce(F.col("i"), F.array()), lambda c: c["m"]["id"])
    rules = [
        _rule("id_shape", F.col("id").rlike(ISSUE_ID_RE)),
        _rule("st_enum", F.col("st").isin(*SOURCE_TYPES) | F.col("st").isNull()),
        _rule("sm_enum", F.col("sm").isin(*SOURCE_MEDIUMS) | F.col("sm").isNull()),
        _rule(
            "ci_ids_prefixed",
            F.size(
                F.filter(ci_ids, lambda cid: ~cid.startswith(F.col("id")))
            )
            == 0,
        ),
        _rule(
            "ci_ids_unique",
            F.size(F.array_distinct(ci_ids)) == F.size(ci_ids),
        ),
        _rule(
            "supports_present",
            (F.size(F.coalesce(F.col("pp"), F.array())) > 0)
            | (F.size(F.coalesce(F.col("rr"), F.array())) > 0),
        ),
    ]
    return issues_df.withColumn(
        "_violations",
        F.filter(F.array(*rules), lambda v: v.isNotNull()),
    )


def validate_pages(pages_df: DataFrame) -> DataFrame:
    """Attach ``_violations`` to canonical page rows: ID shape, coord
    arity ([x,y,w,h] exactly) on every region/para/line/token."""
    bad_coords = F.lit(0)
    regions = F.coalesce(F.col("r"), F.array())
    # count coord arrays with arity != 4 across the full nesting
    region_bad = F.size(
        F.filter(
            regions,
            lambda r: r["c"].isNotNull() & (F.size(r["c"]) != 4),
        )
    )
    token_bad = F.aggregate(
        regions,
        F.lit(0),
        lambda acc, r: acc
        + F.aggregate(
            F.coalesce(r["p"], F.array()),
            F.lit(0),
            lambda a2, p: a2
            + F.aggregate(
                F.coalesce(p["l"], F.array()),
                F.lit(0),
                lambda a3, ln: a3
                + F.size(
                    F.filter(
                        F.coalesce(ln["t"], F.array()),
                        lambda tk: tk["c"].isNotNull() & (F.size(tk["c"]) != 4),
                    )
                ),
            ),
        ),
    )
    rules = [
        _rule("id_shape", F.col("id").rlike(PAGE_ID_RE)),
        _rule("region_coord_arity", region_bad == bad_coords),
        _rule("token_coord_arity", token_bad == 0),
    ]
    return pages_df.withColumn(
        "_violations", F.filter(F.array(*rules), lambda v: v.isNotNull())
    )


def split_valid(validated_df: DataFrame, stage: str) -> tuple[DataFrame, DataFrame]:
    """Route rows with violations to the error channel (S15 shape)."""
    ok = validated_df.filter(F.size("_violations") == 0).drop("_violations")
    errors = (
        validated_df.filter(F.size("_violations") > 0)
        .select(
            F.col("id").alias("canonical_path"),
            F.lit(stage).alias("stage"),
            F.concat_ws(
                "; ",
                F.transform(
                    F.col("_violations"), lambda v: F.concat(F.lit("violated "), v)
                ),
            ).alias("error"),
        )
    )
    return ok, errors
