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

from impresso_ta.schemas import KNOWN_CI_TYPES, SOURCE_MEDIUMS, SOURCE_TYPES

ISSUE_ID_RE = r"^[A-Za-z0-9_]+(-[A-Za-z0-9_]+)*-\d{4}-\d{2}-\d{2}-[a-z]\d*$"
PAGE_ID_RE = ISSUE_ID_RE[:-1] + r"-p\d{4}$"
RECORD_ID_RE = ISSUE_ID_RE[:-1] + r"-r\d{4}$"
CI_ID_RE = ISSUE_ID_RE[:-1] + r"-i\d{4}$"

# value-shape regexes of the canonical JSON Schemas (reconstructed from the
# reference's serializers — the schema files are an empty submodule there):
# timestamps from impresso-essentials timestamp() / strftime (space or T
# separated, optional zone), HH:MM:SS audio offsets (ref: ina/classes.py
# _get_duration strftime("%H:%M:%S")), 2-3 letter lowercase language codes.
TIMESTAMP_RE = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
HMS_RE = r"^\d{2,}:\d{2}:\d{2}$"
LANG_RE = r"^[a-z]{2,3}$"


def _rule(name: str, ok: Column) -> Column:
    """A violation entry (null when the rule passes)."""
    return F.when(~ok, F.lit(name))


def _all_cis(col: str = "i") -> Column:
    return F.coalesce(F.col(col), F.array())


def _opt(value: Column, ok: Column) -> Column:
    """Rule body for an optional field: pass when absent."""
    return value.isNull() | ok


def validate_issues(issues_df: DataFrame) -> DataFrame:
    """Attach ``_violations: array<string>`` to canonical issue rows.

    Value-level rules of the canonical issue schema (ref: utils.py:71-89
    validate_issue_schema; enum/shape sources cited per rule):

    - ``id_shape``/``ci_ids_prefixed``/``ci_ids_unique`` — canonical ID
      grammar (ref: importers/classes.py canonical_path usage).
    - ``st_enum``/``sm_enum``/``st_sm_consistent`` — SourceType/
      SourceMedium members and the print|typescript→paper,
      audio→radio dispatch (ref: core.py:185-204).
    - ``cdt_timestamp``/``ts_timestamp`` — serializer timestamp shape.
    - ``ci_tp_enum`` — tp ∈ KNOWN_CI_TYPES (ref: importers/__init__.py
      CONTENTITEM_TYPES + importer type maps).
    - ``ci_lg_shape`` — 2-3 letter lowercase code.
    - ``ci_ro_positive`` — reading order is 1-based.
    - ``ci_pp_in_range`` — CI page numbers must index into issue.pp
      (ref: verify_imported_issues checks CI/page consistency).
    - ``supports_prefixed`` — page/record ids belong to this issue.
    """
    cis = _all_cis()
    ci_ids = F.transform(cis, lambda c: c["m"]["id"])
    pp = F.coalesce(F.col("pp"), F.array())
    rr = F.coalesce(F.col("rr"), F.array())
    n_pages = F.size(pp)
    n_records = F.size(rr)
    bad_pp_refs = F.size(
        F.filter(
            cis,
            lambda c: F.exists(
                F.coalesce(c["m"]["pp"], F.array()),
                lambda p: (p < 1) | (p > n_pages),
            ),
        )
    )
    bad_rr_refs = F.size(
        F.filter(
            cis,
            lambda c: F.exists(
                F.coalesce(c["m"]["rr"], F.array()),
                lambda r: (r < 1) | (r > n_records),
            ),
        )
    )
    rules = [
        _rule("id_shape", F.col("id").rlike(ISSUE_ID_RE)),
        _rule("st_enum", F.col("st").isin(*SOURCE_TYPES) | F.col("st").isNull()),
        _rule("sm_enum", F.col("sm").isin(*SOURCE_MEDIUMS) | F.col("sm").isNull()),
        _rule(
            "st_sm_consistent",
            # only the PAIRING, gated on both being valid enum members
            # (the enum rules fire separately): audio ⇔ not-newspaper
            # (ref: core.py:185-204 print|typescript→paper, audio→radio)
            F.col("st").isNull()
            | F.col("sm").isNull()
            | ~F.col("st").isin(*SOURCE_TYPES)
            | ~F.col("sm").isin(*SOURCE_MEDIUMS)
            | (F.col("sm") != "audio")
            | (F.col("st") == "radio_broadcast"),
        ),
        _rule("cdt_timestamp", _opt(F.col("cdt"), F.col("cdt").rlike(TIMESTAMP_RE))),
        _rule("ts_timestamp", _opt(F.col("ts"), F.col("ts").rlike(TIMESTAMP_RE))),
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
            "ci_tp_enum",
            ~F.exists(
                cis,
                lambda c: c["m"]["tp"].isNotNull()
                & ~c["m"]["tp"].isin(*KNOWN_CI_TYPES),
            ),
        ),
        _rule(
            "ci_lg_shape",
            ~F.exists(
                cis,
                lambda c: c["m"]["lg"].isNotNull()
                & ~c["m"]["lg"].rlike(LANG_RE),
            ),
        ),
        _rule(
            "ci_ro_positive",
            ~F.exists(
                cis,
                lambda c: c["m"]["ro"].isNotNull() & (c["m"]["ro"] < 1),
            ),
        ),
        _rule("ci_pp_in_range", bad_pp_refs == 0),
        _rule("ci_rr_in_range", bad_rr_refs == 0),
        _rule(
            "supports_prefixed",
            ~F.exists(
                F.concat(pp, rr), lambda sid: ~sid.startswith(F.col("id"))
            ),
        ),
        _rule(
            "supports_present",
            (F.size(pp) > 0) | (F.size(rr) > 0),
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
    # coordinate ORIGINS (x, y) must be non-negative; width/height are
    # deliberately unconstrained — the reference's own char-run word
    # boxes keep first-char origin + last-char extent (ref:
    # bcul/helpers.py:150-210), which yields negative extents on
    # non-monotonic OCR runs, and those outputs pass the reference's
    # schema validation, so the canonical schema has no minimum there.
    def _origin_neg(c: Column) -> Column:
        return c.isNotNull() & (
            (F.element_at(c, 1) < 0) | (F.element_at(c, 2) < 0)
        )

    region_neg = F.size(F.filter(regions, lambda r: _origin_neg(r["c"])))
    token_neg = F.aggregate(
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
                        lambda tk: _origin_neg(tk["c"]),
                    )
                ),
            ),
        ),
    )
    bad_pof = F.size(
        F.filter(
            regions,
            lambda r: r["pOf"].isNotNull() & ~r["pOf"].rlike(CI_ID_RE),
        )
    )
    rules = [
        _rule("id_shape", F.col("id").rlike(PAGE_ID_RE)),
        _rule("region_coord_arity", region_bad == bad_coords),
        _rule("token_coord_arity", token_bad == 0),
        _rule("region_origin_nonneg", region_neg == 0),
        _rule("token_origin_nonneg", token_neg == 0),
        _rule("region_pOf_shape", bad_pof == 0),
        _rule("cdt_timestamp", _opt(F.col("cdt"), F.col("cdt").rlike(TIMESTAMP_RE))),
        _rule("ts_timestamp", _opt(F.col("ts"), F.col("ts").rlike(TIMESTAMP_RE))),
        _rule("st_enum", _opt(F.col("st"), F.col("st").isin(*SOURCE_TYPES))),
        _rule("sm_enum", _opt(F.col("sm"), F.col("sm").isin(*SOURCE_MEDIUMS))),
    ]
    return pages_df.withColumn(
        "_violations", F.filter(F.array(*rules), lambda v: v.isNotNull())
    )


def validate_audio_records(records_df: DataFrame) -> DataFrame:
    """Attach ``_violations`` to canonical audio-record rows (the audio
    twin of :func:`validate_pages` — ref: utils.py validate_audio_schema,
    shapes from ina/classes.py:52-62,108-124):

    - ``id_shape`` — ``-r\\d{4}`` record id grammar.
    - ``sm_audio``/``st_enum`` — records are always source medium
      "audio" (ref: ina/classes.py SourceMedium.AO) with a valid type.
    - ``stt_shape``/``dur_shape`` — HH:MM:SS offsets
      (ref: ina/classes.py _get_duration strftime).
    - ``tc_arity`` — every time-coord array at section/utterance/
      speech-segment/token level is [start, duration], exactly 2.
    - ``tc_nonneg`` — starts and durations are non-negative seconds.
    - ``section_pOf_shape`` — sections point at a canonical CI id
      (ref: ina/classes.py parse() sections pOf).
    """
    sections = F.coalesce(F.col("s"), F.array())

    def _tc_bad(tc: Column, pred) -> Column:
        return F.when(tc.isNotNull() & pred(tc), 1).otherwise(0)

    def _walk(pred) -> Column:
        # sum of violating tc arrays over section → utterance → speech
        # segment → token
        return F.aggregate(
            sections,
            F.lit(0),
            lambda acc, s: acc
            + _tc_bad(s["tc"], pred)
            + F.aggregate(
                F.coalesce(s["u"], F.array()),
                F.lit(0),
                lambda a2, u: a2
                + _tc_bad(u["tc"], pred)
                + F.aggregate(
                    F.coalesce(u["ss"], F.array()),
                    F.lit(0),
                    lambda a3, seg: a3
                    + _tc_bad(seg["tc"], pred)
                    + F.aggregate(
                        F.coalesce(seg["t"], F.array()),
                        F.lit(0),
                        lambda a4, tk: a4 + _tc_bad(tk["tc"], pred),
                    ),
                ),
            ),
        )

    arity_bad = _walk(lambda tc: F.size(tc) != 2)
    neg_bad = _walk(lambda tc: F.exists(tc, lambda v: v < 0))
    bad_pof = F.size(
        F.filter(
            sections,
            lambda s: s["pOf"].isNotNull() & ~s["pOf"].rlike(CI_ID_RE),
        )
    )
    rules = [
        _rule("id_shape", F.col("id").rlike(RECORD_ID_RE)),
        _rule("sm_audio", _opt(F.col("sm"), F.col("sm") == "audio")),
        _rule("st_enum", _opt(F.col("st"), F.col("st").isin(*SOURCE_TYPES))),
        _rule("cdt_timestamp", _opt(F.col("cdt"), F.col("cdt").rlike(TIMESTAMP_RE))),
        _rule("ts_timestamp", _opt(F.col("ts"), F.col("ts").rlike(TIMESTAMP_RE))),
        _rule("stt_shape", _opt(F.col("stt"), F.col("stt").rlike(HMS_RE))),
        _rule("dur_shape", _opt(F.col("dur"), F.col("dur").rlike(HMS_RE))),
        _rule("tc_arity", arity_bad == 0),
        _rule("tc_nonneg", neg_bad == 0),
        _rule("section_pOf_shape", bad_pof == 0),
    ]
    return records_df.withColumn(
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


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality column profile (the deequ/great-expectations summary
    pass): one row per column with exact n_rows / n_null / n_distinct
    and lexicographic min/max of the string form.

    ONE pass over the data: rows explode to (column, value_str) pairs —
    a |cols|× row expansion of only the profiled columns (unprofiled
    payload is pruned at the scan) — then a single map-side-combined
    groupBy(column). Exact distinct counts are what the oracle can
    check; at 100 TB swap count_distinct for approx_count_distinct and
    drop the oracle row (the plan shape is unchanged). String-form
    min/max is deliberate: one output schema for heterogeneous columns,
    deterministic across engines.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.v")
    return pairs.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
