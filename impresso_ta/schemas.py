"""Fixed StructTypes for the canonical data model.

The reference enforces externally-defined JSON Schemas at write time
(ref: utils.py:71-89, importers/classes.py:23-25); IDs and shapes must be
stable across runs. We mirror those schemas as explicit Spark StructTypes —
never inferred — so every stage type-checks against the same contract.

Shapes mirror:
- canonical issue   ref: importers/lux/classes.py:594-606
- content item      ref: importers/lux/classes.py:264-302
- canonical page    ref: importers/mets_alto/classes.py:60-67, alto.py:74-126
- audio record      ref: importers/ina/classes.py:52-62,108-124
- rebuilt (solr) CI ref: rebuilders/helpers.py:215-259, paper_rebuilders.py:177-230
- passim document   ref: rebuilders/helpers.py:291-311
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --------------------------------------------------------------------------
# Discovery (ref: importers/detect.py:191-196 IssueDir + format dispatch)
# --------------------------------------------------------------------------
DISCOVERY_SCHEMA = StructType(
    [
        _f("alias", StringType(), False),
        _f("date", DateType(), False),
        _f("edition", StringType(), False),
        _f("path", StringType(), False),
        _f("format", StringType(), False),
    ]
)

# --------------------------------------------------------------------------
# Canonical content item (nested inside issue.i)
# --------------------------------------------------------------------------
CI_PART_SCHEMA = StructType(
    [
        _f("comp_role", StringType()),
        _f("comp_id", StringType()),
        _f("comp_fileid", StringType()),
        _f("comp_page_no", IntegerType()),
    ]
)

CI_METADATA_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("pp", ArrayType(IntegerType())),  # page numbers (print)
        _f("rr", ArrayType(IntegerType())),  # record numbers (audio)
        _f("tp", StringType()),
        _f("t", StringType()),
        _f("lg", StringType()),
        _f("ro", IntegerType()),
        _f("iiif_link", StringType()),
        _f("cc", BooleanType()),
        _f("var_t", StringType()),
        _f("archival_note", StringType()),
    ]
)

CI_LEGACY_SCHEMA = StructType(
    [
        _f("id", StringType()),
        _f("parts", ArrayType(CI_PART_SCHEMA)),
        _f("source", StringType()),
        _f("canonical_parts", ArrayType(StringType())),
    ]
)

CONTENT_ITEM_SCHEMA = StructType(
    [
        _f("m", CI_METADATA_SCHEMA, False),
        _f("l", CI_LEGACY_SCHEMA),
        _f("c", ArrayType(IntegerType())),  # [x,y,w,h] — images only
        _f("pOf", StringType()),  # containing-article CI id
    ]
)

# --------------------------------------------------------------------------
# Canonical issue
# --------------------------------------------------------------------------
STYLE_SCHEMA = StructType(
    [
        _f("id", IntegerType()),
        _f("f", StringType()),  # font family
        _f("fs", DoubleType()),  # font size
        _f("rgb", ArrayType(IntegerType())),
    ]
)

ISSUE_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("cdt", StringType()),
        _f("ts", StringType()),
        _f("st", StringType()),  # source type: newspaper | radio_broadcast
        _f("sm", StringType()),  # source medium: print | typescript | audio
        _f("i", ArrayType(CONTENT_ITEM_SCHEMA)),
        _f("pp", ArrayType(StringType())),  # page IDs
        _f("rr", ArrayType(StringType())),  # audio record IDs
        _f("s", ArrayType(STYLE_SCHEMA)),
        _f("rp", StringType()),  # radio program
        _f("rc", StringType()),  # radio channel
        _f("iiif_manifest_uri", StringType()),  # issue-level IIIF manifest
        _f("n", StringType()),  # notes
    ]
)

# --------------------------------------------------------------------------
# Canonical page (region → paragraph → line → token)
# --------------------------------------------------------------------------
TOKEN_SCHEMA = StructType(
    [
        _f("tx", StringType()),
        _f("c", ArrayType(IntegerType())),
        _f("hy", BooleanType()),  # hyphen-start (first part of split word)
        _f("nf", StringType()),  # normalized form (second part carries it)
        _f("gn", BooleanType()),  # glue-no-space-after
        _f("s", IntegerType()),  # style id
    ]
)

LINE_SCHEMA = StructType(
    [_f("c", ArrayType(IntegerType())), _f("t", ArrayType(TOKEN_SCHEMA))]
)

PARAGRAPH_SCHEMA = StructType(
    [_f("c", ArrayType(IntegerType())), _f("l", ArrayType(LINE_SCHEMA))]
)

REGION_SCHEMA = StructType(
    [
        _f("c", ArrayType(IntegerType())),
        _f("pOf", StringType()),
        _f("p", ArrayType(PARAGRAPH_SCHEMA)),
    ]
)

PAGE_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("cdt", StringType()),
        _f("ts", StringType()),
        _f("st", StringType()),
        _f("sm", StringType()),
        _f("cc", BooleanType()),
        _f("iiif_img_base_uri", StringType()),
        _f("fw", IntegerType()),  # facsimile width
        _f("fh", IntegerType()),  # facsimile height
        _f("parag_avg_size", DoubleType()),  # A8 (SwissInfo typescript)
        _f("r", ArrayType(REGION_SCHEMA)),
        _f("s", ArrayType(STYLE_SCHEMA)),
        _f("n", ArrayType(StringType())),
    ]
)

# --------------------------------------------------------------------------
# Canonical audio record (section → utterance → speech-segment → token)
# --------------------------------------------------------------------------
AUDIO_TOKEN_SCHEMA = StructType(
    [_f("tx", StringType()), _f("tc", ArrayType(DoubleType()))]
)

SPEECH_SEGMENT_SCHEMA = StructType(
    [
        _f("tc", ArrayType(DoubleType())),
        _f("t", ArrayType(AUDIO_TOKEN_SCHEMA)),
    ]
)

UTTERANCE_SCHEMA = StructType(
    [
        _f("tc", ArrayType(DoubleType())),
        _f("ss", ArrayType(SPEECH_SEGMENT_SCHEMA)),
    ]
)

AUDIO_SECTION_SCHEMA = StructType(
    [
        _f("tc", ArrayType(DoubleType())),  # [start, duration] seconds
        _f("pOf", StringType()),
        _f("u", ArrayType(UTTERANCE_SCHEMA)),
    ]
)

AUDIO_RECORD_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("cdt", StringType()),
        _f("ts", StringType()),
        _f("st", StringType()),
        _f("sm", StringType()),
        _f("cc", BooleanType()),
        _f("iiif_base_uri", StringType()),
        _f("stt", StringType()),  # HH:MM:SS start time
        _f("dur", StringType()),  # HH:MM:SS duration
        _f("s", ArrayType(AUDIO_SECTION_SCHEMA)),
        _f("n", ArrayType(StringType())),
    ]
)

# --------------------------------------------------------------------------
# Rebuilt ("solr") content item
# --------------------------------------------------------------------------
REBUILT_TOKEN_SCHEMA = StructType(
    [
        _f("c", ArrayType(IntegerType())),
        _f("s", IntegerType(), False),  # char start offset in ft
        _f("l", IntegerType(), False),  # char length
        _f("hy1", BooleanType()),  # first part of hyphenated word
        _f("hy2", BooleanType()),  # second part (normalized form used)
    ]
)

REBUILT_PAGE_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("n", IntegerType(), False),  # page number
        _f("t", ArrayType(REBUILT_TOKEN_SCHEMA)),
        _f("r", ArrayType(ArrayType(IntegerType()))),  # region coords
    ]
)

REBUILT_AUDIO_TOKEN_SCHEMA = StructType(
    [
        _f("tc", ArrayType(DoubleType())),
        _f("s", IntegerType(), False),
        _f("l", IntegerType(), False),
    ]
)

REBUILT_RECORD_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("n", IntegerType(), False),
        _f("t", ArrayType(REBUILT_AUDIO_TOKEN_SCHEMA)),
        _f("u", ArrayType(ArrayType(DoubleType()))),  # utterance time coords
        _f("s", ArrayType(ArrayType(DoubleType()))),  # section time coords
    ]
)

REBUILT_CI_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("ts", StringType()),
        _f("d", StringType()),  # ISO date
        _f("pp", ArrayType(IntegerType())),
        _f("rr", ArrayType(IntegerType())),
        _f("cc", BooleanType()),
        _f("olr", BooleanType()),
        _f("st", StringType()),
        _f("sm", StringType()),
        _f("lg", StringType()),
        _f("tp", StringType()),  # remapped via TYPE_MAPPINGS
        _f("ro", IntegerType()),
        _f("title", StringType()),
        _f("var_t", StringType()),
        _f("archival_note", StringType()),
        _f("rp", StringType()),
        _f("rc", StringType()),
        _f("iiif_link", StringType()),
        _f("ft", StringType()),  # assembled fulltext
        _f("lb", ArrayType(IntegerType())),  # line break offsets
        _f("pb", ArrayType(IntegerType())),  # paragraph break offsets
        _f("rb", ArrayType(IntegerType())),  # region break offsets
        _f("ssb", ArrayType(IntegerType())),  # speech-segment breaks (audio)
        _f("ub", ArrayType(IntegerType())),  # utterance breaks (audio)
        _f("sb", ArrayType(IntegerType())),  # section breaks (audio)
        _f("ppreb", ArrayType(REBUILT_PAGE_SCHEMA)),
        _f("rreb", ArrayType(REBUILT_RECORD_SCHEMA)),
        _f("stt", StringType()),
        _f("dur", StringType()),
    ]
)

# --------------------------------------------------------------------------
# Passim document
# --------------------------------------------------------------------------
PASSIM_COORDS_SCHEMA = StructType(
    [
        _f("x", IntegerType()),
        _f("y", IntegerType()),
        _f("w", IntegerType()),
        _f("h", IntegerType()),
    ]
)

PASSIM_REGION_SCHEMA = StructType(
    [
        _f("start", IntegerType(), False),
        _f("length", IntegerType(), False),
        _f("coords", PASSIM_COORDS_SCHEMA),
    ]
)

PASSIM_PAGE_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("seq", IntegerType(), False),
        _f("regions", ArrayType(PASSIM_REGION_SCHEMA)),
    ]
)

PASSIM_SCHEMA = StructType(
    [
        _f("series", StringType(), False),
        _f("date", StringType(), False),
        _f("id", StringType(), False),
        _f("cc", BooleanType()),
        _f("tp", StringType()),
        _f("lg", StringType()),
        _f("title", StringType()),
        _f("text", StringType()),
        _f("pages", ArrayType(PASSIM_PAGE_SCHEMA)),
    ]
)

# --------------------------------------------------------------------------
# Error channel (errors-as-data; ref: core.py:54-88 write_error)
# --------------------------------------------------------------------------
ERROR_SCHEMA = StructType(
    [
        _f("canonical_path", StringType(), False),
        _f("stage", StringType(), False),
        _f("error", StringType(), False),
    ]
)

# Allowed content-item types (ref: importers/__init__.py:3-8)
CONTENTITEM_TYPES = (
    "article",
    "advertisement",
    "obituary",
    "death_notice",
    "weather",
    "image",
    "table",
    "chronicle",
    "radio_broadcast_episode",
)

# Rebuilt-side type remapping (ref: rebuilders/helpers.py:36-48)
TYPE_MAPPINGS: dict[str, str | None] = {
    "article": "ar",
    "ar": "ar",
    "advertisement": "ad",
    "ad": "ad",
    "pg": None,
    "page": None,
    "image": "img",
    "table": "tb",
    "death_notice": "ob",
    "weather": "w",
    "chronicle": "ch",
}

SOURCE_TYPES = ("newspaper", "radio_broadcast")
SOURCE_MEDIUMS = ("print", "typescript", "audio")

# Content-item type vocabulary of the canonical schema, reconstructed from
# every reference code path that mints a ``tp`` value (the schema JSON files
# are an empty submodule in the reference checkout): CONTENTITEM_TYPES
# (ref: importers/__init__.py:3-17), the METS/ALTO div-type mapping targets,
# BNF-EN content types + TYPE_TRANSLATION (ref: bnf_en/classes.py:30-40),
# Olive legacy lowercased types, SwissInfo/INA radio types
# (ref: swissinfo/classes.py:53, ina/classes.py:158), and the rebuilt-side
# TYPE_MAPPINGS keys (ref: rebuilders/helpers.py:36-48).
KNOWN_CI_TYPES = (
    "article",
    "ar",
    "advertisement",
    "ad",
    "obituary",
    "death_notice",
    "ob",
    "weather",
    "w",
    "image",
    "img",
    "picture",
    "illustration",
    "table",
    "tb",
    "chronicle",
    "ch",
    "section",
    "page",
    "pg",
    "ornament",
    "freead",
    "radio_bulletin",
    "radio_broadcast_episode",
)
