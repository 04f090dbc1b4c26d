"""Fuzzy text location (SURVEY X11).

The reference's FedGaz importer locates article boundaries by searching
(fuzzily) for the next article's title inside the page fulltext with the
``regex`` module's approximate-match syntax ``{e<=k}``
(ref: fedgaz/classes.py:242-345). Generalized here as a corpus operator:
given (text, needle) pairs, find the best approximate occurrence and
return its span — the candidate-filter (J9 broadcast metadata join)
should run FIRST so the expensive fuzzy scan touches only candidate rows,
exactly the reference's candidate→search staging.

Runs as an Arrow-batched ``mapInPandas`` (the ``regex`` library is
C-backed; per-row work is a single approximate search).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUZZY_MATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("start", IntegerType(), True),
        StructField("end", IntegerType(), True),
        StructField("matched", StringType(), True),
        StructField("n_errors", IntegerType(), True),
    ]
)


def fuzzy_locate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    needle_col: str = "needle",
    max_errors: int = 2,
) -> DataFrame:
    """Best approximate occurrence of ``needle`` in ``text`` per row.

    Output: (doc_id, start, end, matched, n_errors); nulls when no match
    within ``max_errors`` edits. BESTMATCH semantics (minimal edit count),
    ties → leftmost — deterministic.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import regex

        cache: dict[str, "regex.Pattern"] = {}

        def pattern_for(needle: str):
            if needle not in cache:
                cache[needle] = regex.compile(
                    f"(?b)(?:{regex.escape(needle)}){{e<={max_errors}}}"
                )
            return cache[needle]

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                doc_id = int(getattr(row, id_col))
                text = getattr(row, text_col) or ""
                needle = getattr(row, needle_col)
                rec = {
                    "doc_id": doc_id,
                    "start": None,
                    "end": None,
                    "matched": None,
                    "n_errors": None,
                }
                if needle:
                    m = pattern_for(needle).search(text)
                    if m is not None:
                        rec.update(
                            start=m.start(),
                            end=m.end(),
                            matched=m.group(0),
                            n_errors=sum(m.fuzzy_counts),
                        )
                out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in FUZZY_MATCH_SCHEMA.fields]
            )

    return df.select(id_col, text_col, needle_col).mapInPandas(
        fn, schema=FUZZY_MATCH_SCHEMA
    )


def fuzzy_blocked_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block_expr=None,
) -> DataFrame:
    """Record-linkage fuzzy join: BLOCK (equi-join on a cheap normalized
    key) then VERIFY (exact Levenshtein <= ``max_dist``) — the standard
    blocking scheme that keeps approximate string matching off the
    all-pairs cliff (Christen 2012; same candidate->verify staging as
    the MinHash band join).

    ``block_expr`` maps a string column to its blocking key; the default
    is the lowercased first alphanumeric token (fast, JVM-side). Two
    strings in different blocks are never compared — blocking recall is
    the caller's modeling decision, exactly as in record-linkage
    practice.

    Scale shape: ONE equi-join on the block key (broadcast when a side
    is small, shuffle otherwise — Catalyst's choice), with the
    |len(a)-len(b)| <= max_dist prefilter fused into the join condition
    so the O(len^2) edit-distance DP only runs on length-compatible
    pairs (levenshtein >= length difference, so the filter is lossless).
    A pathological block (every row sharing one key) degrades to that
    block's cross product — cap or salt upstream if the key distribution
    is clone-heavy, as with any blocking scheme.
    """
    from pyspark.sql import functions as F

    def default_block(col):
        return F.lower(
            F.regexp_extract(col, r"([A-Za-z0-9]+)", 1)
        )

    blk = block_expr or default_block
    l = left.withColumn("_blk", blk(F.col(left_col)))
    r = right.withColumn("_blk", blk(F.col(right_col)))
    lc, rc = F.col(f"l.{left_col}"), F.col(f"r.{right_col}")
    joined = l.alias("l").join(
        r.alias("r"),
        (F.col("l._blk") == F.col("r._blk"))
        & (
            F.abs(F.length(lc) - F.length(rc)) <= F.lit(max_dist)
        )
        & (F.levenshtein(lc, rc) <= F.lit(max_dist)),
    )
    return joined.select(
        "l.*", "r.*", F.levenshtein(lc, rc).alias("edit_dist")
    ).drop("_blk")
