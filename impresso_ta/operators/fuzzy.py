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
