"""Custom aggregates via Arrow-batched Pandas grouped-agg UDFs (§2.10
UDAF surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the Series annotations at decoration time, and postponed
(string) annotations break its signature inspection.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Weight-averaged value per group. Arrow-batched; prefer the
    built-in sum(v*w)/sum(w) composition in hot paths (JVM-side) — this
    exists to exercise the custom-UDAF surface with oracle parity."""
    return float((value * weight).sum() / weight.sum())


def make_chunk_text_udtf():
    """SQL-callable Python UDTF (PySpark ``@udtf``): split a document
    into fixed-size character chunks — one input row → N chunk rows
    (context-window chunking for training pipelines).

    Returned lazily from a factory so importing this module never
    requires an active SparkSession; register with
    ``spark.udtf.register("chunk_text", make_chunk_text_udtf())``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, start: int, chunk: string")
    class ChunkText:
        def eval(self, text: str, budget: int):
            if text is None:
                return
            for i in range(0, max(len(text), 1), budget):
                yield i // budget, i, text[i : i + budget]

    return ChunkText
