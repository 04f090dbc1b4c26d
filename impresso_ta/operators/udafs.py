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
