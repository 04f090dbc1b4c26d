"""Skew-mitigation operators: salted aggregation and salted broadcast-ish
joins for hot keys.

AQE's skew-join splitting (enabled in session defaults) handles skewed
JOINS at runtime, but a skewed AGGREGATION key — one (alias, year) of a
major daily ≫ median (SURVEY §7 risk 4), or a stop-shingle in dedup —
still funnels every row of the hot key through one reducer. The classic
fix is salting: spread each key over ``n_salts`` sub-keys, partially
aggregate, then combine the partials in a second (tiny) shuffle.

The salt is DETERMINISTIC — derived from a row column via md5, never
``rand()`` — so plans stay replayable (task retries see the same salt;
results are engine-portable for the DuckDB oracle, which computes the
same answer without salting since salting never changes semantics).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(source: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): md5 of a high-cardinality row
    column (e.g. the row id). Uniform, replayable on task retry."""
    return (
        F.conv(F.substring(F.md5(source.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_salts
    ).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_source: str,
    n_salts: int = 16,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-stage aggregation for skewed grouping keys.

    ``aggs`` maps output column name → (function, input column) with
    function ∈ {sum, count, min, max} — the decomposable aggregates whose
    partials combine losslessly (count re-combines as sum; avg callers
    compose sum/count themselves).

    Stage 1 groups by (keys + salt): the hot key's rows spread over
    ``n_salts`` reducers. Stage 2 re-groups the ≤ n_salts partial rows
    per key — a shuffle of |distinct keys|·n_salts tiny rows. Results are
    identical to a direct groupBy (tested + oracle-checked); use when one
    key holds ≫ 1/shuffle-partitions of the data.
    """
    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in _PARTIAL:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    salted = df.withColumn("_salt", salt_column(F.col(salt_source), n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[fn](col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[fn](out).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` is heavily skewed on ``key`` and ``small``
    is too large to broadcast outright.

    The big side gets a deterministic salt; the small side is REPLICATED
    n_salts× (explode over the salt range) so every (key, salt) pair
    matches. The shuffle then partitions on (key, salt): the hot key's
    rows land on n_salts reducers instead of one. Same rows as a plain
    join (tested). Prefer ``F.broadcast(small)`` when small fits in
    memory; prefer AQE skew-join when it triggers — this is the explicit
    fallback for when neither does.
    """
    salted_big = big.withColumn(
        "_salt", salt_column(F.col(salt_source), n_salts)
    )
    replicated = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")
