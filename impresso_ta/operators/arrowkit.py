"""Shared helpers for the Arrow-batch (mapInArrow) fast paths added in
the round-12 optimization pass (guide §4.2: hand whole batches to
vectorized native code instead of interpreted JVM higher-order-function
lambdas).

Everything here exists to keep those fast paths BIT-IDENTICAL to the
JVM expression forms they replace (the DuckDB oracles pin results at
the hash level):

- :func:`java_tokens` reproduces ``F.split(F.trim(text), r"\\s+")``
  exactly (Spark trim strips only 0x20; Java ``\\s`` is the ASCII class
  ``[ \\t\\n\\x0B\\f\\r]``; Spark's ``split`` has limit=-1, which KEEPS
  trailing empty strings — unlike Java's ``String.split`` default).
- :func:`ge_round_cutoff` converts a ``round(x, r) >= threshold``
  predicate on doubles into an equivalent plain ``x >= cutoff``:
  Spark's ``round`` on DoubleType is ``BigDecimal.valueOf(x)`` (i.e.
  the SHORTEST decimal representation of x, which Python's ``repr``
  also produces) rounded HALF_UP, so the predicate holds iff the
  shortest-decimal of x reaches the half-up lower edge of the smallest
  passing 10^-r multiple. The function returns the smallest double at
  or above that edge, found by exact Decimal comparison on neighboring
  doubles — no float guesswork. ``le_round_cutoff`` is the mirrored
  form for ``round(x, r) <= threshold``.

Batch-level callers must preserve the JVM's floating-point summation
ORDER where a sum feeds a rounded comparison: Spark's ``aggregate``
fold adds left-to-right, so vectorized re-implementations accumulate
per-dimension (``acc += a[:, d] * b[:, d]`` in a loop over d), which
performs the identical sequence of IEEE additions for every row at
numpy speed.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

# Java \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]; Python re with
# re.ASCII gives \s == [ \t\n\r\f\v] — the same six code points.
_WS_SPLIT = re.compile(r"\s+", re.ASCII)


def java_tokens(text: str) -> list[str]:
    """``F.split(F.trim(text), r"\\s+")`` for one string, bit-compatible.

    Spark's ``trim`` strips only space (0x20). Spark's ``split`` calls
    ``Pattern.split(input, -1)``: limit -1 keeps BOTH a leading empty
    string (input starts with a delimiter) and a trailing one (input
    ends with non-space whitespace, which trim left in place); the
    empty input yields ``[""]``. Python's ``re.split`` has exactly the
    limit=-1 behavior, so no post-processing is needed.
    """
    return _WS_SPLIT.split(text.strip(" "))


def _shortest(x: float) -> Decimal:
    return Decimal(repr(x))


def ge_round_cutoff(threshold: float, round_to: int) -> float:
    """Smallest double c such that for every double x:
    ``spark_round(x, round_to) >= threshold``  ⟺  ``x >= c``.

    Derivation: spark_round(x, r) enumerates multiples k·10^-r; the
    comparison is between the double nearest k·10^-r and the double
    ``threshold``, so the passing set is {k >= kmin} with kmin the
    smallest k whose double value reaches threshold. HALF_UP sends
    shortest(x) ∈ [k - 0.5, k + 0.5)·10^-r to k (for x >= 0), so the
    pass condition is shortest(x) >= (kmin - 0.5)·10^-r, and the
    shortest-decimal map is strictly increasing over doubles.

    Only valid for threshold > 0 (HALF_UP rounds away from zero for
    negatives, flipping the boundary) — callers assert that.
    """
    if not threshold > 0:
        raise ValueError("ge_round_cutoff requires a positive threshold")
    scale = Decimal(10) ** round_to
    kmin = int(
        (Decimal(repr(threshold)) * scale).to_integral_value(
            rounding=ROUND_HALF_UP
        )
    )
    # adjust so kmin is the smallest k with float(k/scale) >= threshold
    while float(Decimal(kmin) / scale) < threshold:
        kmin += 1
    while float(Decimal(kmin - 1) / scale) >= threshold:
        kmin -= 1
    edge = (Decimal(kmin) - Decimal("0.5")) / scale
    if edge <= 0:
        # every non-negative x passes; negatives handled by caller's data
        raise ValueError("cutoff edge not positive — unsupported range")
    c = float(edge)
    while _shortest(c) < edge:
        c = math.nextafter(c, math.inf)
    while _shortest(math.nextafter(c, -math.inf)) >= edge:
        c = math.nextafter(c, -math.inf)
    return c


def le_round_cutoff(threshold: float, round_to: int) -> float:
    """Largest double c such that for every double x >= 0:
    ``spark_round(x, round_to) <= threshold``  ⟺  ``x <= c``.

    Mirror of :func:`ge_round_cutoff`: kmax is the largest k whose
    double value stays at or below threshold; HALF_UP (x >= 0) keeps
    shortest(x) < (kmax + 0.5)·10^-r, so c is the largest double whose
    shortest decimal is strictly below that edge.
    """
    if not threshold >= 0:
        raise ValueError("le_round_cutoff requires a non-negative threshold")
    scale = Decimal(10) ** round_to
    kmax = int(
        (Decimal(repr(threshold)) * scale).to_integral_value(
            rounding=ROUND_HALF_UP
        )
    )
    while float(Decimal(kmax) / scale) > threshold:
        kmax -= 1
    while float(Decimal(kmax + 1) / scale) <= threshold:
        kmax += 1
    edge = (Decimal(kmax) + Decimal("0.5")) / scale
    c = float(edge)
    while _shortest(c) >= edge:
        c = math.nextafter(c, -math.inf)
    while _shortest(math.nextafter(c, math.inf)) < edge:
        c = math.nextafter(c, math.inf)
    return c
