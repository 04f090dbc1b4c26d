"""Coordinate math as column expressions (SURVEY X6/X7, A7).

The reference does this in per-token Python (ref: utils.py:256-285
xywh↔x1y1x2y2, utils.py:326-404 ``rescale_coords``, lux/helpers.py:12-37
resolution-based scale). Here each is a higher-order-function column
expression over the ``array<int>`` coord column — JVM-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xywh_to_corners(c: Column) -> Column:
    """[x,y,w,h] → [x1,y1,x2,y2] (ref: utils.py:256-269)."""
    return F.array(c[0], c[1], c[0] + c[2], c[1] + c[3])


def corners_to_xywh(c: Column) -> Column:
    """[x1,y1,x2,y2] → [x,y,w,h] (ref: utils.py:272-285)."""
    return F.array(c[0], c[1], c[2] - c[0], c[3] - c[1])


def rescale_coords(c: Column, scale: Column) -> Column:
    """Multiply every coord by a (possibly fractional) scale factor,
    rounding to int (ref: utils.py:326-404; lux res/254 variant
    lux/helpers.py:12-37)."""
    return F.transform(c, lambda v: F.round(v * scale).cast("int"))


def bounding_box(coords: Column) -> Column:
    """Enclosing [x,y,w,h] of an array of [x,y,w,h] boxes (SURVEY A7;
    ref: swissinfo/helpers.py:118-131, tetml/helpers.py:287-304).

    Pure ``aggregate`` over the array — no explode, no shuffle.
    """
    x1 = F.array_min(F.transform(coords, lambda c: c[0]))
    y1 = F.array_min(F.transform(coords, lambda c: c[1]))
    x2 = F.array_max(F.transform(coords, lambda c: c[0] + c[2]))
    y2 = F.array_max(F.transform(coords, lambda c: c[1] + c[3]))
    return F.array(x1, y1, x2 - x1, y2 - y1)
