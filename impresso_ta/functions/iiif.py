"""IIIF link reconstruction as column expressions (SURVEY X9).

Mirrors ref: rebuilders/helpers.py:417-485 (``get_iiif_and_coords`` +
``reconstruct_iiif_link``) — endpoint-specific suffixes at helpers.py:29-34.
Implemented as a ``when`` chain over string columns; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ref: rebuilders/helpers.py:29-34
IIIF_ENDPOINT_BASE_2_SUFFIX = {
    "https://ub-sipi.ub.unibas.ch/impresso": "max/0/default.jpg",
    "https://scriptorium.bcu-lausanne.ch/api": "300,/0/default.jpg",
}
DEFAULT_IMG_SUFFIX = "full/0/default.jpg"


def _suffix_for(uri_base: Column) -> Column:
    expr = F.lit(DEFAULT_IMG_SUFFIX)
    for base, suffix in IIIF_ENDPOINT_BASE_2_SUFFIX.items():
        expr = F.when(uri_base.contains(base), F.lit(suffix)).otherwise(expr)
    return expr


def reconstruct_iiif_link(iiif_link: Column, coords: Column) -> Column:
    """Build the image-area IIIF URL for an image CI.

    ``iiif_link`` is the CI's stored IIIF uri (usually ``.../info.json``),
    ``coords`` the ``array<int>`` [x,y,w,h]. Returns null when either is
    missing (ref: helpers.py:430-438).
    """
    coords_str = F.array_join(coords, ",")
    # os.path.split equivalent: strip the last path component.
    uri_base = F.regexp_replace(iiif_link, "/[^/]*$", "")
    old_suffix = F.regexp_extract(iiif_link, "/([^/]*)$", 1)
    img_suffix = _suffix_for(uri_base)

    # old_suffix == "default.jpg": link was already an image URL — keep it
    # if it embeds the right coords+suffix, else rebuild from 3-levels-up
    # (ref: helpers.py:470-475).
    rebuilt_base = F.regexp_replace(uri_base, "(/[^/]*){3}$", "")
    full_link = F.concat_ws("/", uri_base, coords_str, img_suffix)
    rebuilt_link = F.concat_ws("/", rebuilt_base, coords_str, img_suffix)

    return F.when(
        iiif_link.isNull() | coords.isNull() | (F.size(coords) == 0),
        F.lit(None).cast("string"),
    ).otherwise(
        F.when(
            old_suffix == "default.jpg",
            F.when(
                iiif_link.contains(coords_str)
                & iiif_link.contains(img_suffix),
                iiif_link,
            ).otherwise(rebuilt_link),
        ).otherwise(full_link)
    )
