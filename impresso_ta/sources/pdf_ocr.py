"""S9: SwissInfo PDF OCR pre-extraction — the last SURVEY §2 item.

The reference runs this OUT of the engine as a driver-side loop over a
directory (ref: importer_scripts/preprocessing/
swissinfo_extract_ocr_from_pdfs.py — pymupdf text dicts + pdf2image JP2
conversion, one OCR JSON per radio bulletin, consumed downstream by the
SwissInfo importer). The engine-native form distributes the same
per-file pipeline:

- **discover** PDFs with Spark's ``binaryFile`` source (paths only —
  column pruning keeps the bytes out of the listing pass);
- **skip already-processed bulletins** with the F3/J1 incremental
  anti-join on the canonical id (the reference's ``os.path.exists``
  check, as a set operation instead of N stat calls);
- **decode + extract** per file inside ``mapInPandas`` (Arrow batches,
  executor-local file reads — the bytes never ship through a shuffle);
- **emit** one OCR-JSON row per bulletin matching the reference's
  structure bit-for-bit: ``canonical_id, lang, original_path,
  jp2_full_paths, ocr_pages`` with per-page
  ``blocks_with_lines``/``blocks_without_lines`` and ``rescaled_bbox``
  at block/line/span level (ref lines 93-148).

The one genuinely non-Spark piece — turning PDF bytes into pymupdf-style
page text dicts and page image sizes — is a pluggable
``page_extractor`` callable. The default raises ``NotImplementedError``
(pymupdf/pdf2image are not in this container); tests inject a
deterministic fake, so the Spark-side plumbing (schema, partitioning,
batch shape, rescale/split logic, incremental skip) is real and tested.
"""

from __future__ import annotations

import datetime
import json
import os
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# page_extractor contract: pdf bytes -> iterable of
# (page_text_dict, dest_img_size) per page, where page_text_dict is the
# pymupdf ``page.get_text("dict")`` shape ({"width", "height", "blocks"})
# and dest_img_size is the rendered image's (width, height).
PageExtractor = Callable[[bytes], Iterable[tuple[dict, tuple[float, float]]]]

OCR_SCHEMA = (
    "canonical_id string, lang string, original_path string, "
    "ocr_json string, n_pages int, error string"
)


def _default_page_extractor(content: bytes):
    raise NotImplementedError(
        "PDF decoding needs pymupdf (text dicts) + pdf2image (page "
        "sizes), which are not installed in this environment. Pass "
        "page_extractor=... with the contract: bytes -> iterable of "
        "(page_text_dict, (img_w, img_h)) per page."
    )


def canonical_from_filename(filename: str) -> tuple[str, str]:
    """Canonical path + language from a bulletin filename
    ``<prefix>_<prefix>_<program>_<YYYYMMDD>_<LANG>[_<EDITION>].<ext>``
    → ``SOC_<program>/<yyyy>/<mm>/<dd>/<edition>`` (ref lines 150-191;
    the reference's ``chr(elements[5] + 96)`` would TypeError on the
    string element — the intended int parse is applied here)."""
    elements = os.path.basename(filename).split(".")[0].split("_")
    program = elements[2]
    date = datetime.datetime.strptime(elements[3], "%Y%m%d").date()
    lang = elements[4]
    edition = chr(int(elements[5]) + 96) if len(elements) > 5 else "a"
    path = (
        f"SOC_{program}/{date.year}/{str(date.month).zfill(2)}/"
        f"{str(date.day).zfill(2)}/{edition}"
    )
    return path, lang.lower()


def _rescale(coords, curr_size, dest_size):
    """x1,y1,x2,y2 rescale between image sizes (ref utils.rescale_coords
    xy_format=True path)."""
    sx = dest_size[0] / curr_size[0]
    sy = dest_size[1] / curr_size[1]
    return [coords[0] * sx, coords[1] * sy, coords[2] * sx, coords[3] * sy]


def rescale_block_coords(block: dict, curr_size, dest_size) -> dict:
    """Add ``rescaled_bbox`` at block/line/span level (ref lines 50-93)."""
    if "bbox" in block:
        block["rescaled_bbox"] = _rescale(block["bbox"], curr_size, dest_size)
    for line in block.get("lines", ()):
        if "bbox" in line:
            line["rescaled_bbox"] = _rescale(
                line["bbox"], curr_size, dest_size
            )
        for span in line.get("spans", ()):
            if "bbox" in span:
                span["rescaled_bbox"] = _rescale(
                    span["bbox"], curr_size, dest_size
                )
    return block


def process_blocks_of_page(
    page_num: int, page_text_dict: dict, page_image_size
) -> dict:
    """Clean (drop image/mask payloads), rescale, and split a page's OCR
    blocks into with/without-lines lists (ref lines 95-148)."""
    curr = (page_text_dict["width"], page_text_dict["height"])
    lineless, with_lines = [], []
    for og_block in page_text_dict["blocks"]:
        block = {
            k: v for k, v in og_block.items() if k not in ("image", "mask")
        }
        block = rescale_block_coords(block, curr, page_image_size)
        (with_lines if "lines" in block else lineless).append(block)
    return {
        "page_num": page_num,
        "ocr_page_size": list(curr),
        "jp2_img_size": list(page_image_size),
        "blocks_with_lines": with_lines,
        "blocks_without_lines": lineless,
    }


def build_ocr_json(
    path: str, content: bytes, page_extractor: PageExtractor
) -> dict:
    """One bulletin's OCR JSON, the reference's structure (lines
    293-316). ``jp2_full_paths`` records the canonical image ids the JP2
    conversion would produce — the conversion itself is the importer's
    out-of-engine image leg (pdf2image + PIL JPEG2000), stubbed like
    every other multimodal decode in this repo."""
    canonical_path, lang = canonical_from_filename(path)
    canonical_issue_id = canonical_path.replace("/", "-")
    pages = [
        process_blocks_of_page(i, page_dict, img_size)
        for i, (page_dict, img_size) in enumerate(page_extractor(content))
    ]
    return {
        "canonical_id": canonical_issue_id,
        "lang": lang,
        "original_path": path,
        "jp2_full_paths": [
            os.path.join(
                "images",
                canonical_path,
                f"{canonical_issue_id}-p{str(i + 1).zfill(4)}.jp2",
            )
            for i in range(len(pages))
        ],
        "ocr_pages": pages,
    }


def extract_pdf_ocr(
    spark: SparkSession,
    in_dir: str,
    page_extractor: PageExtractor | None = None,
    existing_ids: DataFrame | None = None,
) -> DataFrame:
    """Distributed S9: every ``*.pdf`` under ``in_dir`` → one OCR-JSON
    row ``(canonical_id, lang, original_path, ocr_json, n_pages,
    error)``.

    Scale shape: the ``binaryFile`` listing is pruned to paths (the
    bytes column is never materialized on the listing side); the
    canonical id is derived with JVM-side string expressions so the
    ``existing_ids`` anti-join (the reference's skip-if-JSON-exists
    check, F3-style) prunes work BEFORE any PDF byte is read; surviving
    files are decoded inside ``mapInPandas`` with executor-LOCAL reads
    — each task opens its own files, nothing corpus-sized crosses the
    driver or a shuffle. A failing PDF becomes an error row (the S15
    errors-as-data discipline), never a task failure.
    """
    extractor = page_extractor or _default_page_extractor

    listing = (
        spark.read.format("binaryFile")
        # character-class glob: archives mix .pdf/.PDF (the reference
        # lists the directory unfiltered and would pick up both)
        .option("pathGlobFilter", "*.[pP][dD][fF]")
        .load(in_dir)
        .select("path")
    )
    parts = F.split(
        F.element_at(F.split(F.element_at(F.split("path", "/"), -1), r"\."), 1),
        "_",
    )
    listing = listing.withColumn(
        "canonical_id",
        F.concat_ws(
            "-",
            F.concat(F.lit("SOC_"), F.element_at(parts, 3)),
            F.substring(F.element_at(parts, 4), 1, 4),
            F.substring(F.element_at(parts, 4), 5, 2),
            F.substring(F.element_at(parts, 4), 7, 2),
            F.when(
                F.size(parts) > 5,
                F.char(F.element_at(parts, 6).cast("int") + 96),
            ).otherwise(F.lit("a")),
        ),
    )
    if existing_ids is not None:
        listing = listing.join(
            F.broadcast(existing_ids.select("canonical_id").distinct()),
            "canonical_id",
            "left_anti",
        )

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "canonical_id", "lang", "original_path", "ocr_json",
                "n_pages", "error",
            )}
            for path in pdf["path"]:
                local = path[len("file:"):] if path.startswith("file:") else path
                try:
                    with open(local, "rb") as f:
                        content = f.read()
                    doc = build_ocr_json(path, content, extractor)
                    out["canonical_id"].append(doc["canonical_id"])
                    out["lang"].append(doc["lang"])
                    out["original_path"].append(path)
                    out["ocr_json"].append(json.dumps(doc, sort_keys=True))
                    out["n_pages"].append(len(doc["ocr_pages"]))
                    out["error"].append(None)
                except Exception as exc:  # S15: errors are data
                    cid, lang = None, None
                    try:
                        cp, lang = canonical_from_filename(path)
                        cid = cp.replace("/", "-")
                    except Exception:
                        pass
                    out["canonical_id"].append(cid)
                    out["lang"].append(lang)
                    out["original_path"].append(path)
                    out["ocr_json"].append(None)
                    out["n_pages"].append(None)
                    out["error"].append(f"{path}: {exc}"[:500])
            yield pd.DataFrame(out)

    return listing.select("path").mapInPandas(_extract, OCR_SCHEMA)


def write_ocr_json(ocr_df: DataFrame, out_dir: str, mode: str = "append") -> None:
    """Persist extraction output partitioned by (program, year) derived
    from the canonical id — the engine's packaging unit (one file per
    bulletin, the reference's layout, is pathological at scale: see
    sources/sinks.py). Error rows go to the S15 ``_errors`` channel."""
    ok = ocr_df.filter(F.col("error").isNull())
    ok = (
        ok.withColumn("program", F.split("canonical_id", "-").getItem(0))
        .withColumn(
            "year", F.split("canonical_id", "-").getItem(1).cast("int")
        )
    )
    ok.write.partitionBy("program", "year").mode(mode).json(
        os.path.join(out_dir, "ocr")
    )
    errs = ocr_df.filter(F.col("error").isNotNull()).select(
        "original_path", "error"
    )
    errs.write.mode(mode).json(os.path.join(out_dir, "_errors"))
