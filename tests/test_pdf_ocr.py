"""S9 PDF OCR pre-extraction: canonical-id derivation parity, the
block clean/rescale/split logic on a hand-built pymupdf-shaped page
dict, the distributed extract with an injected deterministic extractor
(the PDF decode itself is stubbed — pymupdf is not in this container),
the incremental anti-join skip, the errors-as-data channel, and the
default extractor's loud NotImplementedError."""

import json

import pytest

from impresso_ta.sources.pdf_ocr import (
    build_ocr_json,
    canonical_from_filename,
    extract_pdf_ocr,
    process_blocks_of_page,
    write_ocr_json,
)

PAGE_DICT = {
    "width": 100.0,
    "height": 200.0,
    "blocks": [
        {  # text block: image payload dropped, nested boxes rescaled
            "bbox": [10.0, 20.0, 30.0, 40.0],
            "image": b"\x00" * 16,
            "lines": [
                {
                    "bbox": [10.0, 20.0, 30.0, 30.0],
                    "spans": [
                        {"bbox": [10.0, 20.0, 20.0, 30.0], "text": "hi"}
                    ],
                }
            ],
        },
        {"bbox": [0.0, 0.0, 100.0, 200.0], "mask": b"\xff"},  # lineless
    ],
}


def _make_fake_extractor():
    """Built fresh per test: a NESTED function (cloudpickle serializes
    it by value, with the page dict captured) — a module-level function
    would pickle as a reference to this test module, which executor
    workers cannot import."""
    page = json.loads(json.dumps({
        **PAGE_DICT,
        "blocks": [
            {k: (v if not isinstance(v, bytes) else "x") for k, v in b.items()}
            for b in PAGE_DICT["blocks"]
        ],
    }))

    def _fake_extractor(content: bytes):
        # one page per value of the first input byte (deterministic)
        for _ in range(content[0]):
            yield page, (200.0, 400.0)  # 2x upscale

    return _fake_extractor


_fake_extractor = _make_fake_extractor()


def test_canonical_from_filename():
    path, lang = canonical_from_filename(
        "/in/RB_SOC_Prog1_19440307_FR.pdf"
    )
    assert path == "SOC_Prog1/1944/03/07/a"
    assert lang == "fr"
    # explicit edition number -> letter (2 -> 'b')
    path, lang = canonical_from_filename("RB_SOC_P_19440307_DE_2.pdf")
    assert path == "SOC_P/1944/03/07/b" and lang == "de"


def test_process_blocks_cleans_rescales_and_splits():
    out = process_blocks_of_page(0, json.loads(json.dumps(
        {**PAGE_DICT, "blocks": [
            {k: (v if not isinstance(v, bytes) else "x")
             for k, v in b.items()} for b in PAGE_DICT["blocks"]
        ]})), (200.0, 400.0))
    assert out["ocr_page_size"] == [100.0, 200.0]
    assert out["jp2_img_size"] == [200.0, 400.0]
    assert len(out["blocks_with_lines"]) == 1
    assert len(out["blocks_without_lines"]) == 1
    blk = out["blocks_with_lines"][0]
    assert "image" not in blk and "mask" not in out["blocks_without_lines"][0]
    assert blk["rescaled_bbox"] == [20.0, 40.0, 60.0, 80.0]
    assert blk["lines"][0]["rescaled_bbox"] == [20.0, 40.0, 60.0, 60.0]
    assert blk["lines"][0]["spans"][0]["rescaled_bbox"] == [
        20.0, 40.0, 40.0, 60.0,
    ]
    # originals kept alongside (the reference keeps both)
    assert blk["bbox"] == [10.0, 20.0, 30.0, 40.0]


def test_build_ocr_json_structure():
    doc = build_ocr_json(
        "file:/in/RB_SOC_Prog1_19440307_FR.pdf", b"\x02", _fake_extractor
    )
    assert doc["canonical_id"] == "SOC_Prog1-1944-03-07-a"
    assert doc["lang"] == "fr"
    assert len(doc["ocr_pages"]) == 2
    assert doc["jp2_full_paths"] == [
        "images/SOC_Prog1/1944/03/07/a/SOC_Prog1-1944-03-07-a-p0001.jp2",
        "images/SOC_Prog1/1944/03/07/a/SOC_Prog1-1944-03-07-a-p0002.jp2",
    ]


def test_extract_distributed_with_incremental_skip(spark, tmp_path):
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x02pdf")
    (src / "RB_SOC_Prog1_19440308_DE.pdf").write_bytes(b"\x01pdf")
    (src / "RB_SOC_Prog2_19440309_EN_2.pdf").write_bytes(b"\x03pdf")
    (src / "notes.txt").write_text("ignored: not a pdf")

    out = extract_pdf_ocr(spark, str(src), page_extractor=_fake_extractor)
    rows = {r["canonical_id"]: r for r in out.collect()}
    assert set(rows) == {
        "SOC_Prog1-1944-03-07-a",
        "SOC_Prog1-1944-03-08-a",
        "SOC_Prog2-1944-03-09-b",
    }
    assert rows["SOC_Prog2-1944-03-09-b"]["n_pages"] == 3
    assert all(r["error"] is None for r in rows.values())
    doc = json.loads(rows["SOC_Prog1-1944-03-07-a"]["ocr_json"])
    assert len(doc["ocr_pages"]) == 2
    assert doc["ocr_pages"][0]["blocks_with_lines"][0]["rescaled_bbox"] == [
        20.0, 40.0, 60.0, 80.0,
    ]

    # incremental skip (F3-style anti-join): already-processed ids are
    # pruned BEFORE decode — re-run with 2 of 3 marked done
    done = spark.createDataFrame(
        [("SOC_Prog1-1944-03-07-a",), ("SOC_Prog2-1944-03-09-b",)],
        "canonical_id string",
    )
    remaining = extract_pdf_ocr(
        spark, str(src), page_extractor=_fake_extractor, existing_ids=done
    )
    assert [r["canonical_id"] for r in remaining.collect()] == [
        "SOC_Prog1-1944-03-08-a"
    ]

    # sink: (program, year) partition layout + S15 error channel
    write_ocr_json(out, str(tmp_path / "out"))
    import glob

    assert glob.glob(
        str(tmp_path / "out" / "ocr" / "program=SOC_Prog1" / "year=1944" / "*")
    )


def test_extract_errors_are_data_not_task_failures(spark, tmp_path):
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x01ok")
    (src / "RB_SOC_BadDate_1944XX07_FR.pdf").write_bytes(b"\x01bad")

    def _picky(content: bytes):
        yield PAGE_DICT, (200.0, 400.0)

    rows = extract_pdf_ocr(
        spark, str(src), page_extractor=_picky
    ).collect()
    by_err = {bool(r["error"]): r for r in rows}
    assert len(rows) == 2
    assert by_err[False]["canonical_id"] == "SOC_Prog1-1944-03-07-a"
    assert "1944XX07" in by_err[True]["original_path"]
    assert by_err[True]["ocr_json"] is None


def test_default_extractor_is_a_loud_stub(spark, tmp_path):
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x01x")
    rows = extract_pdf_ocr(spark, str(src)).collect()
    assert rows[0]["error"] and "pymupdf" in rows[0]["error"]


def test_default_extractor_raises_directly():
    from impresso_ta.sources.pdf_ocr import _default_page_extractor

    with pytest.raises(NotImplementedError, match="page_extractor"):
        _default_page_extractor(b"")


def test_jvm_and_python_id_derivations_agree(spark):
    """The listing-stage (JVM) canonical-id derivation and the Python
    parser accept/reject the SAME filenames and produce the SAME id —
    the incremental skip key can never differ from the emitted id."""
    from impresso_ta.sources.pdf_ocr import derive_bulletin_ids

    names = [
        "RB_SOC_Prog1_19440307_FR.pdf",        # plain valid
        "RB_SOC_P_19440307_DE_2.pdf",          # explicit edition
        "RB_SOC_P_19440307_DE_02.pdf",         # zero-padded edition
        "RB_SOC_BadDate_1944XX07_FR.pdf",      # non-numeric date
        "RB_SOC_BadMonth_19441307_FR.pdf",     # month 13
        "RB_SOC_BadDay_19440230_FR.pdf",       # Feb 30
        "RB_SOC_P_19440307_DE_x.pdf",          # non-numeric edition
        "RB_SOC.pdf",                          # too few elements
        "RB_SOC_Pr-og_19440307_fr.pdf",        # hyphen in program, lc lang
    ]
    df = spark.createDataFrame(
        [(f"file:/in/{n}",) for n in names], "path string"
    )
    jvm = {
        r["path"].rsplit("/", 1)[1]: (r["canonical_id"], r["lang"])
        for r in derive_bulletin_ids(df).collect()
    }
    for n in names:
        try:
            cp, lang = canonical_from_filename(n)
            want = (cp.replace("/", "-"), lang)
        except Exception:
            want = (None, None)
        assert jvm[n] == want, n


def test_content_column_reaches_extractor_without_posix_access():
    """The worker consumes bytes from the binaryFile ``content`` column:
    an s3a:// path that does not exist on any local filesystem still
    decodes (the round-7 failure mode was executor-side open() turning
    every object-store row into an error row)."""
    import pandas as pd

    from impresso_ta.sources.pdf_ocr import _make_extract

    batch = pd.DataFrame(
        {
            "path": ["s3a://bucket/RB_SOC_Prog1_19440307_FR.pdf"],
            "canonical_id": ["SOC_Prog1-1944-03-07-a"],
            "_cpath": ["SOC_Prog1/1944/03/07/a"],
            "lang": ["fr"],
            "content": [b"\x02pdf"],
        }
    )
    [out] = list(_make_extract(_fake_extractor)(iter([batch])))
    assert out["error"][0] is None
    assert out["canonical_id"][0] == "SOC_Prog1-1944-03-07-a"
    assert json.loads(out["ocr_json"][0])["lang"] == "fr"
    assert out["n_pages"][0] == 2


def test_local_read_refuses_object_store_schemes(spark):
    with pytest.raises(ValueError, match="local_read"):
        extract_pdf_ocr(
            spark, "s3a://bucket/pdfs", page_extractor=_fake_extractor,
            local_read=True,
        )
    # single-slash Hadoop URI spellings are schemes too (round-8 review:
    # hdfs:/nn/x slipping through reproduced the silent error-row mode)
    with pytest.raises(ValueError, match="local_read"):
        extract_pdf_ocr(
            spark, "hdfs:/namenode/pdfs", page_extractor=_fake_extractor,
            local_read=True,
        )


def test_local_read_opt_in_still_works(spark, tmp_path):
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x02pdf")
    rows = extract_pdf_ocr(
        spark, str(src), page_extractor=_fake_extractor, local_read=True
    ).collect()
    assert [r["canonical_id"] for r in rows] == ["SOC_Prog1-1944-03-07-a"]
    assert rows[0]["n_pages"] == 2 and rows[0]["error"] is None


def test_incremental_run_never_reads_skipped_bytes(spark, tmp_path):
    """With existing_ids, the anti-join runs on a bytes-free listing and
    only surviving files are scanned with content: the content-bearing
    relation in the plan is an explicit-paths scan that lists ONLY the
    new file — the skipped file's bytes are not in any scan."""
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x02pdf")
    (src / "RB_SOC_Prog1_19440308_DE.pdf").write_bytes(b"\x01pdf")
    done = spark.createDataFrame(
        [("SOC_Prog1-1944-03-07-a",)], "canonical_id string"
    )
    # the scan node snapshots spark.sql.maxMetadataStringLength at plan
    # construction — raise it FIRST so Location paths are un-truncated
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try:
        out = extract_pdf_ocr(
            spark, str(src), page_extractor=_fake_extractor,
            existing_ids=done,
        )
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert [r["canonical_id"] for r in rows] == ["SOC_Prog1-1944-03-08-a"]
    assert rows[0]["error"] is None
    # survivor scan is built from the explicit path list, so the file
    # names appear in its Location; the done file's must only appear in
    # the bytes-free listing, never next to content
    content_scans = [
        seg for seg in plan.split("FileScan binaryFile")[1:]
        if "content:binary" in seg.split("ReadSchema:")[1].split("\n")[0]
    ]
    assert len(content_scans) == 1
    assert "RB_SOC_Prog1_19440308_DE.pdf" in content_scans[0]
    assert "RB_SOC_Prog1_19440307_FR.pdf" not in content_scans[0].split(
        "ReadSchema:"
    )[0]


def test_listing_stage_scan_prunes_content(spark, tmp_path):
    """The id-derivation listing reads only ``path`` — ReadSchema of the
    binaryFile scan must not include the bytes column."""
    from impresso_ta.sources.pdf_ocr import derive_bulletin_ids

    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x01x")
    listing = derive_bulletin_ids(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.[pP][dD][fF]")
        .load(str(src))
        .select("path")
    )
    plan = (
        listing._jdf.queryExecution().executedPlan().toString()
    )
    assert "content" not in plan


def test_default_content_plan_has_no_shuffle(spark, tmp_path):
    """No existing_ids: one content-bearing scan feeds mapInPandas
    directly — bytes never cross an Exchange."""
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "RB_SOC_Prog1_19440307_FR.pdf").write_bytes(b"\x01x")
    out = extract_pdf_ocr(spark, str(src), page_extractor=_fake_extractor)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_incremental_survivor_scan_is_sliced(spark, tmp_path, monkeypatch):
    """A survivor count above SURVIVOR_PATHS_PER_SCAN becomes multiple
    bounded binaryFile scans, never one plan embedding the whole path
    list — output identical either way."""
    import impresso_ta.sources.pdf_ocr as mod

    src = tmp_path / "pdfs"
    src.mkdir()
    for d in range(1, 8):  # 7 new files, none done
        (src / f"RB_SOC_Prog1_1944030{d}_FR.pdf").write_bytes(b"\x02pdf")
    done = spark.createDataFrame([("nope-0000-00-00-a",)], "canonical_id string")

    monkeypatch.setattr(mod, "SURVIVOR_PATHS_PER_SCAN", 3)
    out = extract_pdf_ocr(
        spark, str(src), page_extractor=_fake_extractor, existing_ids=done
    )
    got = sorted(r["canonical_id"] for r in out.collect())
    assert got == [f"SOC_Prog1-1944-03-0{d}-a" for d in range(1, 8)]
    # the plan holds ceil(7/3)=3 content scans, each bounded
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("binaryFile") >= 3
