"""Multimodal plumbing: binaryFile scan → decode/frame-sample/feature
UDTFs. Decoders are deterministic fakes (libs absent); the Spark-side
schema, batching and fan-out shapes are real."""

import pytest

from impresso_ta.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "img1.bin").write_bytes(b"\x00\x01" * 500)
    (d / "img2.bin").write_bytes(b"\xff" * 100)
    (d / "empty.bin").write_bytes(b"")
    return multimodal.read_media_dir(spark, str(d), mime="image/raw").cache()


def test_media_scan(media):
    rows = {r["media_id"]: r.asDict() for r in media.drop("content").collect()}
    assert rows["img1.bin"]["n_bytes"] == 1000
    assert rows["img1.bin"]["mime"] == "image/raw"
    assert len(rows["img1.bin"]["sha1"]) == 40
    # Spark's binaryFile source skips zero-length files
    assert "empty.bin" not in rows and len(rows) == 2


def test_decode_images_deterministic(media):
    meta1 = {r["media_id"]: r.asDict() for r in multimodal.decode_images(media).collect()}
    meta2 = {r["media_id"]: r.asDict() for r in multimodal.decode_images(media).collect()}
    assert meta1 == meta2  # deterministic fake decode
    assert meta1["img1.bin"]["width"] >= 64
    assert meta1["img1.bin"]["mode"] in ("RGB", "L")


def test_decode_strict_raises(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_images(media, strict=True)


def test_frame_sampling_fanout(media):
    frames = multimodal.sample_frames(media, n_frames=4)
    rows = frames.collect()
    # 2 payloads × 4 frames
    assert len(rows) == 8
    img1 = sorted(
        (r for r in rows if r["media_id"] == "img1.bin"),
        key=lambda r: r["frame_idx"],
    )
    assert [r["offset_bytes"] for r in img1] == [0, 250, 500, 750]
    assert all(len(r["frame"]) == 250 for r in img1)


def test_byte_histogram_features(spark, media):
    feats = {
        r["media_id"]: r["features"]
        for r in multimodal.byte_histogram_features(media).collect()
    }
    assert len(feats["img1.bin"]) == 16
    assert abs(sum(feats["img1.bin"]) - 1.0) < 1e-6
    assert feats["img1.bin"][0] == 1.0  # all bytes in [0,2)

    # empty payload path (can't arrive via binaryFile — construct directly)
    empty = spark.createDataFrame(
        [("e1", None, None, None, b"")], multimodal.MEDIA_SCHEMA
    )
    row = multimodal.byte_histogram_features(empty).collect()[0]
    assert row["features"] == [0.0] * 16
