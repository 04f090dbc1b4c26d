"""Z-order layout: interleave correctness, clustering effectiveness
(per-chunk min/max spread vs single-column sort), write path."""

import glob

from pyspark.sql import functions as F

from impresso_ta.operators.layout import (
    minmax_scale_to_int,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            zorder_key([F.col("x"), F.col("y")], bits=16).alias("z")
        ).collect()
    ]

    def morton(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == [morton(x, y) for x, y in rows]


def test_minmax_scale_clamps_and_spans(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (-5.0,), (200.0,)], "v double"
    )
    got = [
        r["s"]
        for r in df.select(
            minmax_scale_to_int(F.col("v"), 0.0, 100.0, bits=8).alias("s")
        ).collect()
    ]
    assert got[0] == 0 and got[2] == 255 and got[3] == 0 and got[4] == 255
    assert got[1] == 127  # floor(0.5 * 255)


def test_zorder_clusters_both_dimensions(spark):
    """Chunked by Z-key, the summed per-chunk min/max spread of EACH
    dimension is far below the single-column-sort baseline for the
    non-sorted dimension — the property row-group pruning relies on."""
    n, chunks = 4096, 16
    # full 64x64 grid: x and y independent
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )

    def spread(ordered_col):
        chunked = df.withColumn(
            "chunk",
            F.ntile(chunks).over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy(ordered_col)
            ),
        )
        agg = chunked.groupBy("chunk").agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).agg(F.sum("sx").alias("tx"), F.sum("sy").alias("ty")).collect()[0]
        return agg["tx"], agg["ty"]

    zx, zy = spread(zorder_key([F.col("x"), F.col("y")], bits=6))
    sx, sy = spread(F.col("x"))
    # single-column sort: x perfectly clustered, y completely smeared
    assert sy >= chunks * 60  # ~full range in every chunk
    # z-order: BOTH dims bounded well below the smeared baseline
    assert zx < sy * 0.5 and zy < sy * 0.5
    assert zx + zy < (sx + sy)


def test_write_zordered_roundtrip(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 32).alias("x"),
        ((F.col("id") * 11) % 32).alias("y"),
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, [F.col("x"), F.col("y")], bits=5, n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == {"k", "x", "y"}  # key dropped
    assert len(glob.glob(out + "/part-*")) <= 4
