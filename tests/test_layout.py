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


def _surviving_row_groups(path_glob: str, preds: dict[str, tuple[int, int]]):
    """(survivors, total) row groups whose footer min/max overlap every
    [lo, hi] predicate — the exact skipping decision parquet readers
    (Spark's included) make from row-group statistics."""
    import pyarrow.parquet as pq

    survive = total = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            ok = True
            for col, (lo, hi) in preds.items():
                st = g.column(names.index(col)).statistics
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                survive += 1
    return survive, total


def test_zorder_write_actually_prunes_row_groups(spark, tmp_path):
    """The docstring's claim, measured (VERDICT r3 task 6): write the
    same 64x64 grid z-ordered and single-column-sorted, then count row
    groups a selective 2-D box filter must read per the parquet footer
    min/max — the z-ordered layout prunes on BOTH dimensions, the
    x-sorted layout cannot prune on y at all."""
    n_units = 16
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(
        df, zpath, [F.col("x"), F.col("y")], bits=6, n_files=n_units
    )
    (
        df.repartitionByRange(n_units, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    box = {"x": (0, 7), "y": (0, 7)}  # 1/64 of the grid
    z_read, z_total = _surviving_row_groups(zpath + "/part-*", box)
    s_read, s_total = _surviving_row_groups(spath + "/part-*", box)
    assert z_total >= n_units and s_total >= n_units
    # x-sorted: y stats span the full range in every unit → only the x
    # predicate prunes (keeps ~1/8 of units); z-order prunes on both
    # (~1/64). Measured: z reads 1/16, sorted reads 2/16 at 16 units;
    # the gap widens with unit count (PLANS.md §7).
    assert z_read < s_read
    assert z_read / z_total <= 1 / 8
    # a y-only filter: the x-sorted layout reads EVERYTHING
    y_only = {"y": (0, 7)}
    zy_read, _ = _surviving_row_groups(zpath + "/part-*", y_only)
    sy_read, _ = _surviving_row_groups(spath + "/part-*", y_only)
    assert sy_read == s_total  # no pruning possible
    assert zy_read <= z_total / 2  # z-curve bounds y spread per unit
    # and the engine agrees with the footer math: same rows either way
    zdf, sdf = spark.read.parquet(zpath), spark.read.parquet(spath)
    pred = (F.col("x") <= 7) & (F.col("y") <= 7)
    assert zdf.filter(pred).count() == sdf.filter(pred).count() == 64


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
