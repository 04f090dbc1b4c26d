"""Continuous IVF ingest (streaming/ann.py): a vector drop zone drains
into a ``batch=N/cell=K`` staging store with frozen centroids —
bit-identical serving vs the inline assignment, static cell pruning
through the extra ``batch`` partition level, crash-replay idempotency
(own-partition overwrite), and the snapshot publish into the flat
one-file-per-cell serving layout."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from impresso_ta.operators.similarity import (
    ivf_assign,
    ivf_topk,
    ivf_topk_indexed,
    publish_ivf_store,
    write_ivf_index,
)
from impresso_ta.streaming.ann import stream_ivf_ingest

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _seeds(spark, n=8):
    emb = spark.read.parquet(EMB)
    return [
        (int(r.vec_id), list(r.embedding))
        for r in emb.orderBy("vec_id").limit(n).collect()
    ]


def _drop_slices(spark, drop, slices):
    """Write ``slices`` (list of (lo, hi) vec_id ranges) as one parquet
    file each into the drop zone; returns the union DataFrame."""
    emb = spark.read.parquet(EMB)
    for i, (lo, hi) in enumerate(slices):
        part = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).toPandas()
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(drop, f"slice{i}.parquet"),
        )
    los = min(lo for lo, _ in slices)
    his = max(hi for _, hi in slices)
    return emb.filter((F.col("vec_id") >= los) & (F.col("vec_id") < his))


def _files(root):
    return sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )


def _scan_files_read(df):
    """numFiles off the EXECUTED plan's cell-store scan (the
    test_similarity_ivf metric-walk)."""
    df.collect()
    files_read = None
    stack, seen = [df._jdf.queryExecution().executedPlan()], set()
    while stack:
        node = stack.pop()
        if node.id() in seen:
            continue
        seen.add(node.id())
        if (
            "FileSourceScan" in node.getClass().getSimpleName()
            and "cell" in node.toString()
        ):
            o = node.metrics().get("numFiles")
            if o.isDefined():
                files_read = max(files_read or 0, o.get().value())
        try:
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        except Exception:
            pass
        for meth in ("finalPhysicalPlan", "executedPlan", "plan", "child"):
            try:
                stack.append(getattr(node, meth)())
            except Exception:
                pass
    return files_read


def test_stream_ivf_ingest_parity_incremental_and_pruning(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    seeds = _seeds(spark)

    # two files drained in the first run (maxFilesPerTrigger=1 → two
    # micro-batches, so the store holds two batch partitions)
    corpus = _drop_slices(spark, drop, [(0, 200), (200, 400)])
    q = stream_ivf_ingest(
        spark, drop, store, seeds, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    staged = spark.read.parquet(store)
    assert staged.count() == 400
    assert {"batch", "cell"} <= set(staged.columns)
    assert staged.select("batch").distinct().count() == 2

    # frozen-centroid parity: serving the STAGING store == inline
    # assignment over the drained corpus, bit-for-bit
    qs = corpus.filter(F.col("vec_id") % 97 == 0)
    inline = sorted(
        map(tuple, ivf_topk(corpus, qs, seeds, nprobe=2, k=3).collect())
    )
    served = ivf_topk_indexed(staged, qs, seeds, nprobe=2, k=3)
    assert sorted(map(tuple, served.collect())) == inline

    # static cell pruning reaches the scan THROUGH the batch level
    n_total = len(_files(store))
    files_read = _scan_files_read(
        ivf_topk_indexed(staged, qs, seeds, nprobe=2, k=3)
    )
    assert files_read is not None and files_read < n_total

    # incremental: a third file is drained by a restart on the SAME
    # checkpoint — the file-source offset log skips the two seen paths,
    # so exactly the new 100 vectors land; prior batch partitions are
    # untouched (exactly-once)
    before = set(_files(store))
    emb = spark.read.parquet(EMB)
    pq.write_table(
        pa.Table.from_pandas(
            emb.filter(F.col("vec_id") >= 400).toPandas(),
            preserve_index=False,
        ),
        os.path.join(drop, "slice2.parquet"),
    )
    q = stream_ivf_ingest(
        spark, drop, store, seeds, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    staged2 = spark.read.parquet(store)
    assert staged2.count() == 500
    assert before <= set(_files(store))

    inline2 = sorted(
        map(tuple, ivf_topk(emb, qs, seeds, nprobe=2, k=3).collect())
    )
    served2 = ivf_topk_indexed(staged2, qs, seeds, nprobe=2, k=3)
    assert sorted(map(tuple, served2.collect())) == inline2


def test_stream_ivf_ingest_replay_overwrites_partial_batch(spark, tmp_path):
    """A half-written batch=N partition from a crashed attempt is
    REPLACED by the replay, never appended to: pre-seed batch=0 with
    garbage rows, run from a fresh checkpoint, and assert the garbage
    is gone and the batch holds exactly its input."""
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    store = str(tmp_path / "store")
    seeds = _seeds(spark)

    _drop_slices(spark, drop, [(0, 100)])
    # the "crashed attempt": wrong rows under batch=0
    garbage = ivf_assign(
        spark.read.parquet(EMB).filter(F.col("vec_id") >= 400), seeds
    )
    garbage.write.mode("overwrite").partitionBy("cell").parquet(
        f"{store}/batch=0"
    )
    assert spark.read.parquet(store).count() == 100  # 100 garbage rows

    q = stream_ivf_ingest(
        spark, drop, store, seeds, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    staged = spark.read.parquet(store)
    assert staged.count() == 100
    ids = {r.vec_id for r in staged.select("vec_id").collect()}
    assert ids == set(range(100))  # garbage replaced, not merged


def test_publish_ivf_store_flat_layout_and_parity(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    staging = str(tmp_path / "staging")
    serving = str(tmp_path / "serving")
    seeds = _seeds(spark)

    corpus = _drop_slices(spark, drop, [(0, 150), (150, 300), (300, 500)])
    q = stream_ivf_ingest(
        spark, drop, staging, seeds, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    staged = spark.read.parquet(staging)
    n_staged_files = len(_files(staging))

    publish_ivf_store(spark, staging, serving)
    flat = spark.read.parquet(serving)
    assert "batch" not in flat.columns
    assert flat.count() == 500
    # one file per cell — fewer files than the 3-batch staging store
    n_cells = flat.select("cell").distinct().count()
    assert len(_files(serving)) == n_cells < n_staged_files

    qs = corpus.filter(F.col("vec_id") % 97 == 0)
    a = sorted(
        map(tuple, ivf_topk_indexed(staged, qs, seeds, nprobe=2, k=3).collect())
    )
    b = sorted(
        map(tuple, ivf_topk_indexed(flat, qs, seeds, nprobe=2, k=3).collect())
    )
    assert a == b

    # the published store is where compact_ivf_index maintenance
    # applies — already compact right after a publish
    from impresso_ta.operators.similarity import compact_ivf_index

    assert compact_ivf_index(spark, serving) == []

    with pytest.raises(ValueError, match="serving_path != staging_path"):
        publish_ivf_store(spark, staging, staging + "/")


def test_stream_ivf_ingest_pq_codes_parity(spark, tmp_path):
    """codebook= switches the staged store to PQ codes: each batch is
    assigned AND encoded map-side; serving the staging store with the
    same frozen centroids + codebook is bit-identical to inline
    ivf_pq_topk over the drained corpus."""
    from impresso_ta.operators.pq import (
        ivf_pq_topk,
        ivf_pq_topk_indexed,
        pq_codebook,
    )

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    store = str(tmp_path / "store")
    seeds = _seeds(spark)
    corpus = _drop_slices(spark, drop, [(0, 250), (250, 500)])
    codebook = pq_codebook(corpus, m=4, ksub=8)

    q = stream_ivf_ingest(
        spark, drop, store, seeds, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, codebook=codebook,
    )
    q.awaitTermination(180)
    staged = spark.read.parquet(store)
    assert set(staged.columns) == {"vec_id", "codes", "batch", "cell"}
    assert staged.count() == 500

    qs = corpus.filter(F.col("vec_id") % 97 == 0)
    # inline ivf_pq_topk derives centroids from the corpus head and its
    # own codebook — replicate its probe with the explicit frozen pair
    served = ivf_pq_topk_indexed(
        staged, qs, seeds, codebook, nprobe=2, k=3
    )
    inline = ivf_pq_topk(corpus, qs, nlist=8, nprobe=2, m=4, ksub=8, k=3)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inline.collect())
    )
