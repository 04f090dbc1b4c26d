"""Data-scaling probe for the training-pair mining family (VERDICT r9
task 2): `hard_negatives_ivf` and `ivf_topk_indexed` at 1x (sf0.1),
10x (sf1), 100x (sf10docs — shared with tools/scale_docs.py), same
session layout as bench.py.

Round 9 shipped both operators with parity proofs (full probe == brute,
bit-for-bit; indexed == inline) but no measured curve. This probe turns
the two advertised scale claims into numbers:

1. `hard_negatives_ivf` — "candidate volume ~ corpus*nprobe/nlist; use
   this when every corpus row is an anchor". Measured in exactly that
   regime: the ANCHOR SET GROWS WITH THE CORPUS (10% of rows at every
   tier), nlist follows the IVF sizing discipline nlist = 4*sqrt(n)
   (FAISS guidance; cells ~ sqrt(n)/4), nprobe = 2. Cost model: cell
   assignment is Theta(n*nlist*dims) = n^1.5-shaped, the probe join
   emits |anchors|*nprobe*cellsize ~ n^1.5 candidates — so the
   HONEST expectation for the 10x step is ~sqrt(1000)/sqrt(10) ~ 31x,
   sub-quadratic (a quadratic op steps 100x). The brute twin
   (`hard_negatives`) is |corpus|x|anchors| = truly quadratic — timed
   at 1x/10x for contrast, skipped at 100x (4e9 pairs).
2. `ivf_topk_indexed` — "only the probed cells' files are READ"
   (dynamic partition pruning on the cell-partitioned store). The
   index is built ONCE per tier (ingest cost, reported separately);
   the query pass runs a FIXED 200-anchor batch (the serving regime)
   and records the scan's ACTUAL numFiles/numPartitions metrics from
   the executed plan vs the store totals — the files-read fraction is
   the DPP claim as a measurement, not a plan-string assertion.

Round 11 adds two sections:

3. Triplet-miner curves — `training_triplets_ivf` vs the new
   `training_triplets_lsh` in the same growing-anchor regime (the
   VERDICT r10 task: a measured point at the 100x tier where the
   row-local bucket assignment beats the Voronoi term, completing the
   family symmetry `hard_negatives_lsh` established).
4. `ivf_pq_topk_indexed` — the persisted CODE store probed with static
   cell pruning: files AND bytes read vs the raw-vector index at the
   same tier (the PQ claim is a bytes claim — record filesSize, not
   just numFiles).

Usage: python tools/scale_mining.py [sections...]
  sections ∈ {mining, serving, triplets, ivfpq}; default = all.
  Results are MERGED into tools/scale_mining_results.json so a new
  section doesn't force re-measuring the committed ones.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "testdata", "sf1")
SF10 = os.path.join(REPO, "testdata", "sf10docs")
STORES = os.path.join(REPO, "testdata", "ivf_stores")


def scan_metrics(df) -> list[dict]:
    """Per-FileSourceScan {numFiles, numPartitions, numOutputRows} off
    the EXECUTED plan (post-pruning values — this is where dynamic
    partition pruning shows up as a number). Walks the adaptive plan
    via py4j; dedupes nodes by their JVM-side plan id."""
    out: list[dict] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    visited: set[int] = set()
    while stack:
        node = stack.pop()
        nid = node.id()
        if nid in visited:
            continue
        visited.add(nid)
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name and "cell" in node.toString():
            # only the cell-partitioned INDEX scan — without the filter
            # a bigger queries-side scan could win max(numFiles) and the
            # committed files_read would stop measuring pruning
            m = node.metrics()
            vals: dict = {}
            for key in (
                "numFiles", "numPartitions", "numOutputRows", "filesSize"
            ):
                o = m.get(key)
                if o.isDefined():
                    vals[key] = o.get().value()
            out.append(vals)
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
    return out


def store_files(path: str) -> int:
    return sum(
        1
        for _r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    sections = set(sys.argv[1:]) or {"mining", "serving", "triplets", "ivfpq"}

    from tools.scale_docs import generate_sf10

    generate_sf10()

    from pyspark.sql import functions as F

    from impresso_ta.operators import pq as pqmod
    from impresso_ta.operators import similarity
    from impresso_ta.session import get_spark

    spark = get_spark(
        app_name="impresso_ta-scale-mining",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(build) -> float:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    res_path = os.path.join(REPO, "tools", "scale_mining_results.json")
    results: dict[str, dict] = {}
    if os.path.exists(res_path):
        with open(res_path) as f:
            results = json.load(f)  # merge: new sections join old rows
    for key in (
        "hard_negatives_ivf", "hard_negatives_brute", "hard_negatives_lsh",
        "ivf_indexed_ingest", "ivf_indexed_query", "ivf_indexed_files",
        "training_triplets_ivf", "training_triplets_lsh",
        "training_triplets_brute", "ivfpq_indexed_ingest",
        "ivfpq_indexed_query", "ivfpq_indexed_files", "params",
    ):
        results.setdefault(key, {})
    os.makedirs(STORES, exist_ok=True)

    def store_bytes(path: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    for tag, d in (("1x", SF01), ("10x", SF1), ("100x", SF10)):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        nlist = max(8, int(4 * math.sqrt(n)))
        results["params"][tag] = {"n_vectors": n, "nlist": nlist, "nprobe": 2}
        anchors = emb.filter(F.col("vec_id") % 10 == 0)
        bits = max(2, math.ceil(math.log2(max(2, n / 512))))
        plane_sets = similarity.deterministic_plane_sets(2, bits, 64)

        # --- mining: anchors grow WITH the corpus (10% of rows) ------
        if "mining" in sections:
            try:
                results["hard_negatives_ivf"][tag] = timed(
                    lambda: similarity.hard_negatives_ivf(
                        emb, anchors, nlist=nlist, nprobe=2, k=3
                    )
                )
            except Exception as ex:
                results["hard_negatives_ivf"][tag] = None
                results["hard_negatives_ivf"][f"{tag}_error"] = str(ex).split(
                    "\n"
                )[0][:200]
            if tag != "100x":  # brute is |corpus|x|anchors|: 4e9 pairs
                results["hard_negatives_brute"][tag] = timed(
                    lambda: similarity.hard_negatives(emb, anchors, k=3)
                )
            # the beyond-IVF route: row-local bucket assignment, bits
            # sized so candidates/anchor ~ n/2^bits stays ~constant ->
            # the whole mining pass should be ~linear in n (vs IVF's
            # n^1.5 assignment)
            results["hard_negatives_lsh"][tag] = timed(
                lambda: similarity.hard_negatives_lsh(
                    emb, anchors, plane_sets, k=3, broadcast_queries=False
                )
            )

        # --- triplet miners in the same growing-anchor regime --------
        if "triplets" in sections:
            try:
                results["training_triplets_ivf"][tag] = timed(
                    lambda: similarity.training_triplets_ivf(
                        emb, anchors, nlist=nlist, nprobe=2,
                        k_pos=2, k_neg=2,
                    )
                )
            except Exception as ex:
                results["training_triplets_ivf"][tag] = None
                results["training_triplets_ivf"][f"{tag}_error"] = str(
                    ex
                ).split("\n")[0][:200]
            results["training_triplets_lsh"][tag] = timed(
                lambda: similarity.training_triplets_lsh(
                    emb, anchors, plane_sets, k_pos=2, k_neg=2,
                    broadcast_queries=False,
                )
            )
            if tag != "100x":  # brute cross join: 4e9 pairs at 100x
                results["training_triplets_brute"][tag] = timed(
                    lambda: similarity.training_triplets(
                        emb, anchors, k_pos=2, k_neg=2
                    )
                )

        seeds = [
            (int(r.vec_id), list(r.embedding))
            for r in emb.orderBy("vec_id").limit(nlist).collect()
        ]
        qbatch = emb.filter(F.col("vec_id") < 2000).limit(200)

        # --- serving: ingest once, query a FIXED 200-anchor batch ----
        if "serving" in sections:
            store = os.path.join(STORES, tag)
            t0 = time.time()
            shutil.rmtree(store, ignore_errors=True)
            similarity.write_ivf_index(
                similarity.ivf_assign(emb, seeds), store
            )
            results["ivf_indexed_ingest"][tag] = round(time.time() - t0, 3)

            index = spark.read.parquet(store)
            build = lambda: similarity.ivf_topk_indexed(  # noqa: E731
                index, qbatch, seeds, nprobe=2, k=3
            )
            results["ivf_indexed_query"][tag] = timed(build)
            # files-read: execute via collect so the metrics live on
            # THIS DataFrame's queryExecution, then read the counters
            probe_df = build()
            probe_df.collect()
            scans = scan_metrics(probe_df)
            biggest = max(
                scans, key=lambda s: s.get("numFiles", 0), default={}
            )
            results["ivf_indexed_files"][tag] = {
                "files_read": biggest.get("numFiles"),
                "partitions_read": biggest.get("numPartitions"),
                "bytes_read": biggest.get("filesSize"),
                "files_total": store_files(store),
                "bytes_total": store_bytes(store),
                "partitions_total": nlist,
            }

        # --- the persisted CODE store (IVF-PQ): files AND bytes ------
        if "ivfpq" in sections:
            book = pqmod.pq_codebook(emb, m=4, ksub=8)
            pq_store = os.path.join(STORES, f"{tag}_pq")
            t0 = time.time()
            shutil.rmtree(pq_store, ignore_errors=True)
            similarity.write_ivf_index(
                pqmod.ivf_pq_index_frame(emb, seeds, book), pq_store
            )
            results["ivfpq_indexed_ingest"][tag] = round(
                time.time() - t0, 3
            )
            pq_index = spark.read.parquet(pq_store)
            build_pq = lambda: pqmod.ivf_pq_topk_indexed(  # noqa: E731
                pq_index, qbatch, seeds, book, nprobe=2, k=3
            )
            results["ivfpq_indexed_query"][tag] = timed(build_pq)
            probe_df = build_pq()
            probe_df.collect()
            scans = scan_metrics(probe_df)
            biggest = max(
                scans, key=lambda s: s.get("numFiles", 0), default={}
            )
            results["ivfpq_indexed_files"][tag] = {
                "files_read": biggest.get("numFiles"),
                "partitions_read": biggest.get("numPartitions"),
                "bytes_read": biggest.get("filesSize"),
                "files_total": store_files(pq_store),
                "bytes_total": store_bytes(pq_store),
                "partitions_total": nlist,
            }

    print(f"{'probe':24s} {'1x':>8s} {'10x':>8s} {'100x':>9s} {'100x/10x':>9s}")
    for q in (
        "hard_negatives_ivf",
        "hard_negatives_brute",
        "hard_negatives_lsh",
        "training_triplets_ivf",
        "training_triplets_lsh",
        "training_triplets_brute",
        "ivf_indexed_ingest",
        "ivf_indexed_query",
        "ivfpq_indexed_ingest",
        "ivfpq_indexed_query",
    ):
        r = results.get(q, {})
        t1, t10, t100 = r.get("1x"), r.get("10x"), r.get("100x")
        step = f"{t100 / t10:8.1f}x" if t10 and t100 else "     n/a"
        fmt = lambda v: f"{v:8.2f}" if v is not None else "    skip"  # noqa: E731
        print(f"{q:24s} {fmt(t1)} {fmt(t10)} {fmt(t100)} {step}")
    for key in ("ivf_indexed_files", "ivfpq_indexed_files"):
        for tag in ("1x", "10x", "100x"):
            f = results.get(key, {}).get(tag, {})
            if not f:
                continue
            print(
                f"{key} {tag}: {f.get('files_read')}/"
                f"{f.get('files_total')} files, "
                f"{f.get('bytes_read')}/{f.get('bytes_total')} bytes, "
                f"{f.get('partitions_read')}/"
                f"{f.get('partitions_total')} cells"
            )

    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
