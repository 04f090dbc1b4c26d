"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (VERDICT r3 task 1 — the round record must be
driver-parseable): the FINAL stdout line is ONE small JSON object —
{"metric": "headline_queries_total", "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} — headline only, well under the
driver's tail capture. Everything else (extended pass, sf1 pass,
sf1-extended, per-section environment yardsticks, the pinned sf1 layout
fingerprint, errors) goes to ./BENCH_local.json, committed per round as
BENCH_r{N}_local.json.

Methodology:
- every query forced with the noop sink (full computation of every
  output column, no driver collect), min of 2 runs;
- spark.catalog.clearCache() before every run — no query sees frames
  persisted by another (persist boundaries inside operators are still
  exercised; they just can't leak across queries or sections);
- an environment yardstick (q1 + w3, code unchanged since r2) is
  re-timed at the START of every section so round-over-round deltas can
  be attributed to environment vs code (VERDICT r3 task 4);
- the sf1 dataset is generated ONCE (standard ROW_GROUP layout — the
  r3 1024-row experiment measured slower, see tools/gen_bigsf.py) and
  its layout fingerprint (per-table rows/row-groups/bytes) is recorded,
  so a changed dataset can never masquerade as a code delta;
- spark.sql.files.maxPartitionBytes stays at the 128 MB DEFAULT: the r3
  4 MB override was A/B'd (tools/ab_pipeline.py) and measured 2-20%
  slower at both sf0.1 and sf1.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impresso_ta import queries as catalog
from impresso_ta.session import get_spark

# Representative mix: full-scan agg, multi-join, window, LSH dedup,
# similarity search, text analysis, exact dedup, streaming-style window.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j2_attach_supports",
    "w3_running_offsets",
    "o2_sort_dedup_pages",
    "events_hourly_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_cosine",
    "similarity_ivf_topk",
    "text_quality",
    "corpus_pack_sequences",
    "corpus_contamination",
]

# Newer corpus-text operators timed at the primary sf but reported under
# "extended" (not in the headline total, which must stay comparable to
# earlier rounds' BENCH records).
EXTENDED_QUERIES = [
    "dedup_line_spans",
    "text_lm_perplexity",
    "text_repetition_stats",
    "dedup_shingle_containment",
    "retrieval_bm25_topk",
    # r3: the benched SemDeDup is the corpus-sized LSH-cell variant —
    # ANY fixed-granularity form (fixed nlist=8 Voronoi: 16.7x at 10x
    # data; fixed 4-bit LSH: 55x) is Σ|cell|²-quadratic by construction
    # once the corpus outgrows the cell count. n_bits = ceil(log2(n/32))
    # holds cell size ~constant, so pair volume stays linear. The
    # fixed-granularity demos stay in the catalog for their oracles.
    "dedup_semantic_lsh_auto",
    "text_c4_filters",
    "corpus_epoch_upsample",
    "corpus_snapshot_diff",
    "corpus_distribution_drift",
    "corpus_bpe_merges",
    "text_doc_vectors",
    "text_quality_scorecard",
    "corpus_prepare_pipeline",
    "text_language_consistency",
    "text_normalize",
    "text_quality_outliers",
    "corpus_split_assign",
    "sketch_count_min_heavy_hitters",
    "sketch_hll_distinct",
    "embedding_gramian",
    "events_funnel_conversion",
    "dedup_incremental_lsh",
    "embedding_quantize_error",
    "layout_zorder_key",
    # r4: the clique-proof linear-output dedup form (see PLANS §8)
    "dedup_minhash_survivors",
    # r5: the auto-routed defaults (doc dedup through the size router;
    # ANN through the tier router — brute at this sf) and the ETL core
    # digest over the reference's fixed 726-CI canonical corpus
    "corpus_prepare_dedup_auto",
    "similarity_ann_auto",
    "rebuild_reference_canonical",
    "dedup_exact_substring",
    # r6: DSIR selection, the broadcast semantic decon screen, the
    # trained hashed-LR filter, the stream-stream join's batch twin
    "corpus_dsir_selection",
    "corpus_semantic_decontamination",
    "text_lr_classifier",
    "events_attribution_join",
    # r7: the LR classifier wired into prepare_corpus as the
    # learned-quality stage, and the funnel-loss left-outer twin
    "corpus_prepare_lr_filter",
    "events_attribution_funnel",
    "corpus_dsir_threshold_select",
    "corpus_dsir_weights_bigram",
    "corpus_bpe_encode",
    "events_sliding_window",
    "j16_replicated_skew_join",
    "corpus_stratified_sample",
    "text_lr_classifier_rowlocal",
    "corpus_pack_concat",
    "corpus_token_budget_select",
    # r8: integer-exact PMI collocations (vocabulary analysis pass) and
    # the prefix-filtered EXACT Jaccard join (no hot-shingle df² blowup)
    "corpus_pmi_collocations",
    "dedup_jaccard_prefix",
    # r8 second wave: the graph family (log-round CC, integer PageRank,
    # degree-oriented triangles), lake maintenance + diagnostics, the
    # per-row weighted sampler, and the PQ compressed-domain ANN scan
    "graph_connected_components",
    "graph_pagerank",
    "graph_triangle_counts",
    "layout_compaction_plan",
    "a17_key_skew_profile",
    "corpus_weighted_sample",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "cdc_latest_snapshot",
    "cdc_scd2_history",
    "table_profile_columns",
    "cdc_point_in_time_join",
    "events_debounce",
    "er_entity_clusters",
    "graph_bfs_khop",
    # r9: the exact fuzzy PAIRS join (clone-collapsed verify). r10:
    # expansion broadcast-fixed (sf1 376.7 -> 113 s, same rows) but the
    # row is still output-bound at sf1 — skipped there (see
    # EXTENDED_SF1_SKIP); the contracted twin below is the sf1-tracked
    # form, and er_entity_clusters the clustering consumer.
    "j17_fuzzy_blocked_join",
    # r9: hard-negative mining (contrastive-training data) — the
    # cosine_topk plan with the label-inequality fused into the
    # broadcast cross join
    "similarity_hard_negatives",
    "similarity_training_triplets",
    "similarity_hard_negatives_ivf",
    "similarity_ivf_indexed_topk",
    "retrieval_mmr_rerank",
    # r10: the CONTRACTED exact-pairs twins (VERDICT r9 task 1) — same
    # blocked verify as j17_fuzzy_blocked_join / dedup_jaccard_prefix,
    # output held at the distinct-value level so cost tracks DISTINCT
    # verified pairs instead of the quadratic-in-clique expansion.
    # These are the forms tracked at sf1; the expanded raw-pairs forms
    # stay benched at the primary sf (cheap there) and skip sf1.
    "j17_fuzzy_contracted",
    "dedup_jaccard_contracted",
    # r10: the beyond-IVF mining route (row-local LSH bucket assignment)
    # and the triplet miner's IVF scale path
    "similarity_hard_negatives_lsh",
    "similarity_training_triplets_ivf",
    "similarity_semihard_triplets",
    # r11: the triplet miner's beyond-IVF route (family symmetry) and
    # the persisted IVF-PQ code store (the FAISS on-disk shape)
    "similarity_training_triplets_lsh",
    "similarity_ivfpq_indexed_topk",
    # NOT benched: *_recall evals (their brute-force ground truth is
    # O(n²) by definition — sf0.01 accuracy checks, not perf surface)
]

# Extended entries skipped at the sf1 pass.
# r10: j17_fuzzy_blocked_join (EXPANDED form) leaves the sf1 pass — it
# ran r9 at 376.7 s, but that row measured OUTPUT EMISSION, not the
# join: the verify is clone-collapsed, so what remained was fanning
# ~400M expansion rows (sf1 part: 200k rows / 64 distinct names ≈ 31k
# clones each — expansion quadratic in clone multiplicity) through the
# noop sink. Its CONTRACTED twin j17_fuzzy_contracted (identical
# verify, value-level output + multiplicities — the granularity
# downstream consumers actually use) is tracked at sf1 instead
# (measured 0.7 s); the expanded form stays benched at the primary sf
# where expansion is cheap, keeping the raw-pairs contract tracked.
# dedup_jaccard_prefix STAYS at sf1: its r9 109.5 s was diagnosed this
# round as 5x subtree RECOMPUTATION, not output (sf1 documents carry
# per-copy prefix tokens, so there are no exact clones to expand) —
# with the shingle-set frame persisted it runs 28 s of honest
# candidate+verify work.
EXTENDED_SF1_SKIP: set[str] = {
    "j17_fuzzy_blocked_join",
}

# Output-proportional giants run ONCE per bench pass (min-of-2 would
# double wall-time to protect a number dominated by output volume, not
# plan noise). EMPTY since r10: j17's expanded form left the sf1 pass
# (see EXTENDED_SF1_SKIP), and at the primary sf it is seconds-scale —
# normal min-of-2 applies.
SINGLE_RUN: set[str] = set()

YARDSTICK = ["q1_pricing_summary", "w3_running_offsets"]

# Queries whose driver samples drifted beyond the q1/w3 environment
# band at small absolutes — judged "very likely single-run noise" (the
# local twin agreed, the plans are clean). min-of-3 instead of min-of-2
# so one noisy run can't mimic a regression in the driver-captured
# record. r8 flagged q3/minhash (q3 confirmed noise in r9: 1.96 ->
# 0.689 s); r9 flagged similarity_topk_cosine (1.26x against a 0.7x
# environment) and dedup_simhash (1.01x) — same treatment (VERDICT r9
# task 4).
MIN_OF_3 = {
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "dedup_simhash",
    # r10 flagged o2 (0.856->1.28 s) and events_hourly (0.277->0.416 s)
    # moving 1.5x while the environment yardstick moved 1.19-1.25x; the
    # same-code local record had both in-band — same treatment
    # (VERDICT r10 "What's wrong" #2).
    "o2_sort_dedup_pages",
    "events_hourly_window",
    # r11 flagged these two at sf1: untouched code, in-band yardstick,
    # yet sustained 1.3-1.5x movement across all three r11 runs while
    # their own callees (minhash_lsh) benched FASTER — min-of-3 so one
    # inflated sample can't mimic a regression; stage-decompose in r12
    # if the movement survives (PLANS.md "Watch items for r12").
    "dedup_exact_substring",
    "corpus_prepare_pipeline",
    # r12 driver row moved 0.81x with NO code change (word_shingles
    # refactor expression-identical; isolated min-of-3 in-band) — the
    # recurring in-suite session-migration class; promoted per the
    # bench's own precedent (VERDICT r12 "What's wrong" #4,
    # additions-only).
    "corpus_contamination",
}


def layout_fingerprint(sf_dir: str) -> dict:
    """Pin the dataset: per-table (rows, row_groups, bytes) + one md5.
    A bench against a regenerated/different layout shows a different
    fingerprint, so round-over-round totals can't silently compare
    different data (VERDICT r3 task 4)."""
    import pyarrow.parquet as pq

    tables = {}
    h = hashlib.md5()
    for name in sorted(catalog.TABLES):
        p = os.path.join(sf_dir, f"{name}.parquet")
        md = pq.ParquetFile(p).metadata
        tables[name] = [md.num_rows, md.num_row_groups, os.path.getsize(p)]
        h.update(f"{name}:{tables[name]}".encode())
    return {"md5": h.hexdigest(), "tables": tables}


def main() -> None:
    # Unskippable preflight (VERDICT r6 task 3): a bench record against a
    # drifted catalog (missing COVERAGE rows, oracle-key drift, broken
    # imports) is evidence rot — refuse to produce one. Static-only (no
    # Spark, seconds); queries newer than the committed CHECK snapshot
    # are surfaced in the headline JSON so a stale snapshot is loud in
    # the driver-captured artifact itself.
    from tools.preflight import static_gate, unverified_queries

    problems = static_gate()
    if problems and os.environ.get("SPARK_GRAFT_SKIP_PREFLIGHT") != "1":
        for p in problems:
            print(f"BENCH REFUSED — preflight static gate red: {p}")
        print("fix the gate (python tools/preflight.py --static) or set "
              "SPARK_GRAFT_SKIP_PREFLIGHT=1 to override")
        raise SystemExit(1)
    _, stale = unverified_queries()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    repo = os.path.dirname(os.path.abspath(__file__))

    spark = get_spark(
        app_name="impresso_ta-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            # the sf1 pass broadcasts dimension tables 10x the sf0.1
            # size; the 1g driver-heap default has no headroom for the
            # broadcast build when the host is under memory pressure
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch every table so JVM/parquet-footer costs are excluded
    for name in catalog.TABLES:
        catalog.t(spark, sf_dir, name).count()
    # r13 (additions-only, VERDICT r12 item 8): fork the session's
    # Python workers BEFORE any timed run — the one-time worker spawn
    # (~25 s across 32 cores) otherwise lands inside whichever Arrow
    # query runs first and pollutes in-suite attribution. min-of-N
    # already excluded it from every recorded number (run 1 pays, the
    # min doesn't), so recorded timings stay methodologically
    # comparable; this only de-noises run-1 samples and total wall time.
    from impresso_ta.session import warm_python_workers

    warm_python_workers(spark)

    def timed(build, runs: int = 2) -> float:
        # min of N runs, cache cleared between queries: isolates each
        # query from frames persisted by earlier operators and from
        # one-off JIT/GC noise.
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    registry = catalog.queries()
    errors: dict[str, str] = {}
    detail_extras: dict[str, float] = {}

    def run_names(names, at_dir: str) -> dict[str, float]:
        # one failing query must not void the rest of the suite — record
        # it under "errors" and keep timing the others
        timings: dict[str, float] = {}
        for name in names:
            fn = registry[name]
            try:
                timings[name] = timed(
                    lambda fn=fn: fn(spark, at_dir),
                    runs=1
                    if name in SINGLE_RUN
                    else (3 if name in MIN_OF_3 else 2),
                )
            except Exception as ex:
                errors[f"{at_dir}:{name}"] = str(ex).split("\n")[0][:300]
        return timings

    def yardstick(at_dir: str) -> dict[str, float]:
        # q1 + w3 are code-frozen since r2: their drift between sections
        # and rounds measures the ENVIRONMENT, not the code
        return run_names(YARDSTICK, at_dir)

    def run_suite(at_dir: str) -> dict[str, float]:
        timings = run_names(BENCH_QUERIES, at_dir)

        # Flagship engine benchmark: rebuild a synthetic canonical corpus
        # derived from the documents table (one issue+page+CI per doc).
        from impresso_ta.plans import synthetic_canonical_corpus
        from impresso_ta.rebuild import (
            rebuild_issues_passim,
            rebuild_issues_solr,
        )

        docs = catalog.t(spark, at_dir, "documents")
        issues_df, pages_df = synthetic_canonical_corpus(docs)
        for rb_name, rb in (
            ("rebuild_solr_synthetic", rebuild_issues_solr),
            ("rebuild_passim_synthetic", rebuild_issues_passim),
        ):
            try:
                timings[rb_name] = timed(lambda rb=rb: rb(issues_df, pages_df))
            except Exception as ex:
                errors[f"{at_dir}:{rb_name}"] = str(ex).split("\n")[0][:300]
        # r8: the AUDIO assembly (ssb/ub/sb offsets) under the same
        # tracking — reported under extended to keep the headline total
        # comparable to r1-r7
        from impresso_ta.plans import synthetic_audio_corpus

        try:
            a_issues, a_records = synthetic_audio_corpus(docs)
            detail_extras["rebuild_solr_audio_synthetic:" + at_dir] = timed(
                lambda: rebuild_issues_solr(a_issues, a_records)
            )
        except Exception as ex:
            errors[f"{at_dir}:rebuild_solr_audio"] = str(ex).split("\n")[0][:300]
        return timings

    def deep_entries(at_dir: str) -> dict[str, float]:
        """One-off depth probes (VERDICT r3 tasks 5 & 7), local detail
        only: a 256-merge BPE run (the sequential-job ceiling under its
        checkpoint cadence) and the skew-hardened rebuild over a zipfian
        (alias, year) profile."""
        out: dict[str, float] = {}
        from impresso_ta.operators.bpe import bpe_train
        from impresso_ta.plans import synthetic_canonical_corpus
        from impresso_ta.rebuild import rebuild_issues_solr
        from tools.skewed_docs import zipfian_documents

        docs = catalog.t(spark, at_dir, "documents")
        try:
            spark.catalog.clearCache()
            t0 = time.time()
            # batch_m=64: the measured sweet spot (r10 A/B: 86.6 s at
            # 16, 55.8 s at 64, 64.7 s at 128 — tie-bounded acceptance);
            # merge sequence identical at every setting, so the row stays
            # comparable in WHAT it computes, faster in how
            merges, vocab = bpe_train(docs, n_merges=256, batch_m=64)
            vocab.unpersist()
            assert len(merges) > 0
            out["bpe_256_merges"] = round(time.time() - t0, 3)
        except Exception as ex:
            errors[f"{at_dir}:bpe_256_merges"] = str(ex).split("\n")[0][:300]
        try:
            from impresso_ta.rebuild.solr import rebuild_issues_solr_ci

            skewed = zipfian_documents(docs)
            issues_df, pages_df = synthetic_canonical_corpus(skewed)
            out["rebuild_solr_zipfian"] = timed(
                lambda: rebuild_issues_solr(issues_df, pages_df)
            )
            # the skew-safe CI-level twin: same output (parity-tested),
            # work keyed by content item so the hot issue can't straggle
            out["rebuild_solr_zipfian_ci"] = timed(
                lambda: rebuild_issues_solr_ci(issues_df, pages_df)
            )
        except Exception as ex:
            errors[f"{at_dir}:rebuild_zipfian"] = str(ex).split("\n")[0][:300]
        return out

    detail: dict = {
        "cpus": int(cpus),
        "maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
        "yardstick_note": "q1+w3 code-frozen since r2; their drift "
        "measures environment, not code",
    }

    detail["yardstick_sf0.1_pre"] = yardstick(sf_dir)
    timings = run_suite(sf_dir)
    total = round(sum(timings.values()), 3)
    headline = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # the code-frozen q1+w3 environment yardstick, embedded in the
        # driver-captured record so round-over-round deltas can be
        # decomposed into environment vs code from BENCH_rNN.json alone
        "yardstick": detail["yardstick_sf0.1_pre"],
    }
    if stale:
        # catalog entries with no row in the newest committed CHECK_r*.json
        headline["unverified_queries"] = stale

    # ETL skew path in the driver-captured record (VERDICT r7 task 7):
    # the zipfian-profile rebuild and its skew-safe CI-level twin, timed
    # at the primary sf and embedded under a SEPARATE key so the
    # round-over-round headline total stays comparable to r1-r7.
    try:
        from impresso_ta.plans import synthetic_canonical_corpus
        from impresso_ta.rebuild import rebuild_issues_solr
        from impresso_ta.rebuild.solr import rebuild_issues_solr_ci
        from tools.skewed_docs import zipfian_documents

        zi, zp = synthetic_canonical_corpus(
            zipfian_documents(catalog.t(spark, sf_dir, "documents"))
        )
        headline["etl"] = {
            "rebuild_solr_zipfian": timed(
                lambda: rebuild_issues_solr(zi, zp)
            ),
            "rebuild_solr_zipfian_ci": timed(
                lambda: rebuild_issues_solr_ci(zi, zp)
            ),
        }
    except Exception as ex:
        errors[f"{sf_dir}:headline_etl"] = str(ex).split("\n")[0][:300]

    # The headline is complete once the primary-sf pass is done; the
    # extended + sf1 sections below add ~15-30 min (j17's sf1 output
    # emission alone is ~6 min). Print the contract line NOW and again
    # at the very end: if a harness timeout kills the remaining
    # sections, the tail capture still holds a valid headline instead
    # of nothing, and a completed run's FINAL line (same JSON, plus
    # n_errors if any) simply supersedes this one.
    print(json.dumps(headline), flush=True)
    detail["headline"] = headline
    with open(os.path.join(repo, "BENCH_local.json"), "w") as f:
        json.dump(detail, f, indent=1)  # preliminary; overwritten below

    # Extended pass: newer corpus-text operators, reported separately so
    # the primary metric stays round-over-round comparable.
    spark.catalog.clearCache()
    detail["extended"] = run_names(EXTENDED_QUERIES, sf_dir)

    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        sf1_dir = os.environ.get(
            "SPARK_GRAFT_SF1_DIR", os.path.join(repo, "testdata", "sf1")
        )
        try:
            if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
                from tools.gen_bigsf import generate

                generate(sf_dir, sf1_dir, copies=10)
            spark.catalog.clearCache()
            detail["sf1_layout"] = layout_fingerprint(sf1_dir)
            detail["yardstick_sf1_pre"] = yardstick(sf1_dir)
            sf1_timings = run_suite(sf1_dir)
            spark.catalog.clearCache()
            detail["sf1"] = {
                "sf": 1.0,
                "total": round(sum(sf1_timings.values()), 3),
                "queries": sf1_timings,
                # the corpus-text operators at 10x data: the scaling
                # evidence for the newest perf surface (VERDICT r2 item 6)
                "extended": run_names(
                    [
                        q
                        for q in EXTENDED_QUERIES
                        if q not in EXTENDED_SF1_SKIP
                    ],
                    sf1_dir,
                ),
                "extended_skipped": sorted(EXTENDED_SF1_SKIP),
            }
            if os.environ.get("SPARK_GRAFT_DEEP", "1") != "0":
                spark.catalog.clearCache()
                detail["sf1_deep"] = deep_entries(sf1_dir)
        except Exception as ex:  # bench must still report the primary sf
            detail["sf1"] = {"error": str(ex).split("\n")[0][:300]}

    if detail_extras:
        detail["extras"] = detail_extras
    if errors:
        detail["errors"] = errors
        headline["n_errors"] = len(errors)
    detail["headline"] = headline
    with open(os.path.join(repo, "BENCH_local.json"), "w") as f:
        json.dump(detail, f, indent=1)
    # the contract: final line, small, headline only
    print(json.dumps(headline))
    spark.stop()


if __name__ == "__main__":
    main()
