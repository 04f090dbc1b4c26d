"""Dump the ACTUAL executed physical plans (`explain formatted`) of
representative catalog queries into EXPLAIN.md — committed evidence that
the scale claims (pushdown, broadcast, map-side combine, zero-shuffle)
hold in the plans Spark really runs, not just in docstrings.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# one per claimed plan property
QUERIES = [
    ("q1_pricing_summary", "full-scan agg: partial_ map-side combine, ONE exchange"),
    ("q5_local_supplier_volume", "multi-join: every dim broadcast, no SortMergeJoin"),
    ("q16_supplier_count", "NOT IN as broadcast LeftAnti + two-stage countDistinct"),
    ("q19_disjunctive_pushdown", "OR-of-ANDs: single-side conjuncts pushed to scans"),
    ("q13_customer_distribution", "LEFT OUTER preserved (filter in join condition)"),
    ("w3_running_offsets", "single-exchange window (RANGE frame over dup keys)"),
    ("dedup_minhash_lsh", "banded equi-join, partial_min signatures"),
    ("similarity_topk_cosine", "corpus never shuffled; query side broadcast"),
    ("similarity_ivf_topk", "zero-shuffle centroid argmax"),
    ("dedup_semantic_lsh_auto", "row-local LSH cells; pair join keyed by cell"),
    ("embedding_gramian", "dims^2 partial per batch; corpus-size-independent reduce"),
    ("layout_zorder_key", "Morton key in whole-stage codegen, zero shuffle"),
    ("corpus_contamination", "broadcast bloom probe, row-local"),
    ("events_funnel_conversion", "staged min-aggs; no cartesian of event frames"),
    ("similarity_ann_auto", "tier router: brute tier at this sf — corpus "
     "scanned once, query side broadcast, no index build"),
    ("corpus_prepare_dedup_auto", "auto doc-dedup route: filters fused on "
     "the scan, pairwise verify join-pruned to band collisions"),
    ("corpus_semantic_decontamination", "benchmark collapsed to ONE broadcast "
     "row; train side reaches the filter with zero exchanges"),
    ("corpus_dsir_weights", "dim-row model BroadcastHashJoin; both corpus "
     "aggregates partial_ map-side"),
    ("corpus_dsir_selection", "Gumbel top-k as TakeOrderedAndProject — no "
     "global sort exchange"),
    ("dedup_jaccard_prefix", "prefix filter: candidates only from the "
     "rare-shingle prefix; verify is row-local array_intersect"),
    ("corpus_pmi_collocations", "two map-side-combined groupBys; vocabulary "
     "broadcast back; top-n TakeOrderedAndProject"),
    ("j17_fuzzy_blocked_join", "block-key equi-join with the length "
     "prefilter fused into the join condition; no cartesian"),
    ("events_attribution_join", "stream-stream twin in batch: key-equi join "
     "with time-range residual, no BNLJ"),
    ("q9_product_profit", "five-table star: supplier/nation/part broadcast, "
     "orders the one shuffle join, groupBy map-side on (nation, year)"),
    ("q11_important_parts", "share-of-total HAVING: one-row total broadcast "
     "back over the grouped frame, no second fact scan"),
    ("corpus_prepare_lr_filter", "learned-quality stage: one-row weight-map "
     "broadcast, row-local margin — zero exchanges added over the scan"),
    ("corpus_dsir_weights_bigram", "n<=2 feature stream is a row-local "
     "zip — same two partial_ aggregates as unigrams, no extra exchange"),
    ("graph_pagerank", "per-step: ONE shuffle join (edges ⋈ ranks on src) "
     "+ map-side-combined groupBy(dst); edges⋈outdeg hoisted before the "
     "loop; BIGINT fixed-point, no float"),
    ("graph_triangle_counts", "degree-oriented wedge self-join + closure "
     "equi-join — all equi, no cartesian; O(m^1.5) candidate bound"),
    ("similarity_ivfpq_topk", "IVF-PQ: zero-shuffle cell assignment AND "
     "PQ encode; probe cells + scaled-BIGINT ADC tables broadcast; only "
     "corpus-sized op is the cell equi-join"),
    ("cdc_latest_snapshot", "MERGE replay as one window exchange; key-only "
     "version ranking, tombstones filtered post-rank"),
    ("layout_compaction_plan", "metadata-sized: one map-side-combined "
     "groupBy over the listing; merge decisions row-local"),
    ("er_entity_clusters", "clone-contracted ER (r9): one groupBy(value) "
     "contraction, fuzzy join over DISTINCT values only, CC on the "
     "contracted graph, one value equi-join to expand labels — no "
     "clone-quadratic edge set anywhere in the plan"),
    ("similarity_pq_topk", "PQ codebook as a broadcast one-row relation "
     "(r9): encode and ADC tables via transform over _book — no 512-"
     "literal expression, plan size O(1) in m·ksub"),
    ("similarity_training_triplets", "triplet mining (r9): ONE broadcast "
     "cross join scores all pairs; positives AND negatives carved from "
     "the same scored frame by an (anchor, same-label) window — corpus "
     "scanned once, not twice"),
    ("similarity_hard_negatives_ivf", "mining scale path (r9): the cell "
     "equi-join is the only corpus-sized op; probes broadcast; label "
     "predicate fused into the join"),
    ("j17_fuzzy_contracted", "contracted fuzzy join (r10): groupBy-count "
     "IS the distinct (one exchange per side carries the multiplicity), "
     "blocked Levenshtein verify on values, NO expansion joins — output "
     "bounded by distinct verified pairs"),
    ("dedup_jaccard_contracted", "contracted Jaccard pairs (r10): "
     "md5-grouped clone contraction, prefix-filtered verify on distinct "
     "texts (persisted shingle-set frame — referenced 5x, materialized "
     "once), rep-level output + group sizes, no member fan-out"),
    ("similarity_ivf_indexed_topk", "persisted-index serving (r10): "
     "static cell pruning — probed cells collected (bounded by nlist) "
     "and applied as a partition filter, so only probed cells' files "
     "are read regardless of the DPP heuristics that declined the "
     "nested-broadcast probe subtree at nlist>64"),
    ("similarity_hard_negatives_lsh", "beyond-IVF mining (r10): "
     "row-local bucket assignment, label filter fused into each "
     "bucket join, scoring INSIDE the join projection so the "
     "cross-table dedup shuffles 24-byte rows, not vectors"),
    ("similarity_training_triplets_ivf", "triplet mining scale path "
     "(r10): ONE probed cell equi-join feeds both the positive and "
     "negative (anchor, same-label) windows; label rides the "
     "assignment"),
    ("similarity_training_triplets_lsh", "beyond-IVF triplet route "
     "(r11): row-local Weyl-plane buckets feed BOTH carve sides — no "
     "Voronoi assignment term; (_same, cos) computed inside the join "
     "projection so the cross-table dedup shuffles ~25-byte rows; "
     "single-pass carve (window filter -> per-anchor fold -> explode), "
     "every window rank-filtered so WindowGroupLimit applies"),
    ("similarity_ivfpq_indexed_topk", "persisted IVF-PQ code store "
     "(r11): static cell pruning on the partition filter (probed set "
     "collected, bounded by nlist); serving scans CODES, not vectors — "
     "ADC tables broadcast with the probes; the store scan is the only "
     "corpus-sized op"),
    ("similarity_semihard_triplets", "semi-hard band carve (r11 rework): "
     "eager-checkpointed scored frame + ONE pinned anchor exchange "
     "(explicit-count repartition AQE never coalesces) feeds the "
     "rank-filtered positives window, the no-window negatives side and "
     "the per-(anchor,positive) band rank — every window group-limits"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from impresso_ta.queries import REGISTRY
    from impresso_ta.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# EXPLAIN — actual executed plans (auto-generated)",
        "",
        f"`python tools/plan_report.py {sf_dir}` — `explain('formatted')`",
        "of representative catalog queries; regenerate after plan-shape",
        "changes. Each heading states the property the plan is evidence",
        "for (asserted programmatically in `tests/test_plans.py`).",
        "",
    ]
    for name, claim in QUERIES:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}")
        out.append(f"_{claim}_")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
