"""Physical-plan audits: the scale claims the docstrings make, asserted.

Each test pins a plan property that would silently regress otherwise —
filter/column pushdown reaching the parquet scan, dimension joins
broadcasting, aggregations combining map-side, and the operators that
advertise "zero shuffle" actually having zero exchanges.
"""

from pyspark.sql import functions as F

from impresso_ta.operators.dedup import minhash_signatures
from impresso_ta.operators.similarity import cosine_topk, ivf_assign

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(df) -> int:
    # count shuffle exchanges only (broadcast exchanges are the point of
    # several of these plans)
    return _plan(df).count("Exchange hashpartitioning") + _plan(df).count(
        "Exchange rangepartitioning"
    )


def test_filter_and_projection_pushdown(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.filter(F.col("lang") == "fr").select("doc_id")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,fr)]" in plan
    # scan must read only the two involved columns, not the text payload
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema


def test_dimension_join_broadcasts(spark):
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["j9_broadcast_metadata_lookup"].fn(spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_groupby_aggregates_map_side(spark):
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q1_pricing_summary"].fn(spark, SF)
    plan = _plan(q)
    # partial (map-side) aggregate before the single shuffle
    assert "partial_" in plan
    assert _shuffles(q) == 1


def test_minhash_signatures_map_side_combine(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs, num_perm=8)
    plan = _plan(sigs)
    assert "partial_min" in plan
    assert _shuffles(sigs) == 1


def test_ivf_assign_is_shuffle_free(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    seeds = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.orderBy("vec_id").limit(4).collect()
    ]
    assert _shuffles(ivf_assign(e, seeds)) == 0


def test_ivf_assign_broadcast_strategy_is_shuffle_free(spark):
    """The broadcast-relation centroid form must keep the corpus
    unshuffled too: the one-row centroid table arrives via
    BroadcastExchange, never a ShuffleExchange of the corpus."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    seeds = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.orderBy("vec_id").limit(4).collect()
    ]
    assigned = ivf_assign(e, seeds, strategy="broadcast")
    plan = _plan(assigned)
    assert "BroadcastExchange" in plan
    assert _shuffles(assigned) == 0


def test_cosine_topk_corpus_never_shuffled_by_join(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 53 == 0)
    # r12 arrow engine: the queries ride the Arrow task closure — no
    # join at all; the only shuffle is the final tiny window
    topk = cosine_topk(e, qs, k=3, engine="arrow")
    plan = _plan(topk)
    assert "MapInArrow" in plan
    assert "Join" not in plan
    assert _shuffles(topk) == 1
    # the r11 JVM form's contract still holds on the expr engine:
    # query side broadcasts, corpus never join-shuffled
    expr = cosine_topk(e, qs, k=3, engine="expr")
    assert "BroadcastExchange" in _plan(expr)
    assert _shuffles(expr) == 1


def test_cosine_topk_auto_routes_by_corpus_size(spark):
    # r13: the default engine routes by the corpus' optimizer size
    # estimate — tiny test corpus → expr; with the threshold conf
    # lowered to 1 byte the same call routes to arrow.
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 53 == 0)
    assert "BroadcastExchange" in _plan(cosine_topk(e, qs, k=3))
    key = "spark.impresso_ta.brute.arrowMinBytes"
    spark.conf.set(key, "1")
    try:
        assert "MapInArrow" in _plan(cosine_topk(e, qs, k=3))
    finally:
        spark.conf.unset(key)


def test_multi_join_queries_broadcast_everything(spark):
    from impresso_ta.queries import REGISTRY

    for name in ["q3_shipping_priority", "q5_local_supplier_volume"]:
        q = REGISTRY[name].fn(spark, SF)
        plan = _plan(q)
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        # single shuffle: the final aggregation
        assert _shuffles(q) <= 2, name


def test_anti_join_and_decorrelated_subquery_plans(spark):
    from impresso_ta.queries import REGISTRY

    q22 = REGISTRY["q22_customers_without_orders"].fn(spark, SF)
    plan = _plan(q22)
    assert "LeftAnti" in plan          # a real anti-join operator
    assert "SortMergeJoin" not in plan  # broadcast at dim scale

    q17 = REGISTRY["q17_small_quantity_revenue"].fn(spark, SF)
    plan17 = _plan(q17)
    # the "correlated subquery" runs as one aggregate + join, never a
    # per-row subquery
    assert "Subquery" not in plan17
    assert "HashAggregate" in plan17


def test_q16_not_in_runs_as_broadcast_anti_join(spark):
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q16_supplier_count"].fn(spark, SF)
    plan = _plan(q)
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    # countDistinct = two-stage partial agg, never a per-group collect
    assert "partial_" in plan


def test_q19_disjunction_pushes_single_side_conjuncts(spark):
    """The OR-of-ANDs predicate must not block pushdown entirely:
    Catalyst extracts the union of each side's conjuncts (brand IN (...)
    on part, quantity range on lineitem) below the join as scan
    filters."""
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q19_disjunctive_pushdown"].fn(spark, SF)
    plan = _plan(q)
    assert "PushedFilters" in plan
    # the brand-side disjunction reaches the part scan (In or Or form)
    assert "Brand#" in plan.split("ReadSchema")[0] or "In(p_brand" in plan


def test_q21_collapses_double_exists_to_one_aggregate(spark):
    """Both correlated subqueries (EXISTS other-supplier, NOT EXISTS
    other-failing-supplier) ride ONE per-order distinct-count aggregate:
    lineitem is shuffled by l_orderkey at most twice (candidate join +
    stats agg), with no nested-loop or cartesian fallback."""
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q21_sole_failing_supplier"].fn(spark, SF)
    plan = _plan(q)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("expand") <= 2  # countDistinct expand, not blowup


def test_running_offsets_single_exchange(spark):
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["w3_running_offsets"].fn(spark, SF)
    assert _shuffles(q) == 1


def test_c4_filters_zero_shuffle(spark):
    from impresso_ta.operators.text_analysis import c4_filters

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert _shuffles(c4_filters(docs)) == 0


def test_epoch_upsample_zero_shuffle(spark):
    from impresso_ta.operators.corpus import epoch_upsample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = epoch_upsample(docs, weights={"en": 2.5}, domain_col="lang")
    assert _shuffles(out) == 0


def test_snapshot_diff_single_equi_join(spark):
    from impresso_ta.operators.corpus import snapshot_diff

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = snapshot_diff(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 3 == 0),
    )
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # full-outer on the id key: one sort-merge join, nothing else
    assert plan.count("SortMergeJoin") == 1


def test_q13_outer_join_not_turned_inner(spark):
    """The anti-URGENT filter lives in the join CONDITION: the LEFT
    OUTER must survive planning (a WHERE would convert it inner and
    silently drop zero-order customers)."""
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q13_customer_distribution"].fn(spark, SF)
    plan = _plan(q)
    assert "LeftOuter" in plan
    # the outer join preserves EVERY customer (zero-order ones included)
    total = q.agg(F.sum("custdist")).collect()[0][0]
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total == n_cust


def test_q15_max_equality_single_aggregation_pass(spark):
    """The revenue aggregate computes once; the max arrives as a
    broadcast one-row side, never a per-row re-aggregation."""
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q15_top_supplier"].fn(spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the lineitem-sized aggregate appears a bounded number of times
    # (rev + its max reuse), not once per supplier row
    assert plan.count("HashAggregate") <= 8


def test_funnel_no_cartesian_of_event_frames(spark):
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["events_funnel_conversion"].fn(spark, SF)
    plan = _plan(q)
    assert "CartesianProduct" not in plan  # only 1-row crossJoins remain


def test_rebuild_group_exchange_is_pinned_against_coalescing(spark):
    """The supports grouping must shuffle EXACTLY once on the derived
    issue key with a user-pinned partition count (REPARTITION_BY_NUM):
    AQE may not byte-coalesce it below the configured parallelism — the
    compute-heavy assembly UDTF's parallelism rides this exchange
    (PLANS §8: unpinned, the zipfian profile serialized into one 35 s
    task)."""
    from impresso_ta.plans.synthetic import synthetic_canonical_corpus
    from impresso_ta.rebuild import rebuild_issues_solr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    issues_df, pages_df = synthetic_canonical_corpus(docs)
    plan = _plan(rebuild_issues_solr(issues_df, pages_df))
    assert "REPARTITION_BY_NUM" in plan
    # one hash exchange for the grouping+join side of the supports — the
    # issues side adds its own; no third exchange may appear between the
    # pinned repartition and the collect_list aggregate
    assert plan.count("Exchange hashpartitioning") <= 2


def test_ci_level_regs_exchange_pinned_and_reused(spark):
    """CI-level rebuild: the wide region payload shuffles ONCE — the
    pinned repartition on (issue, pOf) must be the only exchange between
    the supports scan and the collect_list aggregate (the groupBy reuses
    the user partitioning), and it must be REPARTITION_BY_NUM so AQE
    cannot coalesce under the assembly."""
    from impresso_ta.plans.synthetic import synthetic_canonical_corpus
    from impresso_ta.rebuild.solr import rebuild_issues_solr_ci

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    issues_df, pages_df = synthetic_canonical_corpus(docs)
    plan = _plan(rebuild_issues_solr_ci(issues_df, pages_df))
    assert "REPARTITION_BY_NUM" in plan
    # the aggregate over (_r_issue, _r_pof) must sit directly on the
    # pinned exchange: no hashpartitioning(_r_issue, _r_pof) exchange
    # other than the explicit repartition itself
    import re

    regs_exchanges = [
        m for m in re.findall(r"Exchange hashpartitioning\([^)]*_r_pof[^)]*\)[^\n]*", plan)
    ]
    assert len(regs_exchanges) == 1, regs_exchanges
    assert "REPARTITION_BY_NUM" in regs_exchanges[0]


def test_q9_star_join_never_sort_merge_or_bnlj(spark):
    """q9: dims ride as broadcasts; neither a SortMergeJoin over the
    fact table nor a BNLJ ever appears, and the (nation, year) groupBy
    combines map-side."""
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q9_product_profit"].fn(spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_q11_total_is_reaggregated_not_rescanned(spark):
    """q11: the global total must come from re-aggregating the grouped
    per-part frame (AQE ReusedExchange at runtime), never a second scan
    of lineitem. The reuse only materializes in the FINAL adaptive
    plan, so the assertion runs after an action."""
    from impresso_ta.queries import REGISTRY

    q = REGISTRY["q11_important_parts"].fn(spark, SF)
    q.collect()
    plan = _plan(q)
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan or plan.count("lineitem.parquet") <= 1


def test_lr_pipeline_stage_adds_no_shuffle(spark):
    """The prepare_corpus quality stage scores row-locally: the
    ≤dim-row model folds into a one-row map broadcast, so the quality
    filter adds ZERO hash/range exchanges over the bare corpus scan —
    no SortMergeJoin of the corpus against its own margins (the batch
    scorer's shape), no model shuffle."""
    from impresso_ta.operators.classifier import lr_hashed_train
    from impresso_ta.operators.pipeline import prepare_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = docs.withColumn("y", (F.col("doc_id") % 2 == 0).cast("double"))
    trained = lr_hashed_train(train, "y", tf=True)
    model = spark.createDataFrame(  # sever training lineage (cached,
        trained.collect(), "bucket long, w double"  # but still printed)
    )
    res = prepare_corpus(
        docs, c4=False, gopher=False, line_spans=None, doc_dedup=False,
        quality_model=model,
    )
    plan = _plan(res.docs)
    assert "SortMergeJoin" not in plan
    assert _shuffles(res.docs) == 0
    res.unpersist()


def test_dsir_bigram_stream_adds_no_exchange(spark):
    """ngram=2 must not change the aggregate structure: same shuffle
    count as the unigram form (the bigram build is a row-local zip)."""
    from impresso_ta.operators.corpus import dsir_log_weights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    raw = docs.filter(F.col("doc_id") % 17 != 0)
    tgt = docs.filter(F.col("doc_id") % 17 == 0)
    uni = dsir_log_weights(raw, tgt, ngram=1)
    bi = dsir_log_weights(raw, tgt, ngram=2)
    assert _shuffles(bi) == _shuffles(uni)


def test_pq_encode_zero_shuffle(spark):
    from impresso_ta.operators.pq import pq_codebook, pq_encode

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    book = pq_codebook(emb, m=4, ksub=4)
    assert _shuffles(pq_encode(emb, book)) == 0


def test_pq_topk_corpus_never_shuffled_before_scoring(spark):
    from impresso_ta.operators.pq import pq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 29 == 0)
    plan = _plan(pq_topk(emb, qs, m=4, ksub=4, k=3))
    # queries+tables broadcast; the only hash exchange is the final
    # per-query window over scored pairs
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_compaction_plan_single_aggregate_exchange(spark):
    from impresso_ta.operators.layout import compaction_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("n_chars").cast("long").alias("bytes"),
        "lang",
        "source",
    )
    plan_df = compaction_plan(docs, ["lang", "source"], target_bytes=4000)
    assert _shuffles(plan_df) == 1  # one groupBy; decisions are row-local
    assert "partial" in _plan(plan_df).lower()  # map-side combine


def test_profile_key_skew_never_shuffles_raw_rows(spark):
    from impresso_ta.operators.skew import profile_key_skew

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(profile_key_skew(ev, "user_id", top_k=5))
    # raw rows combine map-side (partial_count feeds every exchange) and
    # the scan never reads payload columns — only the key
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    for read_schema in plan.split("ReadSchema:")[1:]:
        assert read_schema.splitlines()[0].strip() == "struct<user_id:bigint>"


def test_cdc_ops_single_window_exchange(spark):
    from impresso_ta.operators.cdc import latest_snapshot, scd2_history

    log = spark.createDataFrame(
        [(1, 1, "upsert")], "k long, seq long, op string"
    )
    assert _shuffles(latest_snapshot(log, ["k"], ["seq"], op_col="op")) == 1
    assert _shuffles(scd2_history(log, ["k"], ["seq"])) == 1
