"""Training-corpus export operators: determinism, packing invariants,
containment bounds."""

from pyspark.sql import functions as F

from impresso_ta.operators.corpus import (
    contamination,
    pack_sequences,
    training_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_training_shards_deterministic_dense(spark):
    d = _docs(spark)
    a = {(r["doc_id"]): (r["shard"], r["pos"]) for r in training_shards(d, 4).collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in training_shards(d, 4).collect()}
    assert a == b
    assert len(a) == d.count()
    # pos dense 1..n per shard
    per_shard = {}
    for shard, pos in a.values():
        per_shard.setdefault(shard, []).append(pos)
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert set(per_shard) <= set(range(4))


def test_pack_sequences_invariants(spark):
    d = _docs(spark)
    rows = pack_sequences(d, budget=500, n_shards=2).collect()
    assert len(rows) == d.count()
    for r in rows:
        # a doc starts strictly inside its block's budget
        assert 0 <= r["block_offset"] < 500
        assert r["block"] >= 0
    # blocks are contiguous per shard: 0..max present
    for shard in {r["shard"] for r in rows}:
        blocks = sorted({r["block"] for r in rows if r["shard"] == shard})
        assert blocks == list(range(len(blocks)))
    # exclusive cumsum consistency: block * budget + offset is
    # monotone in pack order and equals sum of preceding docs' tokens
    for shard in {r["shard"] for r in rows}:
        mine = sorted(
            (r["block"] * 500 + r["block_offset"], r["n_tokens"])
            for r in rows
            if r["shard"] == shard
        )
        acc = 0
        for start, n_tokens in mine:
            assert start == acc
            acc += n_tokens


def test_contamination_bounds_and_self(spark):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 100 == 0)
    train_with_bench = d  # bench docs included → full containment
    full = contamination(train_with_bench, bench).collect()
    assert all(r["containment"] == 1.0 for r in full)

    disjoint_train = d.filter(F.col("doc_id") % 100 != 0)
    part = {r["bench_id"]: r for r in contamination(disjoint_train, bench).collect()}
    assert set(part) == {r["doc_id"] for r in bench.select("doc_id").collect()}
    for r in part.values():
        assert 0.0 <= r["containment"] <= 1.0
        assert r["n_contaminated"] <= r["n_shingles"]


def test_write_training_shards_layout(spark, tmp_path):
    from impresso_ta.sources.sinks import write_training_shards

    d = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(d, out, n_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    assert {r["shard"] for r in back.select("shard").distinct().collect()} <= set(
        range(4)
    )
    # written files are ordered by pos inside each shard directory
    import glob

    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        files = sorted(glob.glob(f"{shard_dir}/*.parquet"))
        assert files
        import pyarrow.parquet as pq

        poss = []
        for fpath in files:
            poss.extend(pq.read_table(fpath, columns=["pos"])["pos"].to_pylist())
        # each file is internally sorted (sortWithinPartitions)
        assert poss == sorted(poss)


def test_temperature_sample_flattens_mix(spark):
    from impresso_ta.operators.corpus import temperature_sample

    d = _docs(spark)
    by_lang = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # alpha=0 → uniform target: every domain's keep count ∝ 1/n_d · const
    s0 = temperature_sample(d, alpha=0.0, target_rows=100, domain_col="lang")
    got0 = {r["lang"]: r["n"] for r in s0.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # each lang contributes ~100/n_langs docs; rare langs keep a larger
    # FRACTION than common ones
    fr = {l: got0.get(l, 0) / by_lang[l] for l in by_lang}
    rare = min(by_lang, key=by_lang.get)
    common = max(by_lang, key=by_lang.get)
    assert fr[rare] > fr[common]
    # determinism: same sample twice
    s1 = temperature_sample(d, alpha=1.0, target_rows=100, domain_col="lang")
    a = sorted(r["doc_id"] for r in s1.collect())
    b = sorted(r["doc_id"] for r in temperature_sample(d, alpha=1.0, target_rows=100, domain_col="lang").collect())
    assert a == b and len(a) > 0


def test_temperature_sample_never_upsamples(spark):
    from impresso_ta.operators.corpus import temperature_sample

    d = _docs(spark)
    s = temperature_sample(d, alpha=0.3, target_rows=10**9, domain_col="lang")
    # p_d caps at 1 → sample is the whole corpus, each doc exactly once
    assert sorted(r["doc_id"] for r in s.collect()) == sorted(
        r["doc_id"] for r in d.collect()
    )


def test_epoch_upsample_integer_weights_exact(spark):
    from impresso_ta.operators.corpus import epoch_upsample

    d = _docs(spark)
    n_by_lang = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    up = epoch_upsample(d, weights={"en": 3.0}, domain_col="lang")
    got = {r["lang"]: r["n"] for r in up.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # integer weight → exactly w copies per doc, zero variance
    assert got["en"] == 3 * n_by_lang["en"]
    # unlisted domains default to weight 1.0 (one copy each)
    for lang, n in n_by_lang.items():
        if lang != "en":
            assert got[lang] == n
    # epoch index is dense 1..w
    epochs = {r["epoch"] for r in up.filter(F.col("lang") == "en").collect()}
    assert epochs == {1, 2, 3}


def test_epoch_upsample_fractional_is_deterministic_and_bounded(spark):
    from impresso_ta.operators.corpus import epoch_upsample

    d = _docs(spark)
    n_en = d.filter(F.col("lang") == "en").count()
    a = epoch_upsample(d, weights={"en": 1.5}, domain_col="lang")
    n_a = a.filter(F.col("lang") == "en").count()
    # between 1x and 2x, near 1.5x in expectation
    assert n_en < n_a < 2 * n_en
    b = epoch_upsample(d, weights={"en": 1.5}, domain_col="lang")
    assert n_a == b.filter(F.col("lang") == "en").count()


def test_snapshot_diff_statuses(spark):
    from impresso_ta.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same  text"), (2, "changed text"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    # whitespace-normalized fingerprints: doc 1 is unchanged
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_distribution_drift_zero_on_identical_and_positive_on_influx(spark):
    from impresso_ta.operators.corpus import distribution_drift

    d = _docs(spark)
    same = {r["word"]: r["kl_term"] for r in distribution_drift(d, d).collect()}
    assert same and all(v == 0.0 for v in same.values())

    spam = d.withColumn("text", F.concat(F.col("text"), F.lit(" zzspam zzspam")))
    drift = {r["word"]: r for r in distribution_drift(d, spam, top_k=1000).collect()}
    assert drift["zzspam"]["c_old"] == 0
    assert drift["zzspam"]["kl_term"] > 0
