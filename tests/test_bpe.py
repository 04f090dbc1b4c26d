"""Distributed BPE induction vs a sequential reference implementation,
plus encode/train consistency and determinism."""

from collections import Counter

from pyspark.sql import functions as F

from impresso_ta.operators.bpe import bpe_encode, bpe_merge_table, bpe_train


def _ref_bpe(texts: list[str], n_merges: int):
    """Sequential reference: classic Sennrich-style corpus BPE."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        # max count, ties lexicographic
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((lhs, rhs, cnt))
        new_vocab = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == lhs and sym[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges, vocab


TEXTS = [
    "low low low lower lowest",
    "new newer newest new new",
    "wide wider widest low new",
]


def test_bpe_matches_sequential_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got, final_vocab = bpe_train(docs, n_merges=8)
    want, ref_vocab = _ref_bpe(TEXTS, 8)
    assert got == want
    # final symbol sequences agree word-for-word
    got_seqs = {
        r["word"]: tuple(r["seq"].split())
        for r in final_vocab.collect()
    }
    ref_seqs = {}
    for sym, _ in ref_vocab.items():
        ref_seqs["".join(sym).replace("</w>", "")] = sym
    for word, sym in got_seqs.items():
        assert sym == ref_seqs[word], word
    final_vocab.unpersist()


def test_bpe_encode_consistent_with_train(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    merges, final_vocab = bpe_train(docs, n_merges=5)
    enc = bpe_encode(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    seqs = {r["word"]: r["seq"].split() for r in final_vocab.collect()}
    for i, text in enumerate(TEXTS):
        want = [tok for w in text.split() for tok in seqs[w]]
        assert rows[i]["tokens"] == want
        assert rows[i]["n_tokens"] == len(want)
    # merges shrink the token stream vs raw characters
    raw = sum(len(w) + 1 for t in TEXTS for w in t.split())
    assert sum(r["n_tokens"] for r in rows.values()) < raw
    final_vocab.unpersist()


def test_bpe_batch_sizes_agree_with_classic_loop(spark):
    """The batched selector must learn the IDENTICAL merge sequence as
    the one-at-a-time loop (batch_m=1) — the exactness contract of
    _select_exact_batch — regardless of batch size."""
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    classic, v0 = bpe_train(docs, n_merges=8, batch_m=1)
    v0.unpersist()
    want, _ = _ref_bpe(TEXTS, 8)
    assert classic == want
    for m in (2, 4, 16):
        got, v = bpe_train(docs, n_merges=8, batch_m=m)
        v.unpersist()
        assert got == classic, f"batch_m={m}"


def test_bpe_batch_equals_classic_on_real_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    classic, v0 = bpe_train(docs, n_merges=6, batch_m=1)
    v0.unpersist()
    batched, v1 = bpe_train(docs, n_merges=6, batch_m=8)
    v1.unpersist()
    assert batched == classic


def test_bpe_batched_training_bounds_spark_jobs(spark):
    """256 merges over a wide-disjoint vocabulary must cost ~n/batch_m
    pair-count jobs, not one job per merge (VERDICT r2 item 1).

    Fixture: 256 families of unique symbols — words x·y (cnt c_i) and
    x·y·w (cnt c_i) put pair (x,y) at 2·c_i, strictly above every
    </w>-sharing pair (2·min c > max c), so each job confirms a full
    batch of 64 disjoint merges.
    """
    base = 0x4E00
    rows = []
    for i in range(256):
        a, b, c = (chr(base + 3 * i + j) for j in range(3))
        cnt = 1000 - i
        rows.append((i, ((a + b + " ") * cnt) + ((a + b + c + " ") * cnt)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sc = spark.sparkContext
    sc.setJobGroup("bpe-batch-count", "bpe job count")
    try:
        merges, vocab = bpe_train(docs, n_merges=256, batch_m=64)
    finally:
        sc.setJobGroup(None, None)
    vocab.unpersist()
    # all 256 (x_i, y_i) merges, in strictly-descending 2*c_i order
    assert len(merges) == 256
    assert merges == [
        (chr(base + 3 * i), chr(base + 3 * i + 1), 2 * (1000 - i))
        for i in range(256)
    ]
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-batch-count")
    # 4 rounds of 64 merges; AQE materializes each shuffle stage as its
    # own job, so one pair-count query costs ~4 jobs → ~16 total. The
    # one-at-a-time loop would cost 256 queries (~1000 jobs).
    assert 0 < len(jobs) <= 24, f"{len(jobs)} Spark jobs for 256 merges"


def test_bpe_checkpoint_cadence_is_transparent(spark):
    """localCheckpoint lineage truncation (every checkpoint_every
    batches) must not change the learned merges — only the plan depth."""
    base = 0x5E00
    rows = []
    for i in range(64):
        a, b, c = (chr(base + 3 * i + j) for j in range(3))
        cnt = 500 - i
        rows.append((i, ((a + b + " ") * cnt) + ((a + b + c + " ") * cnt)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_ckpt, v0 = bpe_train(
        docs, n_merges=64, batch_m=16, checkpoint_every=2
    )
    v0.unpersist()
    without, v1 = bpe_train(docs, n_merges=64, batch_m=16, checkpoint_every=0)
    v1.unpersist()
    assert with_ckpt == without and len(with_ckpt) == 64


def test_bpe_merge_table_on_real_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in bpe_merge_table(docs, n_merges=3).collect()]
    b = [tuple(r) for r in bpe_merge_table(docs, n_merges=3).collect()]
    assert a == b and len(a) == 3
    # ranks dense, counts non-increasing is NOT guaranteed (merges create
    # new pairs), but counts are positive
    assert [r[0] for r in a] == [1, 2, 3]
    assert all(r[3] > 0 for r in a)
