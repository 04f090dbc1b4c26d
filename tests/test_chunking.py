"""Chunking operators: window coverage/overlap invariants and the
content-defined insertion-resilience property (the reason CDC exists)."""

from pyspark.sql import functions as F

from impresso_ta.operators.chunking import (
    content_defined_chunks,
    content_defined_chunks_clamped,
    sliding_chunks,
)


def test_sliding_chunks_cover_and_overlap(spark):
    words = [f"w{i}" for i in range(150)]
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    rows = sorted(
        sliding_chunks(docs, window_words=64, stride_words=48).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts advance by the stride; windows cover every word
    assert [r["start_word"] for r in rows] == [0, 48, 96]
    covered = set()
    for r in rows:
        toks = r["chunk"].split()
        assert toks == words[r["start_word"] : r["start_word"] + 64]
        covered.update(range(r["start_word"], r["start_word"] + len(toks)))
    assert covered == set(range(150))
    # consecutive windows overlap by window - stride
    assert rows[0]["chunk"].split()[48:] == rows[1]["chunk"].split()[:16]


def test_content_defined_chunks_reconstruct(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(60))) for i in range(5)],
        "doc_id long, text string",
    )
    out = content_defined_chunks(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    for i in range(5):
        text = " ".join(c for _, c in sorted(by_doc[i]))
        assert text == " ".join(f"t{i}_{j}" for j in range(60))


def test_content_defined_chunks_survive_insertion(spark):
    """THE property: inserting words early changes O(1) chunks; the rest
    stay byte-identical (fixed windows would shift every later chunk)."""
    base = [f"word{i}" for i in range(400)]
    edited = base[:3] + ["inserted", "tokens"] + base[3:]
    docs = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(edited))],
        "doc_id long, text string",
    )
    out = content_defined_chunks(docs).collect()
    fps = {0: set(), 1: set()}
    for r in out:
        fps[r["doc_id"]].add(r["chunk_fp"])
    shared = fps[0] & fps[1]
    # nearly all chunks shared — only the edited chunk differs
    assert len(shared) >= len(fps[0]) - 2
    assert fps[0] != fps[1]

    # fixed windows, by contrast, mis-align: far fewer shared
    win = sliding_chunks(docs, window_words=16, stride_words=16).collect()
    wfp = {0: set(), 1: set()}
    for r in win:
        wfp[r["doc_id"]].add(r["chunk"])
    assert len(wfp[0] & wfp[1]) < len(shared)


def test_content_defined_clamped_bounds(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"v{i}" for i in range(300)))],
        "doc_id long, text string",
    )
    rows = content_defined_chunks_clamped(
        docs, boundary_mod=4, min_words=3, max_words=10
    ).collect()
    # every chunk except possibly the trailing remainder respects bounds
    sizes = [r["n_words"] for r in sorted(rows, key=lambda r: r["chunk_idx"])]
    for s in sizes[:-1]:
        assert 3 <= s <= 10
    assert sizes[-1] <= 10
    # reconstruction
    text = " ".join(
        r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"])
    )
    assert text == " ".join(f"v{i}" for i in range(300))
