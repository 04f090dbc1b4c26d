"""Corpus chunking for retrieval/training export: overlapping fixed
windows (the RAG-ingestion standard) and content-defined chunking
(rolling-hash boundaries — chunk edges follow content, so an insertion
early in a document shifts ONE chunk instead of re-cutting every window
downstream, keeping chunk-level dedup effective across near-identical
documents; the FastCDC/rsync idea applied at word granularity).

Both are pure column expressions over the word array — zero shuffle,
chunks materialize map-side. The non-overlapping fixed window lives in
``operators/udafs.make_chunk_text_udtf`` (the SQL-registered UDTF
surface); these are the column-expression forms that stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def sliding_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 64,
    stride_words: int = 48,
) -> DataFrame:
    """Overlapping fixed windows: chunk i covers words
    [i·stride, i·stride + window). Overlap = window − stride gives
    retrieval context continuity across boundaries. Returns
    (id, chunk_idx, start_word, n_words, chunk).
    """
    words = _words(F.col(text_col))
    n = F.size(words)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(window_words)) / F.lit(float(stride_words)))
        .cast("int")
        + 1,
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride_words).cast("int").alias("start_word"),
            F.slice(words, i * stride_words + 1, window_words).alias("_w"),
        ),
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(chunks).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.start_word").alias("start_word"),
            F.size("c._w").alias("n_words"),
            F.array_join(F.col("c._w"), " ").alias("chunk"),
        )
        .filter(F.col("n_words") > 0)
    )


def _is_boundary(w: Column, boundary_mod: int) -> Column:
    """Boundary flag per word (md5-derived, engine-portable)."""
    return (
        F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast("long")
        % boundary_mod
        == 0
    )


def content_defined_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 16,
) -> DataFrame:
    """Content-defined chunking: a word ENDS a chunk when
    md5(word) % boundary_mod == 0 (expected chunk length ≈ boundary_mod
    words). Boundaries depend only on content, so shared text between
    near-duplicate documents yields byte-identical chunks — the property
    that makes chunk-level exact dedup effective where fixed windows
    mis-align after one insertion (the FastCDC/rsync idea at word
    granularity).

    Zero shuffle: boundary positions are a filtered index sequence,
    chunks a zip_with of adjacent boundaries — all inside codegen.
    Returns (id, chunk_idx, n_words, chunk, chunk_fp).
    """
    words = _words(F.col(text_col))
    n = F.size(words)
    bpos = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: _is_boundary(F.element_at(words, i), boundary_mod),
    )
    starts = F.concat(F.array(F.lit(0)), bpos)
    ends = F.concat(bpos, F.array(n))
    segs = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.slice(words, s + 1, e - s)
        ),
        lambda c: F.size(c) > 0,
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(segs).alias("chunk_idx", "_w"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        F.size("_w").alias("n_words"),
        F.array_join(F.col("_w"), " ").alias("chunk"),
        F.md5(F.array_join(F.col("_w"), " ")).alias("chunk_fp"),
    )


def content_defined_chunks_clamped(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 16,
    min_words: int = 4,
    max_words: int = 64,
) -> DataFrame:
    """:func:`content_defined_chunks` with [min_words, max_words] length
    clamps — boundaries become stateful (a cut depends on the previous
    cut), so this is a sequential array fold per document (still
    map-side, zero shuffle; just not oracle-SQL-expressible without a
    recursive CTE).

    Returns (id, chunk_idx, n_words, chunk, chunk_fp).
    """
    words = _words(F.col(text_col))
    is_boundary = lambda w: _is_boundary(w, boundary_mod)
    # fold words into chunks: running (current_chunk, emitted_chunks)
    folded = F.aggregate(
        words,
        F.struct(
            F.lit([]).cast("array<string>").alias("cur"),
            F.lit([]).cast("array<array<string>>").alias("done"),
        ),
        lambda acc, w: F.when(
            (
                is_boundary(w)
                & (F.size(acc["cur"]) + 1 >= F.lit(min_words))
            )
            | (F.size(acc["cur"]) + 1 >= F.lit(max_words)),
            F.struct(
                F.lit([]).cast("array<string>").alias("cur"),
                F.concat(
                    acc["done"],
                    F.array(F.concat(acc["cur"], F.array(w))),
                ).alias("done"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["cur"], F.array(w)).alias("cur"),
                acc["done"].alias("done"),
            )
        ),
        lambda acc: F.when(
            F.size(acc["cur"]) > 0, F.concat(acc["done"], F.array(acc["cur"]))
        ).otherwise(acc["done"]),
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(folded).alias("chunk_idx", "_w"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int"),
            F.size("_w").alias("n_words"),
            F.array_join(F.col("_w"), " ").alias("chunk"),
            F.md5(F.array_join(F.col("_w"), " ")).alias("chunk_fp"),
        )
    )
