"""Synthetic canonical corpus derived from the documents table.

Turns each document row into one canonical issue with one page and one
article content item whose tokens are the document's words — entirely
with JVM column expressions (no UDF): ``transform`` over the split word
array builds the token structs, so corpus synthesis runs at scan speed
and the rebuild benchmark measures the REBUILD engine, not Python row
assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthetic_canonical_corpus(
    docs: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """documents(doc_id, text, lang, ...) → (issues_df, pages_df).

    Issue id ``SYN-{yyyy-mm-dd}-{edition}`` minted from doc_id (dates
    cycle over ~10 years, editions a-c) — valid canonical ids, unique per
    doc. One CI per issue covering the whole page.

    Skewed profile: when the input carries ``_issue``/``_seq`` columns
    (see ``tools.skewed_docs.zipfian_documents``), issues are minted
    from ``_issue`` instead — many documents share an issue (zipfian
    group sizes), each contributing page ``p{_seq:04d}`` and CI
    ``i{_seq:04d}``, so the rebuild's per-issue groupBy and assembly
    UDTF see realistic hot keys while every page/CI id stays unique.
    """
    from impresso_ta.operators.partitioning import spread_small_input

    skewed = "_issue" in docs.columns and "_seq" in docs.columns
    cols = [
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        F.col("lang"),
    ]
    if skewed:
        cols += [F.col("_issue").cast("long"), F.col("_seq").cast("int")]
    d = spread_small_input(docs).select(*cols)
    issue_ord = F.col("_issue") if skewed else F.col("doc_id")
    date_str = F.date_format(
        F.date_add(F.lit("1900-01-01").cast("date"), (issue_ord % 3650).cast("int")),
        "yyyy-MM-dd",
    )
    edition = F.concat(
        F.lit("a"),
        (issue_ord / 3650).cast("long").cast("string"),
    )
    issue_id = F.concat_ws("-", F.lit("SYN"), date_str, edition)
    seq = F.col("_seq") if skewed else F.lit(1)
    nnnn = F.lpad(seq.cast("string"), 4, "0")
    ci_id = F.concat(issue_id, F.lit("-i"), nnnn)
    page_id = F.concat(issue_id, F.lit("-p"), nnnn)

    words = F.split(F.trim(F.col("text")), r"\s+")
    tokens = F.transform(
        words,
        lambda w, i: F.struct(
            w.alias("tx"),
            F.array(i * 10, F.lit(0), F.lit(9), F.lit(12)).alias("c"),
            F.lit(None).cast("boolean").alias("hy"),
            F.lit(None).cast("string").alias("nf"),
            F.lit(None).cast("boolean").alias("gn"),
            F.lit(None).cast("int").alias("s"),
        ),
    )
    line = F.struct(
        F.array(F.lit(0), F.lit(0), F.lit(2000), F.lit(12)).alias("c"),
        tokens.alias("t"),
    )
    para = F.struct(line["c"].alias("c"), F.array(line).alias("l"))
    region = F.struct(
        para["c"].alias("c"), ci_id.alias("pOf"), F.array(para).alias("p")
    )

    base = d.select(
        "doc_id", "lang", issue_id.alias("issue_id"), ci_id.alias("ci_id"),
        page_id.alias("page_id"), region.alias("region"), seq.alias("seq"),
    )

    ci = F.struct(
        F.struct(
            F.col("ci_id").alias("id"),
            F.array(F.col("seq")).alias("pp"),
            F.lit(None).cast("array<int>").alias("rr"),
            F.lit("article").alias("tp"),
            F.lit(None).cast("string").alias("t"),
            F.col("lang").alias("lg"),
            F.col("seq").alias("ro"),
            F.lit(None).cast("string").alias("iiif_link"),
            F.lit(None).cast("boolean").alias("cc"),
            F.lit(None).cast("string").alias("var_t"),
            F.lit(None).cast("string").alias("archival_note"),
        ).alias("m"),
    )

    if skewed:
        # one issue row per zipfian issue: its CI and page lists carry
        # the whole (possibly huge) group — array_sort restores the
        # _seq order collect_list does not guarantee
        issues_df = (
            base.groupBy("issue_id")
            .agg(
                F.array_sort(F.collect_list(ci)).alias("i"),
                F.array_sort(F.collect_list(F.col("page_id"))).alias("pp"),
            )
            .select(
                F.col("issue_id").alias("id"),
                F.lit(None).cast("string").alias("cdt"),
                F.lit(None).cast("string").alias("ts"),
                F.lit("newspaper").alias("st"),
                F.lit("print").alias("sm"),
                "i",
                "pp",
            )
        )
    else:
        issues_df = base.select(
            F.col("issue_id").alias("id"),
            F.lit(None).cast("string").alias("cdt"),
            F.lit(None).cast("string").alias("ts"),
            F.lit("newspaper").alias("st"),
            F.lit("print").alias("sm"),
            F.array(ci).alias("i"),
            F.array(F.col("page_id")).alias("pp"),
        )

    pages_df = base.select(
        F.col("page_id").alias("id"),
        F.lit(None).cast("string").alias("cdt"),
        F.lit(None).cast("string").alias("ts"),
        F.lit("newspaper").alias("st"),
        F.lit("print").alias("sm"),
        F.lit(True).alias("cc"),
        F.array(F.col("region")).alias("r"),
    )
    return issues_df, pages_df


def synthetic_audio_corpus(
    docs: DataFrame, words_per_utterance: int = 50
) -> tuple[DataFrame, DataFrame]:
    """documents → (issues_df, records_df) for the AUDIO rebuild path.

    One radio-broadcast issue + one audio record per document: the
    document's words become 0.5 s-spaced ASR tokens, chunked into
    ``words_per_utterance``-token utterances of one speech segment each
    (a single section spans them). Entirely JVM-side (nested
    ``transform`` over ``sequence`` chunks + ``slice``), so the
    benchmark measures the ssb/ub/sb offset-assembly engine, not Python
    row synthesis — the audio twin of :func:`synthetic_canonical_corpus`.
    """
    from impresso_ta.operators.partitioning import spread_small_input

    d = spread_small_input(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        F.col("lang"),
    )
    date_str = F.date_format(
        F.date_add(
            F.lit("1900-01-01").cast("date"),
            (F.col("doc_id") % 3650).cast("int"),
        ),
        "yyyy-MM-dd",
    )
    edition = F.concat(
        F.lit("a"), (F.col("doc_id") / 3650).cast("long").cast("string")
    )
    issue_id = F.concat_ws("-", F.lit("SYA"), date_str, edition)
    ci_id = F.concat(issue_id, F.lit("-i0001"))
    rec_id = F.concat(issue_id, F.lit("-r0001"))

    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(words)
    wpu = F.lit(words_per_utterance)
    # utterance k covers words [k*wpu, min((k+1)*wpu, n)) at 0.5 s/word
    utterances = F.transform(
        F.sequence(F.lit(0), ((n - 1) / wpu).cast("int")),
        lambda k: F.struct(
            F.array(
                (k * wpu).cast("double") * 0.5,
                (F.least((k + 1) * wpu, n) - k * wpu).cast("double") * 0.5,
            ).alias("tc"),
            F.array(
                F.struct(
                    F.array(
                        (k * wpu).cast("double") * 0.5,
                        (F.least((k + 1) * wpu, n) - k * wpu).cast("double")
                        * 0.5,
                    ).alias("tc"),
                    F.transform(
                        F.slice(words, k * wpu + 1, words_per_utterance),
                        lambda w, i: F.struct(
                            w.alias("tx"),
                            F.array(
                                (k * wpu + i).cast("double") * 0.5,
                                F.lit(0.4),
                            ).alias("tc"),
                        ),
                    ).alias("t"),
                )
            ).alias("ss"),
        ),
    )
    section = F.struct(
        F.array(F.lit(0.0), n.cast("double") * 0.5).alias("tc"),
        ci_id.alias("pOf"),
        utterances.alias("u"),
    )

    base = d.select(
        "lang",
        issue_id.alias("issue_id"),
        ci_id.alias("ci_id"),
        rec_id.alias("rec_id"),
        section.alias("section"),
        n.alias("n_words"),
    )

    ci = F.struct(
        F.struct(
            F.col("ci_id").alias("id"),
            F.lit(None).cast("array<int>").alias("pp"),
            F.array(F.lit(1)).alias("rr"),
            F.lit("radio_broadcast_episode").alias("tp"),
            F.lit(None).cast("string").alias("t"),
            F.col("lang").alias("lg"),
            F.lit(1).alias("ro"),
            F.lit(None).cast("string").alias("iiif_link"),
            F.lit(None).cast("boolean").alias("cc"),
            F.lit(None).cast("string").alias("var_t"),
            F.lit(None).cast("string").alias("archival_note"),
        ).alias("m"),
    )

    issues_df = base.select(
        F.col("issue_id").alias("id"),
        F.lit(None).cast("string").alias("cdt"),
        F.lit(None).cast("string").alias("ts"),
        F.lit("radio_broadcast").alias("st"),
        F.lit("audio").alias("sm"),
        F.array(ci).alias("i"),
        F.array(F.col("rec_id")).alias("rr"),
    )
    records_df = base.select(
        F.col("rec_id").alias("id"),
        F.lit(None).cast("string").alias("cdt"),
        F.lit(None).cast("string").alias("ts"),
        F.lit("radio_broadcast").alias("st"),
        F.lit("audio").alias("sm"),
        F.lit(True).alias("cc"),
        F.lit("00:00:00").alias("stt"),
        F.format_string(
            "%02d:%02d:%02d",
            ((F.col("n_words").cast("double") * 0.5).cast("long") / 3600)
            .cast("long"),
            (((F.col("n_words").cast("double") * 0.5).cast("long") % 3600)
             / 60).cast("long"),
            (F.col("n_words").cast("double") * 0.5).cast("long") % 60,
        ).alias("dur"),
        F.array(F.col("section")).alias("s"),
    )
    return issues_df, records_df
