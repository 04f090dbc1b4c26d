"""Command-line entry points mirroring the reference's CLI surface.

The reference ships ``impresso-txt-importer`` (docopt, ref:
importers/generic_importer.py:180-208) and ``impresso-rebuilder``
(ref: rebuilders/rebuilder.py:306-327). Same capabilities here, Spark-
backed:

    python -m impresso_ta.cli import --input-dir DIR --format FMT \
        --output-dir OUT [--aliases A,B] [--exclude] \
        [--date-ranges GDL=1900-01-01:1950-12-31] [--incremental] [--ts TS]

    python -m impresso_ta.cli rebuild --issues PATH --supports PATH \
        --output-dir OUT [--fmt solr|passim] [--languages fr,de] \
        [--default-language LG] [--ts TS]

Both run as ONE Spark job each (no per-year driver loops, no manual
memory management — SURVEY §3 lifecycle collapsed into declarative
pipelines).
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="impresso_ta")
    sub = p.add_subparsers(dest="command", required=True)

    imp = sub.add_parser("import", help="OCR source tree → canonical store")
    imp.add_argument("--input-dir", required=True)
    imp.add_argument("--format", required=True, help="registered plugin name")
    imp.add_argument("--output-dir", required=True)
    imp.add_argument("--aliases", help="comma-separated alias filter (F1)")
    imp.add_argument("--exclude", action="store_true", help="invert --aliases")
    imp.add_argument(
        "--date-ranges",
        help="ALIAS=start:end[,ALIAS=start:end] per-title date filter (F2)",
    )
    imp.add_argument(
        "--incremental",
        action="store_true",
        help="anti-join against issues already in --output-dir (F3)",
    )
    imp.add_argument("--ts", help="deterministic timestamp to stamp rows with")
    imp.add_argument("--store-format", default="json", choices=["json", "parquet"])
    imp.add_argument(
        "--image-dirs",
        help="comma-separated image/image-info sidecar dirs for Olive X7 "
        "coordinate conversion (ref generic_importer's --image-dirs)",
    )
    imp.add_argument(
        "--validate",
        action="store_true",
        help="validate canonical rows against the value-level schema "
        "rules before writing; violations go to the error channel "
        "(ref utils.py:71-89 write-time JSON-Schema validation)",
    )

    reb = sub.add_parser("rebuild", help="canonical store → rebuilt docs")
    reb.add_argument("--issues", required=True)
    reb.add_argument("--supports", required=True, help="pages or audio records")
    reb.add_argument("--output-dir", required=True)
    reb.add_argument("--fmt", default="solr", choices=["solr", "passim"])
    reb.add_argument("--languages", help="keep only these CI languages (F6)")
    reb.add_argument("--default-language")
    reb.add_argument("--audio", action="store_true", help="supports are audio records")
    reb.add_argument("--ts")
    reb.add_argument(
        "--filter-config",
        help="reference-style rebuild config JSON: [{alias: [start, end)}...]",
    )
    reb.add_argument("--store-format", default="json", choices=["json", "parquet"])

    cor = sub.add_parser(
        "corpus",
        help="raw documents → filtered/deduped/mixed training corpus",
    )
    cor.add_argument("--input", required=True, help="documents parquet path")
    cor.add_argument("--output-dir", required=True)
    cor.add_argument(
        "--id-col",
        default="doc_id",
        help="document id column; must be integer-typed (or losslessly "
        "castable to BIGINT) — pipeline stages key their joins on the "
        "id cast to long",
    )
    cor.add_argument("--text-col", default="text")
    cor.add_argument("--no-c4", action="store_true")
    cor.add_argument("--no-gopher", action="store_true")
    cor.add_argument(
        "--line-spans",
        type=int,
        default=10,
        help="line-dedup span width in words; 0 disables",
    )
    cor.add_argument(
        "--substring-dedup",
        type=int,
        default=0,
        metavar="K",
        help="corpus-wide exact-substring dedup window (tokens); 0 "
        "disables (default). Repeated K-token windows are removed "
        "everywhere but their globally-first occurrence (ExactSubstr).",
    )
    cor.add_argument("--no-doc-dedup", action="store_true")
    cor.add_argument(
        "--jaccard-threshold",
        type=float,
        default=None,
        help="near-dup Jaccard threshold for the 'jaccard' doc-dedup "
        "form (default 0.7). IGNORED when dedup runs through "
        "'minhash_survivors' — including when 'auto' routes there at "
        ">=25k docs (a warning is emitted); force --doc-dedup-method "
        "jaccard to keep thresholded semantics at any scale.",
    )
    cor.add_argument(
        "--doc-dedup-method",
        choices=["auto", "jaccard", "minhash_survivors"],
        default="auto",
        help="auto (default): jaccard below 25k filtered docs, "
        "minhash_survivors at or above. jaccard: exact-verified "
        "near-dup pairs (precision; pair set quadratic in "
        "duplicate-clique size). minhash_survivors: band-bucket "
        "union-find, linear at any duplicate distribution (the "
        "crawl-scale form; threshold-free).",
    )
    cor.add_argument(
        "--domain-cap",
        type=int,
        default=0,
        metavar="N",
        help="keep at most N docs per --domain-col value (RefinedWeb "
        "per-domain cap; salted two-stage window, hot-domain-proof); "
        "0 disables (default)",
    )
    cor.add_argument(
        "--domain-cap-order",
        help="column ranking docs within a capped domain (ascending; "
        "default: --id-col)",
    )
    cor.add_argument(
        "--benchmark", help="parquet of benchmark docs to decontaminate against"
    )
    cor.add_argument(
        "--dsir-target",
        help="parquet of target-distribution docs: DSIR importance "
        "resampling (Xie et al. 2023) keeps the --dsir-n filtered docs "
        "most like this corpus (deterministic Gumbel top-k)",
    )
    cor.add_argument(
        "--dsir-n",
        type=int,
        default=0,
        metavar="N",
        help="number of docs DSIR selection keeps (required with "
        "--dsir-target)",
    )
    cor.add_argument(
        "--dsir-ngram",
        type=int,
        default=1,
        choices=[1, 2],
        help="DSIR feature order: 1 = hashed unigrams, 2 = unigrams + "
        "bigrams (the paper's full n<=2 set; needed when the target "
        "differs by word order, not vocabulary)",
    )
    cor.add_argument(
        "--quality-model",
        help="parquet of trained (bucket, w) LR weights "
        "(lr_hashed_train): learned quality filter — drop docs whose "
        "hashed-feature probability falls below --quality-threshold, "
        "right after the heuristic filters",
    )
    cor.add_argument(
        "--quality-threshold",
        type=float,
        default=0.5,
        metavar="P",
        help="minimum lr_prob a doc must score to survive "
        "--quality-model (default 0.5)",
    )
    cor.add_argument(
        "--quality-dim",
        type=int,
        default=64,
        metavar="D",
        help="hashed feature dimension the --quality-model was trained "
        "with (must match lr_hashed_train's dim; default 64)",
    )
    cor.add_argument(
        "--quality-raw-counts",
        action="store_true",
        help="score with raw hashed counts instead of term frequencies "
        "(only if the model was trained with tf=False)",
    )
    cor.add_argument(
        "--dedup-against",
        help="parquet of the already-ingested corpus: drop input docs "
        "near-duplicating it (MinHash band probe + exact-Jaccard "
        "verify) BEFORE the pipeline stages — the incremental-crawl "
        "gate",
    )
    cor.add_argument("--temperature-alpha", type=float)
    cor.add_argument("--temperature-target", type=int, default=0)
    cor.add_argument("--domain-col", default="lang")
    cor.add_argument(
        "--shards", type=int, default=0, help="also export N training shards"
    )
    cor.add_argument(
        "--split",
        help="add a deterministic split column, e.g. train=0.98,val=0.01,test=0.01",
    )
    cor.add_argument("--stats", action="store_true", help="print per-stage counts")
    return p


def cmd_import(args, spark) -> int:
    from pyspark.sql import functions as F

    from impresso_ta.importers import import_issues
    from impresso_ta.sources import (
        alias_filter,
        date_filter,
        detect_issues,
        incremental_filter,
        manifest_stats,
        write_errors,
        write_issues,
        write_pages,
    )
    from impresso_ta.sources.readers import read_issues

    disc = detect_issues(spark, args.input_dir, args.format)
    if args.aliases:
        disc = alias_filter(disc, args.aliases.split(","), exclude=args.exclude)
    if args.date_ranges:
        ranges = {}
        for spec in args.date_ranges.split(","):
            alias, rng = spec.split("=")
            start, end = rng.split(":")
            ranges[alias] = (start, end)
        disc = date_filter(disc, ranges)
    if getattr(args, "image_dirs", None):
        # Olive X7 coordinate conversion: the importer reads the sidecar
        # location from a path suffix so the discovery schema stays flat
        disc = disc.withColumn(
            "path",
            F.when(
                F.col("format") == "olive",
                F.concat(
                    F.col("path"), F.lit("::image_dirs=" + args.image_dirs)
                ),
            ).otherwise(F.col("path")),
        )
    if args.incremental:
        try:
            done = read_issues(spark, f"{args.output_dir}/issues").select(
                F.split("id", "-")[0].alias("alias"),
                F.to_date(
                    F.concat_ws(
                        "-",
                        F.split("id", "-")[1],
                        F.split("id", "-")[2],
                        F.split("id", "-")[3],
                    )
                ).alias("date"),
                F.element_at(F.split("id", "-"), -1).alias("edition"),
            )
            disc = incremental_filter(disc, done)
        except Exception:  # noqa: BLE001 — empty store → nothing to skip
            pass

    res = import_issues(disc, ts=args.ts)
    issues_df, pages_df, records_df, errors_df = (
        res.issues,
        res.pages,
        res.records,
        res.errors,
    )
    if args.validate:
        from impresso_ta.operators.validate import (
            split_valid,
            validate_audio_records,
            validate_issues,
            validate_pages,
        )

        issues_df, issue_errs = split_valid(
            validate_issues(issues_df), "validate-issue"
        )
        pages_df, page_errs = split_valid(
            validate_pages(pages_df), "validate-page"
        )
        records_df, record_errs = split_valid(
            validate_audio_records(records_df), "validate-record"
        )
        errors_df = (
            errors_df.unionByName(issue_errs)
            .unionByName(page_errs)
            .unionByName(record_errs)
        )
    write_issues(issues_df, f"{args.output_dir}/issues", fmt=args.store_format)
    write_pages(pages_df, f"{args.output_dir}/pages", fmt=args.store_format)
    if records_df.take(1):
        write_pages(
            records_df, f"{args.output_dir}/records", fmt=args.store_format
        )
    write_errors(errors_df, f"{args.output_dir}/errors")
    # manifest goes through the sink (distributed write) — at scale the
    # (alias, year) grid is big enough that a full driver collect is a
    # bottleneck; the console only echoes a bounded sample.
    stats_df = manifest_stats(issues_df)
    stats_df.write.mode("overwrite").json(f"{args.output_dir}/manifest")
    echo = stats_df.orderBy("alias", "year").limit(20).collect()
    for row in echo:
        print(
            f"{row['alias']}-{row['year']}: {row['n_issues']} issues, "
            f"{row['n_content_items']} content items, {row['n_pages']} pages"
        )
    print(f"manifest written to {args.output_dir}/manifest")
    return 0


def cmd_rebuild(args, spark) -> int:
    from pyspark.sql import functions as F

    from impresso_ta.rebuild import rebuild_issues_passim, rebuild_issues_solr
    from impresso_ta.rebuild.solr import split_errors
    from impresso_ta.sources import write_errors, write_rebuilt
    from impresso_ta.sources.readers import (
        read_audio_records,
        read_issues,
        read_pages,
    )

    issues = read_issues(spark, args.issues)
    if args.filter_config:
        import json as _json

        from impresso_ta.sources.discovery import rebuild_config_filter

        with open(args.filter_config) as f:
            issues = rebuild_config_filter(issues, _json.load(f))
    supports = (
        read_audio_records(spark, args.supports)
        if args.audio
        else read_pages(spark, args.supports)
    )
    if args.fmt == "solr":
        out = rebuild_issues_solr(
            issues, supports, ts=args.ts, default_language=args.default_language
        )
        ok, errors = split_errors(out)
    else:
        out = rebuild_issues_passim(issues, supports)
        ok = out.filter(~F.col("has_problem")).drop("has_problem", "error")
        errors = out.filter(F.col("has_problem")).select(
            F.col("id").alias("canonical_path"),
            F.lit("rebuild").alias("stage"),
            F.coalesce(F.col("error"), F.lit("unknown")).alias("error"),
        )
    if args.languages:
        ok = ok.filter(F.col("lg").isin(args.languages.split(",")))
    write_rebuilt(ok, f"{args.output_dir}/rebuilt", fmt=args.store_format)
    write_errors(errors, f"{args.output_dir}/errors")
    print(f"rebuilt {ok.count()} content items")
    return 0


def cmd_corpus(args, spark) -> int:
    from pyspark.sql import functions as F

    from impresso_ta.operators.pipeline import prepare_corpus

    docs = spark.read.parquet(args.input)
    # pipeline stages (c4_filters, line_dedup, hashed joins) key on the id
    # cast to long — a non-castable id would fail under ANSI mode or
    # silently null-join every row away, so validate up front.
    dtypes = dict(docs.dtypes)
    if args.id_col not in dtypes:
        raise SystemExit(
            f"--id-col {args.id_col!r} not found; columns: {sorted(dtypes)}"
        )
    if dtypes[args.id_col] not in {"tinyint", "smallint", "int", "bigint"}:
        bad = docs.filter(
            F.col(args.id_col).isNotNull()
            & F.col(args.id_col).try_cast("long").isNull()
        )
        if bad.take(1):
            raise SystemExit(
                f"--id-col {args.id_col!r} has {dtypes[args.id_col]} values "
                "that do not cast to BIGINT; supply an integer id column"
            )
    if args.dedup_against:
        from impresso_ta.operators.dedup import incremental_minhash_dedup

        existing = spark.read.parquet(args.dedup_against)
        before = docs.count()
        docs = incremental_minhash_dedup(
            docs,
            existing,
            id_col=args.id_col,
            text_col=args.text_col,
            threshold=(
                0.7
                if args.jaccard_threshold is None
                else args.jaccard_threshold
            ),
        )
        print(f"incremental_dedup: {before} -> {docs.count()}")
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    res = prepare_corpus(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        c4=not args.no_c4,
        gopher=not args.no_gopher,
        line_spans=args.line_spans or None,
        substring_dedup=args.substring_dedup or None,
        doc_dedup=not args.no_doc_dedup,
        jaccard_threshold=args.jaccard_threshold,
        doc_dedup_method=args.doc_dedup_method,
        benchmark=bench,
        dsir_target=(
            spark.read.parquet(args.dsir_target)
            if args.dsir_target
            else None
        ),
        dsir_n=args.dsir_n or None,
        dsir_ngram=args.dsir_ngram,
        quality_model=(
            spark.read.parquet(args.quality_model)
            if args.quality_model
            else None
        ),
        quality_threshold=args.quality_threshold,
        quality_dim=args.quality_dim,
        quality_tf=not args.quality_raw_counts,
        domain_cap=args.domain_cap or None,
        domain_cap_order=args.domain_cap_order,
        temperature_alpha=args.temperature_alpha,
        temperature_target=args.temperature_target,
        domain_col=args.domain_col,
        collect_stats=args.stats,
    )
    out_docs = res.docs
    if args.split:
        from impresso_ta.operators.corpus import deterministic_split

        fractions = {}
        for part in args.split.split(","):
            name, frac = part.split("=")
            fractions[name] = float(frac)
        out_docs = deterministic_split(
            out_docs, fractions, id_col=args.id_col
        )
    out_docs.write.mode("overwrite").parquet(f"{args.output_dir}/corpus")
    # the parquet sink is the last consumer of the pipeline's persist
    # boundaries; release executor storage before the (re-read) shard
    # pass so a long-lived session doesn't accumulate cached frames
    res.unpersist()
    for stage, n_in, n_out in res.stats:
        print(f"{stage}: {n_in} -> {n_out}")
    if args.shards:
        from impresso_ta.sources.sinks import write_training_shards

        write_training_shards(
            spark.read.parquet(f"{args.output_dir}/corpus"),
            f"{args.output_dir}/shards",
            n_shards=args.shards,
            id_col=args.id_col,
        )
    n = spark.read.parquet(f"{args.output_dir}/corpus").count()
    print(f"prepared corpus: {n} documents -> {args.output_dir}/corpus")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    # cross-flag contracts fail HERE, before any Spark session spins up —
    # not as a ValueError deep inside prepare_corpus (and never silently)
    if args.command == "corpus":
        if args.dsir_target and not args.dsir_n:
            parser.error("--dsir-target requires --dsir-n > 0")
        if args.dsir_n and not args.dsir_target:
            parser.error("--dsir-n has no effect without --dsir-target")
        if args.quality_model and not (0.0 <= args.quality_threshold <= 1.0):
            parser.error("--quality-threshold must be in [0, 1]")
    from impresso_ta.session import get_spark

    spark = get_spark(app_name=f"impresso_ta-{args.command}")
    try:
        if args.command == "import":
            return cmd_import(args, spark)
        if args.command == "corpus":
            return cmd_corpus(args, spark)
        return cmd_rebuild(args, spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
