"""Issue-recomposition operators (Olive/Lux semantics, SURVEY J6-J8, J10).

The reference hand-rolls these joins as Python list scans inside the
Olive/Lux importers; here each is a declarative DataFrame operator so
Catalyst picks the physical join (the dimension side — one issue's ToC,
image list, section map — is always broadcastable).

- ``combine_article_parts``  (J7, ref: olive/helpers.py:128-167): article
  parts split across pages → one logical article; metadata from the
  first part (by sequence), page numbers flattened in part order.
- ``recompose_toc``          (J6/J8, ref: olive/helpers.py:236-349): ToC
  entries ⋈ combined articles on legacy id; Picture entries ⋈ image
  metadata (faulty image XML → dropped, as the reference skips);
  embedded images get ``pOf`` = containing article's canonical id.
- ``remove_section_cis``     (J10/SET2, ref: lux/helpers.py:120-149):
  drop CIs that are members of a section — except images — then union
  the section CIs themselves.
- ``keep_title``             (F8, ref: olive/helpers.py:217-233).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_BLACKLIST = ("untitled article", "untitled ad", "untitled picture")


def keep_title(title: Column) -> Column:
    """Null out blacklisted placeholder titles (F8)."""
    return F.when(
        F.lower(title).isin(*TITLE_BLACKLIST), F.lit(None).cast("string")
    ).otherwise(title)


def combine_article_parts(parts_df: DataFrame) -> DataFrame:
    """J7: merge multi-page article parts into logical articles.

    Input columns: issue_id, article_key (shared by all parts of one
    logical article), legacy_id, seq (part order), page_no, tp, title,
    lg. Output: one row per article with metadata from the first part and
    page numbers/legacy ids flattened in part order — via a single
    groupBy with sorted struct-collect (no window, no self-join).
    """
    part_struct = F.struct(
        F.col("seq"),
        F.col("legacy_id"),
        F.col("page_no"),
        F.col("tp"),
        F.col("title"),
        F.col("lg"),
    )
    agg = parts_df.groupBy("issue_id", "article_key").agg(
        F.array_sort(F.collect_list(part_struct)).alias("parts")
    )
    first = F.col("parts")[0]
    return agg.select(
        "issue_id",
        "article_key",
        F.transform(F.col("parts"), lambda p: p["legacy_id"]).alias(
            "legacy_ids"
        ),
        F.array_sort(
            F.array_distinct(
                F.transform(F.col("parts"), lambda p: p["page_no"])
            )
        ).alias("pp"),
        first["tp"].alias("tp"),
        keep_title(first["title"]).alias("title"),
        first["lg"].alias("lg"),
        F.size("parts").alias("n_parts"),
    )


def recompose_toc(
    toc_df: DataFrame, articles_df: DataFrame, images_df: DataFrame
) -> DataFrame:
    """J6 + J8: ToC entries joined to combined articles and image
    metadata; embedded images resolve ``pOf`` through the ToC itself.

    ``toc_df`` columns: issue_id, legacy_id, seq, type
    ('Article'|'Ad'|'Picture'), ci_id (pre-minted canonical id),
    page_no, embedded_into (nullable legacy id).
    ``articles_df``: output of ``combine_article_parts``.
    ``images_df``: issue_id, legacy_id, name, coords, resolution, path.
    """
    toc = toc_df.alias("toc")
    arts = articles_df.alias("a")

    art_items = (
        toc.filter(F.col("toc.type").isin("Article", "Ad"))
        .join(
            arts,
            (F.col("toc.issue_id") == F.col("a.issue_id"))
            & (F.col("toc.legacy_id") == F.col("a.legacy_ids")[0]),
            # ToC entries of non-first parts of multipart articles find no
            # match and are dropped — exactly the reference's skip
            "inner",
        )
        .select(
            F.col("toc.issue_id").alias("issue_id"),
            F.col("toc.seq").alias("seq"),
            F.col("toc.ci_id").alias("ci_id"),
            F.col("a.pp").alias("pp"),
            F.lower(F.col("a.tp")).alias("tp"),
            F.col("a.title").alias("title"),
            F.col("a.lg").alias("lg"),
            F.col("a.legacy_ids").alias("legacy_ids"),
            F.lit(None).cast("array<int>").alias("coords"),
            F.lit(None).cast("string").alias("pOf"),
        )
    )

    imgs = images_df.alias("img")
    toc_by_legacy = toc_df.select(
        F.col("issue_id").alias("c_issue_id"),
        F.col("legacy_id").alias("c_legacy_id"),
        F.col("ci_id").alias("containing_ci_id"),
    )
    img_items = (
        toc.filter(F.col("toc.type") == "Picture")
        .join(
            imgs,
            (F.col("toc.issue_id") == F.col("img.issue_id"))
            & (F.col("toc.legacy_id") == F.col("img.legacy_id")),
            "inner",  # faulty image XML → no metadata → skipped
        )
        .join(
            toc_by_legacy,
            (F.col("toc.issue_id") == F.col("c_issue_id"))
            & (F.col("toc.embedded_into") == F.col("c_legacy_id")),
            "left",
        )
        .select(
            F.col("toc.issue_id").alias("issue_id"),
            F.col("toc.seq").alias("seq"),
            F.col("toc.ci_id").alias("ci_id"),
            F.array(F.col("toc.page_no")).alias("pp"),
            F.lit("picture").alias("tp"),
            keep_title(F.col("img.name")).alias("title"),
            F.lit(None).cast("string").alias("lg"),
            F.array(F.col("toc.legacy_id")).alias("legacy_ids"),
            F.col("img.coords").alias("coords"),
            F.col("containing_ci_id").alias("pOf"),
        )
    )

    return art_items.unionByName(img_items)


def remove_section_cis(
    cis_df: DataFrame, section_members_df: DataFrame
) -> DataFrame:
    """J10/SET2: subtract CIs contained in sections (images exempt), then
    union the section CIs themselves (ref: lux/helpers.py:120-149 +
    lux/classes.py:559-571)."""
    members = section_members_df.select(
        F.col("issue_id"), F.col("member_ci_id").alias("ci_id")
    )
    kept = cis_df.filter(F.col("tp") == "image").unionByName(
        cis_df.filter(F.col("tp") != "image").join(
            members, ["issue_id", "ci_id"], "left_anti"
        )
    )
    sections = section_members_df.select(
        "issue_id", F.col("section_ci_id").alias("ci_id")
    ).distinct()
    section_rows = sections.join(
        cis_df.select("issue_id", "ci_id").distinct(),
        ["issue_id", "ci_id"],
        "left_anti",
    ).select(
        "issue_id",
        "ci_id",
        F.lit("section").alias("tp"),
        F.lit(None).cast("string").alias("title"),
    )
    return kept.select("issue_id", "ci_id", "tp", "title").unionByName(
        section_rows
    )
