"""Olive/Lux recomposition operators (J6/J7/J8, J10/SET2, F8)."""

import pytest
from pyspark.sql import Row

from impresso_ta.operators.recompose import (
    combine_article_parts,
    recompose_toc,
    remove_section_cis,
)


@pytest.fixture(scope="module")
def recomposed(spark):
    parts = spark.createDataFrame(
        [
            # article spanning two pages: two parts, metadata from part 1
            Row(issue_id="I1", article_key="Ar001", legacy_id="Ar001",
                seq=1, page_no=1, tp="Article", title="Grand titre", lg="fr"),
            Row(issue_id="I1", article_key="Ar001", legacy_id="Ar001b",
                seq=2, page_no=2, tp="Article", title="WRONG", lg="de"),
            # single-part ad with a blacklisted title
            Row(issue_id="I1", article_key="Ad001", legacy_id="Ad001",
                seq=3, page_no=1, tp="Ad", title="untitled ad", lg="fr"),
        ]
    )
    articles = combine_article_parts(parts)

    toc = spark.createDataFrame(
        [
            Row(issue_id="I1", legacy_id="Ar001", seq=1, type="Article",
                ci_id="I1-i0001", page_no=1, embedded_into=None),
            # second part of the multipart article: must vanish
            Row(issue_id="I1", legacy_id="Ar001b", seq=2, type="Article",
                ci_id="I1-i0002", page_no=2, embedded_into=None),
            Row(issue_id="I1", legacy_id="Ad001", seq=3, type="Ad",
                ci_id="I1-i0003", page_no=1, embedded_into=None),
            # picture embedded into the article
            Row(issue_id="I1", legacy_id="Pc001", seq=4, type="Picture",
                ci_id="I1-i0004", page_no=2, embedded_into="Ar001"),
            # picture with faulty/missing image XML: must vanish
            Row(issue_id="I1", legacy_id="Pc002", seq=5, type="Picture",
                ci_id="I1-i0005", page_no=2, embedded_into=None),
        ]
    )
    images = spark.createDataFrame(
        [
            Row(issue_id="I1", legacy_id="Pc001", name="La photo",
                coords=[10, 20, 30, 40], resolution=300, path="img/Pc001.png"),
        ]
    )
    return articles, recompose_toc(toc, articles, images)


def test_combine_article_parts(recomposed):
    articles, _ = recomposed
    rows = {r["article_key"]: r.asDict() for r in articles.collect()}
    ar = rows["Ar001"]
    # metadata from FIRST part (by seq); pages flattened
    assert ar["title"] == "Grand titre" and ar["lg"] == "fr"
    assert ar["pp"] == [1, 2]
    assert ar["legacy_ids"] == ["Ar001", "Ar001b"]
    assert ar["n_parts"] == 2
    # blacklisted title nulled (F8)
    assert rows["Ad001"]["title"] is None


def test_recompose_toc(recomposed):
    _, cis = recomposed
    rows = {r["ci_id"]: r.asDict() for r in cis.collect()}
    # multipart second entry and faulty picture dropped
    assert set(rows) == {"I1-i0001", "I1-i0003", "I1-i0004"}
    art = rows["I1-i0001"]
    assert art["pp"] == [1, 2] and art["tp"] == "article"
    pic = rows["I1-i0004"]
    assert pic["coords"] == [10, 20, 30, 40]
    assert pic["pOf"] == "I1-i0001"  # embedded → containing article (J8)
    assert pic["title"] == "La photo"


def test_remove_section_cis(spark):
    cis = spark.createDataFrame(
        [
            Row(issue_id="I1", ci_id="I1-i0001", tp="article", title="A"),
            Row(issue_id="I1", ci_id="I1-i0002", tp="article", title="B"),
            Row(issue_id="I1", ci_id="I1-i0003", tp="image", title="C"),
        ]
    )
    members = spark.createDataFrame(
        [
            # both the article AND the image are section members; image
            # is exempt from removal (the lux carve-out)
            Row(issue_id="I1", section_ci_id="I1-i0100",
                member_ci_id="I1-i0002"),
            Row(issue_id="I1", section_ci_id="I1-i0100",
                member_ci_id="I1-i0003"),
        ]
    )
    out = {r["ci_id"]: r.asDict() for r in remove_section_cis(cis, members).collect()}
    assert set(out) == {"I1-i0001", "I1-i0003", "I1-i0100"}
    assert out["I1-i0100"]["tp"] == "section"
