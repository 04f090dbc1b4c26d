"""Pure-Python text assembly semantics (ref: paper_rebuilders.py:10-174,
audio_rebuilders.py:11-84). Checks FIXTURES.md §8.3 invariants: offsets
consistent with fulltext, breaks strictly increasing, token s+l ≤ len(ft)."""

from impresso_ta.rebuild.text import (
    rebuild_audio_text,
    rebuild_text,
    rebuild_text_passim,
)
from tests.fixtures import line, para, region, token


def _regions_one_line():
    return [
        region(
            [
                para(
                    [
                        line(
                            [
                                token("Bonjour", [0, 0, 50, 10]),
                                token("monde", [55, 0, 50, 10]),
                                token(",", [105, 0, 5, 10]),
                            ]
                        )
                    ]
                )
            ],
            pOf="X-i0001",
        )
    ]


def test_basic_line_fr():
    ft, coords, offsets = rebuild_text(_regions_one_line(), "fr")
    # no space before the comma, trailing space after it (end of line adds none)
    assert ft == "Bonjour monde, "
    assert [t["s"] for t in coords["tokens"]] == [0, 8, 13]
    assert [t["l"] for t in coords["tokens"]] == [7, 5, 1]
    # line break after last token: s + len(tx)
    assert offsets["line"] == [14]
    # first region/para of a fresh string emit no break offsets
    assert offsets["region"] == [] and offsets["para"] == []


def test_hyphenation_merge():
    regions = [
        region(
            [
                para(
                    [
                        line([token("arti-", [0, 0, 40, 10], hy=True)]),
                        line(
                            [
                                token("cle", [0, 12, 30, 10], nf="article"),
                                token("fin", [35, 12, 30, 10]),
                            ]
                        ),
                    ]
                )
            ]
        )
    ]
    ft, coords, offsets = rebuild_text(regions, "fr")
    # hy token emits nothing; nf token emits the normalized form
    assert ft == "article fin "
    hy1 = coords["tokens"][0]
    assert hy1.get("hy1") is True and hy1["s"] == 0
    # hy length convention: len("arti-"[:-1]) - 1 (ref paper_rebuilders.py:60)
    assert hy1["l"] == 3
    hy2 = coords["tokens"][1]
    assert hy2.get("hy2") is True and hy2["l"] == len("article")
    # line break for hy-terminated line is at the token start
    assert offsets["line"][0] == 0


def test_cross_page_continuation():
    ft1, _, _ = rebuild_text(_regions_one_line(), "fr")
    ft2, coords2, offsets2 = rebuild_text(_regions_one_line(), "fr", ft1)
    assert ft2 == ft1 + ft1
    # continuation: region/para offsets now recorded at the seam
    assert offsets2["region"] == [len(ft1)]
    assert coords2["tokens"][0]["s"] == len(ft1)


def test_offsets_invariants():
    regions = _regions_one_line() * 3
    ft, coords, offsets = rebuild_text(regions, "fr")
    for t in coords["tokens"]:
        assert t["s"] + t["l"] <= len(ft)
    for seq in (offsets["line"], offsets["para"], offsets["region"]):
        assert seq == sorted(seq)
    # 3 regions → 2 region breaks (none at position 0)
    assert len(offsets["region"]) == 2


def test_token_without_coords_skipped():
    regions = [
        region([para([line([token("visible", [0, 0, 10, 10]), token("ghost", None)])])])
    ]
    ft, coords, _ = rebuild_text(regions, "fr")
    assert len(coords["tokens"]) == 1
    # the skipped token also contributes no text (ref paper_rebuilders.py:52)
    assert ft == "visible "


def test_passim_newlines_and_lengths():
    ft, out_regions = rebuild_text_passim(_regions_one_line(), "fr")
    assert ft == "Bonjour monde,\n"
    assert [r["start"] for r in out_regions] == [0, 8, 13]
    # lengths include the whitespace/newline that followed the token
    assert sum(r["length"] for r in out_regions) == len(ft)
    assert out_regions[0]["coords"] == {"x": 0, "y": 0, "w": 50, "h": 10}


def test_audio_text():
    sections = [
        {
            "tc": [0.0, 12.5],
            "pOf": "X-i0001",
            "u": [
                {
                    "tc": [0.0, 6.0],
                    "ss": [
                        {
                            "tc": [0.0, 6.0],
                            "t": [
                                {"tx": "bonjour", "tc": [0.0, 0.8]},
                                {"tx": "à", "tc": [0.9, 0.2]},
                                {"tx": "tous", "tc": [1.2, 0.5]},
                            ],
                        }
                    ],
                }
            ],
        }
    ]
    ft, coords, offsets = rebuild_audio_text(sections, "fr")
    assert ft == "bonjour à tous "
    assert offsets["speech_seg"] == [len("bonjour à tous")]
    assert coords["sections"] == [[0.0, 12.5]]
    assert [t["s"] for t in coords["tokens"]] == [0, 8, 10]
