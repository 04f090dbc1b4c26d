"""Fuzzy location (X11), Olive line normalization (X3), API detect (S4)."""

from datetime import date

from pyspark.sql import Row

from impresso_ta.importers.olive_text import (
    merge_pseudo_tokens,
    normalize_hyphenation,
    normalize_line,
)
from impresso_ta.operators.fuzzy import fuzzy_locate
from impresso_ta.sources.discovery import detect_issues_from_api


def test_fuzzy_locate(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Bericht über die Bundesversammlung von gestern",
                needle="Bundesversammlung"),
            Row(doc_id=2, text="Bericht über die Bnndesversammlung von gestern",
                needle="Bundesversammlung"),  # 1 OCR error
            Row(doc_id=3, text="völlig anderer Inhalt ohne Treffer",
                needle="Bundesversammlung"),
            Row(doc_id=4, text="kein Titel gesucht", needle=None),
        ]
    )
    rows = {r["doc_id"]: r.asDict() for r in fuzzy_locate(df, max_errors=2).collect()}
    assert rows[1]["n_errors"] == 0 and rows[1]["matched"] == "Bundesversammlung"
    assert rows[1]["start"] == 17
    assert rows[2]["n_errors"] == 1 and rows[2]["matched"] == "Bnndesversammlung"
    assert rows[3]["start"] is None  # beyond max_errors → no match
    assert rows[4]["start"] is None  # no needle


def test_merge_pseudo_tokens():
    line = {
        "t": [
            {"tx": "prix", "c": [0, 0, 30, 10], "s": 1},
            {"tx": "fixe", "c": [35, 0, 30, 10], "s": 1, "qid": "q1"},
            {"tx": "ment", "c": [70, 0, 30, 10], "s": 2, "qid": "q1"},
            {"tx": "fin", "c": [105, 0, 20, 10], "s": 1, "qid": "q2"},  # single
        ]
    }
    out = merge_pseudo_tokens(line)
    txs = [t["tx"] for t in out["t"]]
    assert txs == ["prix", "fixement", "fin"]
    merged = out["t"][1]
    # coords: first's (x,y) + last's (w,h); style from first (ref semantics)
    assert merged["c"] == [35, 0, 30, 10]
    assert merged["s"] == 1
    # single-occurrence qid untouched (continues on next line)
    assert out["t"][2].get("qid") == "q2"


def test_normalize_hyphenation_merges_bare_dash():
    line = {
        "t": [
            {"tx": "selon", "c": [0, 0, 30, 10], "s": 1},
            {"tx": "com", "c": [35, 0, 25, 10], "s": 1},
            {"tx": "-", "c": [60, 0, 5, 10], "s": 1, "nf": "commune"},
        ]
    }
    out = normalize_hyphenation(line)
    assert [t["tx"] for t in out["t"]] == ["selon", "com-"]
    tail = out["t"][-1]
    assert tail["hy"] is True and tail["nf"] == "commune"
    assert tail["c"] == [35, 0, 5, 10]


def test_normalize_line_gn_flags():
    line = {
        "t": [
            {"tx": "(", "c": [0, 0, 5, 10], "s": 1},
            {"tx": "prix", "c": [6, 0, 30, 10], "s": 1},
            {"tx": ",", "c": [40, 0, 4, 10], "s": 1},
            {"tx": "fixe", "c": [50, 0, 30, 10], "s": 1},
        ]
    }
    out = normalize_line(line, "fr")
    gn = [t.get("gn") for t in out["t"]]
    # "(" glues to next; "prix" glues (comma follows); "," spaces; "fixe"
    # is last (no next) → whitespace rules say space
    assert gn == [True, True, None, None]


def test_detect_issues_from_api(spark):
    def fake_gallica():
        return [
            {"alias": "EXP", "date": "1902-07-14", "edition": "a",
             "path": "https://gallica.example/ark:/1/issue1"},
            {"alias": "EXP", "date": date(1902, 7, 15),
             "path": "https://gallica.example/ark:/1/issue2"},
        ]

    disc = detect_issues_from_api(spark, fake_gallica, "bnf_en")
    rows = sorted(
        (str(r["date"]), r["edition"], r["format"]) for r in disc.collect()
    )
    assert rows == [
        ("1902-07-14", "a", "bnf_en"),
        ("1902-07-15", "a", "bnf_en"),
    ]
