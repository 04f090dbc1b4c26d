"""Fuzz the error channel: randomly corrupted issue inputs must NEVER
crash an import — bad records become error rows (the reference's
continue-past-failures invariant, ref core.py:110-179), and every
discovered issue is accounted for as either imported or errored."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from impresso_ta.importers import import_issues
from impresso_ta.schemas import DISCOVERY_SCHEMA
from tests.test_importer_mets_alto import ALTO_PAGE, METS


def _corrupt(data: bytes, rng: random.Random, n_mutations: int) -> bytes:
    out = bytearray(data)
    for _ in range(n_mutations):
        kind = rng.randrange(3)
        if kind == 0 and out:  # flip a byte
            out[rng.randrange(len(out))] = rng.randrange(256)
        elif kind == 1 and len(out) > 10:  # delete a slice
            i = rng.randrange(len(out) - 8)
            del out[i : i + rng.randrange(1, 8)]
        else:  # truncate
            del out[len(out) // 2 :]
    return bytes(out)


@given(seed=st.integers(0, 10**6), n_mutations=st.integers(1, 12))
@settings(max_examples=10, deadline=None)
def test_corrupted_mets_alto_never_crashes(spark, tmp_path_factory, seed, n_mutations):
    rng = random.Random(seed)
    base = tmp_path_factory.mktemp(f"fuzz{seed}")
    from datetime import date

    rows = []
    for day, corrupt_what in (("02", "mets"), ("03", "page"), ("04", None)):
        d = base / "GAZ" / "1900" / "01" / day
        (d / "text").mkdir(parents=True)
        mets, page = METS.encode(), ALTO_PAGE.encode()
        if corrupt_what == "mets":
            mets = _corrupt(mets, rng, n_mutations)
        elif corrupt_what == "page":
            page = _corrupt(page, rng, n_mutations)
        (d / "issue-mets.xml").write_bytes(mets)
        (d / "text" / "0001.xml").write_bytes(page)
        rows.append(("GAZ", date(1900, 1, int(day)), "a", str(d), "mets_alto"))

    disc = spark.createDataFrame(rows, DISCOVERY_SCHEMA)
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")  # must not raise
    ok_ids = {r["id"] for r in res.issues.select("id").collect()}
    err_paths = [r["canonical_path"] for r in res.errors.collect()]
    # the clean issue always imports
    assert "GAZ-1900-01-04-a" in ok_ids
    # every discovered issue is either imported or accounted for in the
    # error channel (corruption may still parse by luck — that's fine)
    for iid in ("GAZ-1900-01-02-a", "GAZ-1900-01-03-a"):
        imported = iid in ok_ids
        errored = any(iid in p for p in err_paths)
        assert imported or errored, (iid, ok_ids, err_paths)
