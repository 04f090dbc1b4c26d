"""Local correctness harness mimicking the driver's DuckDB-oracle check.

For every entry in __spark_entry__.queries(): run the Spark query and the
oracle SQL at the same sf, compare row count, schema (column names), and an
order-insensitive value hash. Usage:

    python tools/check.py [--json OUT.json] [sf_dir] [query ...]

--json additionally writes one record per query (same fields as the
driver's CORRECTNESS_r{N}.json rows) so full-catalog runs are a committed,
judge-readable artifact — the driver snapshot samples ~50 of the catalog;
this covers the rest.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from impresso_ta.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            records[name] = {"err": f"spark: {exc}"[:300]}
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{t1-t0:.1f}s]")
            if len(srows) == 0:
                print(f"  WARN {name}: empty result")
            records[name] = {
                "rows_only": True,
                "spark_rows": len(srows),
                "err": None,
            }
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            records[name] = {"err": f"oracle: {exc}"[:300]}
            failures += 1
            continue
        schema_ok = sorted(scols) == sorted(ocols)
        count_ok = len(srows) == len(orows)
        hash_ok = (
            schema_ok
            and count_ok
            and table_hash(srows, scols) == table_hash(orows, ocols)
        )
        status = "OK   " if (schema_ok and count_ok and hash_ok) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        records[name] = {
            "rows_match": count_ok,
            "schema_match": schema_ok,
            "hash_match": hash_ok,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} "
            f"schema={'Y' if schema_ok else 'N'} hash={'Y' if hash_ok else 'N'} "
            f"[{t1-t0:.1f}s]"
        )
        if not schema_ok:
            print(f"  spark cols:  {sorted(scols)}")
            print(f"  oracle cols: {sorted(ocols)}")
        elif not hash_ok and count_ok:
            # show first differing row pair for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted(
                "\x1f".join(normalize(r[i]) for i in order) for r in srows
            )
            oset = sorted(
                "\x1f".join(normalize(r[i]) for i in order) for r in orows
            )
            for a, b in zip(sset, oset):
                if a != b:
                    print(f"  spark : {a[:200]}")
                    print(f"  oracle: {b[:200]}")
                    break
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n": len(records), "failures": failures,
                 "queries": records},
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
