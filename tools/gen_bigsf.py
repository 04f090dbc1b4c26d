"""Generate a larger scale factor by replicating sf0.1 with key offsets.

No network in this environment (DuckDB's tpch extension can't download),
so sf1 is synthesized as ``copies`` referential-integrity-preserving
clones of sf0.1: every key column (and every foreign key referencing it)
is offset by ``copy_index * max(key)``, so joins land exactly as in the
source and per-key group sizes stay constant (no artificial skew).
Copy 0 is the identity — sf0.1 is a subset of the output.

Details that matter for benchmarking:

- ``region``/``nation`` are fixed-size dimensions in TPC-H at every SF —
  copied verbatim.
- ``documents.text`` gets a per-copy prefix token (``c1 `` … ``c9 ``) so
  shingle-based dedup doesn't see 10x exact duplicates (which would
  explode candidate pairs and bench the pathological case, not scale).
- ``embeddings`` vectors are replicated unchanged: duplicate vectors are
  cosine ties broken deterministically by id, which is fine for
  throughput benching.
- ``events`` keeps its timestamp[ns] physical type (pyarrow preserves
  the source schema; the readers' nanos handling stays exercised), and
  offsets both event_id and user_id — 10x users, same per-user volume.
- Output parquet uses ~128k-row row groups: Spark splits scans at row
  group granularity, and a single-row-group file (like the tiny source
  SFs) serializes the whole scan onto one core.

Usage: python tools/gen_bigsf.py [src_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROW_GROUP = 128 * 1024

# table -> {column: key_space} ; every column sharing a key_space gets the
# same per-copy offset (copy_index * max_of_that_key_space_in_source)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event", "user_id": "user"},
}

KEY_SOURCE = {  # key_space -> (table, column) to take max() from
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
}

COPY_VERBATIM = ["region", "nation"]


def _max_keys(src: str) -> dict[str, int]:
    out = {}
    for space, (table, col) in KEY_SOURCE.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        out[space] = pc.max(t.column(0)).as_py()
    return out


def _clone(table_name: str, t: pa.Table, i: int, maxes: dict[str, int]) -> pa.Table:
    if i == 0:
        return t
    cols = {}
    for name in t.column_names:
        col = t.column(name)
        space = KEYED.get(table_name, {}).get(name)
        if space:
            col = pc.add(col, pa.scalar(i * maxes[space], type=col.type))
        cols[name] = col
    if table_name == "documents":
        prefix = f"c{i} "
        n = len(t)
        cols["text"] = pc.binary_join_element_wise(
            pa.array([prefix] * n), cols["text"], ""
        )
        cols["n_chars"] = pc.add(cols["n_chars"], len(prefix))
    return pa.table(cols, schema=None).cast(t.schema)


def generate(src: str, out: str, copies: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    maxes = _max_keys(src)
    for name in COPY_VERBATIM:
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(out, f"{name}.parquet"),
        )
    for name in KEYED:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        dest = os.path.join(out, f"{name}.parquet")
        # One standard ROW_GROUP per copy for every table, documents
        # included. The r3 experiment with 1024-row documents groups
        # (fan scan-fused fold work out at row-group granularity) was
        # A/B'd in one session (tools/ab_pipeline.py, PLANS.md §7) and
        # measured SLOWER (3-8% across text_quality/repetition/minhash/
        # pipeline) — per-group metadata overhead beats the extra
        # parallelism here, and the standard layout is what real corpus
        # parquet looks like, keeping bench numbers round-comparable.
        with pq.ParquetWriter(dest, t.schema) as w:
            for i in range(copies):
                w.write_table(
                    _clone(name, t, i, maxes), row_group_size=ROW_GROUP
                )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf1")
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, copies)
    print(f"wrote {out} ({copies}x {src})")
