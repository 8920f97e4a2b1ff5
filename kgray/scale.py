"""Deterministic 10x scale-tier builder (VERDICT r3 item 2).

Replicates the driver's sf0.1 parquet tables ``factor`` times with
key-space offsets so every foreign-key relationship is preserved and
replicas never collide: replica k shifts row ids by k*1e9 and entity
ids (custkey/partkey/suppkey/user_id) by k*1e6.  Document text is
token-salted per replica (every token prefixed ``r{k}x``) so near-dup
structure within a replica is preserved while no cross-replica dup
pairs appear — output sizes then scale ~linearly and a >12x wall-time
growth at 10x data indicates a super-linear stage, not a quadratic
workload artifact.  Replica 0 is the original bytes untouched.

The build streams one (table, replica) at a time through pyarrow —
peak memory is one table copy, and the output is one parquet file per
replica (a partitioned layout a Ray read parallelizes over).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROW_OFF = 1_000_000_000  # row-id shift per replica
ENT_OFF = 1_000_000      # entity-id shift per replica

# per-table: columns shifted by ROW_OFF / ENT_OFF
_ROW_KEYS = {
    "documents": ["doc_id"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "embeddings": ["vec_id"],
}
_ENT_KEYS = {
    "events": ["user_id"],
    "orders": ["o_custkey"],
    "lineitem": ["l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
_COPY_ONCE = ["nation", "region"]


def _replica(tbl: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0:
        return tbl
    cols = {c: tbl[c] for c in tbl.column_names}
    for c in _ROW_KEYS.get(name, ()):
        cols[c] = pc.add(tbl[c], k * ROW_OFF)
    for c in _ENT_KEYS.get(name, ()):
        cols[c] = pc.add(tbl[c], k * ENT_OFF)
    if name == "documents":
        tag = f"r{k}x"
        salted = pc.binary_join_element_wise(
            pa.array([tag] * len(tbl), pa.string()),
            pc.replace_substring(tbl["text"], " ", f" {tag}"),
            "",
        )
        cols["text"] = salted
        cols["n_chars"] = pc.utf8_length(salted)
    return pa.table(cols)


def build_scale_dir(src: str, dst: str, factor: int = 10) -> str:
    """Materialize the scale tier under ``dst`` (one subdir per table,
    one file per replica).  Idempotent: a finished build (marker file)
    is reused; a partial one is rebuilt."""
    marker = os.path.join(dst, f".complete-{factor}")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    tables = sorted(
        f[:-8] for f in os.listdir(src) if f.endswith(".parquet")
    )
    for name in tables:
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        tdir = os.path.join(dst, f"{name}.parquet")
        os.makedirs(tdir, exist_ok=True)
        reps = 1 if name in _COPY_ONCE else factor
        for k in range(reps):
            out = os.path.join(tdir, f"rep-{k}.parquet")
            if not os.path.exists(out):
                pq.write_table(_replica(tbl, name, k), out)
    with open(marker, "w") as f:
        f.write("ok")
    return dst
