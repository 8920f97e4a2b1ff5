"""Small Dataset utilities shared across ops."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def force_distributed() -> bool:
    """True when ``KGRAY_FORCE_DISTRIBUTED`` is set (and not "0"): every
    small-side gate in the engine collapses to 0 so the DISTRIBUTED
    fallback path always runs — the CI mode that oracle-checks the
    100-TB code paths end-to-end instead of only via paths-agree unit
    tests (``scripts/check_correctness.py --forced``)."""
    import os

    return os.environ.get("KGRAY_FORCE_DISTRIBUTED", "") not in ("", "0")


def gate(threshold):
    """Resolve a small-side gate threshold: under KGRAY_FORCE_DISTRIBUTED
    every gate collapses to 0 (the in-process/broadcast shortcut never
    fires and the partitioned path runs), otherwise the given threshold
    stands.  Call it INSIDE the op on the resolved parameter so the env
    knob also overrides explicitly-passed values."""
    return 0 if force_distributed() else threshold


def round_half_up(x, digits: int = 4):
    """Round half-away-from-zero, matching SQL ROUND (numpy/python round
    is half-even and flips x.xxx5 boundary values vs DuckDB)."""
    scale = 10.0 ** digits
    arr = np.asarray(x, np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def bucket_of(col, num_buckets: int) -> np.ndarray:
    """Deterministic hash buckets for an Arrow column (int: Fibonacci
    multiplicative hash; other types: pandas' vectorized siphash —
    cross-process deterministic, so every map task sends a key to the
    same bucket).  Runs on every row entering a cogroup/bucket-join
    shuffle: must never be a per-row python loop."""
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # unsigned keys (e.g. rolling-hash windows) overflow an int64
        # cast; both lanes land in the same uint64 domain either way
        wide = pa.uint64() if pa.types.is_unsigned_integer(col.type) \
            else pa.int64()
        k = col.cast(wide).to_numpy(zero_copy_only=False).astype(np.uint64)
        return ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)).astype(
            np.int64
        ) % num_buckets
    h = pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def bucket_of_multi(batch: pa.Table, key_cols: list[str],
                    num_buckets: int) -> np.ndarray:
    """Composite-key hash buckets: pandas' vectorized row hash over the
    normalized key columns (ints widened to int64 so an int32 key on one
    join side lands in the same bucket as its int64 twin).  Same
    cross-process-determinism contract as ``bucket_of``."""
    import pandas as pd

    norm = {}
    for c in key_cols:
        col = batch[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            col = col.cast(pa.int64())
        norm[c] = col.to_pandas()
    h = pd.util.hash_pandas_object(
        pd.DataFrame(norm), index=False
    ).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def default_num_buckets() -> int:
    """Shuffle-parallelism default: one bucket per cluster CPU, floor 32.
    A fixed 32 caps shuffle parallelism at 32 workers AND makes bucket
    size grow linearly with data on a bigger cluster — scaling with
    cluster width keeps one bucket ~one worker's heap as nodes are added.
    (Not 2x CPUs: each extra bucket adds all-to-all fixed cost, measured
    +18% suite wall at 32 cpus/sf0.1 for zero tiny-scale benefit.)"""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 16)) if (
            ray.is_initialized()
        ) else 16
    except Exception:
        cpus = 16
    return max(32, cpus)


# bundle target for grouped_map's tiny-block coalescing: small enough
# that a bundle of KB-scale text rows stays well under a worker's heap
# (16384 x 4 KB = 64 MB), large enough to collapse tiny-block storms
_COALESCE_BATCH_ROWS = 16384


def grouped_map(ds, key: str, fn, num_buckets: int | None = None,
                drop_key_bucket=True, coalesce: bool = True):
    """Coarse-bucket cogroup: hash ``key`` into ``num_buckets`` buckets,
    ONE groupby shuffle on the bucket, and ``fn`` (pandas DataFrame ->
    pandas DataFrame) applied once per BUCKET — the caller vectorizes its
    own per-key grouping inside (``df.groupby(key)`` in C).

    Rationale: ``Dataset.groupby(key).map_groups`` pays per-group python +
    block-conversion overhead; with 10^4+ tiny groups (shingles, band
    keys, graph nodes) that dominates wall time by 100x.  All rows of a
    key land in one bucket, so any per-key computation stays correct;
    ``num_buckets`` is the parallelism/skew knob (same sizing rule as a
    partitioned join) and defaults to ``default_num_buckets()`` (scales
    with cluster CPUs).
    """
    import pandas as pd

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def apply(g: pd.DataFrame):
        if "__gbucket" in g.columns:
            g = g.drop(columns="__gbucket")
        out = fn(g)
        # emit ARROW blocks: any downstream sort/groupby over pandas blocks
        # is ~12x slower (measured 7.6s vs 0.6s on a 14k-row aggregate).
        # Strip the pandas schema metadata: its dict payload makes the
        # schema unhashable and Ray's block-schema dedup then warns
        # "Failed to hash the schemas" on every such block
        if isinstance(out, pd.DataFrame):
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)
        return out

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__gbucket", pa.array(bucket_of(batch[key], num_buckets))
        )

    # coalesce tiny blocks first: the sort barrier's fixed cost scales
    # with map_blocks x reduce_partitions (measured: 6.8s -> sub-second
    # on 64-tiny-block inputs).  Done by BUNDLING the tag map
    # (batch_size merges adjacent small blocks inside the streaming
    # executor: 256 tiny blocks -> 4, zero extra stage) — NOT by
    # repartition(), which is a second full all-to-all that also
    # force-materializes the whole input in the object store before the
    # sort's own shuffle (2x data movement at scale).  Callers whose
    # input is ALREADY coarse (e.g. an iterative loop re-consuming
    # materialized num_buckets-block outputs) pass coalesce=False to
    # keep one-batch-per-block; when the input is materialized with few
    # blocks the skip is automatic (num_blocks() raises on lazy
    # datasets — those keep the caller's choice).
    if coalesce:
        try:
            coalesce = ds.num_blocks() > num_buckets
        except Exception:
            pass
    tag_kwargs = {"batch_size": _COALESCE_BATCH_ROWS} if coalesce else {}
    tagged = ds.map_batches(tag, batch_format="pyarrow", **tag_kwargs)
    return tagged.groupby("__gbucket").map_groups(apply, batch_format="pandas")


def pairs_within_groups(df, key: str, val: str, max_block: int,
                        dtype: str = "int64", key_out: str | None = None):
    """All unordered pairs (u < v) of distinct ``val`` within each ``key``
    group of ``df`` — the inner kernel for LSH-block / shingle-block pair
    generation.  Groups larger than ``max_block`` are skipped (degenerate
    blocks).  Returns a DataFrame (u, v) with ``dtype`` columns; when
    ``key_out`` is set a third column carries each pair's group key (the
    wedge CENTER for per-node triangle counting).
    Python loops only over groups with >= 2 members; members drive numpy
    repeat, so cost tracks emitted pairs, not input rows.
    """
    import pandas as pd

    sub = df[[key, val]].drop_duplicates()
    sizes = sub.groupby(key, sort=False)[val].transform("size")
    sub = sub[(sizes >= 2) & (sizes <= max_block)]
    us, vs, ks = [], [], []
    for k, g in sub.groupby(key, sort=False):
        members = np.sort(g[val].to_numpy())
        n = len(members)
        iu = np.repeat(np.arange(n), n - np.arange(n) - 1)
        jv = np.concatenate([np.arange(i + 1, n) for i in range(n)])
        us.append(members[iu])
        vs.append(members[jv])
        if key_out is not None:
            ks.append(np.full(len(iu), k))
    if us:
        out = pd.DataFrame(
            {
                "u": pd.array(np.concatenate(us), dtype=dtype),
                "v": pd.array(np.concatenate(vs), dtype=dtype),
            }
        )
        if key_out is not None:
            out[key_out] = np.concatenate(ks)
        return out
    out = pd.DataFrame(
        {"u": pd.array([], dtype=dtype), "v": pd.array([], dtype=dtype)}
    )
    if key_out is not None:
        out[key_out] = np.array([], dtype=df[key].dtype)
    return out


def rename_cols(ds, mapping: dict[str, str]):
    """Rename columns via a pyarrow map_batches.

    ``Dataset.rename_columns`` projects over raw blocks and breaks when a
    block is pandas (e.g. downstream of ``map_groups(batch_format=
    "pandas")``); forcing Arrow batches here is shape-safe everywhere.
    """

    def apply(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )

    return ds.map_batches(apply, batch_format="pyarrow")
