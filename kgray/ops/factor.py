"""Rank-1 implicit-feedback ALS in integer fixed point — matrix
factorization whose every iterate is EXACTLY oracle-checkable.

Alternating least squares for a rank-1 model r_ci ~ u_c * v_i has
closed-form half-steps that are pure per-key aggregates over the rating
triples:

    u_c = sum_i r_ci * v_i / sum_i v_i^2      (items c observed)
    v_i = sum_c r_ci * u_c / sum_c u_c^2      (users that touched i)

Quantized to integers (factors carry a fixed scale S, the half-step is
``S^2 * num // den``), the recurrence is deterministic in ANY summation
order — integer sums commute — so a DuckDB oracle can UNROLL the same
iterations as stacked CTE layers and match bit-for-bit (the
pagerank_int / kmeans_int / EWMA family).  All operands are
non-negative (ratings are quantities, v0 = S > 0), so DuckDB's
truncating ``//`` equals numpy's floor division throughout.

Scale shape: the rating table streams; each half-step attaches the
opposite factor vector (broadcast dict under ``max_broadcast_keys``,
``joins.bucket_join`` above it or under KGRAY_FORCE_DISTRIBUTED) and
folds per-key partials batch-side before ONE aggregate-scale shuffle.
Factor tables are user-/item-key-scale, never rating-scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _half_step(r_ds, key_col: str, other_col: str, rating_col: str,
               other_tbl: pa.Table, scale: int,
               max_broadcast_keys: int):
    """One ALS half-step: new factors for ``key_col`` given the
    ``other_col`` factor table (columns: other_col, 'f')."""
    import ray

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join
    from kgray.util import gate

    s2 = scale * scale

    if other_tbl.num_rows <= gate(max_broadcast_keys):
        fmap_ref = ray.put(dict(zip(
            other_tbl[other_col].to_pylist(), other_tbl["f"].to_pylist())))

        def attach(batch: pa.Table) -> pa.Table:
            fmap = ray.get(fmap_ref)
            f = pd.Series(batch[other_col].to_pylist()).map(fmap) \
                .to_numpy(np.int64)
            return batch.append_column("f", pa.array(f))

        joined = r_ds.map_batches(attach, batch_format="pyarrow")
    else:
        import ray.data as rd

        joined = bucket_join(r_ds, rd.from_arrow(other_tbl),
                             on=other_col, how="inner")

    # user/item keys are near-unique per batch, so a per-batch combiner
    # compresses nothing and groupby.aggregate degenerates (the repo's
    # measured near-unique-key pathology) — fold inside a coarse-bucket
    # cogroup instead: one shuffle, vectorized per-bucket groupby, and
    # every key lives entirely in one bucket so the half-step finishes
    # in the same pass.
    from kgray.util import grouped_map

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        r = df[rating_col].to_numpy(np.int64)
        fv = df["f"].to_numpy(np.int64)
        # int64 fold bound (documented, not silent): per-key sums of
        # r*f stay below 2^63 for r*f ~ S * rating ~ 1e10 up to ~1e8
        # observed pairs PER KEY — far past any real user/item history
        g = pd.DataFrame({"k": df[key_col], "num": r * fv, "den": fv * fv}) \
            .groupby("k", sort=False).sum()
        # python-int multiply: S^2 * num exceeds int64 long before the
        # fold does — the division is arbitrary precision in both
        # engines (DuckDB computes it in HUGEINT)
        out = [s2 * int(n) // int(d)
               for n, d in zip(g["num"], g["den"])]
        return pd.DataFrame({key_col: g.index, "f": out}) \
            .astype({"f": np.int64})

    return grouped_map(joined, key_col, fold)


def als1(r_ds, user_col: str, item_col: str, rating_col: str,
         iters: int = 2, scale: int = 10_000,
         max_broadcast_keys: int = 2_000_000):
    """Run ``iters`` full ALS rounds (u half-step then v half-step) from
    v0 = scale; returns (user_factors, item_factors) as key-scale
    Datasets with integer column ``f``.  ``r_ds`` must be the
    pre-aggregated rating triples (user, item, integer rating >= 0) —
    callers fold duplicates first so both engines see one row per
    (user, item)."""
    from kgray.ops.agg import pre_aggregate

    r_ds = r_ds.materialize()  # read once; 2*iters passes follow
    items = pre_aggregate(
        r_ds.select_columns([item_col]), [item_col], {"n": (None, "count")}
    )

    def init(batch: pa.Table) -> pa.Table:
        return pa.table({
            item_col: batch[item_col],
            "f": pa.array(np.full(len(batch), scale, np.int64)),
        })

    v = items.map_batches(init, batch_format="pyarrow") \
        .materialize().to_arrow_refs()
    v_tbl = _concat_refs(v)
    u_tbl = None
    for _ in range(iters):
        u_tbl = _collect(_half_step(
            r_ds, user_col, item_col, rating_col, v_tbl, scale,
            max_broadcast_keys))
        v_tbl = _collect(_half_step(
            r_ds, item_col, user_col, rating_col, u_tbl, scale,
            max_broadcast_keys))
    import ray.data as rd

    return rd.from_arrow(u_tbl), rd.from_arrow(v_tbl)


def _collect(ds) -> pa.Table:
    # factor tables are key-scale (one row per user/item) — safe to hold
    return _concat_refs(ds.materialize().to_arrow_refs())


def _concat_refs(refs) -> pa.Table:
    import ray

    tbls = [t for t in ray.get(list(refs)) if t.num_rows]
    return pa.concat_tables(tbls) if tbls else None
