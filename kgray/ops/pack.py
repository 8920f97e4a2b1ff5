"""Sequence packing for LLM training: concat-and-chunk stream offsets.

The standard GPT-style packing concatenates every document's tokens in a
fixed global order and slices the stream every ``chunk`` tokens; a doc's
bin is therefore determined by its exclusive prefix sum of token counts.
This module computes that prefix sum DISTRIBUTED:

1. split the (unique, numeric) order key into R equal-width ranges from a
   cheap min/max aggregate (R scales with cluster width; equal-width is
   documented skew risk — ids clustered into one range serialize in one
   bucket, same partitioning assumption as any per-key window);
2. pass 1 folds sum(len) per range (R-row aggregate -> driver exclusive
   scan -> broadcast base offsets — metadata-scale, never rows);
3. pass 2 cogroups each range's rows once, sorts by the key and cumsums
   inside the bucket (vectorized), adding the range's base.

Two corpus reads, one cogroup shuffle, O(R) driver state.  Semantics are
pinned to a SQL window so oracles can replay them bit-for-bit:
start = SUM(n_tokens) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING AND 1
PRECEDING), bin = start // chunk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _add_range(batch: pa.Table, key: str, lo: int, width: int,
               n_ranges: int) -> np.ndarray:
    ids = batch[key].to_numpy(zero_copy_only=False)
    return np.minimum((ids - lo) // max(width, 1), n_ranges - 1).astype(
        np.int64
    )


def stream_offsets(ds, key: str = "doc_id", len_col: str = "n_tokens",
                   chunk: int = 512, n_ranges: int | None = None):
    """Per-row exclusive prefix sum of ``len_col`` in ``key`` order, plus
    the concat-and-chunk bin (``start // chunk``).  ``key`` must be
    unique and numeric; ``len_col`` must already exist (attach it with a
    tokenizing map first so this op stays schema-agnostic).

    Returns a Dataset of (key, len_col, start, bin).
    """
    import ray
    from ray.data.aggregate import Sum

    from kgray.util import default_num_buckets, grouped_map

    if n_ranges is None:
        n_ranges = default_num_buckets()
    from ray.data.aggregate import Max, Min

    bounds = ds.aggregate(Min(key), Max(key))  # one pass, not two
    lo = int(bounds[f"min({key})"])
    hi = int(bounds[f"max({key})"])
    width = max((hi - lo) // n_ranges + 1, 1)

    def range_partial(batch: pa.Table) -> pa.Table:
        rng = _add_range(batch, key, lo, width, n_ranges)
        lens = batch[len_col].to_numpy(zero_copy_only=False)
        sums = np.bincount(rng, weights=lens, minlength=n_ranges)
        nz = np.nonzero(sums)[0]
        return pa.table(
            {
                "rng": pa.array(nz, pa.int64()),
                "s": pa.array(sums[nz].astype(np.int64)),
            }
        )

    per_range = (
        ds.map_batches(range_partial, batch_format="pyarrow")
        .groupby("rng")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()  # R rows — metadata-scale
    )
    totals = np.zeros(n_ranges, np.int64)
    totals[per_range["rng"].to_numpy()] = per_range["s"].to_numpy()
    base = np.zeros(n_ranges, np.int64)
    np.cumsum(totals[:-1], out=base[1:])  # exclusive scan over ranges
    base_ref = ray.put(base)

    def tag_range(batch: pa.Table) -> pa.Table:
        rng = _add_range(batch, key, lo, width, n_ranges)
        return pa.table(
            {
                key: batch[key],
                len_col: batch[len_col],
                "rng": pa.array(rng),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        df = df.sort_values([("rng"), key], kind="mergesort",
                            ignore_index=True)
        lens = df[len_col].to_numpy(np.int64)
        csum = np.zeros(len(df), np.int64)
        np.cumsum(lens[:-1], out=csum[1:])
        # reset the running sum at each range boundary, then add its base
        rng = df["rng"].to_numpy(np.int64)
        first = np.zeros(len(df), bool)
        first[0] = True
        first[1:] = rng[1:] != rng[:-1]
        range_start = np.maximum.accumulate(np.where(first, csum, 0))
        start = csum - range_start + b[rng]
        return pd.DataFrame(
            {
                key: df[key].to_numpy(),
                len_col: lens,
                "start": start,
                "bin": start // chunk,
            }
        )

    tagged = ds.map_batches(tag_range, batch_format="pyarrow")
    return grouped_map(tagged, "rng", per_bucket)
