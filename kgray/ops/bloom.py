"""Distributed Bloom filter — the big-big semi/anti-join pre-filter.

Above the broadcast gate, ``joins.semi_join`` cogroups BOTH sides: every
left row shuffles even though most match nothing (anti) or the match
test needs only set membership (semi).  A Bloom filter of the right key
set is a few MB regardless of key count, so it broadcasts at any scale;
probing it inside ``map_batches`` splits the left into rows the filter
REJECTS (definitively absent from the right — no false negatives) and
candidate rows that continue to the exact path.  Only candidates pay the
shuffle; false positives are corrected by the exact residual join, so
results stay exact at any FP rate.

Build shape mirrors the HLL sketch: each batch sets bits in a local word
array and emits its nonzero (word index, word) rows — at most
min(k * rows, n_bits/64) per batch — and ONE coarse-bucket cogroup
OR-folds them (``np.bitwise_or.reduceat`` per bucket).  The build needs
no distinct pass: duplicate keys just re-set the same bits.  Hashing is
deterministic (splitmix64 / md5 via ``sketch._hash_column``), so the
filter is a pure function of the key set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kgray.ops.sketch import _hash_column, splitmix64


def _norm(col):
    """Width-normalize before hashing: an int32 left probing an int64
    right must hash negatives identically (two's-complement widths
    diverge under a raw uint64 view)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.cast(pa.int64())
    return col


def _probes(h: np.ndarray, n_bits: int, k: int):
    """k double-hashed bit positions per input hash: pos_i = (h1 + i*h2)
    mod n_bits, h2 forced odd so probe sequences cover the table.
    ``n_bits`` must be a power of two (mask instead of modulo)."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    mask = np.uint64(n_bits - 1)
    h1 = h
    h2 = splitmix64(h ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
    with np.errstate(over="ignore"):
        return [((h1 + np.uint64(i) * h2) & mask) for i in range(k)]


def build_bloom(ds, col: str, n_bits: int = 1 << 24, k: int = 4) -> np.ndarray:
    """Build the filter over ``ds[col]`` -> dense uint64 word array of
    length n_bits/64 (driver-resident: n_bits/8 bytes — 2 MB at the
    default 2^24, sized for ~2M keys at ~3% FP; scale n_bits with the
    expected key count, e.g. from an HLL estimate)."""
    from kgray.util import grouped_map

    n_words = n_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_column(_norm(batch[col]))
        words = np.zeros(n_words, np.uint64)
        for pos in _probes(h, n_bits, k):
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        nz = np.nonzero(words)[0]
        return pa.table(
            {
                "idx": pa.array(nz.astype(np.int64), pa.int64()),
                "word": pa.array(words[nz], pa.uint64()),
            }
        )

    def orfold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("idx", kind="mergesort")
        idx = df["idx"].to_numpy(np.int64)
        w = df["word"].to_numpy(np.uint64)
        starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        return pd.DataFrame(
            {"idx": idx[starts], "word": np.bitwise_or.reduceat(w, starts)}
        )

    folded = grouped_map(
        ds.map_batches(partial, batch_format="pyarrow"), "idx", orfold
    ).to_pandas()  # <= n_bits/64 rows — filter-scale, never data-scale
    words = np.zeros(n_words, np.uint64)
    if len(folded):
        words[folded["idx"].to_numpy(np.int64)] = (
            folded["word"].to_numpy(np.uint64)
        )
    return words


def bloom_mask(col, words: np.ndarray, k: int = 4) -> np.ndarray:
    """Boolean candidate mask for an Arrow column: True = possibly in the
    built set (False is definitive absence)."""
    n_bits = len(words) * 64
    h = _hash_column(_norm(col))
    out = np.ones(len(h), bool)
    for pos in _probes(h, n_bits, k):
        bit = (
            words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        out &= bit.astype(bool)
    return out
