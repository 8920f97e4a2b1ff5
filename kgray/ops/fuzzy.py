"""Fuzzy string matching for blocked entity-resolution joins.

``levenshtein_batch`` is a vectorized edit-distance kernel: the classic
row-DP runs as O(maxlen^2) VECTOR operations across all pairs at once
(no per-pair python), which is the right shape for the bounded-length
name/alias strings a blocking key groups together.  Parity with
DuckDB's ``levenshtein()`` is test-pinned against a brute python DP.
"""

from __future__ import annotations

import numpy as np


def _encode(strings, width: int, pad: int) -> np.ndarray:
    out = np.full((len(strings), max(width, 1)), pad, np.int32)
    for i, s in enumerate(strings):
        b = np.frombuffer(s.encode("utf-8"), np.uint8)
        out[i, : len(b)] = b
    return out


def levenshtein_batch(a_list, b_list) -> np.ndarray:
    """Edit distance for each aligned pair (a_list[i], b_list[i]).

    Byte-level (exact for ASCII, consistent either way as long as both
    engines see the same encoding).  DP rows sweep i over the longest
    left string; each pair's answer is harvested the moment i reaches
    its own length, so padding never leaks into a result.
    """
    n = len(a_list)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.fromiter((len(s.encode()) for s in a_list), np.int64, n)
    lb = np.fromiter((len(s.encode()) for s in b_list), np.int64, n)
    La, Lb = int(la.max()), int(lb.max())
    A = _encode(a_list, La, -1)
    B = _encode(b_list, Lb, -2)

    prev = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    result = np.empty(n, np.int64)
    done0 = la == 0
    result[done0] = lb[done0]
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        hit = la == i
        if hit.any():
            result[hit] = cur[hit, lb[hit]]
        prev = cur
    return result
