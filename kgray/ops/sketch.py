"""Distributed cardinality sketch (HyperLogLog).

Exact distinct counting shuffles every distinct key
(``queries.q_events_distinct_users``); at 100 TB an approximate answer
within ~1% is usually wanted instead, and HLL gets it by shuffling only
REGISTER rows: each batch folds its values into m = 2^p max-rho
registers locally (numpy), the shuffle moves at most m rows per batch,
and a Max-groupby merges them — the classic combiner shape, with the
driver touching only the m-row register table.

Hashing is deterministic (splitmix64 for integer columns — vectorized in
numpy; md5 low-64 for strings), so the estimate is a pure function of
the value set: stable under retries, resumes and block order.
Flajolet et al.'s bias-corrected estimator with the small-range
linear-counting correction; standard error ~= 1.04/sqrt(m) (~0.8% at
p=14).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed 64-bit hash for
    integer keys (public-domain constants)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if pa.types.is_integer(col.type):
        return splitmix64(col.to_numpy(zero_copy_only=False))
    vals = col.to_pylist()
    out = np.empty(len(vals), np.uint64)
    for i, v in enumerate(vals):  # string path: md5 releases to C per call
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:8], "little"
        )
    return out


def _registers(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per hash: idx = top p bits, rho = leading
    zeros of the remaining 64-p bits + 1."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    x = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # leading zeros via floor(log2) per 32-bit half: both halves stay
    # under 2^32 << 2^53, so the float64 log2 is exact for the floor
    hi = (x >> np.uint64(32)).astype(np.int64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.int64)
    lz_hi = 31 - np.floor(
        np.log2(np.maximum(hi, 1).astype(np.float64))
    ).astype(np.int64)
    lz_lo = 31 - np.floor(
        np.log2(np.maximum(lo, 1).astype(np.float64))
    ).astype(np.int64)
    rho = np.where(hi != 0, lz_hi, 32 + lz_lo) + 1
    return idx, rho


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected HLL estimate from the dense register array.

    The harmonic sum is computed EXACTLY in integer space
    (sum of 2^(64-r) as a python int) so the estimate is a pure
    deterministic function of the register multiset — bit-identical to
    the DuckDB SQL twin in ``queries._HLL_USERS_SQL`` regardless of
    summation order (the float sum of 2^-r spans >53 bits of exponent
    and is order-sensitive; the integer sum is not).  ``math.log`` is
    C libm, bit-parity with DuckDB ``ln`` (same trick as tf-idf)."""
    m = len(registers)
    counts = np.bincount(registers.astype(np.int64), minlength=1)
    s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m * 2.0**64 / float(s_int)
    zeros = int(counts[0])
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)  # linear counting for the small range
    return float(e)


def hll_distinct(ds, col: str, p: int = 14):
    """Approximate COUNT(DISTINCT col) -> one-row pyarrow Table
    (est: int64).  Shuffle volume is <= 2^p register rows per batch,
    independent of the data size."""
    from ray.data.aggregate import Max

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch[col])
        idx, rho = _registers(h, p)
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, idx, rho)
        nz = np.nonzero(regs)[0]
        return pa.table({"idx": pa.array(nz), "rho": pa.array(regs[nz])})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("idx")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()  # <= m rows — register-scale, never data-scale
    )
    regs = np.zeros(m, np.int64)
    regs[merged["idx"].to_numpy()] = merged["rho"].to_numpy()
    # floor(e + 0.5): explicit half-up, matching the SQL twin's
    # FLOOR(e + 0.5) (python round() is half-even).
    return pa.table({"est": pa.array([int(math.floor(hll_estimate(regs) + 0.5))],
                                     pa.int64())})


# ---------------------------------------------------------------------------
# heavy hitters (Misra-Gries / space-saving)
# ---------------------------------------------------------------------------

# NOTE: not NUL — numpy fixed-width-unicode -> Arrow conversion drops
# strings containing \x00; \x1e survives and cannot appear in tokens.
_HH_ERR_SENTINEL = "\x1e__hh_err__"


def heavy_hitters(ds, col: str, k: int = 10, capacity: int = 4096):
    """Approximate top-``k`` most frequent values of ``col`` with a
    mergeable Misra-Gries summary.

    Exact top-k shuffles one row per (batch, distinct value) — fine for
    small vocabularies, unbounded for open-ended keys (URLs, n-grams,
    user ids) at 100 TB.  This bounds the shuffle to ``capacity`` rows
    per batch: each batch keeps its top ``capacity`` counts decremented
    by the (capacity+1)-th count (the MG step — each kept count then
    UNDERestimates its key by at most that threshold, and every dropped
    key's count was <= the threshold).  Summaries merge by plain count
    addition (Sum groupby), so total undercount <= sum of per-batch
    thresholds <= n/(capacity+1); that bound travels in-band as a
    sentinel row and is returned alongside the top-k.

    When per-batch distinct values never exceed ``capacity`` the
    threshold is 0 everywhere and the result is EXACT (bound = 0) —
    which is why the catalog query can be oracle-checked against the
    exact SQL top-k at test scale while staying a true sketch at web
    scale.  Ties break on value ascending (deterministic).

    Returns (top-k Dataset with columns (token, est), error-bound int).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ser = pd.Series(batch[col].to_pylist(), dtype=object).value_counts()
        vals = ser.index.to_numpy(object)
        cnt = ser.to_numpy(np.int64)
        thresh = 0
        if len(cnt) > capacity:
            thresh = int(cnt[capacity])
            vals, cnt = vals[:capacity], cnt[:capacity] - thresh
            keep = cnt > 0
            vals, cnt = vals[keep], cnt[keep]
        vals = np.append(vals, _HH_ERR_SENTINEL)
        cnt = np.append(cnt, thresh)
        return pa.table(
            {
                "token": pa.array(vals.astype(str), pa.string()),
                "est": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("est", alias_name="est"))
    )
    err_row = merged.filter(
        expr=f"token == {_HH_ERR_SENTINEL!r}"
    ).take_all()  # one row — the in-band error bound
    err = int(err_row[0]["est"]) if err_row else 0
    top = (
        merged.filter(expr=f"token != {_HH_ERR_SENTINEL!r}")
        .sort(["est", "token"], descending=[True, False])
        .limit(k)
    )
    return top, err


# ---------------------------------------------------------------------------
# quantile sketch (DDSketch-style relative-error log histogram)
# ---------------------------------------------------------------------------

def dd_quantiles(ds, col: str, ps: list[float], alpha: float = 0.01):
    """Approximate quantiles with relative error <= ``alpha`` via a
    DDSketch-style log-bucket histogram (Masson et al., VLDB'19 shape).

    The exact path (``sample.rank_quantiles``) shuffles one row per
    distinct value per batch — unbounded for continuous columns at
    100 TB.  This buckets each value into i = ceil(ln(x)/ln(gamma)),
    gamma = (1+alpha)/(1-alpha), so a batch contributes at most
    O(log(max/min)/alpha) bucket rows regardless of row count; a Sum
    groupby merges histograms losslessly (the sketch is fully
    mergeable and deterministic: same value set -> same sketch, any
    block layout).  Quantile q is read off the cumulative histogram at
    rank ceil(q*N) (percentile_disc semantics) and estimated by the
    bucket midpoint 2*gamma^i/(gamma+1), giving |est - true|/true <=
    alpha.  Zeros (and anything < the subnormal guard) sit in a
    dedicated bucket reported as 0.0; negative values are rejected —
    mirror two sketches if you need them.

    Returns a pyarrow Table (p, est) — sketch-scale driver state.
    """
    from ray.data.aggregate import Sum

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = np.log(gamma)
    ZERO_BUCKET = np.iinfo(np.int64).min

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if (x < 0).any():
            raise ValueError(f"dd_quantiles: negative values in {col!r}")
        pos = x > 0.0
        idx = np.ceil(np.log(x[pos]) / lg).astype(np.int64)
        buckets, counts = np.unique(idx, return_counts=True)
        nz = int((~pos).sum())
        if nz:
            buckets = np.append(buckets, ZERO_BUCKET)
            counts = np.append(counts, nz)
        return pa.table(
            {
                "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # sketch-scale: O(log(range)/alpha) rows
        .sort_values("bucket")
    )
    buckets = hist["bucket"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    total = int(cum[-1]) if len(cum) else 0
    ests = []
    for p in ps:
        if not total:
            ests.append(float("nan"))
            continue
        rank = max(1, int(np.ceil(p * total)))
        i = int(np.searchsorted(cum, rank))
        b = buckets[i]
        ests.append(
            0.0 if b == ZERO_BUCKET else 2.0 * gamma ** b / (gamma + 1.0)
        )
    return pa.table(
        {
            "p": pa.array([float(p) for p in ps], pa.float64()),
            "est": pa.array(ests, pa.float64()),
        }
    )


def hll_distinct_by(ds, key_col: str, col: str, p: int = 12):
    """Approximate per-group COUNT(DISTINCT col) -> (key, est) table.

    The exact per-group distinct shuffles every (group, distinct value)
    row; this shuffles at most groups x 2^p register rows per batch —
    at p=12 (~1.6% s.e.) that is 4096 rows per group per batch worst
    case, collapsing to one register table per group after the
    Max-groupby fold.  Estimates are computed on the driver over the
    folded (group, idx, rho) table (group x register scale).  Same
    deterministic hashing as ``hll_distinct``: the result is a pure
    function of each group's value set."""
    import pandas as pd
    from ray.data.aggregate import Max

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch[col])
        idx, rho = _registers(h, p)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"key": keys, "idx": idx, "rho": rho})
        folded = df.groupby(["key", "idx"], sort=False)["rho"].max()
        out = folded.reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["key", "idx"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()  # groups x registers — sketch-scale, never data-scale
    )
    keys, ests = [], []
    for key, g in merged.groupby("key", sort=True):
        regs = np.zeros(m, np.int64)
        regs[g["idx"].to_numpy(np.int64)] = g["rho"].to_numpy(np.int64)
        keys.append(key)
        ests.append(int(math.floor(hll_estimate(regs) + 0.5)))
    return pa.table(
        {
            "key": pa.array(keys),
            "est": pa.array(ests, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimates under fixed memory)
# ---------------------------------------------------------------------------

def _cms_indices(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices: row j rehashes the base hash with a
    splitmix64-derived seed — pairwise-independent enough for the CM
    guarantee, deterministic across processes."""
    seeds = splitmix64(np.arange(1, depth + 1, dtype=np.uint64))
    return np.stack(
        [
            (splitmix64(h ^ s) % np.uint64(width)).astype(np.int64)
            for s in seeds
        ]
    )


def cms_value_counts(ds, col: str, width: int = 8192, depth: int = 4):
    """Count-Min frequency estimates for every distinct value of ``col``.

    Build shuffles only NONZERO GRID CELLS: each batch folds its local
    value counts into the depth x width grid (value_counts -> one hash
    per distinct value -> np.bincount per row) and emits at most
    depth * min(width, distinct-in-batch) cell rows; a Sum-groupby
    merges them (CM grids are additive), and the driver holds only the
    depth x width grid.  Estimate = min over rows (Cormode-Muthukrishnan:
    overestimate only, err <= e/width * N with prob 1 - e^-depth).

    The query-key set here is the DISTINCT value set (vocab-bounded for
    token streams); at open-ended-key scale you would pass an explicit
    key list instead of enumerating — the sketch itself never needs the
    key set, which is the point of its fixed memory.
    """
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vc = c.to_pandas().value_counts()
        if not len(vc):
            return pa.table(
                {"j": pa.array([], pa.int64()), "c": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        h = _hash_column(pa.array(vc.index))
        n = vc.to_numpy(np.int64)
        idx = _cms_indices(h, depth, width)
        js, cs, ns = [], [], []
        for j in range(depth):
            bc = np.bincount(idx[j], weights=n)
            nz = np.nonzero(bc)[0]
            js.append(np.full(len(nz), j, np.int64))
            cs.append(nz.astype(np.int64))
            ns.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "j": pa.array(np.concatenate(js), pa.int64()),
                "c": pa.array(np.concatenate(cs), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["j", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    grid = np.zeros((depth, width), np.int64)
    grid[cells["j"].to_numpy(), cells["c"].to_numpy()] = cells[
        "n"
    ].to_numpy()

    keys = (
        ds.groupby(col)
        .aggregate(Count(alias_name="__k"))
        .to_pandas()[col]
        .tolist()
    )
    keys = sorted(keys)
    kh = _hash_column(pa.array(keys))
    kidx = _cms_indices(kh, depth, width)
    est = grid[np.arange(depth)[:, None], kidx].min(axis=0)
    return pa.table(
        {
            col: pa.array([str(k) for k in keys], pa.string()),
            "est": pa.array(est, pa.int64()),
        }
    )


def hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized per-ROW HLL estimates for an (n, m) register matrix
    (the HyperBall per-node case, where a python loop of
    ``hll_estimate`` costs seconds at 10^4+ nodes).  The harmonic sum
    accumulates per register VALUE in a fixed v = 0..64 order
    (vectorized across rows), so the result is deterministic and
    identical wherever this same function runs — both neighborhood_hll
    paths use it; it is NOT bit-matched to the scalar
    ``hll_estimate``'s exact-integer sum (callers pick one)."""
    n, m = regs.shape
    offs = (np.arange(n, dtype=np.int64)[:, None] * 65
            + regs.astype(np.int64)).ravel()
    counts = np.bincount(offs, minlength=n * 65).reshape(n, 65)
    s = np.zeros(n, np.float64)
    for v in range(65):  # fixed order: deterministic float sum
        if counts[:, v].any():
            s += counts[:, v] * np.ldexp(1.0, 64 - v)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m * (2.0 ** 64) / s
    zeros = counts[:, 0]
    with np.errstate(divide="ignore"):
        lc = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1),
                                 np.e))
    use_lc = (e <= 2.5 * m) & (zeros > 0)
    return np.where(use_lc, lc, e)
