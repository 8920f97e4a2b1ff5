"""DSIR-style importance weighting for pretraining-data selection.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): hash word features into ``B`` buckets, fit two
bag-of-buckets unigram models — target corpus vs raw corpus — and weight
every document by its log importance ratio
``w(d) = sum_tokens [ln p_target(bucket) - ln p_raw(bucket)]``.
High-weight documents "look like" the target distribution and get kept.

Scale shape (built for the 100 TB case):
- ONE read folds both bucket-count vectors: a per-batch combiner emits at
  most ``B`` nonzero (bucket, n_target, n_raw) rows, so the shuffle moves
  bucket-scale rows (<= B per batch), never corpus scale.  ``B`` is the
  model size — 1024 here, 10^4-10^5 in production — always driver-safe.
- The log-ratio table (B int64s) is broadcast once via ``ray.put``; the
  scoring pass is shuffle-free map_batches.
- Exactness: per-bucket log ratios are computed on the driver with
  ``math.log`` (C libm — bit-identical to DuckDB ``ln``, the tf-idf
  lesson) and quantized to INTEGER micro-units (floor(x*1e6 + 0.5), the
  identical expression in SQL), so per-document weights are int64 sums —
  order-exact in ANY summation order on both engines (the Q1/CUSUM
  integral-units lesson).
- md5-prefix bucket hashing matches DuckDB's
  ``CAST('0x' || substr(md5(w), 1, 13) AS BIGINT) % B`` exactly
  (same trick as ops/sample.py A-ES keys); per-distinct-token results are
  memoized in a process-local dict (vocab-scale, cleared above a cap).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BUCKET_MEMO: dict[tuple[int, str], int] = {}
_MEMO_CAP = 2_000_000  # vocab-scale; reset if an adversarial corpus blows it


def _token_buckets(flat_tokens: np.ndarray, B: int) -> np.ndarray:
    """md5-prefix bucket per token, memoized per distinct token."""
    if not len(flat_tokens):
        return np.array([], np.int64)
    if len(_BUCKET_MEMO) > _MEMO_CAP:
        _BUCKET_MEMO.clear()
    uniq = pd.unique(flat_tokens)
    memo = _BUCKET_MEMO
    for t in uniq:
        key = (B, t)
        if key not in memo:
            memo[key] = int(
                hashlib.md5(t.encode()).hexdigest()[:13], 16
            ) % B
    return (
        pd.Series(flat_tokens)
        .map({t: memo[(B, t)] for t in uniq})
        .to_numpy(np.int64)
    )


def _explode(texts: list[str]):
    """(row_idx, token) arrays under the single-space split convention
    (matches ``string_split(text, ' ')``; '' splits to [''])."""
    tok_lists = [t.split(" ") for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    flat = (
        np.concatenate([np.asarray(t, object) for t in tok_lists])
        if tok_lists else np.array([], object)
    )
    return rows, flat


def fit_dsir(docs, target_col: str, target_val: str, B: int = 1024,
             text_col: str = "text"):
    """Fold target/raw bucket counts in one read and return the int64
    micro-unit log-ratio table (length ``B``)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        is_tgt = pc.equal(batch[target_col], target_val).to_numpy(
            zero_copy_only=False
        )
        rows, flat = _explode(texts)
        b = _token_buckets(flat, B)
        nr = np.bincount(b, minlength=B)
        nt = np.bincount(b[is_tgt[rows]], minlength=B)
        nz = np.flatnonzero(nr)
        return pa.table(
            {
                "bkt": pa.array(nz, pa.int64()),
                "nt": pa.array(nt[nz], pa.int64()),
                "nr": pa.array(nr[nz], pa.int64()),
            }
        )

    cnt = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bkt")
        .aggregate(Sum("nt", alias_name="nt"), Sum("nr", alias_name="nr"))
        .to_pandas()  # <= B rows (bucket/model scale), never corpus scale
    )
    lam = np.zeros(B, np.int64)
    tt = float(cnt["nt"].sum())
    tr = float(cnt["nr"].sum())
    half_b = 0.5 * B
    for bkt, ct, cr in zip(cnt["bkt"].to_numpy(np.int64),
                           cnt["nt"].to_numpy(np.float64),
                           cnt["nr"].to_numpy(np.float64)):
        # EXACTLY parallel to the SQL: ln(a) - ln(b), never ln(a/b)
        x = (
            math.log((ct + 0.5) / (tt + half_b))
            - math.log((cr + 0.5) / (tr + half_b))
        ) * 1_000_000.0
        lam[bkt] = int(math.floor(x + 0.5))
    return lam


def dsir_weights(docs, target_col: str, target_val: str, B: int = 1024,
                 text_col: str = "text", id_col: str = "doc_id",
                 lam: np.ndarray | None = None):
    """Per-document importance weight in log micro-units (int64).

    ``lam`` defaults to fitting on ``docs`` itself; pass a table fit on a
    separate target/raw split for production selection semantics.  The
    scoring pass is shuffle-free: broadcast table, integer per-doc sums.
    """
    import ray

    if lam is None:
        lam = fit_dsir(docs, target_col, target_val, B=B, text_col=text_col)
    lam_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(lam_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rows, flat = _explode(batch[text_col].to_pylist())
        b = _token_buckets(flat, B)
        w = np.zeros(len(ids), np.int64)
        np.add.at(w, rows, table[b])
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "w_micro": pa.array(w, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
