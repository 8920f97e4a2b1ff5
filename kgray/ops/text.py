"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference ops (per the build brief): token counting, language-ID
heuristic, quality scoring, document fingerprinting.  All vectorized per
batch; no per-row Python in hot paths except where the kernel is
inherently string-iterating (fingerprint), which stays O(len) per doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language char profiles for the n-gram language-ID heuristic.
# Declared heuristic (not learned): score(lang) = sum of marker hits.
_LANG_MARKERS = {
    "en": ["the ", " and ", " of "],
    "de": ["der ", " und ", " sch"],
    "fr": [" le ", " de ", " est"],
    "es": [" el ", " de ", "ción"],
    "zh": ["的", "是", "了"],
}

_STOPWORDS = {"the", "a", "and", "of", "to", "in"}


def add_token_count(batch: pa.Table, text_col: str = "text",
                    out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count (single-space convention, matching the
    ``string_split(text, ' ')`` SQL oracle)."""
    toks = pc.split_pattern(batch[text_col], " ")
    return batch.append_column(out_col, pc.list_value_length(toks).cast(pa.int64()))


def add_avg_token_len(batch: pa.Table, text_col: str = "text",
                      out_col: str = "avg_tok_len", digits: int = 4) -> pa.Table:
    """Quality proxy: chars per token, rounded for oracle comparison."""
    from kgray.util import round_half_up

    n_chars = pc.utf8_length(batch[text_col]).cast(pa.float64())
    n_toks = pc.list_value_length(pc.split_pattern(batch[text_col], " ")).cast(
        pa.float64()
    )
    # numpy half-away-from-zero (SQL ROUND); pc.round can leave one-ulp-off
    # quotients unchanged, mismatching DuckDB's bit pattern
    raw = pc.divide(n_chars, n_toks).to_numpy(zero_copy_only=False)
    ratio = pa.array(round_half_up(raw, digits), pa.float64())
    return batch.append_column(out_col, ratio)


def add_stopword_ratio(batch: pa.Table, text_col: str = "text",
                       out_col: str = "stop_ratio", digits: int = 4) -> pa.Table:
    s = batch[text_col].to_pandas()
    toks = s.str.split(" ")
    raw = toks.map(
        lambda ws: sum(w in _STOPWORDS for w in ws) / max(1, len(ws))
    ).to_numpy(np.float64)
    # half-away-from-zero (SQL ROUND), not python/numpy half-even
    scale = 10.0 ** 4
    ratio = np.floor(raw * scale + 0.5) / scale
    return batch.append_column(out_col, pa.array(ratio, pa.float64()))


def add_langid(batch: pa.Table, text_col: str = "text",
               out_col: str = "lang_pred") -> pa.Table:
    """n-gram marker heuristic; vectorized: one match_substring per marker."""
    text = batch[text_col]
    n = len(batch)
    scores = np.zeros((n, len(_LANG_MARKERS)), np.int32)
    langs = list(_LANG_MARKERS)
    for j, lang in enumerate(langs):
        for marker in _LANG_MARKERS[lang]:
            scores[:, j] += pc.match_substring(text, marker).to_numpy(
                zero_copy_only=False
            )
    arg = scores.argmax(axis=1)
    nohit = scores.max(axis=1) == 0
    best = ["und" if nohit[i] else langs[arg[i]] for i in range(n)]
    return batch.append_column(out_col, pa.array(best, pa.string()))


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint64(s: str) -> int:
    """FNV-1a rolling document fingerprint (declared, deterministic)."""
    h = _FP_OFFSET
    for b in s.encode():
        h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    s = batch[text_col].to_pylist()
    fps = np.fromiter((fingerprint64(x) for x in s), np.uint64, len(s))
    return batch.append_column(out_col, pa.array(fps.astype(np.int64)))


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token crc32x2 hashes (Charikar 2002 shape)."""
    import zlib

    if not tokens:
        return 0
    acc = np.zeros(64, np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in tokens:
        h1 = zlib.crc32(t.encode())
        h2 = zlib.crc32(t.encode()[::-1])
        h = np.uint64((h1 << 32) | h2)  # keep in uint64: py-int >> np.arange overflows
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(batch: pa.Table, text_col: str = "text",
                out_col: str = "simhash") -> pa.Table:
    s = batch[text_col].to_pylist()
    hs = [simhash64(x.split(" ")) for x in s]
    return batch.append_column(
        out_col, pa.array(np.array(hs, np.uint64).astype(np.int64))
    )
