"""Interleaved-span codec: spans <-> flat text, fully vectorized on Arrow.

The flagship input is (doc_id, spans: list<struct<kind,text,media_ref,
offset>>) per BASELINE.json input_hint.  The extraction pipeline needs the
flat sentence (concat of kind=='text' span texts in span order) — the
shape the reference consumes (/root/reference/README.md:19-39) — while the
span sequence itself must ride through unchanged (per-row invariant:
(kind, text, media_ref, order) equality, FIXTURES.md F1).

All kernels below operate on the flattened child arrays of the list column
with numpy offset arithmetic + pyarrow.compute — no Python loop over rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _list_parts(spans: pa.ChunkedArray | pa.ListArray) -> tuple[pa.ListArray, np.ndarray, pa.StructArray]:
    """(list array, per-row lengths, flattened struct values)."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
    return spans, lengths.astype(np.int64), spans.flatten()


def reassemble_text(batch: pa.Table, spans_col: str = "spans",
                    out_col: str = "text", keep_spans: bool = True) -> pa.Table:
    """Append ``out_col`` = concat of kind=='text' span texts, span order.

    Span order inside each row is the stored sequence order (already offset
    order per the generator invariant); we do NOT re-sort — the invariant
    test asserts the stored order equals offset order.
    """
    spans, lengths, flat = _list_parts(batch[spans_col])
    n_rows = len(lengths)

    kind = flat.field("kind")
    text = flat.field("text")
    is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)

    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    sel_rows = row_idx[is_text]
    sel_texts = text.filter(pa.array(is_text))

    # rebuild a list<string> of text pieces per row, then binary_join
    counts = np.bincount(sel_rows, minlength=n_rows)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    pieces = pa.ListArray.from_arrays(pa.array(offsets), sel_texts.combine_chunks()
                                      if isinstance(sel_texts, pa.ChunkedArray) else sel_texts)
    joined = pc.binary_join(pieces, "")

    cols = dict(zip(batch.column_names, batch.columns))
    cols[out_col] = joined
    if not keep_spans:
        cols.pop(spans_col, None)
    return pa.table(cols)


def span_fingerprints(batch: pa.Table, spans_col: str = "spans") -> list[str]:
    """Per-row sha1 over the (kind, text, media_ref) sequence — the
    invariant fingerprint compared between pipeline input and output."""
    spans, lengths, flat = _list_parts(batch[spans_col])
    kind = flat.field("kind").to_pylist()
    text = flat.field("text").to_pylist()
    ref = flat.field("media_ref").to_pylist()
    out = []
    pos = 0
    for ln in lengths:
        h = hashlib.sha1()
        for i in range(pos, pos + ln):
            h.update(f"{kind[i]}\x00{text[i]}\x00{ref[i]}\x01".encode())
        out.append(h.hexdigest())
        pos += ln
    return out


def check_offsets_monotonic(batch: pa.Table, spans_col: str = "spans") -> bool:
    """Verify stored span order == offset order (non-decreasing per row)."""
    spans, lengths, flat = _list_parts(batch[spans_col])
    offs = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(offs) == 0:
        return True
    row_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    same_row = row_idx[1:] == row_idx[:-1]
    return bool(np.all(~same_row | (np.diff(offs) >= 0)))
