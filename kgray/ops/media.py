"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample stages over opaque binary media.

The image/audio libraries are not in this container, so the DECODE KERNEL
is stubbed (``DeterministicFakeDecoder`` produces seeded bytes-derived
features; ``LibraryDecoder`` raises NotImplementedError until pillow /
torchaudio / pyav is importable) — but everything Ray-side is real and
tested: schemas, actor signatures, batch sizing for large binary
payloads, and output layout.

Design rules for 100 TB media (SURVEY.md §4):
* media stays an opaque ``binary`` column (or a ``media_ref`` pointer —
  preferred; fetch inside the actor) with typed metadata columns;
* small ``batch_size`` so batch x concurrency of decoded frames fits a
  worker heap; blocks of wide binary rows need a large
  ``target_max_block_size`` so Ray doesn't split them absurdly small;
* decode stages are actor pools: codec/model init once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),        # optional inline bytes ("" = fetch by ref)
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


class DeterministicFakeDecoder:
    """Stand-in decode/feature kernel: sha256(ref) -> unit feature vector.

    Deterministic, dependency-free; keeps the actor-pool plumbing,
    schemas and tests real while the true codec is unavailable.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.dim = feature_dim

    def decode_one(self, ref: str, payload: bytes | None) -> np.ndarray:
        seed_bytes = hashlib.sha256(
            (ref or "").encode() + (payload or b"")
        ).digest()
        rs = np.random.RandomState(
            int.from_bytes(seed_bytes[:4], "big")
        )
        v = rs.standard_normal(self.dim)
        return v / np.linalg.norm(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = (
            batch["payload"].to_pylist()
            if "payload" in batch.column_names
            else [None] * len(refs)
        )
        feats = np.vstack(
            [self.decode_one(r, p) for r, p in zip(refs, payloads)]
        ).astype(np.float32)
        flat = pa.array(feats.reshape(-1))
        col = pa.FixedSizeListArray.from_arrays(flat, self.dim)
        return batch.append_column("features", col)


class LibraryDecoder:
    """Real decoder slot: raises until an image/audio lib is available.

    At deploy time this class body is the only change — the pipeline
    call-sites (actor pool, batch size, schema) stay identical.
    """

    def __init__(self, kind: str = "image"):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "media decoding requires pillow/torchaudio/pyav; "
                "not shipped in this container - use DeterministicFakeDecoder"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


def extract_media_features(
    media_ds,
    decoder_cls=DeterministicFakeDecoder,
    batch_size: int = 64,          # small: binary payloads are wide
    concurrency=(1, 4),
):
    """media table -> + features column.  Actor pool; small batches."""
    return media_ds.map_batches(
        decoder_cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_table_from_documents(docs_interleaved):
    """Pull the media spans out of interleaved documents into the media
    table shape (payload empty: fetch-by-ref model)."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        flat = spans.flatten()
        kinds = flat.field("kind")
        refs = flat.field("media_ref")
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        is_media = pc.not_equal(kinds, "text").to_numpy(zero_copy_only=False)
        n = int(is_media.sum())
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(doc_idx[is_media])),
                "media_ref": refs.filter(pa.array(is_media)),
                "kind": kinds.filter(pa.array(is_media)),
                "payload": pa.array([b""] * n, pa.binary()),
                "width": pa.nulls(n, pa.int32()),
                "height": pa.nulls(n, pa.int32()),
                "duration_ms": pa.nulls(n, pa.int32()),
            }
        )

    return docs_interleaved.map_batches(explode, batch_format="pyarrow")


def sample_frames(media_ds, every_ms: int = 1000, max_frames: int = 8):
    """Frame-sampling plumbing for video rows: emits (media_ref,
    frame_idx, t_ms) rows; the actual frame grab is the decoder's job.
    Cardinality-expanding op — callers should repartition after."""

    def explode(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        out_r, out_i, out_t = [], [], []
        for r, d in zip(refs, durs):
            n = min(max_frames, max(1, int((d or every_ms) // every_ms)))
            for i in range(n):
                out_r.append(r)
                out_i.append(i)
                out_t.append(i * every_ms)
        return pa.table(
            {
                "media_ref": pa.array(out_r, pa.string()),
                "frame_idx": pa.array(out_i, pa.int32()),
                "t_ms": pa.array(out_t, pa.int32()),
            }
        )

    return media_ds.map_batches(explode, batch_format="pyarrow")


def fit_box(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving fit into (max_w, max_h); never upscales.
    Pure arithmetic — the real part of a resize stage regardless of
    codec availability."""
    scale = min(max_w / w, max_h / h, 1.0)
    return max(1, int(w * scale)), max(1, int(h * scale))


class FakeResizer:
    """Resize-stage plumbing: recomputes (width, height) with the real
    fit arithmetic and swaps the payload for a deterministic stub derived
    from (ref, target dims) — at deploy time only the payload kernel body
    changes (PIL.Image.resize), the actor signature / columns / batch
    sizing stay identical."""

    def __init__(self, max_w: int = 256, max_h: int = 256):
        self.max_w = max_w
        self.max_h = max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        new_w, new_h, payloads = [], [], []
        for r, w, h in zip(refs, ws, hs):
            if not w or not h:  # unknown dims pass through untouched
                new_w.append(w)
                new_h.append(h)
                payloads.append(b"")
                continue
            tw, th = fit_box(int(w), int(h), self.max_w, self.max_h)
            new_w.append(tw)
            new_h.append(th)
            payloads.append(
                hashlib.sha256(f"{r}:{tw}x{th}".encode()).digest()
            )
        out = batch
        for name, vals, typ in (
            ("width", new_w, pa.int32()),
            ("height", new_h, pa.int32()),
            ("payload", payloads, pa.binary()),
        ):
            i = out.column_names.index(name)
            out = out.set_column(i, name, pa.array(vals, typ))
        return out


def resize_media(media_ds, max_w: int = 256, max_h: int = 256,
                 batch_size: int = 64, concurrency=(1, 4)):
    """media table -> same schema with fitted dims + resized payloads.
    Actor pool, small batches (wide binary rows)."""
    return media_ds.map_batches(
        FakeResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
    )


def media_dup_refs(media_ds, tau: float = 0.999,
                   decoder_cls=DeterministicFakeDecoder):
    """Near-duplicate media detection: decode/feature-extract through the
    actor pool, then reuse the embedding-cosine dedup machinery
    (``dedup.embedding_dup_pairs`` — brute broadcast under 100k rows,
    multi-probe IVF blocking above) over the feature vectors.  Media
    identity keys are ``media_ref`` strings; they ride through the
    dedup as int64 fingerprints (`text.fingerprint64`) and map back at
    the end, so the pair shuffle moves 8-byte ids, not refs.  Returns
    (ref_u, ref_v, cos) with cos >= tau."""
    import pyarrow.compute as pc

    from kgray.ops.dedup import embedding_dup_pairs
    from kgray.ops.text import fingerprint64

    feats = extract_media_features(media_ds, decoder_cls=decoder_cls)

    def _fp(r: str) -> int:
        # fingerprint64 is uint64-range; wrap to signed for Arrow int64
        v = fingerprint64(r)
        return v - (1 << 64) if v >= (1 << 63) else v

    ref_of: dict[int, str] = {}

    def to_vec(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        ids = [_fp(r) for r in refs]
        f = batch["features"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": f.cast(
                    pa.list_(pa.float32())
                ),
            }
        )

    vecs = feats.map_batches(to_vec, batch_format="pyarrow").materialize()
    # ref map: media tables are span-scale (rows ≈ media per corpus);
    # the id->ref attach is a broadcast dict — at larger scale this
    # becomes a bucket join on the fingerprint
    distinct_refs: set[str] = set()
    for b in media_ds.select_columns(["media_ref"]).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b["media_ref"].to_pylist():
            ref_of[_fp(r)] = r
            distinct_refs.add(r)
    # a 64-bit fingerprint collision (~n^2/2^64) would silently merge
    # two media identities and mislabel dup pairs — fail loudly instead
    if len(ref_of) != len(distinct_refs):
        raise RuntimeError(
            "media_ref fingerprint collision: "
            f"{len(distinct_refs)} refs -> {len(ref_of)} fingerprints"
        )

    pairs = embedding_dup_pairs(vecs, tau=tau)

    def attach(batch: pa.Table) -> pa.Table:
        u = [ref_of.get(i) for i in batch["u"].to_pylist()]
        v = [ref_of.get(i) for i in batch["v"].to_pylist()]
        return pa.table(
            {
                "ref_u": pa.array(u, pa.string()),
                "ref_v": pa.array(v, pa.string()),
                "cos": batch["cos"],
            }
        )

    res = pairs
    if hasattr(res, "map_batches"):
        return res.map_batches(attach, batch_format="pyarrow")
    return attach(res)
