"""kgray.queries.embeds — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)



def q_embed_knn(sf_dir: str):
    """Exact cosine top-10 around vec_id=0 (brute force baseline)."""
    from kgray.ops.similarity import knn_brute

    return knn_brute(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _query_vec(sf_dir),
        k=10,
    )


SQL_EMBED_KNN = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, ROUND(list_cosine_similarity(embedding, (SELECT qv FROM q)), 4) AS sim
FROM embeddings
ORDER BY sim DESC, vec_id LIMIT 10
"""


def q_embed_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs.  tau=0.45 so the testdata's
    planted similarity structure yields a non-empty, boundary-safe result
    (max pairwise cosine in the synthetic tables is ~0.51; nothing within
    5e-4 of the threshold)."""
    from kgray.ops.dedup import embedding_dup_pairs

    return embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.45
    )


SQL_EMBED_DUP_PAIRS = """
SELECT a.vec_id AS u, b.vec_id AS v,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def q_embed_label_counts(sf_dir: str):

    return (
        _read(sf_dir, "embeddings", ["label"])
        .groupby("label")
        .aggregate(Count(alias_name="n"))
    )


SQL_EMBED_LABEL_COUNTS = "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label"


def q_ann_knn_persisted(sf_dir: str):
    """End-to-end persisted-ANN round trip: build an IVF index table
    (one partition per centroid bucket, bucket zone maps, centroids
    beside the manifest) in scratch, then query it probing EVERY bucket
    — full probing is exact, so the whole build/persist/zone-prune/read
    /score path is value-hash checkable against the brute-force SQL.
    The approximate face (nprobe < num_centroids reading only probed
    partitions' files) is pinned by tests/test_ann_persisted.py."""
    import shutil
    import tempfile

    from kgray.ops.similarity import build_ivf_index, knn_ivf_persisted

    idx = tempfile.mkdtemp(prefix="kgray_ann_idx_")
    try:
        C = build_ivf_index(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            idx, num_centroids=8,
        )
        out = knn_ivf_persisted(
            idx, _query_vec(sf_dir), k=10, nprobe=len(C))
        if hasattr(out, "to_arrow_refs"):
            import ray

            out = pa.concat_tables(
                [t for t in (ray.get(r) for r in out.to_arrow_refs())
                 if t.num_rows]
            )
        return out
    finally:
        shutil.rmtree(idx, ignore_errors=True)


SQL_ANN_KNN_PERSISTED = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, ROUND(list_cosine_similarity(embedding, (SELECT qv FROM q)), 4) AS sim
FROM embeddings
ORDER BY sim DESC, vec_id LIMIT 10
"""
