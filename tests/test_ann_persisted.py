"""Persisted IVF index: full probing == brute force, partial probing
reads ONLY the probed buckets' partitions (zone pruning), and the index
is reopenable from disk (centroids + manifest, no rebuild)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _write_embeddings(tmp_path, n_per=20, d=8, seed=3):
    rng = np.random.RandomState(seed)
    # two well-separated clusters on orthogonal axes + noise
    a = rng.normal(0, 0.05, (n_per, d)); a[:, 0] += 10.0
    b = rng.normal(0, 0.05, (n_per, d)); b[:, 1] += 10.0
    X = np.vstack([a, b])
    df = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in X],
        "label": np.zeros(len(X), np.int32),
    })
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    return X


def test_full_probe_equals_brute(ray_session, tmp_path):
    import ray.data as rd

    from kgray.ops.similarity import (build_ivf_index, knn_brute,
                                      knn_ivf_persisted)

    _write_embeddings(tmp_path)
    emb = rd.read_parquet(str(tmp_path / "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    C = build_ivf_index(emb, idx, num_centroids=4)
    qv = [10.0] + [0.0] * 7
    got = knn_ivf_persisted(idx, qv, k=5, nprobe=len(C)).to_pandas()
    exp = knn_brute(emb, qv, k=5).to_pandas()
    assert got["vec_id"].tolist() == exp["vec_id"].tolist()
    assert got["sim"].tolist() == exp["sim"].tolist()


def test_partial_probe_prunes_partitions(ray_session, tmp_path):
    import ray.data as rd

    from kgray import io as kio
    from kgray.ops.similarity import build_ivf_index, knn_ivf_persisted

    _write_embeddings(tmp_path)
    emb = rd.read_parquet(str(tmp_path / "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    C = build_ivf_index(emb, idx, num_centroids=4)
    # the cluster-a query probes one bucket: zone pruning must select a
    # strict subset of the on-disk partitions
    qn = np.array([10.0] + [0.0] * 7)
    qn = qn / np.linalg.norm(qn)
    b = int(np.argmax(C @ qn))
    keep = kio.zone_partitions(idx, {"bucket": (b, b)})
    total = len(kio.read_manifest(idx)["partitions"])
    assert keep is not None and 0 < len(keep) < total
    # and the nprobe=1 result only contains members of that bucket
    bucket_ids = set(
        kio.read_table(idx, columns=["vec_id"],
                       zone_filter={"bucket": (b, b)})
        .to_pandas()["vec_id"].tolist()
    )
    got = knn_ivf_persisted(idx, [10.0] + [0.0] * 7, k=5,
                            nprobe=1).to_pandas()
    assert set(got["vec_id"].tolist()) <= bucket_ids
    assert len(got) == 5


def test_index_reopens_from_disk(ray_session, tmp_path):
    import ray.data as rd

    from kgray.ops.similarity import build_ivf_index, knn_ivf_persisted

    _write_embeddings(tmp_path)
    emb = rd.read_parquet(str(tmp_path / "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    build_ivf_index(emb, idx, num_centroids=4)
    # second query session: no build, just the on-disk artifacts
    r1 = knn_ivf_persisted(idx, [0.0, 10.0] + [0.0] * 6, k=3, nprobe=4)
    r2 = knn_ivf_persisted(idx, [0.0, 10.0] + [0.0] * 6, k=3, nprobe=4)
    assert r1.to_pandas().equals(r2.to_pandas())
