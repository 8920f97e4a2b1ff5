"""Embedding diversity identity (vs brute pairwise cosine), per-group
MAD, and session-id assignment — crafted inputs with hand-checkable
answers plus the single-member-label drop rule."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_label_diversity_matches_brute_pairwise(ray_session, tmp_path):
    from kgray.ops.similarity import label_diversity
    import ray.data as rd

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    labels = np.r_[np.zeros(25, np.int32), np.ones(14, np.int32),
                   np.full(1, 2, np.int32)]  # label 2: single member
    pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(40), "embedding": list(vecs), "label": labels}
    )
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = (
        label_diversity(rd.read_parquet(f"{tmp_path}/embeddings.parquet"))
        .to_pandas().sort_values("label").reset_index(drop=True)
    )
    assert got["label"].tolist() == [0, 1]  # single-member label dropped
    for lab, n in [(0, 25), (1, 14)]:
        m = vecs[labels == lab].astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ m.T
        brute = (cos.sum() - np.trace(cos)) / (n * (n - 1))
        row = got[got["label"] == lab]
        assert row["n"].iloc[0] == n
        np.testing.assert_allclose(row["avg_cos"].iloc[0], brute, atol=1e-4)


def _events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)


def test_user_value_mad_hand_worked(ray_session, tmp_path):
    # user 1: values 1,2,4,100 -> med=3, |dev|=2,1,1,97 -> mad=1.5
    # user 2: values 5,5,5 -> mad=0
    _events(
        tmp_path,
        [(i, "2024-01-01", 1, "v", x) for i, x in
         enumerate([1.0, 2.0, 4.0, 100.0])]
        + [(10 + i, "2024-01-01", 2, "v", 5.0) for i in range(3)],
    )
    from kgray.queries import q_user_value_mad

    got = (
        q_user_value_mad(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    assert got["mad"].tolist() == [1.5, 0.0]


def test_session_ids_gap_and_ties(ray_session, tmp_path):
    _events(
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "v", 0.0),
            (2, "2024-01-01 10:29:00", 1, "v", 0.0),  # same session
            (3, "2024-01-01 11:00:01", 1, "v", 0.0),  # gap > 1800 -> new
            (4, "2024-01-01 09:00:00", 2, "v", 0.0),
        ],
    )
    from kgray.queries import q_events_session_ids

    got = (
        q_events_session_ids(str(tmp_path)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert got["session_idx"].tolist() == [1, 1, 2, 1]
