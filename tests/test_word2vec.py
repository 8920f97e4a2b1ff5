"""SGNS word2vec trainer (ops/word2vec.py): paths-agree between the
broadcast and forced-distributed attach, and an embedding-quality check
(planted synonyms sharing contexts end up nearest in cosine)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _corpus():
    """Two synonym tokens used in identical contexts + distractors."""
    rs = np.random.RandomState(5)
    ctx = ["red", "fruit", "tree", "sweet", "juice"]
    other = ["run", "jump", "fast", "slow", "tall", "blue", "car", "road"]
    docs = []
    for i in range(120):
        syn = "apple" if i % 2 == 0 else "banana"
        c = [ctx[j % len(ctx)] for j in range(i, i + 3)]
        docs.append(f"{c[0]} {syn} {c[1]} {syn} {c[2]}")
    for i in range(120):
        ws = [other[(i + j) % len(other)] for j in range(5)]
        docs.append(" ".join(ws))
    return pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                         "text": docs})


def test_w2v_paths_agree(ray_session, monkeypatch):
    from kgray.ops.word2vec import train_word2vec

    ds = rd.from_arrow(pa.Table.from_pandas(_corpus()))
    u1 = train_word2vec(ds, iters=1)[0].to_pandas() \
        .sort_values("w", ignore_index=True)
    monkeypatch.setenv("KGRAY_FORCE_DISTRIBUTED", "1")
    u2 = train_word2vec(ds, iters=1)[0].to_pandas() \
        .sort_values("w", ignore_index=True)
    monkeypatch.delenv("KGRAY_FORCE_DISTRIBUTED")
    pd.testing.assert_frame_equal(u1, u2)


def test_w2v_planted_synonyms_nearest(ray_session):
    """After a few rounds, cosine(apple, banana) must exceed the cosine
    of apple with any non-context distractor word."""
    from kgray.ops.word2vec import train_word2vec

    ds = rd.from_arrow(pa.Table.from_pandas(_corpus()))
    u, _, _ = train_word2vec(ds, dim=8, k_neg=2, lr_den=1, iters=10,
                             init_div=10)
    df = u.to_pandas().set_index("w")
    mat = df[[f"u{d}" for d in range(8)]].to_numpy(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    emb = dict(zip(df.index, mat))
    sim_syn = float(emb["apple"] @ emb["banana"])
    distractors = ["run", "jump", "fast", "slow", "tall", "blue", "car",
                   "road"]
    worst = max(float(emb["apple"] @ emb[d]) for d in distractors
                if d in emb)
    assert sim_syn > worst, (sim_syn, worst)


def test_w2v_deterministic(ray_session):
    from kgray.ops.word2vec import train_word2vec

    ds = rd.from_arrow(pa.Table.from_pandas(_corpus()))
    a = train_word2vec(ds, iters=2)[0].to_pandas() \
        .sort_values("w", ignore_index=True)
    b = train_word2vec(ds, iters=2)[0].to_pandas() \
        .sort_values("w", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
