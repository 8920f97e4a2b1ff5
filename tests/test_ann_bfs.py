"""Filtered ANN (hard negatives) and BFS hop distances — pinned against
brute numpy / python-BFS references on planted structures."""

import collections

import numpy as np
import pandas as pd


def test_hard_negatives_excludes_same_label(ray_session, tmp_path):
    from kgray.queries import q_hard_negatives

    rng = np.random.default_rng(101)
    n, d = 200, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    # plant a same-label near-duplicate of query 0: must NOT appear
    vecs[10] = vecs[0] + 0.001
    labels[10] = labels[0]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(vecs),
            "label": labels,
        }
    )
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = (
        q_hard_negatives(str(tmp_path)).to_pandas()
        .sort_values(["query_id", "sim", "vec_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    v = vecs.astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    for q in range(5):
        sims = v @ v[q]
        mask = (labels != labels[q]) & (np.arange(n) != q)
        idx = np.nonzero(mask)[0]
        order = np.lexsort((idx, -sims[idx]))[:3]
        exp = idx[order]
        sub = got[got["query_id"] == q]
        assert sub["vec_id"].tolist() == exp.tolist()
        np.testing.assert_allclose(
            sub["sim"].to_numpy(), sims[exp], atol=5.1e-5
        )
    assert 10 not in got.loc[got["query_id"] == 0, "vec_id"].tolist()


def test_users_bfs_matches_python_bfs(ray_session, tmp_path):
    from kgray.queries import q_users_bfs

    # engineer purchases so the co-purchase graph is a known chain with
    # a far tail: users 0-1-2-3-4-5 chained (each adjacent pair shares
    # 2 hours), user 9 isolated
    rows = []
    eid = 0
    for i in range(5):  # adjacent pair (i, i+1) shares hours 2i, 2i+1
        for h in (2 * i, 2 * i + 1):
            for u in (i, i + 1):
                rows.append(
                    (eid, pd.Timestamp("2024-01-01")
                     + pd.Timedelta(hours=h), u, "purchase", 1.0, "{}")
                )
                eid += 1
    rows.append((eid, pd.Timestamp("2024-01-05"), 9, "purchase", 1.0,
                 "{}"))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"],
    )
    df["user_id"] = df["user_id"].astype(np.int64)
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = dict(
        q_users_bfs(str(tmp_path)).to_pandas()
        [["node", "dist"]].itertuples(index=False)
    )
    # brute BFS from node 0 over the chain
    edges = collections.defaultdict(set)
    for i in range(5):
        edges[i].add(i + 1)
        edges[i + 1].add(i)
    exp, frontier = {0: 0}, [0]
    for d in (1, 2, 3):
        nxt = []
        for u in frontier:
            for v in edges[u]:
                if v not in exp:
                    exp[v] = d
                    nxt.append(v)
        frontier = nxt
    assert got == exp
    assert 4 not in got and 5 not in got  # beyond 3 hops
    assert 9 not in got  # isolated user unreachable
