"""HyperBall-lite neighborhood function (graph.neighborhood_hll):
forced-distributed path is bit-identical to the in-process kernel
(max-merge is deterministic), and the estimate tracks exact all-pairs
BFS counts within HLL error on a random graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _edges(seed=3, n=60, m=120):
    rs = np.random.RandomState(seed)
    u = rs.randint(0, n, m).astype(np.int64)
    v = rs.randint(0, n, m).astype(np.int64)
    keep = u != v
    return pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()


def _exact_pairs(df, hops):
    nodes = np.unique(np.concatenate([df["u"], df["v"]]))
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    for a, b in zip(df["u"], df["v"]):
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    out = [n]
    reach = [set([i]) for i in range(n)]
    for _ in range(hops):
        new = []
        for i in range(n):
            s = set(reach[i])
            for j in reach[i]:
                s.update(adj[j])
            new.append(s)
        reach = new
        out.append(sum(len(s) for s in reach))
    return out


def test_neighborhood_paths_agree(ray_session, monkeypatch):
    from kgray.ops.graph import neighborhood_hll

    df = _edges()
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    a = neighborhood_hll(ds, hops=3)
    a = a.to_pandas() if hasattr(a, "to_pandas") else a
    monkeypatch.setenv("KGRAY_FORCE_DISTRIBUTED", "1")
    b = neighborhood_hll(rd.from_arrow(pa.Table.from_pandas(df)), hops=3)
    b = b.to_pandas() if hasattr(b, "to_pandas") else b
    monkeypatch.delenv("KGRAY_FORCE_DISTRIBUTED")
    a = (a.to_pandas() if isinstance(a, pa.Table) else a) \
        .sort_values("hop", ignore_index=True)
    b = (b.to_pandas() if isinstance(b, pa.Table) else b) \
        .sort_values("hop", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_neighborhood_tracks_exact_bfs(ray_session):
    from kgray.ops.graph import neighborhood_hll

    df = _edges(seed=11, n=80, m=200)
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = neighborhood_hll(ds, hops=3, p=10)
    got = (got.to_pandas() if isinstance(got, pa.Table) else
           got.to_pandas()).sort_values("hop")["est_pairs"].to_numpy()
    want = np.array(_exact_pairs(df, 3), np.float64)
    assert got[0] == want[0]
    # p=10 -> sigma ~3.2% per node; the SUM concentrates further
    rel = np.abs(got[1:] - want[1:]) / want[1:]
    assert (rel < 0.10).all(), (got, want)


def test_neighborhood_monotone_nondecreasing(ray_session):
    from kgray.ops.graph import neighborhood_hll

    ds = rd.from_arrow(pa.Table.from_pandas(_edges(seed=7)))
    est = neighborhood_hll(ds, hops=3)
    est = (est.to_pandas() if isinstance(est, pa.Table) else
           est.to_pandas()).sort_values("hop")["est_pairs"].to_numpy()
    assert (np.diff(est) >= -1e-9).all()
