"""HITS / per-node triangles / label propagation (ops/graph.py):
hand-computed tiny-graph values + in-process-vs-distributed paths-agree
(``max_inprocess_edges=0`` forces the bucket-join/cogroup path)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgray.ops.graph import hits_int, lpa_labels, node_triangles


def _rand_edges(n_nodes=30, n_edges=90, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    v = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = u != v
    return pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()


def test_hits_int_hand_computed(ray_session):
    # u1 -> {v10, v11}, u2 -> {v11}; S=1e6, 2 iterations (worked by hand)
    ds = rd.from_pandas(
        pd.DataFrame({"u": [1, 1, 2], "v": [10, 11, 11]})
    )
    t = hits_int(ds, iters=2, scale=10**6)
    got = {(r["side"], r["node"]): r["score"]
           for r in t.to_pylist()}
    assert got == {
        ("hub", 1): 1_000_000, ("hub", 2): 625_000,
        ("auth", 10): 600_000, ("auth", 11): 1_000_000,
    }


def test_hits_paths_agree(ray_session):
    df = _rand_edges()
    ds = rd.from_pandas(df, override_num_blocks=3)
    inproc = pd.DataFrame(hits_int(ds, iters=2).to_pydict())
    dist = (
        hits_int(rd.from_pandas(df, override_num_blocks=3), iters=2,
                 max_inprocess_edges=0)
        .to_pandas()
    )
    key = ["side", "node"]
    a = inproc.sort_values(key).reset_index(drop=True)
    b = dist.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_node_triangles_hand_computed(ray_session):
    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    df = pd.DataFrame({"u": [1, 1, 1, 2, 2], "v": [2, 3, 4, 3, 4]})
    t = node_triangles(rd.from_pandas(df))
    got = dict(zip(t["node"].to_pylist(), t["tri"].to_pylist()))
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_node_triangles_paths_agree_and_sum_to_3x(ray_session):
    from kgray.ops.graph import triangle_count

    df = _rand_edges(n_nodes=20, n_edges=80)
    inproc = node_triangles(rd.from_pandas(df))
    inproc = dict(zip(inproc["node"].to_pylist(), inproc["tri"].to_pylist()))
    dist_t = node_triangles(
        rd.from_pandas(df, override_num_blocks=3), max_inprocess_edges=0
    ).to_pandas()
    dist = dict(zip(dist_t["node"], dist_t["tri"]))
    assert inproc == dist
    total = triangle_count(rd.from_pandas(df))["n_triangles"][0].as_py()
    assert sum(inproc.values()) == 3 * total


def test_lpa_hand_computed_star(ray_session):
    # star 1-{2,3,4} with self-votes: round 1 every vote set ties
    # (all counts 1) -> MIN label 1 everywhere; stable thereafter
    ds = rd.from_pandas(pd.DataFrame({"u": [1, 1, 1], "v": [2, 3, 4]}))
    t = lpa_labels(ds, rounds=3)
    got = dict(zip(t["node"].to_pylist(), t["lbl"].to_pylist()))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_lpa_two_node_community_converges(ray_session):
    # without the self-vote a 2-node community oscillates forever;
    # with it both nodes settle on the min id in one round
    ds = rd.from_pandas(pd.DataFrame({"u": [7], "v": [3]}))
    t = lpa_labels(ds, rounds=3)
    got = dict(zip(t["node"].to_pylist(), t["lbl"].to_pylist()))
    assert got == {3: 3, 7: 3}


def test_lpa_paths_agree(ray_session):
    df = _rand_edges(seed=13)
    inproc = lpa_labels(rd.from_pandas(df), rounds=3)
    inproc = dict(zip(inproc["node"].to_pylist(), inproc["lbl"].to_pylist()))
    dist_t = lpa_labels(
        rd.from_pandas(df, override_num_blocks=3), rounds=3,
        max_inprocess_edges=0,
    ).to_pandas()
    dist = dict(zip(dist_t["node"], dist_t["lbl"]))
    assert inproc == dist


def test_hits_empty_edges(ray_session):
    ds = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    )
    t = hits_int(ds)
    assert t.num_rows == 0


def test_bellman_ford_two_hop_beats_direct(ray_session):
    from kgray.ops.graph import bellman_ford

    # direct 1-3 costs 10; 1-2-3 costs 2+3=5; node 4 reachable in 3 hops
    df = pd.DataFrame(
        {"u": [1, 2, 1, 3], "v": [2, 3, 3, 4], "w": [2, 3, 10, 1]}
    )
    t = bellman_ford(rd.from_pandas(df), seeds=[1], rounds=3)
    got = dict(zip(t["node"].to_pylist(), t["dist"].to_pylist()))
    assert got == {1: 0, 2: 2, 3: 5, 4: 6}


def test_bellman_ford_paths_agree(ray_session):
    from kgray.ops.graph import bellman_ford

    df = _rand_edges(seed=23)
    rng = np.random.default_rng(5)
    df["w"] = rng.integers(1, 9, len(df)).astype(np.int64)
    inproc = bellman_ford(rd.from_pandas(df), seeds=[0, 5], rounds=3)
    inproc = dict(zip(inproc["node"].to_pylist(),
                      inproc["dist"].to_pylist()))
    dist_t = bellman_ford(
        rd.from_pandas(df, override_num_blocks=3), seeds=[0, 5],
        rounds=3, max_inprocess_edges=0,
    ).to_pandas()
    dist = dict(zip(dist_t["node"], dist_t["dist"]))
    assert inproc == dist


def test_bellman_ford_absent_seed_dropped(ray_session):
    from kgray.ops.graph import bellman_ford

    df = pd.DataFrame({"u": [1], "v": [2], "w": [4]})
    for kw in ({}, {"max_inprocess_edges": 0}):
        t = bellman_ford(rd.from_pandas(df), seeds=[1, 99], rounds=2, **kw)
        got = dict(zip(
            (t["node"].to_pylist() if isinstance(t, pa.Table)
             else t.to_pandas()["node"].tolist()),
            (t["dist"].to_pylist() if isinstance(t, pa.Table)
             else t.to_pandas()["dist"].tolist()),
        ))
        assert got == {1: 0, 2: 4}
