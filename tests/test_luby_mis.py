"""Luby MIS graph invariants: the 'in' set is independent, every 'out'
node has an 'in' neighbor, and when no node stays 'open' the set is
MAXIMAL; forced-distributed equals the in-process kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _rand_edges(seed, n=40, m=90):
    rs = np.random.RandomState(seed)
    u = rs.randint(0, n, m)
    v = rs.randint(0, n, m)
    keep = u != v
    return pd.DataFrame({
        "u": [f"w{x}" for x in u[keep]],
        "v": [f"w{x}" for x in v[keep]],
    }).drop_duplicates()


def _states(df, rounds=6):
    from kgray.ops.graph import luby_mis

    out = luby_mis(rd.from_arrow(pa.Table.from_pandas(df)),
                   rounds=rounds)
    out = out.to_pandas() if not isinstance(out, pa.Table) \
        else out.to_pandas()
    return dict(zip(out["node"], out["state"]))


def test_mis_invariants(ray_session):
    for seed in (1, 5, 9):
        df = _rand_edges(seed)
        st = _states(df)
        adj = {}
        for a, b in zip(df["u"], df["v"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        ins = {n for n, s in st.items() if s == "in"}
        # independence: no edge inside the MIS
        for a, b in zip(df["u"], df["v"]):
            assert not (a in ins and b in ins), (seed, a, b)
        # domination: every settled non-member borders a member
        for n, s in st.items():
            if s == "out":
                assert adj[n] & ins, (seed, n)
        # with enough rounds nothing stays open -> maximal
        assert "open" not in st.values(), seed


def test_mis_paths_agree(ray_session, monkeypatch):
    from kgray.ops.graph import luby_mis

    df = _rand_edges(3)
    a = _states(df, rounds=3)
    monkeypatch.setenv("KGRAY_FORCE_DISTRIBUTED", "1")
    b = _states(df, rounds=3)
    monkeypatch.delenv("KGRAY_FORCE_DISTRIBUTED")
    assert a == b
