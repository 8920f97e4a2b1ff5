"""Upsert merge and late-data audit — pinned against brute python
references; the upsert test checks all three MERGE outcomes (kept,
updated, inserted) and the late test plants known out-of-order runs."""

import numpy as np
import pandas as pd


def test_orders_upsert_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_orders_upsert

    rng = np.random.default_rng(51)
    n = 400
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": "F",
            "o_totalprice": np.round(rng.uniform(100, 5000, n), 2),
            "o_orderdate": pd.Timestamp("1995-01-01"),
            "o_orderpriority": "3-MEDIUM",
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    got = (
        q_orders_upsert(str(tmp_path)).to_pandas()
        .sort_values("o_orderkey").reset_index(drop=True)
    )
    exp = {}
    for _, r in df.iterrows():
        exp[r["o_orderkey"]] = (round(r["o_totalprice"], 2), "F")
    for _, r in df.iterrows():
        if r["o_orderkey"] % 17 == 0:
            exp[r["o_orderkey"] + 1_000_000] = (
                round(r["o_totalprice"], 2), "N"
            )
        if r["o_orderkey"] % 10 == 0:
            exp[r["o_orderkey"]] = (round(r["o_totalprice"] + 100, 2), "U")
    assert got["o_orderkey"].tolist() == sorted(exp)
    for _, r in got.iterrows():
        price, status = exp[r["o_orderkey"]]
        assert abs(r["o_totalprice"] - price) < 1e-9
        assert r["o_orderstatus"] == status
    assert (got["o_orderstatus"] == "U").sum() == 40
    assert (got["o_orderstatus"] == "N").sum() == 24


def test_events_out_of_order_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_out_of_order

    rng = np.random.default_rng(53)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "ts": pd.Timestamp("2024-02-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "event_type": "x",
            "value": 0.0,
            "props": "{}",
        }
    )
    # one fully in-order user: ts strictly increases with event_id, so
    # it must report 0 lates, not vanish from the output
    m = df["user_id"] == 0
    df.loc[m, "ts"] = pd.Timestamp("2024-02-02") + pd.to_timedelta(
        df.loc[m, "event_id"].to_numpy() * 60, unit="s"
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = (
        q_events_out_of_order(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    exp = {}
    for uid, g in df.sort_values("event_id").groupby("user_id"):
        mx, late = None, 0
        for t in g["ts"]:
            if mx is not None and t < mx:
                late += 1
            mx = t if mx is None else max(mx, t)
        exp[uid] = late
    assert got["user_id"].tolist() == sorted(exp)
    assert got["n_late"].tolist() == [exp[u] for u in sorted(exp)]
    assert exp[0] == 0 and max(exp.values()) > 0
