"""Market-basket pair mining and time-decay aggregate — pinned against
brute python references on synthetic tables with forced duplicate
lineitem rows (distinct-before-pairing) and cross-bucket pair folds."""

import itertools
import math

import numpy as np
import pandas as pd


def test_basket_pairs_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_basket_pairs

    rng = np.random.default_rng(23)
    n = 600
    df = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 150, n).astype(np.int64),
            "l_partkey": rng.integers(0, 12, n).astype(np.int64),
        }
    )
    # duplicate (order, part) rows: support must count ORDERS, not rows
    df = pd.concat([df, df.head(50)], ignore_index=True)
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)

    got = q_basket_pairs(str(tmp_path)).to_pandas()
    support = {}
    for _, g in df.groupby("l_orderkey"):
        for a, b in itertools.combinations(
            sorted(set(g["l_partkey"])), 2
        ):
            support[(a, b)] = support.get((a, b), 0) + 1
    exp = sorted(
        support.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:20]
    assert list(zip(got["p1"], got["p2"])) == [k for k, _ in exp]
    assert got["n_orders"].tolist() == [v for _, v in exp]
    assert exp[0][1] > 1  # the fold across order-buckets is exercised


def test_events_decay_sum_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_decay_sum

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-05")
            + pd.to_timedelta(rng.integers(0, 40 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 15, n).astype(np.int64),
            "event_type": "x",
            "value": np.round(rng.uniform(0, 100, n), 2),
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        q_events_decay_sum(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    anchor = pd.Timestamp("2024-03-01")
    w = df["ts"].dt.floor("D").map(
        lambda d: math.exp(-(anchor - d).days / 7.0)
    )
    exp = (
        (df["value"] * w).groupby(df["user_id"]).sum()
        .sort_index()
    )
    assert got["user_id"].tolist() == exp.index.tolist()
    np.testing.assert_allclose(
        got["decay_sum"].to_numpy(), exp.to_numpy(), atol=1e-4
    )
