"""Pareto skyline and expanding-distinct adoption — pinned against
brute O(n^2) / per-user python references; the skyline test plants
duplicate frontier cells (all must survive strict-domination NOT
EXISTS) and same-price dominated rows."""

import numpy as np
import pandas as pd


def test_pareto_skyline_matches_brute_n2(ray_session, tmp_path):
    from kgray.queries import q_pareto_parts

    rng = np.random.default_rng(71)
    n = 300
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "p_name": "p",
            "p_brand": "B",
            "p_type": "STANDARD",
            "p_size": rng.integers(1, 50, n).astype(np.int32),
            "p_retailprice": np.round(rng.uniform(1, 100, n), 2),
        }
    )
    # duplicate frontier cell: two rows with the identical best point
    df.loc[0, ["p_retailprice", "p_size"]] = [0.5, 49]
    df.loc[1, ["p_retailprice", "p_size"]] = [0.5, 49]
    # same-price dominated row (smaller size at the same price)
    df.loc[2, ["p_retailprice", "p_size"]] = [0.5, 10]
    df.to_parquet(tmp_path / "part.parquet", index=False)

    got = q_pareto_parts(str(tmp_path)).to_pandas()
    price = df["p_retailprice"].to_numpy()
    size = df["p_size"].to_numpy()
    keep = []
    for i in range(n):
        dominated = np.any(
            (price <= price[i]) & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
        if not dominated:
            keep.append(i)
    assert got["p_partkey"].tolist() == keep
    assert {0, 1} <= set(keep) and 2 not in keep


def test_events_adoption_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_adoption

    rng = np.random.default_rng(73)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-04-01")
            + pd.to_timedelta(rng.integers(0, 10 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 8, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d", "e"], n),
            "value": 0.0,
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        q_events_adoption(str(tmp_path)).to_pandas()
        .sort_values(["user_id", "day"]).reset_index(drop=True)
    )
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.assign(d=g["ts"].dt.floor("D"))
        for day in sorted(g["d"].unique()):
            seen = g.loc[g["d"] <= day, "event_type"].nunique()
            rows.append((uid, pd.Timestamp(day).strftime("%Y-%m-%d"),
                         seen))
    exp = pd.DataFrame(rows, columns=["user_id", "day", "n_types"])
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["day"].tolist() == exp["day"].tolist()
    assert got["n_types"].tolist() == exp["n_types"].tolist()
    # adoption is non-decreasing per user
    assert (
        got.groupby("user_id")["n_types"].apply(
            lambda s: (s.diff().dropna() >= 0).all()
        ).all()
    )
