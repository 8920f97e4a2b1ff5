"""Argmax row recovery, STRING_AGG profile, bitmap distinct — pinned
against brute python references; the argmax test plants exact acctbal
ties (the suppkey tiebreak must decide) and the bitmap test spreads ids
across multiple 2^16 chunks."""

import numpy as np
import pandas as pd


def test_top_supplier_per_nation_ties_break_on_suppkey(
    ray_session, tmp_path
):
    from kgray.queries import q_top_supplier_per_nation

    rng = np.random.default_rng(61)
    n = 80
    df = pd.DataFrame(
        {
            "s_suppkey": np.arange(n, dtype=np.int64),
            "s_name": [f"s{i}" for i in range(n)],
            "s_nationkey": rng.integers(0, 6, n).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(0, 1000, n), 2),
        }
    )
    # force an exact two-way tie at the max of nation 0
    m = df.index[df["s_nationkey"] == 0][:2]
    df.loc[m, "s_acctbal"] = 9999.99
    df.to_parquet(tmp_path / "supplier.parquet", index=False)

    got = (
        q_top_supplier_per_nation(str(tmp_path)).to_pandas()
        .sort_values("s_nationkey").reset_index(drop=True)
    )
    exp = (
        df.sort_values(["s_acctbal", "s_suppkey"],
                       ascending=[False, True], kind="mergesort")
        .groupby("s_nationkey").head(1)
        .sort_values("s_nationkey").reset_index(drop=True)
    )
    assert got["s_suppkey"].tolist() == exp["s_suppkey"].tolist()
    assert got["s_nationkey"].tolist() == exp["s_nationkey"].tolist()
    assert (got.loc[got["s_nationkey"] == 0, "s_suppkey"].iloc[0]
            == df.loc[m, "s_suppkey"].min())


def test_user_type_profile_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_user_type_profile

    rng = np.random.default_rng(63)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
            "value": 0.0,
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        q_user_type_profile(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    exp = {}
    for uid, g in df.groupby("user_id"):
        c = g["event_type"].value_counts()
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp[uid] = ",".join(t for t, _ in ranked)
    assert got["user_id"].tolist() == sorted(exp)
    assert got["profile"].tolist() == [exp[u] for u in sorted(exp)]


def test_events_distinct_bitmap_multi_chunk(ray_session, tmp_path):
    from kgray.queries import q_events_distinct_bitmap

    rng = np.random.default_rng(67)
    n = 3000
    # ids straddle three 2^16 chunks, with repeats
    users = rng.choice(
        np.concatenate(
            [rng.integers(0, 500, 400),
             rng.integers(1 << 16, (1 << 16) + 500, 400),
             rng.integers(1 << 17, (1 << 17) + 500, 400)]
        ),
        n,
    ).astype(np.int64)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": users,
            "event_type": rng.choice(["x", "y"], n),
            "value": 0.0,
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = dict(
        q_events_distinct_bitmap(str(tmp_path)).to_pandas()
        [["event_type", "n_users"]].itertuples(index=False)
    )
    exp = df.groupby("event_type")["user_id"].nunique().to_dict()
    assert got == exp
    assert len(set(df["user_id"].to_numpy() >> 16)) >= 3  # chunks hit
