"""Cross-operator invariants on randomized inputs: the gap-fill,
streaks, session-id, window-join, and median/MAD operators must agree
with each other and with per-user brute recomputation — catches
bucket-boundary bugs a single fixture can miss."""

import numpy as np
import pandas as pd
import pytest


def _random_events(tmp_path, seed, n_users=17, n_events=400):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(
                rng.integers(0, 40 * 86400, n_events), unit="s"
            ),
            "user_id": rng.integers(0, n_users, n_events).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase"], n_events
            ),
            "value": np.round(rng.uniform(-5, 5, n_events), 3),
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


@pytest.mark.parametrize("seed", [1, 22, 333])
def test_windowed_operator_invariants(ray_session, tmp_path, seed):
    from kgray.queries import (
        q_events_session_ids,
        q_events_window_join,
        q_user_daily_dense,
        q_user_streaks,
        q_user_value_mad,
        q_user_value_median,
    )

    df = _random_events(tmp_path, seed)
    sf = str(tmp_path)

    # gap-fill: per-user n sums to the user's event count; day range dense
    dense = q_user_daily_dense(sf).to_pandas()
    per_user = df.groupby("user_id").size()
    got_sum = dense.groupby("user_id")["n"].sum()
    assert got_sum.sort_index().tolist() == per_user.sort_index().tolist()
    for uid, g in dense.groupby("user_id"):
        days = np.sort(g["day"].to_numpy())
        assert (np.diff(days) == 1).all()

    # streaks: bounded by distinct days; == brute islands
    streaks = q_user_streaks(sf).to_pandas().set_index("user_id")
    days_of = (
        df.assign(day=df["ts"].values.astype("datetime64[D]")
                  .astype(np.int64))
        .groupby("user_id")["day"].apply(lambda s: np.unique(s.to_numpy()))
    )
    for uid, days in days_of.items():
        runs = np.split(days, np.where(np.diff(days) != 1)[0] + 1)
        assert streaks.loc[uid, "max_streak"] == max(len(r) for r in runs)

    # session ids: per user, ids are 1..k and non-decreasing in ts order
    sess = q_events_session_ids(sf).to_pandas()
    merged = sess.merge(df[["event_id", "ts"]], on="event_id")
    for uid, g in merged.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        idx = g["session_idx"].to_numpy()
        assert idx[0] == 1
        assert ((np.diff(idx) == 0) | (np.diff(idx) == 1)).all()

    # window join: == brute per-view count
    wj = q_events_window_join(sf).to_pandas().set_index("event_id")
    views = df[df["event_type"] == "view"]
    clicks = df[df["event_type"] == "click"]
    for _, v in views.iterrows():
        c = clicks[
            (clicks["user_id"] == v["user_id"])
            & (clicks["ts"] > v["ts"])
            & (clicks["ts"] <= v["ts"] + pd.Timedelta(minutes=10))
        ]
        assert wj.loc[v["event_id"], "n_follow"] == len(c)

    # median/MAD: == pandas brute (rounded like the ops)
    from kgray.util import round_half_up

    med = q_user_value_median(sf).to_pandas().set_index("user_id")["med"]
    mad = q_user_value_mad(sf).to_pandas().set_index("user_id")["mad"]
    bm = df.groupby("user_id")["value"].median()
    for uid in bm.index:
        assert med[uid] == round_half_up(np.float64(bm[uid]), 4)
        dev = (df[df["user_id"] == uid]["value"] - bm[uid]).abs().median()
        assert mad[uid] == round_half_up(np.float64(dev), 4)
