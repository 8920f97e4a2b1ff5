"""Window batch (conversion lag, bounded-ROWS moving average) — pinned
against per-user python references on synthetic events with forced ties
and view-less / purchase-less users."""

import numpy as np
import pandas as pd


def _events(tmp_path, n=300, users=12, seed=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 4 * 86400, n), unit="s"),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase"], n, p=[0.5, 0.3, 0.2]
            ),
            "value": np.round(rng.uniform(0, 100, n), 2),
            "props": "{}",
        }
    )
    # forced tie: two same-user rows at the identical timestamp so the
    # event_id tiebreak in the moving-average frame is exercised
    df.loc[1, ["user_id", "ts"]] = [df.loc[0, "user_id"], df.loc[0, "ts"]]
    # user with purchases but no view: must not appear in conversion lag
    df.loc[df["user_id"] == 0, "event_type"] = "purchase"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


def test_conversion_lag_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_conversion_lag

    df = _events(tmp_path)
    got = (
        q_events_conversion_lag(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    exp = {}
    for uid, g in df.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        fv = views.min()
        purch = g.loc[
            (g["event_type"] == "purchase") & (g["ts"] >= fv), "ts"
        ]
        if purch.empty:
            continue
        exp[uid] = (purch.min() - fv).value // 1000  # ns -> us
    assert got["user_id"].tolist() == sorted(exp)
    assert got["lag_us"].tolist() == [exp[u] for u in sorted(exp)]
    assert 0 not in exp  # the view-less user is excluded by construction


def test_moving_avg_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_moving_avg

    df = _events(tmp_path)
    got = (
        q_events_moving_avg(str(tmp_path)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    exp = (
        s.groupby("user_id")["value"]
        .rolling(3, min_periods=1).mean()
        .reset_index(level=0, drop=True)
    )
    s = s.assign(exp=exp).sort_values("event_id")
    np.testing.assert_allclose(
        got["mov_avg"].to_numpy(), s["exp"].to_numpy(), atol=5.1e-5
    )
    assert len(got) == len(df)
