"""Drawdown, trigram paths, seasonal anomaly — pinned against brute
python references; trigrams force a cross-user boundary that must NOT
produce a path, drawdown plants a known monotone-then-crash series."""

import numpy as np
import pandas as pd


def _events(tmp_path, n=350, users=8, seed=111):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-06-01")
            + pd.to_timedelta(rng.integers(0, 6 * 86400, n), unit="s"),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


def test_events_drawdown_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_drawdown

    df = _events(tmp_path)
    got = dict(
        q_events_drawdown(str(tmp_path)).to_pandas()
        [["user_id", "max_drawdown"]].itertuples(index=False)
    )
    exp = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        run, best = -np.inf, np.inf
        for v in g["value"]:
            run = max(run, v)
            best = min(best, v - run)
        exp[uid] = best
    assert set(got) == set(exp)
    for u in exp:
        assert got[u] == exp[u]  # exact floats: no arithmetic drift
    assert all(v <= 0 for v in got.values())


def test_events_trigrams_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_trigrams

    df = _events(tmp_path)
    got = q_events_trigrams(str(tmp_path)).to_pandas()
    counts = {}
    for _, g in df.groupby("user_id"):
        et = g.sort_values(["ts", "event_id"], kind="mergesort")[
            "event_type"
        ].tolist()
        for i in range(len(et) - 2):
            p = ">".join(et[i:i + 3])
            counts[p] = counts.get(p, 0) + 1
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got["path"].tolist() == [p for p, _ in exp]
    assert got["n_paths"].tolist() == [c for _, c in exp]
    # conservation: total trigrams == sum over users of max(len-2, 0)
    total = sum(counts.values())
    assert total == sum(
        max(len(g) - 2, 0) for _, g in df.groupby("user_id")
    )


def test_events_seasonal_anomaly_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_seasonal_anomaly

    df = _events(tmp_path, n=800)
    # spike: one hour cell gets a burst far above its baseline
    burst = df.head(60).copy()
    burst["ts"] = pd.Timestamp("2024-06-03 07:30:00")
    burst["event_id"] = np.arange(10_000, 10_000 + len(burst))
    pd.concat([df, burst], ignore_index=True).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    got = q_events_seasonal_anomaly(str(tmp_path)).to_pandas()
    assert (
        (got["day"] == "2024-06-03") & (got["hod"] == "07")
    ).any()
    assert (got["z"].abs() > 2).all()
