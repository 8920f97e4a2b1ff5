"""Last-touch attribution and embedding drift — pinned against brute
python references; attribution plants a purchase outside the 1-day
window (must not be credited) and drift checks the block-boundary pair
(vec_id % W == 0) survives the range bucketing."""

import numpy as np
import pandas as pd


def test_events_attribution_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_attribution

    rng = np.random.default_rng(81)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-05-01")
            + pd.to_timedelta(rng.integers(0, 5 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "event_type": rng.choice(["click", "purchase", "view"], n),
            "value": np.round(rng.uniform(1, 50, n), 2),
            "props": "{}",
        }
    )
    # user 9: a lone click, then a purchase 2 days later -> NOT credited
    df.loc[0, ["user_id", "event_type", "ts"]] = [
        9, "click", pd.Timestamp("2024-05-01")
    ]
    df.loc[1, ["user_id", "event_type", "ts", "value"]] = [
        9, "purchase", pd.Timestamp("2024-05-03 00:00:01"), 10.0
    ]
    df.loc[df["user_id"] == 9, "event_type"] = df.loc[
        df["user_id"] == 9, "event_type"
    ].where(df.loc[df["user_id"] == 9].index.isin([0, 1]), "view")
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = (
        q_events_attribution(str(tmp_path)).to_pandas()
        .sort_values("hour").reset_index(drop=True)
    )
    exp = {}
    clicks = df[df["event_type"] == "click"]
    for _, p in df[df["event_type"] == "purchase"].iterrows():
        prior = clicks[
            (clicks["user_id"] == p["user_id"])
            & (clicks["ts"] <= p["ts"])
        ]
        if prior.empty:
            continue
        c = prior["ts"].max()
        if (p["ts"] - c).total_seconds() > 86400:
            continue
        h = c.strftime("%Y-%m-%d %H")
        cnt, val = exp.get(h, (0, 0.0))
        exp[h] = (cnt + 1, val + p["value"])
    assert got["hour"].tolist() == sorted(exp)
    assert got["n_purchases"].tolist() == [exp[h][0] for h in sorted(exp)]
    np.testing.assert_allclose(
        got["attributed_value"].to_numpy(),
        [exp[h][1] for h in sorted(exp)], atol=1e-3,
    )
    # the out-of-window purchase was not credited anywhere
    assert sum(v for _, v in exp.values()) < df.loc[
        df["event_type"] == "purchase", "value"
    ].sum()


def test_embed_drift_block_boundary(ray_session, tmp_path):
    from kgray.queries import q_embed_drift

    rng = np.random.default_rng(83)
    n, d = 120, 8
    # ids straddle the W=4096 boundary: 4090..4209
    ids = np.arange(4090, 4090 + n, dtype=np.int64)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": list(vecs),
            "label": np.zeros(n, np.int32),
        }
    )
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = (
        q_embed_drift(str(tmp_path)).to_pandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    # every consecutive pair present exactly once, incl. vec_id 4096
    assert got["vec_id"].tolist() == list(range(4091, 4090 + n))
    v = vecs.astype(np.float64)
    exp = (v[1:] * v[:-1]).sum(1) / (
        np.linalg.norm(v[1:], axis=1) * np.linalg.norm(v[:-1], axis=1)
    )
    np.testing.assert_allclose(
        got["cos"].to_numpy(), exp, atol=5.1e-5
    )
