"""RFM segmentation — pinned against a brute pandas reference with
percentile_disc-style cuts (rank = ceil(p*N)) and forced quartile ties."""

import numpy as np
import pandas as pd


def _pdisc(vals, p):
    s = np.sort(np.asarray(vals))
    rank = max(int(np.ceil(p * len(s))), 1)
    return s[rank - 1]


def test_events_rfm_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_rfm

    rng = np.random.default_rng(121)
    n, users = 600, 20
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-10")
            + pd.to_timedelta(rng.integers(0, 45 * 86400, n), unit="s"),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": "x",
            "value": np.round(rng.uniform(1, 30, n), 2),
            "props": "{}",
        }
    )
    # force frequency ties: users 0 and 1 get exactly the same activity
    df.loc[df["user_id"] == 1, "user_id"] = 0
    extra = df[df["user_id"] == 0].copy()
    extra["user_id"] = 1
    extra["event_id"] += 100_000
    df = pd.concat([df, extra], ignore_index=True)
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = dict(
        q_events_rfm(str(tmp_path)).to_pandas()
        [["rfm_code", "n_users"]].itertuples(index=False)
    )

    anchor = pd.Timestamp("2024-03-01")
    u = df.groupby("user_id").agg(
        last=("ts", "max"), freq=("ts", "size"), monetary=("value", "sum")
    )
    u["recency"] = (anchor - u["last"].dt.floor("D")).dt.days
    cuts = {
        c: [_pdisc(u[c], p) for p in (0.25, 0.5, 0.75)]
        for c in ("recency", "freq", "monetary")
    }

    def digit(v, qs):
        return 1 + (v > qs[0]) + (v > qs[1]) + (v > qs[2])

    codes = (
        digit(u["recency"], cuts["recency"]) * 100
        + digit(u["freq"], cuts["freq"]) * 10
        + digit(u["monetary"], cuts["monetary"])
    )
    exp = codes.value_counts().to_dict()
    assert got == exp
    # tied twins land in the same segment
    assert codes.loc[0] == codes.loc[1]
