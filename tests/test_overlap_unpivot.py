"""Interval-overlap join (sessions x spike hours) and UNPIVOT reshape,
pinned against pandas brute force on synthetic events that force the
interesting cases: a session straddling an hour boundary, a session
with zero overlaps, and a spike hour shared by several users."""

import numpy as np
import pandas as pd


def _events(tmp_path):
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1: one session 00:50 -> 01:10 (straddles the 00 and 01 hours)
    for m in (50, 55, 60, 65, 70):
        rows.append((1, base + pd.Timedelta(minutes=m)))
    # user 2: burst inside hour 00 (makes hour 00 a spike), then an
    # isolated event 3 days later (its own session, zero overlaps)
    for s in range(20):
        rows.append((2, base + pd.Timedelta(minutes=10, seconds=s)))
    rows.append((2, base + pd.Timedelta(days=3)))
    # user 3: single event inside hour 01
    rows.append((3, base + pd.Timedelta(minutes=75)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["event_type"] = "view"
    df["value"] = 1.0
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


def _brute(df, gap_s=1800, factor=1.2):
    h = df["ts"].dt.floor("h")
    counts = h.value_counts()
    thr = factor * counts.sum() / len(counts)
    spikes = counts[counts > thr].index
    out = {}
    for uid, g in df.sort_values("ts").groupby("user_id"):
        ts = g["ts"].reset_index(drop=True)
        sid = ((ts - ts.shift()).dt.total_seconds() > gap_s).cumsum()
        for _, s in ts.groupby(sid):
            s0, s1 = s.min(), s.max()
            n = sum(
                1 for w in spikes
                if s1 >= w and s0 < w + pd.Timedelta(hours=1)
            )
            if n:
                out[uid] = out.get(uid, 0) + n
    return out


def test_session_overlap_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_session_overlap

    df = _events(tmp_path)
    got = q_events_session_overlap(str(tmp_path)).to_pandas()
    exp = _brute(df)
    assert exp, "fixture must produce at least one spike overlap"
    assert dict(zip(got["user_id"], got["n_overlaps"])) == exp
    # user 2's isolated day-3 session contributes nothing beyond the
    # burst session's overlaps; users absent from exp are absent here
    assert set(got["user_id"]) == set(exp)


def test_session_overlap_straddling_session_counts_both_hours(
    ray_session, tmp_path
):
    from kgray.queries import q_events_session_overlap

    df = _events(tmp_path)
    got = q_events_session_overlap(
        str(tmp_path), spike_factor=0.0
    ).to_pandas()
    # with every hour a spike, user 1's 00:50->01:10 session must count
    # BOTH hours it touches
    assert int(got.loc[got["user_id"] == 1, "n_overlaps"].iloc[0]) == 2


def test_lineitem_unpivot_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_lineitem_unpivot

    rng = np.random.default_rng(3)
    line = pd.DataFrame(
        {
            "l_quantity": rng.integers(1, 50, 100).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(10, 2000, 100), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, 100), 2),
        }
    )
    line.to_parquet(tmp_path / "lineitem.parquet", index=False)
    got = (
        q_lineitem_unpivot(str(tmp_path)).to_pandas()
        .set_index("measure").sort_index()
    )
    assert got["n"].tolist() == [100, 100, 100]
    for m in ("quantity", "extendedprice", "discount"):
        assert abs(got.loc[m, "total"] - line[f"l_{m}"].sum()) < 0.005
