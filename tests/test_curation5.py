"""PII redaction, per-group median, windowed dedup, streaks, and
calendar gap-fill — edge cases the sf-corpus can't force: adjacent PII
patterns and ordering (email eats a phone-shaped local part), ts ties
resolved by event_id, single-day streaks, and gap days that must appear
as explicit zero rows."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_redact_pii_kernel_order_and_counts():
    from kgray.ops.text import redact_pii

    batch = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail a.b_c9@host.org now",
                "call 555-1234 or 021-99999 end",  # 2nd: 5 digits, 4 match
                "x 123-456@dom.com y",  # '-' is outside the local-part class
                "",
            ],
        }
    )
    out = redact_pii(batch)
    red = out["red"].to_pylist()
    assert red[0] == "mail <EMAIL> now"
    # {3,4} is greedy: 021-9999 matches, trailing 9 survives
    assert red[1] == "call <PHONE> or <PHONE>9 end"
    # the local-part class has no '-': the email starts at '456', and the
    # leftover '123-' has no digits after the dash, so no phone fires
    assert red[2] == "x 123-<EMAIL> y"
    assert red[3] == ""
    assert out["n_pii"].to_pylist() == [1, 2, 1, 0]


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


def test_hourly_dedup_breaks_ts_ties_by_event_id(ray_session, tmp_path):
    from kgray.queries import q_events_hourly_dedup

    _write_events(
        tmp_path,
        [
            (7, "2024-01-01 10:15:00", 1, "view", 0.0),
            (3, "2024-01-01 10:15:00", 1, "view", 0.0),  # same ts: id wins
            (9, "2024-01-01 10:59:00", 1, "view", 0.0),
            (1, "2024-01-01 11:00:00", 1, "view", 0.0),  # next hour
            (2, "2024-01-01 10:30:00", 2, "view", 0.0),  # other user
        ],
    )
    got = (
        q_events_hourly_dedup(str(tmp_path)).to_pandas()
        .sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)
    )
    assert got["first_event_id"].tolist() == [3, 1, 2]
    assert (got["user_id"].tolist(), len(got)) == ([1, 1, 2], 3)


def test_user_streaks_islands(ray_session, tmp_path):
    from kgray.queries import q_user_streaks

    rows = []
    # user 1: days 0,1,2 then 5,6 -> max streak 3
    for i, d in enumerate([0, 1, 2, 5, 6]):
        rows.append((i, pd.Timestamp("2024-03-01") + pd.Timedelta(days=d),
                     1, "view", 0.0))
    # user 2: one day, two events -> streak 1
    rows.append((10, "2024-03-04 01:00:00", 2, "view", 0.0))
    rows.append((11, "2024-03-04 23:00:00", 2, "view", 0.0))
    _write_events(tmp_path, rows)
    got = (
        q_user_streaks(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 2]
    assert got["max_streak"].tolist() == [3, 1]


def test_user_daily_dense_fills_gaps_with_zeros(ray_session, tmp_path):
    from kgray.queries import q_user_daily_dense

    rows = [
        (0, "2024-03-01 05:00:00", 1, "view", 0.0),
        (1, "2024-03-01 06:00:00", 1, "view", 0.0),
        (2, "2024-03-04 07:00:00", 1, "view", 0.0),  # 2 silent days
        (3, "2024-03-02 08:00:00", 2, "view", 0.0),  # single-day user
    ]
    _write_events(tmp_path, rows)
    got = (
        q_user_daily_dense(str(tmp_path)).to_pandas()
        .sort_values(["user_id", "day"]).reset_index(drop=True)
    )
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 4  # 1st..4th inclusive
    assert u1["n"].tolist() == [2, 0, 0, 1]
    assert (np.diff(u1["day"].to_numpy()) == 1).all()
    u2 = got[got["user_id"] == 2]
    assert len(u2) == 1 and u2["n"].tolist() == [1]


def test_user_value_median_interpolates_even_counts(ray_session, tmp_path):
    from kgray.queries import q_user_value_median

    rows = [
        (0, "2024-03-01", 1, "view", 1.0),
        (1, "2024-03-01", 1, "view", 2.0),
        (2, "2024-03-01", 1, "view", 10.0),
        (3, "2024-03-01", 1, "view", 11.0),  # even: (2+10)/2 = 6
        (4, "2024-03-01", 2, "view", 5.0),  # odd: exact value
    ]
    _write_events(tmp_path, rows)
    got = (
        q_user_value_median(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    assert got["med"].tolist() == [6.0, 5.0]
