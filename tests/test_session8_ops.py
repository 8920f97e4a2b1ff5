"""Session-8 operators: exact distributed deciles (rank selection with
tie-break) and day-over-day user-set Jaccard (zero-overlap days drop on
both engines)."""

import duckdb
import numpy as np
import pandas as pd

from kgray.queries import CATALOG


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet", index=False)


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _run(qname, tmp_path):
    fn, sql = CATALOG[qname]
    res = fn(str(tmp_path))
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    return got, sql


def _cmp(got, exp, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def test_events_value_deciles(ray_session, tmp_path):
    # n=10 shuffled values 1..10 -> decile q is exactly value q;
    # duplicated value (5.0 twice, distinct event_ids) pins the
    # (value, event_id) tie-break
    vals = [7.0, 2.0, 9.0, 5.0, 1.0, 10.0, 5.0, 3.0, 8.0, 6.0]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype=np.int64),
            "ts": pd.Timestamp("2025-01-01"),
            "user_id": np.int64(1),
            "event_type": "x",
            "value": np.array(vals, np.float64),
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)
    got, sql = _run("events_value_deciles", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["decile"])
    assert got.sort_values("decile")["value"].tolist() == [
        1.0, 2.0, 3.0, 5.0, 5.0, 6.0, 7.0, 8.0, 9.0
    ]


def test_events_day_overlap(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-06-01")
    rows = []
    # day0 {1,2,3}, day1 {2,3,4} -> jaccard 2/4; day1->day2 {9}: zero
    # overlap -> day1 row DROPS; day2 has no next day -> drops
    for d, users in [(0, [1, 2, 3]), (1, [2, 3, 4]), (2, [9])]:
        for u in users:
            rows.append((len(rows), t0 + pd.Timedelta(days=d, hours=u),
                         u, "x", 1.0))
    # duplicate (user, day) presence must not inflate the sets
    rows.append((len(rows), t0 + pd.Timedelta(hours=23), 1, "x", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)
    got, sql = _run("events_day_overlap", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["day"])
    assert got["day"].tolist() == ["2025-06-01"]
    assert got["jaccard"].iloc[0] == 0.5
