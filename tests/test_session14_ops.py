"""Session-14: churn label generation (7-day lookahead; last-day edge)
and sorted-neighborhood blocking (cross-name boundary pairs must equal
the global ROW_NUMBER window, incl. single-row name blocks)."""

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


def test_events_churn_labels(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-07-01 09:00:00")
    rows = []
    # user 1: days 0, 7 (exactly-7 gap -> NOT churned), 20 (churned,
    # gap 13), and day 20 is the last day -> churned
    for d in (0, 7, 20):
        rows.append((len(rows), t0 + pd.Timedelta(days=d), 1, "x", 1.0))
    # user 1 second event on day 0: distinct-day dedup
    rows.append((len(rows), t0 + pd.Timedelta(hours=2), 1, "x", 1.0))
    # user 2: days 0, 8 -> gap 8 > 7 -> day 0 churned
    for d in (0, 8):
        rows.append((len(rows), t0 + pd.Timedelta(days=d), 2, "x", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)
    got, sql = _run("events_churn_labels", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["user_id", "day"])
    g = got.set_index(["user_id", "day"])["churned"]
    assert g.loc[(1, "2025-07-01")] == 0   # returned exactly on day 7
    assert g.loc[(1, "2025-07-08")] == 1   # 13-day gap
    assert g.loc[(1, "2025-07-21")] == 1   # last day
    assert g.loc[(2, "2025-07-01")] == 1   # 8-day gap


def test_part_sorted_neighbor_pairs(ray_session, tmp_path):
    # name blocks of sizes 3 / 1 / 2: cross-boundary windows must close
    # exactly as the global ROW_NUMBER order does
    part = pd.DataFrame(
        {
            "p_partkey": np.array([10, 11, 12, 20, 30, 31], np.int64),
            "p_name": ["alpha", "alpha", "alpha", "beta",
                       "gamma", "gamma"],
        }
    )
    _write(tmp_path, "part", part)
    got, sql = _run("part_sorted_neighbor_pairs", tmp_path)
    exp = _oracle(tmp_path, sql, ["part"])
    _cmp(got, exp, ["k1", "k2"])
    pairs = set(map(tuple, got[["k1", "k2"]].to_numpy().tolist()))
    # global order: 10,11,12,20,30,31
    assert (12, 20) in pairs and (12, 30) in pairs  # across alpha->beta->gamma
    assert (20, 30) in pairs and (20, 31) in pairs  # beta (1 row) bridges
    assert (11, 20) in pairs                        # distance 2 across names
    assert (10, 20) not in pairs                    # distance 3


def test_events_weekday_adjusted(ray_session, tmp_path):
    # two Mondays (3 and 5 events) + one Tuesday (4): Monday mean 4 ->
    # residuals -1/+1; Tuesday residual exactly 0
    t0 = pd.Timestamp("2025-06-02")  # a Monday
    rows = []
    for d, k in [(0, 3), (7, 5), (1, 4)]:
        for i in range(k):
            rows.append((len(rows), t0 + pd.Timedelta(days=d, hours=i),
                         1, "x", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)
    got, sql = _run("events_weekday_adjusted", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["day"])
    g = got.set_index("day")["resid"]
    assert g.loc["2025-06-02"] == -1.0
    assert g.loc["2025-06-09"] == 1.0
    assert g.loc["2025-06-03"] == 0.0
