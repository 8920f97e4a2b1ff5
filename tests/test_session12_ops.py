"""Session-12: bounce rate (strict 30-min gap boundary; session
attributed to its START day) and cohort LTV (cents-exact revenue
matrix, week arithmetic on integer microseconds)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

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


def _events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)
    return df


def test_events_bounce_rate(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-05-01 10:00:00")
    rows = [
        # user 1: two events EXACTLY 1800s apart -> SAME session (strict >)
        (0, t0, 1, "x", 1.0),
        (1, t0 + pd.Timedelta(seconds=1800), 1, "x", 1.0),
        # then 1801s gap -> NEW single-event session -> bounce
        (2, t0 + pd.Timedelta(seconds=1800 + 1801), 1, "x", 1.0),
        # user 2: session starting 23:59 day 1, second event day 2:
        # attributed to day 1, NOT a bounce
        (3, pd.Timestamp("2025-05-02 23:59:00"), 2, "x", 1.0),
        (4, pd.Timestamp("2025-05-03 00:05:00"), 2, "x", 1.0),
    ]
    _events(tmp_path, rows)
    got, sql = _run("events_bounce_rate", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["day"])
    g = got.set_index("day")
    assert g.loc["2025-05-01", "n_sessions"] == 2
    assert g.loc["2025-05-01", "n_bounce"] == 1
    assert g.loc["2025-05-01", "bounce_rate"] == 0.5
    assert g.loc["2025-05-02", "n_sessions"] == 1
    assert g.loc["2025-05-02", "n_bounce"] == 0
    assert "2025-05-03" not in g.index  # session counted at its start


def test_events_cohort_ltv(ray_session, tmp_path):
    wk0 = pd.Timestamp("1970-01-01")  # week arithmetic is epoch-based
    rows = [
        # user 1: first active week W, spends 100 then 50 a week later
        (0, pd.Timestamp("2025-06-02"), 1, "x", 100.0),
        (1, pd.Timestamp("2025-06-09"), 1, "x", 50.0),
        # user 2: same cohort week, 25 in week 0 only (two events fold)
        (2, pd.Timestamp("2025-06-03"), 2, "x", 20.0),
        (3, pd.Timestamp("2025-06-04"), 2, "x", 5.0),
        # user 3: later cohort
        (4, pd.Timestamp("2025-06-16"), 3, "x", 7.5),
    ]
    _events(tmp_path, rows)
    got, sql = _run("events_cohort_ltv", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["cohort_wk", "age_wk"])
    g = got.set_index(["cohort_wk", "age_wk"])
    c0 = g.xs(got["cohort_wk"].min(), level=0)
    assert c0.loc[0, "n_users"] == 2
    assert c0.loc[0, "revenue"] == 125.0
    assert c0.loc[1, "n_users"] == 1
    assert c0.loc[1, "revenue"] == 50.0
