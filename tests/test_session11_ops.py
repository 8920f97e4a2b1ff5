"""Session-11 rank statistics: winsorized mean (exact integer-rank
thresholds; clip counts at the boundary) and Mann-Whitney U (tie-averaged
ranks — U must equal the brute pair count #(a>b) + ties/2)."""

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


def test_events_winsorized(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-01-01")
    # 40 values 1..40 for type a: lo rank (40+19)//20 = 2 -> lo = 2;
    # hi rank (19*40+19)//20 = 38 -> hi = 38; 1 clipped low, 2 high;
    # winsorized sum = 2 + sum(2..38) + 2*38 = 2+740+76 = 818
    rows = []
    for i in range(1, 41):
        rows.append((i, t0, 1, "a", float(i)))
    _events(tmp_path, rows)
    got, sql = _run("events_winsorized", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_type"])
    r = got.iloc[0]
    assert r["n_lo"] == 1 and r["n_hi"] == 2
    assert r["mean_winsor"] == pytest.approx(818 / 40, abs=1e-4)


def test_events_mannwhitney_matches_brute(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-01-01")
    a = [3.0, 5.0, 5.0, 9.0, 1.0]         # click
    b = [5.0, 2.0, 8.0, 5.0]               # purchase (ties with a!)
    rows = []
    eid = 0
    for v in a:
        rows.append((eid, t0, 1, "click", v)); eid += 1
    for v in b:
        rows.append((eid, t0, 2, "purchase", v)); eid += 1
    rows.append((eid, t0, 3, "view", 100.0))  # other types excluded
    _events(tmp_path, rows)
    got, sql = _run("events_mannwhitney", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["n1"])
    # brute: U1 = #(a > b) + 0.5 * #(a == b)
    gt = sum(1 for x in a for y in b if x > y)
    eq = sum(1 for x in a for y in b if x == y)
    assert got["u1"].iloc[0] == gt + 0.5 * eq
    assert got["n1"].iloc[0] == 5 and got["n2"].iloc[0] == 4
