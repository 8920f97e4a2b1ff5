"""Session-10 analytics operators: geometric mean (positive-domain),
min-max normalization (degenerate single-value group), Fano burstiness
(integer-exact moments; Poisson-like fixture ~1, bursty fixture >1),
and CUPED variance reduction (a covariate-explained shift must vanish
from the adjusted means)."""

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


def test_events_geomean(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-01-01")
    # type a: 2, 8 -> geomean exactly 4; a ZERO value must be excluded
    rows = [
        (0, t0, 1, "a", 2.0), (1, t0, 1, "a", 8.0), (2, t0, 1, "a", 0.0),
        (3, t0, 2, "b", 5.0),
    ]
    _events(tmp_path, rows)
    got, sql = _run("events_geomean", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_type"])
    g = got.set_index("event_type")["geomean"]
    assert g.loc["a"] == 4.0
    assert g.loc["b"] == 5.0


def test_events_minmax_norm(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-01-01")
    rows = [
        (0, t0, 1, "a", 10.0), (1, t0, 1, "a", 20.0),
        (2, t0, 1, "a", 15.0),
        (3, t0, 2, "b", 7.0), (4, t0, 2, "b", 7.0),  # zero span -> 0
    ]
    _events(tmp_path, rows)
    got, sql = _run("events_minmax_norm", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_id"])
    s = got.set_index("event_id")["scaled"]
    assert s.loc[0] == 0.0 and s.loc[1] == 1.0 and s.loc[2] == 0.5
    assert s.loc[3] == 0.0 and s.loc[4] == 0.0


def test_events_fano(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-01-01")
    rows = []
    eid = 0
    # 'flat': exactly 3 events every day for 6 days -> variance 0 ->
    # fano exactly 0; 'bursty': 1,1,1,9 across 4 days -> var 16, mean 3
    for d in range(6):
        for _ in range(3):
            rows.append((eid, t0 + pd.Timedelta(days=d, minutes=eid),
                         1, "flat", 1.0))
            eid += 1
    for d, k in enumerate([1, 1, 1, 9]):
        for _ in range(k):
            rows.append((eid, t0 + pd.Timedelta(days=d, minutes=eid),
                         2, "bursty", 1.0))
            eid += 1
    _events(tmp_path, rows)
    got, sql = _run("events_fano", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_type"])
    f = got.set_index("event_type")["fano"]
    assert f.loc["flat"] == 0.0
    assert f.loc["bursty"] == pytest.approx(16.0 / 3.0, abs=1e-6)


def test_events_cuped_removes_covariate_shift(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-01-01")
    rng = np.random.default_rng(5)
    rows = []
    eid = 0
    # y is EXACTLY 2x (pre) for every user, but arms get different
    # pre-period levels: raw mean_y differs by arm, CUPED-adjusted
    # means must coincide (the covariate explains everything)
    for uid in range(1, 21):
        base = 10.0 + (uid % 2) * 5.0 + float(rng.uniform(0, 1))
        rows.append((eid, t0, uid, "x", base)); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=20), uid, "x",
                     2.0 * base)); eid += 1
    _events(tmp_path, rows)
    got, sql = _run("events_cuped", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["arm"])
    m = got.set_index("arm")
    assert abs(m.loc[0, "mean_y"] - m.loc[1, "mean_y"]) > 5.0
    assert abs(m.loc[0, "mean_y_cuped"]
               - m.loc[1, "mean_y_cuped"]) < 1e-3
