"""Session-7 operator batch (weighted median, INTERSECT,
exact Gini via distributed sorted ranks, RANK-with-ties top-k) — oracle
parity over fixtures forcing the boundary semantics: the exact
2·cum == total weighted-median boundary, ties at the rank-3 cut, and a uniform distribution whose Gini must be
exactly the closed-form (n-1)-free value."""

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


def test_brand_weighted_median(ray_session, tmp_path):
    # brand A: values 100, 200, 300 with weights 1, 1, 2 -> total 4,
    # cum at 200 is 2 -> 2*2 >= 4 EXACTLY: lower median = 200.
    # brand B: single value.  Duplicate (brand, value) rows must fold.
    line = pd.DataFrame(
        {
            "l_partkey": [1, 2, 3, 3, 4],
            "l_extendedprice": [1.0, 2.0, 3.0, 3.0, 9.0],
            "l_quantity": [1.0, 1.0, 1.0, 1.0, 5.0],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": [1, 2, 3, 4], "p_brand": ["A", "A", "A", "B"]}
    )
    line["l_partkey"] = line["l_partkey"].astype(np.int64)
    part["p_partkey"] = part["p_partkey"].astype(np.int64)
    _write(tmp_path, "lineitem", line)
    _write(tmp_path, "part", part)
    got, sql = _run("brand_weighted_median", tmp_path)
    exp = _oracle(tmp_path, sql, ["lineitem", "part"])
    _cmp(got, exp, ["p_brand"])
    g = got.set_index("p_brand")["wmedian_cents"]
    assert g.loc["A"] == 200  # exact boundary -> lower median
    assert g.loc["B"] == 900


def test_users_click_and_purchase(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2, 3, 3], np.int64),
            "event_type": ["click", "click", "purchase",  # u1: both
                           "click",                        # u2: click only
                           "purchase", "view"],            # u3: no click
        }
    )
    _write(tmp_path, "events", df)
    got, sql = _run("users_click_and_purchase", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["user_id"])
    assert got["user_id"].tolist() == [1]


def test_revenue_gini_uniform_and_skewed(ray_session, tmp_path):
    # perfectly equal revenues: Gini exactly 0
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(8, dtype=np.int64),
            "o_custkey": np.arange(8, dtype=np.int64) % 4,
            "o_totalprice": np.full(8, 250.0),
        }
    )
    _write(tmp_path, "orders", orders)
    got, sql = _run("revenue_gini", tmp_path)
    exp = _oracle(tmp_path, sql, ["orders"])
    _cmp(got, exp, ["gini"])
    assert got["gini"].iloc[0] == 0.0
    # one customer holds everything extra: hand value via the formula
    orders2 = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([0, 1, 2, 3], np.int64),
            "o_totalprice": np.array([1.0, 1.0, 1.0, 97.0]),
        }
    )
    _write(tmp_path, "orders", orders2)
    got2, _ = _run("revenue_gini", tmp_path)
    exp2 = _oracle(tmp_path, sql, ["orders"])
    _cmp(got2, exp2, ["gini"])
    x = np.array([100, 100, 100, 9700], np.int64)
    hand = 2 * (np.arange(1, 5) * x).sum() / (4 * x.sum()) - 5 / 4
    assert abs(got2["gini"].iloc[0] - hand) < 1e-6


def test_top_suppliers_with_ties(ray_session, tmp_path):
    nation = pd.DataFrame(
        {"n_nationkey": np.array([0, 1], np.int64),
         "n_name": ["FRANCE", "KENYA"]}
    )
    supp = pd.DataFrame(
        {
            "s_nationkey": np.array([0, 0, 0, 0, 0, 1], np.int64),
            "s_name": ["s1", "s2", "s3", "s4", "s5", "k1"],
            # tie AT the rank-3 cut: s3 and s4 share 30.0 -> both kept
            "s_acctbal": [50.0, 40.0, 30.0, 30.0, 10.0, 7.5],
        }
    )
    _write(tmp_path, "nation", nation)
    _write(tmp_path, "supplier", supp)
    got, sql = _run("top_suppliers_with_ties", tmp_path)
    exp = _oracle(tmp_path, sql, ["nation", "supplier"])
    _cmp(got, exp, ["n_name", "s_name"])
    fr = got[got["n_name"] == "FRANCE"]
    assert sorted(fr["s_name"]) == ["s1", "s2", "s3", "s4"]  # 4 rows kept
    assert fr.set_index("s_name")["rnk"].loc["s3"] == 3
    assert fr.set_index("s_name")["rnk"].loc["s4"] == 3
    assert got[got["n_name"] == "KENYA"]["rnk"].tolist() == [1]
