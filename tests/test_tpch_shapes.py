"""TPC-H shape batch (Q4 EXISTS, Q13 left-join distribution, Q14
conditional ratio, Q22 scalar-subquery + anti-join, Q3 top-10 fold,
Q7 two-nation volume, Q10 returned-item top-20) — each pinned against
a brute-force pandas reference on synthetic tables that force the
interesting cases (zero-order customers, empty promo slice edge,
urgent-free customers, both nation-pair directions)."""

import numpy as np
import pandas as pd


def _tables(tmp_path, n_cust=30, n_orders=120, n_lines=400, seed=7):
    rng = np.random.default_rng(seed)
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 5, n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-500, 5000, n_cust), 2),
            "c_mktsegment": rng.choice(["BUILDING", "A"], n_cust),
        }
    )
    # leave the last 4 customers order-free so Q13's zero bucket is real
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust - 4, n_orders).astype(
                np.int64
            ),
            "o_orderstatus": "F",
            "o_totalprice": np.round(rng.uniform(100, 9000, n_orders), 2),
            "o_orderdate": pd.Timestamp("1995-01-01")
            + pd.to_timedelta(rng.integers(0, 500, n_orders), unit="D"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_orders
            ),
        }
    )
    line = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, n_lines).astype(
                np.int64
            ),
            "l_partkey": rng.integers(0, 20, n_lines).astype(np.int64),
            "l_suppkey": rng.integers(0, 5, n_lines).astype(np.int64),
            "l_linenumber": np.arange(n_lines, dtype=np.int32) % 7,
            "l_quantity": rng.integers(1, 51, n_lines).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(10, 2000, n_lines), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n_lines), 2),
            "l_tax": 0.0,
            "l_returnflag": rng.choice(["R", "N"], n_lines),
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1995-08-15")
            + pd.to_timedelta(rng.integers(0, 700, n_lines), unit="D"),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(20, dtype=np.int64),
            "p_name": [f"p{i}" for i in range(20)],
            "p_brand": rng.choice(
                ["Brand#12", "Brand#13", "Brand#23", "Brand#34"], 20
            ),
            "p_type": np.where(np.arange(20) % 3 == 0, "PROMO", "STANDARD"),
            "p_size": np.arange(20, dtype=np.int32),
            "p_retailprice": 1.0,
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(5, dtype=np.int64),
            "s_name": [f"s{i}" for i in range(5)],
            "s_nationkey": np.arange(5, dtype=np.int32),
            "s_acctbal": np.round(rng.uniform(0, 1000, 5), 2),
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(5, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(5)],
            # split across two regions so the Q8 ASIA gate really drops rows
            "n_regionkey": np.array([0, 0, 1, 1, 0], dtype=np.int32),
        }
    )
    region = pd.DataFrame(
        {
            "r_regionkey": np.array([0, 1], dtype=np.int32),
            "r_name": ["ASIA", "AMERICA"],
        }
    )
    for name, df in [
        ("customer", cust), ("orders", orders),
        ("lineitem", line), ("part", part),
        ("supplier", supplier), ("nation", nation),
        ("region", region),
    ]:
        df.to_parquet(tmp_path / f"{name}.parquet", index=False)
    return cust, orders, line, part


def test_tpch_q4_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q4

    cust, orders, line, part = _tables(tmp_path)
    got = (
        q_tpch_q4(str(tmp_path)).to_pandas()
        .sort_values("o_orderpriority").reset_index(drop=True)
    )
    win = orders[
        (orders["o_orderdate"] >= "1995-07-01")
        & (orders["o_orderdate"] < "1995-10-01")
    ]
    hot = set(line.loc[line["l_quantity"] > 45, "l_orderkey"])
    exp = (
        win[win["o_orderkey"].isin(hot)]
        .groupby("o_orderpriority").size().rename("n_orders")
        .reset_index().sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_orders"].tolist() == exp["n_orders"].tolist()


def test_tpch_q13_zero_bucket_counts_orderless_customers(
    ray_session, tmp_path
):
    from kgray.queries import q_tpch_q13

    cust, orders, _, _ = _tables(tmp_path)
    got = (
        q_tpch_q13(str(tmp_path)).to_pandas()
        .sort_values("c_count").reset_index(drop=True)
    )
    per_cust = (
        orders.groupby("o_custkey").size()
        .reindex(cust["c_custkey"], fill_value=0)
    )
    exp = per_cust.value_counts().sort_index()
    assert got["c_count"].tolist() == exp.index.tolist()
    assert got["custdist"].tolist() == exp.tolist()
    assert 0 in got["c_count"].tolist()  # the order-free tail is counted


def test_tpch_q14_matches_brute_ratio(ray_session, tmp_path):
    from kgray.queries import q_tpch_q14

    _, _, line, part = _tables(tmp_path)
    got = q_tpch_q14(str(tmp_path)).to_pandas()
    win = line[
        (line["l_shipdate"] >= "1995-09-01")
        & (line["l_shipdate"] < "1995-10-01")
    ].merge(part, left_on="l_partkey", right_on="p_partkey")
    rev = win["l_extendedprice"] * (1 - win["l_discount"])
    exp = 100.0 * rev[win["p_type"] == "PROMO"].sum() / rev.sum()
    assert abs(got["promo_revenue"].iloc[0] - exp) < 5e-5  # ROUND(.., 4)


def test_tpch_q22_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q22

    cust, orders, _, _ = _tables(tmp_path)
    got = (
        q_tpch_q22(str(tmp_path)).to_pandas()
        .sort_values("c_nationkey").reset_index(drop=True)
    )
    pos = cust.loc[cust["c_acctbal"] > 0, "c_acctbal"]
    thr = pos.sum() / len(pos)
    urgent = set(
        orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_custkey"]
    )
    keep = cust[
        (cust["c_acctbal"] > thr) & ~cust["c_custkey"].isin(urgent)
    ]
    exp = (
        keep.groupby("c_nationkey")
        .agg(numcust=("c_custkey", "size"), totacctbal=("c_acctbal", "sum"))
        .reset_index().sort_values("c_nationkey").reset_index(drop=True)
    )
    assert len(keep) > 0  # synthetic data exercises the anti-join keep side
    assert got["c_nationkey"].tolist() == exp["c_nationkey"].tolist()
    assert got["numcust"].tolist() == exp["numcust"].tolist()
    np.testing.assert_allclose(
        got["totacctbal"].to_numpy(), exp["totacctbal"].to_numpy(),
        atol=0.005,
    )


def test_tpch_q3_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q3
    from kgray.util import round_half_up

    cust, orders, line, _ = _tables(tmp_path)
    got = q_tpch_q3(str(tmp_path)).to_pandas().reset_index(drop=True)
    keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    o = orders[
        orders["o_custkey"].isin(keys)
        & (orders["o_orderdate"] < "1997-01-01")
    ]
    li = line[line["l_shipdate"] > "1997-01-01"].merge(
        o[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    li = li.assign(rev=li["l_extendedprice"] * (1 - li["l_discount"]))
    g = (
        li.groupby(["l_orderkey", "o_orderdate"])["rev"].sum()
        .reset_index(name="revenue")
    )
    g["revenue"] = round_half_up(g["revenue"].to_numpy(np.float64), 2)
    g["o_orderdate"] = g["o_orderdate"].dt.strftime("%Y-%m-%d")
    exp = g.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True], kind="mergesort",
    ).head(10).reset_index(drop=True)
    assert len(exp) > 0  # the synthetic window is non-degenerate
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    np.testing.assert_allclose(
        got["revenue"].to_numpy(), exp["revenue"].to_numpy(), atol=0.005
    )
    assert got["o_orderdate"].tolist() == exp["o_orderdate"].tolist()


def test_tpch_q7_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q7

    cust, orders, line, _ = _tables(tmp_path)
    got = (
        q_tpch_q7(str(tmp_path)).to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    li = line[
        (line["l_shipdate"] >= "1995-01-01")
        & (line["l_shipdate"] <= "1996-12-31")
    ].merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    sn = li["l_suppkey"].to_numpy()  # s_nationkey == s_suppkey in fixture
    cn = li["c_nationkey"].to_numpy()
    keep = ((sn == 1) & (cn == 2)) | ((sn == 2) & (cn == 1))
    li = li[keep]
    assert len(li) > 0  # both pair directions are exercised
    df = pd.DataFrame(
        {
            "supp_nation": "NATION_" + li["l_suppkey"].astype(str),
            "cust_nation": "NATION_" + li["c_nationkey"].astype(str),
            "l_year": li["l_shipdate"].dt.year.astype(np.int64),
            "rev": li["l_extendedprice"] * (1 - li["l_discount"]),
        }
    )
    exp = (
        df.groupby(["supp_nation", "cust_nation", "l_year"])["rev"].sum()
        .round(2).reset_index(name="revenue")
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=0.005)


def test_tpch_q10_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q10
    from kgray.util import round_half_up

    cust, orders, line, _ = _tables(tmp_path)
    got = q_tpch_q10(str(tmp_path)).to_pandas().reset_index(drop=True)
    o = orders[
        (orders["o_orderdate"] >= "1996-01-01")
        & (orders["o_orderdate"] < "1996-04-01")
    ]
    li = line[line["l_returnflag"] == "R"].merge(
        o[["o_orderkey", "o_custkey"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    li = li.assign(rev=li["l_extendedprice"] * (1 - li["l_discount"]))
    g = li.groupby("o_custkey")["rev"].sum().reset_index(name="revenue")
    g["revenue"] = round_half_up(g["revenue"].to_numpy(np.float64), 2)
    g = g.merge(cust, left_on="o_custkey", right_on="c_custkey")
    g["n_name"] = "NATION_" + g["c_nationkey"].astype(str)
    g["c_acctbal"] = round_half_up(g["c_acctbal"].to_numpy(np.float64), 2)
    exp = g.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True],
        kind="mergesort",
    ).head(20).reset_index(drop=True)
    assert len(exp) > 0
    assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
    np.testing.assert_allclose(
        got["revenue"].to_numpy(), exp["revenue"].to_numpy(), atol=0.005
    )
    assert got["n_name"].tolist() == exp["n_name"].tolist()


def test_tpch_q17_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q17

    _, _, line, part = _tables(tmp_path)
    got = q_tpch_q17(str(tmp_path)).to_pandas()
    keys = set(part.loc[part["p_brand"] == "Brand#13", "p_partkey"])
    li = line[line["l_partkey"].isin(keys)]
    assert len(li) > 0
    thr = 0.2 * li.groupby("l_partkey")["l_quantity"].transform("mean")
    exp = li.loc[li["l_quantity"] < thr, "l_extendedprice"].sum() / 7.0
    assert abs(got["avg_yearly"].iloc[0] - exp) < 0.005


def test_tpch_q19_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q19

    _, _, line, part = _tables(tmp_path)
    got = q_tpch_q19(str(tmp_path)).to_pandas()
    li = line.merge(part, left_on="l_partkey", right_on="p_partkey")
    keep = (
        (li["p_brand"] == "Brand#12") & li["p_size"].between(1, 10)
        & li["l_quantity"].between(1, 11)
    ) | (
        (li["p_brand"] == "Brand#23") & li["p_size"].between(1, 20)
        & li["l_quantity"].between(10, 20)
    ) | (
        (li["p_brand"] == "Brand#34") & li["p_size"].between(1, 30)
        & li["l_quantity"].between(20, 30)
    )
    kept = li[keep]
    assert len(kept) > 0
    exp = (kept["l_extendedprice"] * (1 - kept["l_discount"])).sum()
    assert abs(got["revenue"].iloc[0] - exp) < 0.005


def test_tpch_q21_sole_late_supplier_in_multi_supplier_orders(
    ray_session, tmp_path
):
    from kgray.queries import q_tpch_q21

    _, orders, line, _ = _tables(tmp_path)
    got = (
        q_tpch_q21(str(tmp_path)).to_pandas()
        .sort_values("s_name").reset_index(drop=True)
    )
    li = line.merge(
        orders[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    li = li.assign(
        is_late=li["l_shipdate"] > li["o_orderdate"] + pd.Timedelta(days=90)
    )
    rows = []
    for _, r in li[li["is_late"]].iterrows():
        grp = li[li["l_orderkey"] == r["l_orderkey"]]
        others = grp[grp["l_suppkey"] != r["l_suppkey"]]
        if len(others) and not others["is_late"].any():
            rows.append(r["l_suppkey"])
    exp = (
        pd.Series(rows, dtype=np.int64).value_counts().sort_index()
    )
    assert len(exp) > 0
    got = got.assign(k=got["s_name"].str.lstrip("s").astype(np.int64))
    got = got.sort_values("k")
    assert got["k"].tolist() == exp.index.tolist()
    assert got["numwait"].tolist() == exp.tolist()


def test_tpch_q8_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_tpch_q8

    cust, orders, line, part = _tables(tmp_path)
    got = (
        q_tpch_q8(str(tmp_path)).to_pandas()
        .sort_values("o_year").reset_index(drop=True)
    )
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"])
    asia = {0, 1, 4}  # nations in region 0 per the fixture
    li = line[line["l_partkey"].isin(promo)].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    ).merge(cust, left_on="o_custkey", right_on="c_custkey")
    li = li[li["c_nationkey"].isin(asia)]
    assert len(li) > 0 and li["l_suppkey"].nunique() > 1
    vol = li["l_extendedprice"] * (1 - li["l_discount"])
    df = pd.DataFrame(
        {
            "o_year": li["o_orderdate"].dt.year.astype(np.int64),
            "vol": vol,
            # s_nationkey == s_suppkey in the fixture
            "share": np.where(li["l_suppkey"] == 3, vol, 0.0),
        }
    )
    g = df.groupby("o_year").sum()
    exp = (g["share"] / g["vol"]).round(4)
    assert got["o_year"].tolist() == exp.index.tolist()
    np.testing.assert_allclose(
        got["mkt_share"].to_numpy(), exp.to_numpy(), atol=5e-5
    )


def test_tpch_q15_picks_global_max_supplier(ray_session, tmp_path):
    from kgray.queries import q_tpch_q15
    from kgray.util import round_half_up

    _, _, line, _ = _tables(tmp_path)
    got = q_tpch_q15(str(tmp_path)).to_pandas()
    win = line[
        (line["l_shipdate"] >= "1996-01-01")
        & (line["l_shipdate"] < "1996-04-01")
    ]
    assert len(win) > 0
    rev = (
        (win["l_extendedprice"] * (1 - win["l_discount"]))
        .groupby(win["l_suppkey"]).sum()
    )
    rev = pd.Series(
        round_half_up(rev.to_numpy(np.float64), 2), index=rev.index
    )
    winners = rev[rev == rev.max()]
    assert sorted(got["s_suppkey"].tolist()) == sorted(winners.index.tolist())
    np.testing.assert_allclose(
        np.sort(got["total_revenue"].to_numpy()),
        np.sort(winners.to_numpy()), atol=0.005,
    )
