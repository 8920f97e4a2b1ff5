"""Second TPC-H shape batch (Q2 correlated-min, Q9 multi-join profit,
Q11 scalar-threshold fold, Q12 conditional counts, Q16 NOT-IN distinct
count, Q20 dominant-share nested aggregation) — each pinned against the
same DuckDB SQL the driver oracle runs, over synthetic tables that force
the edge cases: min-cost TIES (Q2's DISTINCT must collapse them), a part
shipped EXACTLY 50/50 between two suppliers (Q20's strict > must drop
both — quantity sums are integral so the compare is exact), suppliers
with negative balances (Q16's NOT IN), and parts outside every gate."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _tables(tmp_path, seed=11):
    rng = np.random.default_rng(seed)
    n_parts, n_sup, n_orders, n_lines = 40, 12, 150, 600
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(n_parts, dtype=np.int64),
            "p_name": [
                ("red widget" if i % 3 == 0
                 else "small bolt" if i % 3 == 1 else "blue gear")
                for i in range(n_parts)
            ],
            "p_brand": rng.choice(["Brand#1", "Brand#2", "Brand#3"], n_parts),
            "p_type": np.where(np.arange(n_parts) % 4 == 0, "PROMO",
                               np.where(np.arange(n_parts) % 4 == 1,
                                        "LARGE", "STANDARD")),
            # size 15 hits the Q2 gate; mix of Q16's IN-list sizes
            "p_size": np.where(
                np.arange(n_parts) == 5, 15,  # p5 is LARGE: pins a Q2 hit
                rng.choice([1, 5, 10, 15, 20, 25, 33], n_parts)
            ).astype(np.int32),
            "p_retailprice": np.round(rng.uniform(1, 20, n_parts), 2),
        }
    )
    s_nat = (np.arange(n_sup) % 6).astype(np.int32)
    s_nat[-2:] = 7  # Q11's NATION_7 gate needs suppliers to hit
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(n_sup, dtype=np.int64),
            "s_name": [f"s{i}" for i in range(n_sup)],
            "s_nationkey": s_nat,
            # two negative balances feed Q16's NOT IN
            "s_acctbal": np.round(
                np.where(np.arange(n_sup) % 5 == 0, -50.0,
                         rng.uniform(0, 1000, n_sup)), 2),
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(6, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(6)],
            # nations 0/2/4 EUROPE-region, 1/3 ASIA, 5 AMERICA
            "n_regionkey": np.array([0, 1, 0, 1, 0, 2], dtype=np.int32),
        }
    )
    region = pd.DataFrame(
        {
            "r_regionkey": np.array([0, 1, 2], dtype=np.int32),
            "r_name": ["EUROPE", "ASIA", "AMERICA"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, 30, n_orders).astype(np.int64),
            "o_orderstatus": "F",
            "o_totalprice": np.round(rng.uniform(100, 9000, n_orders), 2),
            "o_orderdate": pd.Timestamp("1995-06-01")
            + pd.to_timedelta(rng.integers(0, 700, n_orders), unit="D"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"], n_orders
            ),
        }
    )
    line = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, n_lines).astype(
                np.int64
            ),
            "l_partkey": rng.integers(0, n_parts, n_lines).astype(np.int64),
            "l_suppkey": rng.integers(0, n_sup, n_lines).astype(np.int64),
            "l_linenumber": np.arange(n_lines, dtype=np.int32) % 7,
            "l_quantity": rng.integers(1, 51, n_lines).astype(np.float64),
            # coarse price grid so Q2 min-cost TIES actually occur
            "l_extendedprice": (
                rng.integers(1, 8, n_lines) * 100.0
            ),
            "l_discount": np.round(rng.uniform(0, 0.1, n_lines), 2),
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": rng.choice(["O", "F"], n_lines),
            "l_shipdate": pd.Timestamp("1995-10-01")
            + pd.to_timedelta(rng.integers(0, 600, n_lines), unit="D"),
        }
    )
    # force a Q20 exact-half part: one 'small' part shipped 30/30 in 1996
    # by two suppliers — strict > must exclude both
    half = pd.DataFrame(
        {
            "l_orderkey": [0, 1],
            "l_partkey": [1, 1],  # p1 is 'small bolt'
            "l_suppkey": [2, 3],
            "l_linenumber": [1, 2],
            "l_quantity": [30.0, 30.0],
            "l_extendedprice": [100.0, 100.0],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": [pd.Timestamp("1996-03-01")] * 2,
        }
    )
    # Q2 tie: part 5 (size 15, LARGE) bought at the same bottom price
    # from two EUROPE suppliers (nations 0 and 4) — DISTINCT must keep
    # both rows, and duplicate (supplier, price) lines must collapse
    tie = pd.DataFrame(
        {
            "l_orderkey": [2, 3, 4],
            "l_partkey": [5, 5, 5],
            "l_suppkey": [0, 4, 4],
            "l_linenumber": [1, 2, 3],
            "l_quantity": [5.0, 5.0, 5.0],
            "l_extendedprice": [50.0, 50.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.0],
            "l_returnflag": ["N", "N", "N"],
            "l_linestatus": ["O", "O", "O"],
            "l_shipdate": [pd.Timestamp("1996-05-01")] * 3,
        }
    )
    # Q20 dominance: supplier 1 (ASIA nation 1) ships the bulk of
    # 'small' part 4 in 1996 — must survive the strict > half test
    dom = pd.DataFrame(
        {
            "l_orderkey": [5, 6],
            "l_partkey": [4, 4],
            "l_suppkey": [1, 2],
            "l_linenumber": [1, 2],
            "l_quantity": [500.0, 10.0],
            "l_extendedprice": [100.0, 100.0],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": [pd.Timestamp("1996-07-01")] * 2,
        }
    )
    line = pd.concat([line, half, tie, dom], ignore_index=True)
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(30, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(30)],
            "c_nationkey": (np.arange(30) % 6).astype(np.int32),
            "c_acctbal": 1.0,
            "c_mktsegment": "BUILDING",
        }
    )
    tables = {
        "part": part, "supplier": supplier, "nation": nation,
        "region": region, "orders": orders, "lineitem": line,
        "customer": customer,
    }
    for name, df in tables.items():
        df.to_parquet(tmp_path / f"{name}.parquet", index=False)
    return tables


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _cmp(got, exp, sort_cols, float_cols=(), atol=1e-9):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        if c in float_cols:
            np.testing.assert_allclose(
                got[c].to_numpy(np.float64), exp[c].to_numpy(np.float64),
                atol=atol,
            )
        else:
            assert got[c].tolist() == exp[c].tolist(), c


@pytest.mark.parametrize(
    "qname,sort_cols,float_cols",
    [
        ("tpch_q2", ["p_partkey", "s_name", "cost"], ("s_acctbal", "cost")),
        ("tpch_q9", ["n_name", "o_year"], ("sum_profit",)),
        ("tpch_q11", ["l_partkey"], ("value",)),
        ("tpch_q12", ["l_linestatus"], ()),
        ("tpch_q16", ["p_brand", "p_size"], ()),
        ("tpch_q20", ["s_name"], ()),
    ],
)
def test_tpch_shape_matches_duckdb(ray_session, tmp_path, qname,
                                   sort_cols, float_cols):
    from kgray.queries import CATALOG

    tables = _tables(tmp_path)
    fn, sql = CATALOG[qname]
    res = fn(str(tmp_path))
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    exp = _oracle(tmp_path, sql, tables)
    assert len(exp) > 0, f"{qname}: degenerate fixture (empty oracle)"
    _cmp(got, exp, sort_cols, float_cols)


def test_q2_fixture_has_min_cost_ties(tmp_path):
    """The coarse price grid must actually produce >= one part whose
    min EU cost is achieved by two different (supplier, line) rows —
    otherwise the DISTINCT in Q2 is untested."""
    t = _tables(tmp_path)
    line, part, sup = t["lineitem"], t["part"], t["supplier"]
    eu_nations = {0, 2, 4}
    eu = set(sup.loc[sup["s_nationkey"].isin(eu_nations), "s_suppkey"])
    gate = set(part.loc[(part["p_size"] == 15)
                        & (part["p_type"] == "LARGE"), "p_partkey"])
    l = line[line["l_partkey"].isin(gate) & line["l_suppkey"].isin(eu)]
    assert len(l) > 0
    mc = l.groupby("l_partkey")["l_extendedprice"].transform("min")
    winners = l[l["l_extendedprice"] == mc]
    assert winners.groupby("l_partkey").size().max() >= 2


def test_q20_exact_half_share_excluded(ray_session, tmp_path):
    """Part 1 is shipped exactly 30/30 by suppliers 2 and 3 in 1996;
    the strict > half test must drop both (integral quantities make the
    compare exact in both engines)."""
    from kgray.queries import q_tpch_q20

    tables = _tables(tmp_path)
    got = q_tpch_q20(str(tmp_path)).to_pandas()
    line = tables["lineitem"]
    win = line[
        (line["l_shipdate"] >= "1996-01-01")
        & (line["l_shipdate"] < "1997-01-01")
        & (line["l_partkey"] == 1)
    ]
    q = win.groupby("l_suppkey")["l_quantity"].sum()
    # fixture sanity: suppliers 2 and 3 each hold exactly half of p1
    if set(q.index) == {2, 3} and q[2] == q[3]:
        only_p1 = {2, 3}
        # a supplier dominating ONLY p1 must be absent from the result
        for s in only_p1:
            dominated_elsewhere = False
            w = line[
                (line["l_shipdate"] >= "1996-01-01")
                & (line["l_shipdate"] < "1997-01-01")
                & (line["l_suppkey"] == s)
            ]
            for pk, grp in w.groupby("l_partkey"):
                if pk == 1 or tables["part"].loc[pk, "p_name"][:5] != "small":
                    continue
                allp = line[
                    (line["l_shipdate"] >= "1996-01-01")
                    & (line["l_shipdate"] < "1997-01-01")
                    & (line["l_partkey"] == pk)
                ]
                if grp["l_quantity"].sum() > 0.5 * allp["l_quantity"].sum():
                    dominated_elsewhere = True
            if not dominated_elsewhere:
                assert f"s{s}" not in set(got["s_name"])
