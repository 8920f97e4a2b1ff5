"""kgray.queries.tpch — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)



# ---------------------------------------------------------------------------
# TPC-H-ish conformance: groupby / join / sort / window
# ---------------------------------------------------------------------------

def q_tpch_q1(sf_dir: str):
    """Per-batch combiner first (pre_aggregate): the shuffle moves one row
    per (batch, flag, status) instead of one per lineitem.  The money
    sums are INTEGRAL (price -> cents, disc_price -> cents x integer
    (100 - disc%) = 1e-4-dollar units) and divide back only at the final
    pinned ROUND: float accumulation of 4-decimal products lands the
    group totals exactly on half-cent boundaries at sf0.1+ (measured:
    2697140231.625), where the two engines' summation orders disagree —
    the Q9 integral-coefficient lesson applied to Q1.  Exact-int range
    holds to ~sf100 (2^53 of 1e-4 units); beyond that both engines'
    DOUBLE casts degrade identically."""


    cutoff = datetime.datetime(1998, 9, 2)

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff)))
        cents = round_half_up(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        disc_pct = round_half_up(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "cents": pa.array(cents),
                "disc_units": pa.array(cents * (100 - disc_pct)),
            }
        )

    ds = pre_aggregate(
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"],
        ).map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "cents": ("cents", "sum"),
            "disc_units": ("disc_units", "sum"),
            "count_order": (None, "count"),
        },
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(
                    round_half_up(
                        batch["sum_qty"].to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
                "sum_base_price": pa.array(
                    round_half_up(
                        batch["cents"].to_numpy().astype(np.float64)
                        / 100.0, 2
                    ),
                    pa.float64(),
                ),
                "sum_disc_price": pa.array(
                    round_half_up(
                        batch["disc_units"].to_numpy().astype(np.float64)
                        / 10000.0, 2
                    ),
                    pa.float64(),
                ),
                "count_order": batch["count_order"],
            }
        )

    return ds.map_batches(finalize, batch_format="pyarrow")


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS sum_base_price,
       ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_mktsegment_revenue(sf_dir: str):
    """orders (fact) x customer (dim): BROADCAST the small side once via
    the object store, Arrow-join per batch — no shuffle; then combiner
    groupby."""

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="inner"
    )
    ds = pre_aggregate(
        joined, ["c_mktsegment"],
        {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    )
    return _round_col(ds, "revenue", 2)


SQL_MKTSEGMENT_REVENUE = """
SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_supplier_balance_by_region(sf_dir: str):
    """3-way dimension join: nation and region are tiny -> both broadcast
    (no shuffle at all before the final small groupby)."""

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    j1 = broadcast_join(sup, nat, on="s_nationkey", right_on="n_nationkey",
                        how="inner")
    j2 = broadcast_join(j1, reg, on="n_regionkey", right_on="r_regionkey",
                        how="inner")
    ds = pre_aggregate(
        j2, ["r_name", "n_name"],
        {"n_suppliers": (None, "count"), "total_bal": ("s_acctbal", "sum")},
    )
    return _round_col(ds, "total_bal", 2)


SQL_SUPPLIER_BALANCE_BY_REGION = """
SELECT r_name, n_name, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_top_customers(sf_dir: str):
    """Global sort + limit (T-ops, SURVEY.md §2.6)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    ds = _round_col(ds, "c_acctbal", 2)
    return ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(10)


SQL_TOP_CUSTOMERS = (
    "SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal FROM customer "
    "ORDER BY c_acctbal DESC, c_custkey LIMIT 10"
)


def q_part_type_stats(sf_dir: str):

    ds = pre_aggregate(
        _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"]),
        ["p_type"],
        {
            "n": (None, "count"),
            "avg_price": ("p_retailprice", "mean"),
            "max_size": ("p_size", "max"),
        },
    )
    return _round_col(ds, "avg_price", 2)


SQL_PART_TYPE_STATS = """
SELECT p_type, COUNT(*) AS n, ROUND(AVG(p_retailprice), 2) AS avg_price,
       MAX(p_size) AS max_size
FROM part GROUP BY p_type
"""


def q_orders_monthly(sf_dir: str):

    def bucket(batch: pa.Table) -> pa.Table:
        s = batch["o_orderdate"].to_pandas().dt.strftime("%Y-%m")
        return pa.table(
            {
                "month": pa.array(s, pa.string()),
                "o_totalprice": batch["o_totalprice"],
            }
        )


    ds = pre_aggregate(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(bucket, batch_format="pyarrow"),
        ["month"],
        {"n_orders": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    return _round_col(ds, "total", 2)


SQL_ORDERS_MONTHLY = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY month
"""
