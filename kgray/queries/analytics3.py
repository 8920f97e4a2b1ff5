"""kgray.queries.analytics3 — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)
from kgray.io import read_parquet_clean as _rpqc



def q_events_drawdown(sf_dir: str):
    """Running-max drawdown per user (the monitoring/finance window):
    min(value - running max) over (ts, event_id) order.  One user
    cogroup; the running max is a per-user groupby cummax and the
    output is exact float subtraction + MIN — no arithmetic that could
    drift, so no rounding is needed for oracle parity."""

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        run = df.groupby("user_id", sort=False)["value"].cummax()
        dd = df["value"].to_numpy(np.float64) - run.to_numpy(np.float64)
        out = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "dd": dd})
            .groupby("user_id", sort=False)["dd"].min()
        )
        return pd.DataFrame(
            {
                "user_id": out.index.to_numpy(np.int64),
                "max_drawdown": out.to_numpy(np.float64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_DRAWDOWN = """
SELECT user_id, MIN(value - run_max) AS max_drawdown
FROM (SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_max
      FROM events)
GROUP BY 1
"""


def q_events_trigrams(sf_dir: str):
    """Behavioral path mining: top-5 three-step event-type sequences
    (per-user (ts, event_id) order), ties broken lexicographically.
    The double shift-pairing runs vectorized inside ONE user cogroup,
    trigram partials fold through the combiner (the trigram alphabet is
    tiny — 125 keys — so groupby.aggregate compresses well here), and
    the top-5 sorts a vocabulary-sized table."""

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        if len(df) < 3:
            return pd.DataFrame({"path": np.array([], object),
                                 "n": np.array([], np.int64)})
        same = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        path = pd.Series(et[:-2][same]).str.cat(
            [pd.Series(et[1:-1][same]), pd.Series(et[2:][same])], sep=">"
        )
        out = path.value_counts()
        return pd.DataFrame(
            {"path": out.index.to_numpy(),
             "n": out.to_numpy(np.int64)}
        )

    partial = grouped_map(ev, "user_id", per_bucket)
    folded = pre_aggregate(partial, ["path"], {"n_paths": ("n", "sum")})
    return folded.sort(
        ["n_paths", "path"], descending=[True, False]
    ).limit(5)


SQL_EVENTS_TRIGRAMS = """
WITH s AS (SELECT user_id, event_type,
                  LAG(event_type, 1) OVER w AS p1,
                  LAG(event_type, 2) OVER w AS p2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT p2 || '>' || p1 || '>' || event_type AS path,
             CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM s WHERE p2 IS NOT NULL GROUP BY 1)
SELECT path, n_paths FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_paths DESC, path) AS r FROM t)
WHERE r <= 5
"""


def q_events_seasonal_anomaly(sf_dir: str):
    """Seasonal-baseline anomaly detection: per (date, hour-of-day)
    event counts compared against that hour-of-day's cross-date mean
    and std; emit cells beyond 2 sigma.  Counts fold through the
    combiner; the 24-row baseline attaches by closure (aggregate ->
    join-back-to-aggregate at a coarser grain, no second shuffle).
    The z math follows the zscore-outliers formula for bit parity."""

    ev = _read(sf_dir, "events", ["ts"])

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(batch["ts"], "%Y-%m-%d"),
                "hod": pc.strftime(batch["ts"], "%H"),
            }
        )

    cells = pre_aggregate(
        ev.map_batches(keyed, batch_format="pyarrow"),
        ["day", "hod"], {"n": (None, "count")},
    ).materialize()

    base = cells.to_pandas()  # (days x 24) rows: metadata-scale
    g = base.groupby("hod")["n"]
    stats = pd.DataFrame(
        {"k": g.size(), "sv": g.sum(), "sq": (base["n"] ** 2).groupby(
            base["hod"]).sum()}
    )
    mu = stats["sv"] / stats["k"]
    sd = np.sqrt(np.maximum(stats["sq"] / stats["k"] - mu * mu, 0.0))
    mu_of, sd_of = mu.to_dict(), sd.to_dict()

    def flag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["hod"].map(mu_of).to_numpy(np.float64)
        s = df["hod"].map(sd_of).to_numpy(np.float64)
        z = (df["n"].to_numpy(np.float64) - m) / np.where(s == 0, 1, s)
        keep = np.abs(z) > 2.0
        return pa.table(
            {
                "day": pa.array(df["day"].to_numpy()[keep], pa.string()),
                "hod": pa.array(df["hod"].to_numpy()[keep], pa.string()),
                "z": pa.array(round_half_up(z[keep], 4), pa.float64()),
            }
        )

    return cells.map_batches(flag, batch_format="pyarrow")


SQL_EVENTS_SEASONAL_ANOMALY = """
WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  strftime(ts, '%H') AS hod,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
b AS (SELECT hod, CAST(COUNT(*) AS DOUBLE) AS k,
             CAST(SUM(n) AS DOUBLE) AS sv,
             CAST(SUM(n * n) AS DOUBLE) AS sq
      FROM c GROUP BY 1),
t AS (SELECT hod, sv / k AS mu,
             sqrt(GREATEST(sq / k - (sv / k) * (sv / k), 0)) AS sd
      FROM b)
SELECT day, c.hod,
       ROUND((n - mu) / CASE WHEN sd = 0 THEN 1 ELSE sd END, 4) AS z
FROM c JOIN t ON c.hod = t.hod
WHERE abs((n - mu) / CASE WHEN sd = 0 THEN 1 ELSE sd END) > 2.0
"""


def q_events_rfm(sf_dir: str):
    """RFM customer segmentation (the classic marketing pipeline): ONE
    combiner fold to per-user (recency, frequency, monetary), three
    exact rank-quantile cuts over the user-scale table (distinct-value
    histogram folds — never row-scale on the driver), then a stateless
    quartile-code assignment and a tiny per-code fold.  Quartile digit
    = 1 + (> p25) + (> p50) + (> p75): deterministic under ties, same
    closed form in the oracle."""
    from kgray.ops.sample import rank_quantiles

    anchor_day = np.datetime64("2024-03-01").astype("datetime64[D]")
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def keyed(batch: pa.Table) -> pa.Table:
        day = batch["ts"].to_numpy().astype("datetime64[D]")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "dayidx": pa.array(
                    day.astype(np.int64), pa.int64()
                ),
                "value": batch["value"],
            }
        )

    users = pre_aggregate(
        ev.map_batches(keyed, batch_format="pyarrow"),
        ["user_id"],
        {"last_day": ("dayidx", "max"), "freq": (None, "count"),
         "monetary": ("value", "sum")},
    ).map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "recency": pc.subtract(
                    pa.scalar(int(anchor_day.astype(np.int64))),
                    b["last_day"],
                ),
                "freq": b["freq"],
                "monetary": b["monetary"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    cuts = {
        dim: rank_quantiles(users, dim, [0.25, 0.50, 0.75])["value"]
        .to_pylist()
        for dim in ("recency", "freq", "monetary")
    }

    def code(batch: pa.Table) -> pa.Table:
        def digit(col, qs):
            v = batch[col].to_numpy(zero_copy_only=False)
            return (
                1 + (v > qs[0]).astype(np.int64)
                + (v > qs[1]).astype(np.int64)
                + (v > qs[2]).astype(np.int64)
            )

        rfm = (
            digit("recency", cuts["recency"]) * 100
            + digit("freq", cuts["freq"]) * 10
            + digit("monetary", cuts["monetary"])
        )
        return pa.table({"rfm_code": pa.array(rfm, pa.int64())})

    coded = users.map_batches(code, batch_format="pyarrow")
    return pre_aggregate(coded, ["rfm_code"],
                         {"n_users": (None, "count")})


SQL_EVENTS_RFM = """
WITH u AS (SELECT user_id,
             CAST(date_diff('day', MAX(CAST(ts AS DATE)),
                            DATE '2024-03-01') AS BIGINT) AS recency,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(value) AS monetary
           FROM events GROUP BY 1),
q AS (SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY recency) AS r25,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY recency) AS r50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY recency) AS r75,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY freq) AS f25,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY freq) AS f50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY freq) AS f75,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m25,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m75
      FROM u)
SELECT CAST((1 + (recency > r25)::INT + (recency > r50)::INT
               + (recency > r75)::INT) * 100
          + (1 + (freq > f25)::INT + (freq > f50)::INT
               + (freq > f75)::INT) * 10
          + (1 + (monetary > m25)::INT + (monetary > m50)::INT
               + (monetary > m75)::INT) AS BIGINT) AS rfm_code,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u, q GROUP BY 1
"""


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority top-10): both fact reads are
    date-pruned at the parquet scan, the BUILDING customer-key set
    gates orders via ``semi_join`` (auto broadcast/bloom), lineitem
    and the surviving orders bucket-join on orderkey, and — because
    the group key (orderkey) is near-unique, so a combiner cannot
    compress the shuffle (the Q18 lesson) — the revenue fold runs
    INSIDE the same coarse orderkey cogroup with an in-bucket top-10
    (lossless for a global top-10); the driver folds buckets x 10
    rows.  Ranking uses the ROUNDED revenue with orderkey tiebreak so
    both engines order identically under float-sum ulp drift."""



    cutoff = datetime.datetime(1997, 1, 1)
    building = _read(sf_dir, "customer",
                     ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = _rpqc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pds.field("o_orderdate") < cutoff,
    )
    orders = semi_join(orders, building, on="o_custkey",
                       right_on="c_custkey")
    line = _rpqc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_shipdate") > cutoff,
    )
    joined = bucket_join(
        line,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        d = d.assign(rev=d["l_extendedprice"] * (1 - d["l_discount"]))
        g = (
            d.groupby("l_orderkey", sort=False)
            .agg(revenue=("rev", "sum"), o_orderdate=("o_orderdate", "first"))
            .reset_index()
        )
        g["revenue"] = round_half_up(g["revenue"].to_numpy(np.float64), 2)
        g = g.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(10)
        g["o_orderdate"] = g["o_orderdate"].dt.strftime("%Y-%m-%d")
        return g[["l_orderkey", "revenue", "o_orderdate"]]

    cand = grouped_map(joined, "l_orderkey", fold).to_pandas()
    top = cand.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True], kind="mergesort",
    ).head(10)
    return pa.Table.from_pandas(top, preserve_index=False)


SQL_TPCH_Q3 = """
WITH g AS (
  SELECT l_orderkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
  FROM customer, orders, lineitem
  WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
    AND l_orderkey = o_orderkey
    AND o_orderdate < DATE '1997-01-01' AND l_shipdate > DATE '1997-01-01'
  GROUP BY 1, 3)
SELECT l_orderkey, revenue, o_orderdate FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY revenue DESC, o_orderdate, l_orderkey) AS r FROM g)
WHERE r <= 10
"""


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape (volume shipping between two nations): BOTH fact
    sides are nation-pre-filtered via broadcast dimension maps BEFORE
    the big-big orderkey shuffle, so the all-to-all moves only the two
    nations' rows (~2/|nations| of the data); the (supp, cust) pair
    gate and the year extraction are vectorized Arrow kernels, and the
    final (nation, nation, year) fold compresses through the combiner."""



    n1, n2 = 1, 2
    line = _rpqc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1995, 1, 1))
        & (pds.field("l_shipdate") <= datetime.datetime(1996, 12, 31)),
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            b["s_nationkey"], value_set=pa.array([n1, n2], pa.int32())
        )),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey", how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            b["c_nationkey"], value_set=pa.array([n1, n2], pa.int32())
        )),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        line,
        orders.select_columns(["o_orderkey", "c_nationkey"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].tolist(), nat["n_name"].tolist()))

    def shape(batch: pa.Table) -> pa.Table:
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((sn == n1) & (cn == n2)) | ((sn == n2) & (cn == n1))
        b = batch.filter(pa.array(keep))
        rev = pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"]),
        )
        sn, cn = sn[keep], cn[keep]
        return pa.table(
            {
                "supp_nation": pa.array(
                    [name_of[int(k)] for k in sn], pa.string()
                ),
                "cust_nation": pa.array(
                    [name_of[int(k)] for k in cn], pa.string()
                ),
                "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "rev": rev,
            }
        )

    shaped = joined.map_batches(shape, batch_format="pyarrow")
    ds = pre_aggregate(
        shaped, ["supp_nation", "cust_nation", "l_year"],
        {"revenue": ("rev", "sum")},
    )
    return _round_col(ds, "revenue", 2)


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_nationkey = 1 AND n2.n_nationkey = 2)
          OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
GROUP BY 1, 2, 3
"""


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 shape (returned-item top customers): the revenue fold
    runs BELOW the dimension joins — lineitem('R') bucket-joins the
    date-pruned orders on orderkey, folds to one row per custkey
    (combiner-compressed), and only that bounded aggregate joins the
    customer/nation dims (the tiny side broadcasts INTO the customer
    stream, so no row-scale data ever re-shuffles).  Top-20 ranks on
    the ROUNDED revenue with custkey tiebreak (ulp-safe, as Q3)."""



    orders = _rpqc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pds.field("o_orderdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("o_orderdate") < datetime.datetime(1996, 4, 1)),
    )
    line = _rpqc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == "R",
    )
    joined = bucket_join(
        line, orders, on="l_orderkey", right_on="o_orderkey", how="inner"
    )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "rev": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    per_cust = pre_aggregate(
        joined.map_batches(rev, batch_format="pyarrow"),
        ["o_custkey"], {"revenue": ("rev", "sum")},
    )
    per_cust = _round_col(per_cust, "revenue", 2)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    named = broadcast_join(cust, per_cust, on="c_custkey",
                           right_on="o_custkey", how="inner")
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    named = broadcast_join(named, nat, on="c_nationkey",
                           right_on="n_nationkey", how="inner")
    named = _round_col(named, "c_acctbal", 2)
    return (
        named.select_columns(
            ["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]
        )
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
    )


SQL_TPCH_Q10 = """
WITH g AS (
  SELECT c_custkey, c_name,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         ROUND(c_acctbal, 2) AS c_acctbal, n_name
  FROM customer, orders, lineitem, nation
  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1996-04-01'
    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
  GROUP BY 1, 2, 4, 5)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS r
  FROM g)
WHERE r <= 20
"""


def q_tpch_q17(sf_dir: str, brand: str = "Brand#13"):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-part scalar subquery (0.2 * AVG(l_quantity) per partkey)
    collapses into ONE partkey cogroup — each bucket computes the avg
    and applies the gate in the same pass, so the brand-pruned slice
    shuffles exactly once and nothing is re-read.  l_quantity is
    integer-valued, so sum/count (hence the avg and the strict-less
    gate) are bit-exact in both engines."""

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_brand"], brand)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]),
        part, on="l_partkey", right_on="p_partkey",
    )

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("l_partkey", sort=False)["l_quantity"]
        thr = 0.2 * g.transform("sum") / g.transform("size")
        kept = d.loc[d["l_quantity"] < thr, "l_extendedprice"]
        return pd.DataFrame({"s": [float(kept.sum())]})

    parts = grouped_map(line, "l_partkey", fold)
    total = parts.sum("s") or 0.0
    val = float(round_half_up(np.float64(total / 7.0), 2))
    return pa.table({"avg_yearly": pa.array([val], pa.float64())})


SQL_TPCH_Q17 = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 shape (disjunctive predicate join): the part dim is
    pre-pruned to the brands/sizes any disjunct can accept and ships
    once as a broadcast map; each lineitem batch evaluates the whole
    OR-of-ANDs as vectorized Arrow/numpy masks (no row loop, no
    per-disjunct re-join); revenue folds through per-batch partials to
    a single driver row."""

    DISJUNCTS = [  # (brand, max_size, qty_lo, qty_hi)
        ("Brand#12", 10, 1.0, 11.0),
        ("Brand#23", 20, 10.0, 20.0),
        ("Brand#34", 30, 20.0, 30.0),
    ]
    brands = pa.array([d[0] for d in DISJUNCTS])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                 ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_in(b["p_brand"], value_set=brands),
                pc.and_(pc.greater_equal(b["p_size"], 1),
                        pc.less_equal(b["p_size"], 30)),
            )
        ),
        batch_format="pyarrow",
    )
    line = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(line, part, on="l_partkey",
                            right_on="p_partkey", how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        brand = batch["p_brand"].to_numpy(zero_copy_only=False)
        size = batch["p_size"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(brand), bool)
        for b, mx, lo, hi in DISJUNCTS:
            keep |= (brand == b) & (size <= mx) & (qty >= lo) & (qty <= hi)
        t = batch.filter(pa.array(keep))
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]),
        )
        return pa.table({"s": pa.array([pc.sum(rev).as_py() or 0.0])})

    total = joined.map_batches(partial, batch_format="pyarrow").sum("s") or 0.0
    val = float(round_half_up(np.float64(total), 2))
    return pa.table({"revenue": pa.array([val], pa.float64())})


SQL_TPCH_Q19 = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this corpus: a line is LATE when l_shipdate > o_orderdate + 90
    days (no commit/receipt dates here).  The EXISTS / NOT EXISTS pair
    of lineitem self-joins collapses into ONE orderkey cogroup — each
    bucket computes, per order, the distinct-supplier and
    late-supplier sets and keeps late lines of the sole late supplier
    in multi-supplier orders — so the self-join never materializes.
    Per-supplier counts partial-fold in-bucket; names attach via the
    broadcast supplier dim (cf. reference join staging,
    classification/data_prepare.py)."""



    orders = _rpqc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        filter=pds.field("o_orderstatus") == "F",
    )
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = bucket_join(line, orders, on="l_orderkey",
                         right_on="o_orderkey", how="inner")

    lag = datetime.timedelta(days=90)

    def mark(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        odate = batch["o_orderdate"].to_numpy()
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "is_late": pa.array(ship > odate + np.timedelta64(lag)),
            }
        )

    marked = joined.map_batches(mark, batch_format="pyarrow")

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        nsupp = d.groupby("l_orderkey", sort=False)["l_suppkey"].nunique()
        late = d[d["is_late"]]
        lsupp = late.groupby("l_orderkey", sort=False)["l_suppkey"].nunique()
        sole = lsupp[lsupp == 1].index
        multi = nsupp[nsupp > 1].index
        ok = sole.intersection(multi)
        kept = late[late["l_orderkey"].isin(ok)]
        return (
            kept.groupby("l_suppkey", sort=False).size()
            .reset_index(name="w")
        )

    waits = grouped_map(marked, "l_orderkey", fold)
    per_supp = pre_aggregate(waits, ["l_suppkey"], {"numwait": ("w", "sum")})
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = broadcast_join(per_supp, sup, on="l_suppkey",
                           right_on="s_suppkey", how="inner")
    return named.select_columns(["s_name", "numwait"])


SQL_TPCH_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM late l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY 1
"""


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 shape (national market share): both fact sides are
    gated BEFORE the single big-big orderkey shuffle — lineitem by the
    PROMO-part semi-join plus the broadcast supplier-nation map,
    orders by the broadcast customer map and the ASIA nation-set
    filter — then the conditional (share vs total) volume sums fold
    per year through the combiner and the ratio is one driver-side
    vectorized divide."""

    SHARE_NATION = 3

    promo = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_type"], "PROMO")).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"]),
        promo, on="l_partkey", right_on="p_partkey",
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner")

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_regs = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    asia_keys = pa.array(
        sorted(nat.loc[nat["n_regionkey"].isin(asia_regs),
                       "n_nationkey"].tolist())
    )
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey", how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            pc.cast(b["c_nationkey"], pa.int64()), value_set=asia_keys
        )),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        line.select_columns(["l_orderkey", "s_nationkey",
                             "l_extendedprice", "l_discount"]),
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey", right_on="o_orderkey", how="inner",
    )

    def shape(batch: pa.Table) -> pa.Table:
        vol = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        share = pc.if_else(
            pc.equal(pc.cast(batch["s_nationkey"], pa.int64()),
                     pa.scalar(SHARE_NATION, pa.int64())),
            vol, pa.scalar(0.0),
        )
        return pa.table(
            {
                "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
                "vol": vol,
                "share": share,
            }
        )

    sums = pre_aggregate(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["o_year"], {"share": ("share", "sum"), "vol": ("vol", "sum")},
    ).to_pandas()  # one row per year: metadata-scale
    return pa.table(
        {
            "o_year": pa.array(sums["o_year"].to_numpy(np.int64)),
            "mkt_share": pa.array(
                round_half_up(
                    sums["share"].to_numpy(np.float64)
                    / sums["vol"].to_numpy(np.float64),
                    4,
                ),
                pa.float64(),
            ),
        }
    )


SQL_TPCH_Q8 = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 3 THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             s_nationkey AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND p_type = 'PROMO')
GROUP BY 1
"""


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 shape (top supplier): quarter revenue folds per
    suppkey through the combiner, is ROUNDED before the max gate (so
    the scalar comparison is ulp-safe in both engines), the global max
    is a Dataset aggregate (no driver materialization of the fold),
    and only the winner row(s) join the broadcast supplier names."""


    from kgray.util import rename_cols

    line = _rpqc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1996, 4, 1)),
    )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_suppkey": batch["l_suppkey"],
                "rev": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    per_supp = pre_aggregate(
        line.map_batches(rev, batch_format="pyarrow"),
        ["l_suppkey"], {"total_revenue": ("rev", "sum")},
    )
    per_supp = _round_col(per_supp, "total_revenue", 2).materialize()
    best = per_supp.max("total_revenue")
    winners = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b["total_revenue"], best)),
        batch_format="pyarrow",
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = broadcast_join(winners, sup, on="l_suppkey",
                           right_on="s_suppkey", how="inner")
    return rename_cols(
        named.select_columns(["l_suppkey", "s_name", "total_revenue"]),
        {"l_suppkey": "s_suppkey"},
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT l_suppkey AS s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_events_session_overlap(sf_dir: str, gap_s: int = 1800,
                             spike_factor: float = 1.2):
    """Interval-overlap join: per-user session intervals [min ts, max
    ts] (gap-based, built in one user cogroup) against global SPIKE
    hours (hourly counts > factor x the mean hourly count — a
    metadata-scale interval set by construction: <= hours-in-range
    rows at any data size).  The spike hour-starts broadcast as one
    sorted array and each session counts its overlaps with two
    searchsorted probes — no row loop, no second shuffle; per-user
    totals fold through the combiner."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    hours = pre_aggregate(
        ev.map_batches(
            lambda b: pa.table(
                {"h": pc.floor_temporal(b["ts"], unit="hour")}
            ),
            batch_format="pyarrow",
        ),
        ["h"], {"c": (None, "count")},
    ).to_pandas()
    thr = spike_factor * hours["c"].sum() / len(hours)
    spikes = np.sort(
        hours.loc[hours["c"] > thr, "h"].to_numpy().astype("datetime64[us]")
    )
    one_h = np.timedelta64(3600, "s")

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new = prev.isna() | ((df["ts"] - prev).dt.total_seconds() > gap_s)
        sid = new.cumsum()
        g = df.groupby([df["user_id"], sid], sort=False)["ts"]
        s0 = g.min().to_numpy().astype("datetime64[us]")
        s1 = g.max().to_numpy().astype("datetime64[us]")
        uid = g.min().index.get_level_values(0).to_numpy(np.int64)
        # window [h, h+1h) overlaps session [s0, s1] iff h <= s1 and
        # h > s0 - 1h: two searchsorted probes per session
        lo = np.searchsorted(spikes, s0 - one_h, side="right")
        hi = np.searchsorted(spikes, s1, side="right")
        n = (hi - lo).astype(np.int64)
        out = pd.DataFrame({"user_id": uid, "n": n})
        return out[out["n"] > 0]

    per_sess = grouped_map(ev, "user_id", sessions)
    return pre_aggregate(per_sess, ["user_id"],
                         {"n_overlaps": ("n", "sum")})


SQL_EVENTS_SESSION_OVERLAP = """
WITH g AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
s AS (SELECT user_id, sid, MIN(ts) AS s0, MAX(ts) AS s1
      FROM m GROUP BY 1, 2),
w AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1
      HAVING COUNT(*) > 1.2 * (SELECT COUNT(*) FROM events)
                             / (SELECT COUNT(DISTINCT date_trunc('hour', ts))
                                FROM events))
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps
FROM s JOIN w ON s.s1 >= w.h AND s.s0 < w.h + INTERVAL 1 HOUR
GROUP BY 1
"""


def q_lineitem_unpivot(sf_dir: str):
    """Wide -> long UNPIVOT reshape: each batch emits the three measure
    columns stacked into (measure, value) long format with one
    vectorized concat (no row loop, no three separate scans — the
    UNION ALL oracle reads the table three times; the Ray reshape
    reads it once), then per-measure stats fold through the combiner."""

    MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]
    line = _read(sf_dir, "lineitem", MEASURES)

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vals = np.concatenate(
            [batch[m].to_numpy(zero_copy_only=False) for m in MEASURES]
        )
        names = np.repeat(
            np.array([m[2:] for m in MEASURES], dtype=object), n
        )
        return pa.table(
            {
                "measure": pa.array(names, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    long = line.map_batches(melt, batch_format="pyarrow")
    stats = pre_aggregate(
        long, ["measure"],
        {"n": (None, "count"), "total": ("value", "sum")},
    )
    return _round_col(stats, "total", 2)


SQL_LINEITEM_UNPIVOT = """
SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total
FROM (SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem)
GROUP BY 1
"""


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shape (priority by line status; no shipmode column in
    this corpus, l_linestatus stands in): the 1996 shipdate slice prunes
    lineitem at the read, ONE big-big orderkey cogroup attaches the
    order priority, and the two conditional counts fold through the
    combiner — the shuffle moves one row per (batch, status)."""



    line = _rpqc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1997, 1, 1)),
    ).select_columns(["l_orderkey", "l_linestatus"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = bucket_join(line, orders, on="l_orderkey",
                         right_on="o_orderkey", how="inner")

    def shape(batch: pa.Table) -> pa.Table:
        hi = pc.cast(
            pc.is_in(batch["o_orderpriority"],
                     value_set=pa.array(["1-URGENT", "2-HIGH"])),
            pa.int64(),
        )
        return pa.table(
            {
                "l_linestatus": batch["l_linestatus"],
                "high": hi,
                "low": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )

    return pre_aggregate(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["l_linestatus"],
        {"high_line_count": ("high", "sum"),
         "low_line_count": ("low", "sum")},
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY 1
"""


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 shape (min-cost supplier per part; lineitem is the
    part-supplier association — this corpus has no partsupp): the
    correlated MIN subquery decorrelates into a per-part min fold
    (combiner groupby) joined back on (partkey, exact price equality —
    untouched doubles compare bit-exact).  Part and supplier gates
    prune the fact scan BEFORE the fold: the size/type part filter is
    a broadcast semi-join, the EUROPE supplier map ships once.  The
    final DISTINCT is a key-only pre_aggregate."""

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_size", "p_type"]).map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["p_size"], 15),
                    pc.equal(b["p_type"], "LARGE"))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice"]),
        parts, on="l_partkey", right_on="p_partkey",
    )

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    eu_regs = set(reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"])
    eu_nat = nat[nat["n_regionkey"].isin(eu_regs)]
    name_of = dict(zip(eu_nat["n_nationkey"].astype(np.int64),
                       eu_nat["n_name"]))
    eu_keys = pa.array(sorted(name_of))

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            pc.cast(b["s_nationkey"], pa.int64()), value_set=eu_keys
        )),
        batch_format="pyarrow",
    )
    mc = pre_aggregate(
        line.select_columns(["l_partkey", "l_extendedprice"]),
        ["l_partkey"], {"mincost": ("l_extendedprice", "min")},
    )

    joined = bucket_join(line, mc, on="l_partkey", how="inner")

    def shape(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.equal(batch["l_extendedprice"], batch["mincost"])
        )
        names = [name_of[k] for k in
                 pc.cast(keep["s_nationkey"], pa.int64()).to_pylist()]
        return pa.table(
            {
                "p_partkey": keep["l_partkey"],
                "s_name": keep["s_name"],
                "n_name": pa.array(names, pa.string()),
                "s_acctbal": keep["s_acctbal"],
                "cost": keep["l_extendedprice"],
            }
        )

    rows = joined.map_batches(shape, batch_format="pyarrow")
    distinct = pre_aggregate(
        rows, ["p_partkey", "s_name", "n_name", "s_acctbal", "cost"],
        {"nn": (None, "count")},
    )
    return distinct.map_batches(
        lambda b: b.drop_columns(["nn"]), batch_format="pyarrow"
    )


SQL_TPCH_Q2 = """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
l AS (
  SELECT l_partkey, l_extendedprice, s_name, s_acctbal, n_name
  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_size = 15 AND p_type = 'LARGE'),
mc AS (SELECT l_partkey, MIN(l_extendedprice) AS mincost
       FROM l GROUP BY 1)
SELECT DISTINCT l.l_partkey AS p_partkey, s_name, n_name, s_acctbal,
       l_extendedprice AS cost
FROM l JOIN mc ON l.l_partkey = mc.l_partkey
   AND l.l_extendedprice = mc.mincost
"""


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 shape (product-type profit by nation and year; retail
    price stands in for the missing ps_supplycost): the 'red%' part
    gate and the supplier->nation map attach by broadcast BEFORE the
    single big-big orderkey shuffle, so the all-to-all moves only
    matched, pruned rows; the (nation, year) profit sums fold through
    the combiner.  The cost coefficient is 1.0 (not TPC-H's fraction):
    retailprice has two decimals and quantity is integral, so every
    cost term is an exact 2-dp decimal — a fractional coefficient
    would park sums on half-cent boundaries where ROUND half-up and
    nearest-double disagree."""

    red = _read(sf_dir, "part",
                ["p_partkey", "p_name", "p_retailprice"]).map_batches(
        lambda b: b.filter(
            pc.starts_with(b["p_name"], "red")
        ).select(["p_partkey", "p_retailprice"]),
        batch_format="pyarrow",
    )
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                  "l_extendedprice", "l_discount"])
    line = broadcast_join(line, red, on="l_partkey", right_on="p_partkey",
                          how="inner")
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner")
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    line = broadcast_join(line, nation, on="s_nationkey",
                          right_on="n_nationkey", how="inner")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = bucket_join(
        line.select_columns(["l_orderkey", "n_name", "l_quantity",
                             "l_extendedprice", "l_discount",
                             "p_retailprice"]),
        orders, on="l_orderkey", right_on="o_orderkey", how="inner",
    )

    def shape(batch: pa.Table) -> pa.Table:
        amount = pc.subtract(
            pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"]),
            ),
            pc.multiply(batch["p_retailprice"], batch["l_quantity"]),
        )
        return pa.table(
            {
                "n_name": batch["n_name"],
                "o_year": pc.cast(pc.year(batch["o_orderdate"]),
                                  pa.int64()),
                "amount": amount,
            }
        )

    agg = pre_aggregate(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["n_name", "o_year"], {"sum_profit": ("amount", "sum")},
    )
    return _round_col(agg, "sum_profit", 2)


SQL_TPCH_Q9 = """
SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
"""


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 shape (important parts by traded value; lineitem
    value = price x qty stands in for partsupp stock value): the
    NATION_7 supplier gate is a broadcast semi-join, the per-part
    values fold through the combiner, and the scalar-subquery
    threshold (0.1% of the total) is ONE streaming sum over the
    already-folded per-part rows — no second scan of the fact table."""

    sup7 = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: b.filter(
            pc.equal(pc.cast(b["s_nationkey"], pa.int64()), 7)
        ).select(["s_suppkey"]),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]),
        sup7, on="l_suppkey", right_on="s_suppkey",
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "val": pc.multiply(batch["l_extendedprice"],
                                   batch["l_quantity"]),
            }
        )

    per_part = pre_aggregate(
        line.map_batches(shape, batch_format="pyarrow"),
        ["l_partkey"], {"value": ("val", "sum")},
    ).materialize()  # folded: one row per distinct part — reused twice
    # scalar-subquery threshold at 2x the MEAN per-part value: TPC-H's
    # fixed 0.01% fraction empties the answer as part count grows with
    # SF (at sf0.1 EVERY share < 0.1% -> a correct-but-empty result,
    # which the driver can never column-match because empty Ray
    # datasets lose their schema) — the mean-relative form keeps the
    # same decorrelated shape and a non-empty answer at every SF
    n_parts = per_part.count()
    if n_parts == 0:
        # a typed empty Table: an empty Dataset loses its schema and
        # the driver compare then sees zero columns
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    threshold = 2.0 * (per_part.sum("value") or 0.0) / n_parts
    kept = per_part.map_batches(
        lambda b, t=threshold: b.filter(pc.greater(b["value"], t)),
        batch_format="pyarrow",
    )
    return _round_col(kept, "value", 2)


SQL_TPCH_Q11 = """
WITH v AS (
  SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7
  GROUP BY 1)
SELECT l_partkey, ROUND(value, 2) AS value FROM v
WHERE value > (SELECT 2.0 * SUM(value) / COUNT(*) FROM v)
"""


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 shape (supplier count per part attribute; negative
    account balance stands in for the complaints pattern): the NOT-IN
    supplier set drops via an ANTI semi-join (broadcast — the bad set
    is dimension-sized), the part gate attaches by broadcast, and
    COUNT(DISTINCT suppkey) decomposes into two combiner folds — the
    first collapses to one row per (brand, size, suppkey), the second
    counts them — so neither shuffle moves raw fact rows."""

    bad = _read(sf_dir, "supplier",
                ["s_suppkey", "s_acctbal"]).map_batches(
        lambda b: b.filter(pc.less(b["s_acctbal"], 0.0)).select(
            ["s_suppkey"]
        ),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        bad, on="l_suppkey", right_on="s_suppkey", anti=True,
    )
    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.invert(pc.equal(b["p_type"], "PROMO")),
                pc.is_in(pc.cast(b["p_size"], pa.int64()),
                         value_set=pa.array([1, 5, 10, 15, 20, 25])),
            )
        ).select(["p_partkey", "p_brand", "p_size"]),
        batch_format="pyarrow",
    )
    joined = broadcast_join(line, parts, on="l_partkey",
                            right_on="p_partkey", how="inner")
    triple = pre_aggregate(
        joined, ["p_brand", "p_size", "l_suppkey"], {"nn": (None, "count")}
    )
    return pre_aggregate(
        triple, ["p_brand", "p_size"], {"supplier_cnt": (None, "count")}
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 shape (dominant suppliers of 'small%' parts; the >50%
    shipped-quantity share stands in for the availqty test): the 1996
    slice prunes at the read and the part gate semi-joins BEFORE the
    (part, supplier) quantity fold; the per-part total is a second fold
    over already-collapsed rows, rejoined on partkey.  l_quantity is
    integral, so the half-share compare is exact in both engines.  The
    surviving supplier set is dimension-sized and gates the supplier
    scan via a broadcast semi-join."""



    small = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda b: b.filter(pc.starts_with(b["p_name"], "small")).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = _rpqc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1997, 1, 1)),
    ).select_columns(["l_partkey", "l_suppkey", "l_quantity"])
    line = semi_join(line, small, on="l_partkey", right_on="p_partkey")
    q = pre_aggregate(
        line, ["l_partkey", "l_suppkey"], {"qty": ("l_quantity", "sum")}
    )
    tot = pre_aggregate(q, ["l_partkey"], {"tq": ("qty", "sum")})
    joined = bucket_join(q, tot, on="l_partkey", how="inner")
    dom = joined.map_batches(
        lambda b: b.filter(
            pc.greater(b["qty"], pc.multiply(pa.scalar(0.5), b["tq"]))
        ).select(["l_suppkey"]),
        batch_format="pyarrow",
    )

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    name_of = dict(
        zip(nat.loc[nat["n_regionkey"].isin(asia), "n_nationkey"]
            .astype(np.int64),
            nat.loc[nat["n_regionkey"].isin(asia), "n_name"])
    )
    sup = semi_join(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]),
        dom, on="s_suppkey", right_on="l_suppkey",
    )

    def shape(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["s_nationkey"], pa.int64()).to_pylist()
        mask = pa.array([k in name_of for k in keys])
        keep = batch.filter(mask)
        names = [name_of[k] for k in
                 pc.cast(keep["s_nationkey"], pa.int64()).to_pylist()]
        return pa.table(
            {
                "s_name": keep["s_name"],
                "n_name": pa.array(names, pa.string()),
            }
        )

    return sup.map_batches(shape, batch_format="pyarrow")


SQL_TPCH_Q20 = """
WITH q AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'small%')
  GROUP BY 1, 2),
t AS (SELECT l_partkey, SUM(qty) AS tq FROM q GROUP BY 1),
dom AS (SELECT DISTINCT l_suppkey FROM q JOIN t USING (l_partkey)
        WHERE qty > 0.5 * tq)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN dom ON s_suppkey = dom.l_suppkey
WHERE n_regionkey IN (SELECT r_regionkey FROM region
                      WHERE r_name = 'ASIA')
"""


def q_pii_redact(sf_dir: str):
    """PII redaction (emails + phone-shaped digit runs -> placeholder
    tokens): the corpus text carries no PII, so a deterministic contact
    header derived from doc_id is prepended IN BOTH ENGINES and the
    redaction itself is the operator under test.  Patterns are compiled
    once at module import (kgray/ops/text.py) and shared by every task;
    ASCII-explicit classes pin Python-re == RE2 semantics."""
    from kgray.ops.text import redact_pii

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        head = [
            f"user{i}@mail{i % 7}.example.com tel 555-{1000 + i % 9000} "
            for i in ids
        ]
        raw = pc.binary_join_element_wise(
            pa.array(head, pa.string()),
            pc.cast(batch["text"], pa.string()), "",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": raw})

    red = docs.map_batches(attach, batch_format="pyarrow").map_batches(
        redact_pii, batch_format="pyarrow"
    )
    return red.select_columns(["doc_id", "red", "n_pii"])


SQL_PII_REDACT = """
WITH raw AS (
  SELECT doc_id,
         'user' || CAST(doc_id AS VARCHAR) || '@mail' ||
         CAST(doc_id % 7 AS VARCHAR) || '.example.com tel 555-' ||
         CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ' || text AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
         '[0-9]{3}-[0-9]{3,4}', '<PHONE>', 'g') AS red,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+'))
            + len(regexp_extract_all(
                regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+',
                               '<EMAIL>', 'g'),
                '[0-9]{3}-[0-9]{3,4}')) AS BIGINT) AS n_pii
FROM raw
"""


def q_user_value_median(sf_dir: str):
    """Per-group EXACT median (not a sketch): every row of a user lands
    in one coarse hash bucket (ONE cogroup shuffle), and the per-user
    median is pandas' C groupby inside the bucket.  pandas interpolates
    even-count medians linearly, exactly like DuckDB's MEDIAN
    (quantile_cont 0.5); round(4) on both sides absorbs ulp drift."""

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def med(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("user_id", sort=False)["value"].median()
        return pd.DataFrame(
            {
                "user_id": m.index.to_numpy(np.int64),
                "med": round_half_up(m.to_numpy(np.float64), 4),
            }
        )

    return grouped_map(ev, "user_id", med)


SQL_USER_VALUE_MEDIAN = """
SELECT user_id, ROUND(MEDIAN(value), 4) AS med FROM events GROUP BY 1
"""


def q_events_hourly_dedup(sf_dir: str):
    """Windowed deduplication: keep the FIRST event (min ts, event_id
    tiebreak) per (user, hour) — the idempotent-ingest primitive.  User
    cogroup, then one mergesort + drop_duplicates per bucket; the hour
    key is integer epoch arithmetic (unit-safe, no timestamp hashing)."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        hour = (
            df["ts"].to_numpy("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        out = df.assign(hour_bucket=hour).drop_duplicates(
            ["user_id", "hour_bucket"], keep="first"
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(np.int64),
                "hour_bucket": out["hour_bucket"].to_numpy(np.int64),
                "first_event_id": out["event_id"].to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", dedup)


SQL_EVENTS_HOURLY_DEDUP = """
SELECT user_id, hour_bucket, event_id AS first_event_id FROM (
  SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
         event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, floor(epoch(ts)/3600)
                            ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn = 1
"""
