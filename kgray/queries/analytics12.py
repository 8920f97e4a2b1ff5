"""Session-21 operator batch — market-data / ranking-eval / graph
family: per-(type, day) OHLC bars (ordered-aggregate open/close over
integer cents), global peak-concurrency sweep over session intervals
(a distributed +1/-1 prefix-sum with day-range decomposition),
time-weighted average value (TWAP) per user-day, integer-exact
Bollinger-band breakout flags (the squared-inequality trick removes
sqrt entirely), Adamic-Adar supplier link prediction (degree-blocked
common-neighbor fold with memoized libm logs), and per-user NDCG@5
ranking evaluation (explicit left-fold DCG so the <=5-term float sum
is order-identical in both engines).

Exactness strategy (house rules): every cross-engine accumulation is
integral (cents / counts / microseconds / squared integers); floats
appear only in final per-row expressions whose operation tree is
written identically in both engines (same libm calls, same fold
order), then rounded half-up.
"""

from ._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# OHLC bars per (event_type, day)
# ---------------------------------------------------------------------------


def q_events_ohlc(sf_dir: str):
    """Open/high/low/close/volume bars over integer cents.  Open and
    close are argmin/argmax by the strict total order (ts, event_id)
    (event_id is unique, so first/last are deterministic).  Per-batch
    partials carry their candidate open/close rows plus min/max/count/
    sum, so the shuffle moves (types x days x batches) rows, never the
    event stream; the final fold is one coarse-bucket cogroup on the
    (type, day) key."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["c"] = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        df["tus"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        df = df.sort_values(["event_type", "day", "tus", "event_id"])
        g = df.groupby(["event_type", "day"], sort=False)
        out = pd.DataFrame({
            "o_t": g["tus"].first(), "o_i": g["event_id"].first(),
            "open_c": g["c"].first(),
            "c_t": g["tus"].last(), "c_i": g["event_id"].last(),
            "close_c": g["c"].last(),
            "high_c": g["c"].max(), "low_c": g["c"].min(),
            "n": g.size().astype(np.int64), "sum_c": g["c"].sum(),
        }).reset_index()
        out["k"] = out["event_type"] + "|" + out["day"]
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = df.sort_values(["k", "o_t", "o_i"])
        g = a.groupby("k", sort=False)
        opens = g[["event_type", "day", "open_c"]].first()
        b = df.sort_values(["k", "c_t", "c_i"])
        closes = b.groupby("k", sort=False)["close_c"].last()
        agg = df.groupby("k").agg(
            high_c=("high_c", "max"), low_c=("low_c", "min"),
            n=("n", "sum"), sum_c=("sum_c", "sum"))
        out = opens.join([closes, agg]).reset_index(drop=True)
        for col in ("open_c", "high_c", "low_c", "close_c", "n", "sum_c"):
            out[col] = out[col].astype(np.int64)
        return out[["event_type", "day", "open_c", "high_c", "low_c",
                    "close_c", "n", "sum_c"]]

    return grouped_map(parts, "k", fold)


SQL_EVENTS_OHLC = """
WITH e AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
  FROM events)
SELECT event_type, day,
       FIRST(c ORDER BY ts, event_id) AS open_c,
       CAST(MAX(c) AS BIGINT) AS high_c,
       CAST(MIN(c) AS BIGINT) AS low_c,
       LAST(c ORDER BY ts, event_id) AS close_c,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS sum_c
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Peak concurrent sessions (distributed +1/-1 sweep)
# ---------------------------------------------------------------------------


def q_events_peak_concurrency(sf_dir: str):
    """Maximum number of concurrently-open sessions (gap-30min user
    sessions, closed intervals) and the first microsecond timestamp at
    which the peak is reached.  Classic sweep: +1 at session start, -1
    at end, running max.  Distributed form: session intervals come from
    ONE user-keyed cogroup; the sweep decomposes by UTC day of the
    point — each day bucket computes (total_delta, local_max,
    first_t_at_local_max) over its (t, d)-grouped prefix sums, and the
    driver folds the days-scale partials with a cumulative offset
    (global_max = max_d(offset_d + local_max_d)).  Tie rule: all +1s at
    a timestamp apply before any -1 (SQL RANGE-peer semantics —
    per-(t,d) grouped deltas reproduce it exactly)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new = prev.isna() | ((df["ts"] - prev).dt.total_seconds() > 1800.0)
        sid = new.cumsum()  # unique per session within the user bucket
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({"sid": sid.to_numpy(), "us": us}).groupby(
            "sid", sort=False)["us"]
        a = g.min().to_numpy(np.int64)
        b = g.max().to_numpy(np.int64)
        return pd.DataFrame({
            "t": np.concatenate([a, b]),
            "d": np.concatenate([np.ones(len(a), np.int64),
                                 -np.ones(len(b), np.int64)]),
        })

    pts = grouped_map(ev, "user_id", intervals)
    pts = pts.map_batches(
        lambda b: b.append_column(
            "day", pc.divide(b["t"], pa.scalar(86_400_000_000, pa.int64()))),
        batch_format="pyarrow")

    def day_sweep(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for day, sub in df.groupby("day", sort=False):  # days-scale loop
            agg = sub.groupby(["t", "d"], sort=False).size().reset_index(
                name="cnt")
            agg["delta"] = agg["d"] * agg["cnt"]
            agg = agg.sort_values(["t", "d"], ascending=[True, False])
            cum = agg["delta"].cumsum().to_numpy(np.int64)
            i = int(cum.argmax())  # first occurrence
            rows.append((int(day), int(agg["delta"].sum()),
                         int(cum[i]), int(agg["t"].iloc[i])))
        return pd.DataFrame(rows, columns=["day", "total", "lmax", "t_at"])

    part = grouped_map(pts, "day", day_sweep).to_pandas()  # days-scale
    part = part.sort_values("day")
    off = part["total"].cumsum().shift(fill_value=0).to_numpy(np.int64)
    glob = off + part["lmax"].to_numpy(np.int64)
    peak = int(glob.max())
    at_us = int(part["t_at"].to_numpy(np.int64)[int(glob.argmax())])
    return pa.table({"peak": pa.array([peak], pa.int64()),
                     "at_us": pa.array([at_us], pa.int64())})


SQL_EVENTS_PEAK_CONCURRENCY = """
WITH g AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
s AS (SELECT user_id, sid, MIN(epoch_us(ts)) AS a, MAX(epoch_us(ts)) AS b
      FROM m GROUP BY 1, 2),
p AS (SELECT a AS t, 1 AS d FROM s UNION ALL SELECT b, -1 FROM s),
r AS (SELECT t, SUM(d) OVER (ORDER BY t, d DESC) AS run FROM p)
SELECT CAST(MAX(run) AS BIGINT) AS peak,
       CAST(MIN(CASE WHEN run = (SELECT MAX(run) FROM r) THEN t END)
            AS BIGINT) AS at_us
FROM r
"""


# ---------------------------------------------------------------------------
# Time-weighted average value (TWAP) per user-day
# ---------------------------------------------------------------------------


def q_events_twap(sf_dir: str):
    """Time-weighted average of ``value`` per (user, day): each event's
    cents are weighted by the exact microseconds until the user's next
    event that day (the last event of a day carries no forward
    interval).  Numerator and denominator are integer sums
    (cents x us), so only the final num/den/100 division touches
    floats — identical operands, identical double, rounded half-up.
    One user-keyed cogroup; no global sort."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def twap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        d = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "day": df["ts"].dt.strftime("%Y-%m-%d").to_numpy(),
            "us": df["ts"].astype("datetime64[us]").astype(np.int64)
                  .to_numpy(),
            "c": round_half_up(df["value"].to_numpy(np.float64) * 100.0, 0)
                 .astype(np.int64),
        })
        nxt = d.groupby(["user_id", "day"], sort=False)["us"].shift(-1)
        mask = nxt.notna().to_numpy()
        d = d[mask].copy()
        d["dt"] = (nxt[mask].to_numpy(np.int64) - d["us"].to_numpy())
        d["num"] = d["c"] * d["dt"]
        g = d.groupby(["user_id", "day"], sort=False)
        out = pd.DataFrame({
            "n_iv": g.size().astype(np.int64),
            "num": g["num"].sum(), "den": g["dt"].sum(),
        }).reset_index()
        out = out[out["den"] > 0]
        out["twap"] = round_half_up(
            out["num"].to_numpy(np.float64)
            / out["den"].to_numpy(np.float64) / 100.0, 6)
        return out[["user_id", "day", "n_iv", "twap"]]

    return grouped_map(ev, "user_id", twap)


SQL_EVENTS_TWAP = """
WITH e AS (
  SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         epoch_us(ts) AS us, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
l AS (
  SELECT user_id, day, c,
         LEAD(us) OVER (PARTITION BY user_id, day
                        ORDER BY ts, event_id) - us AS dt
  FROM e)
SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_iv,
       ROUND(CAST(SUM(c * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE) / 100.0,
             6) AS twap
FROM l WHERE dt IS NOT NULL
GROUP BY 1, 2 HAVING SUM(dt) > 0
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Bollinger-band breakouts, integer-exact (no sqrt)
# ---------------------------------------------------------------------------


def q_events_bollinger(sf_dir: str):
    """7-day (ROWS frame over present days) Bollinger breakout flags on
    daily per-type cents totals.  x > mean + 2*sigma is evaluated as the
    INTEGER inequality (7x - s) > 0 AND (7x - s)^2 > 4*(7*ss - s^2)
    (s = frame sum, ss = frame sum of squares), so there is no float
    anywhere — bit-exact in any engine.  Daily totals come from a
    combiner fold; the window pass is a per-type cogroup over the
    days-scale aggregate (python-int arithmetic, overflow-immune)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "day": df["ts"].dt.strftime("%Y-%m-%d"),
            "c": round_half_up(df["value"].to_numpy(np.float64) * 100.0, 0)
                 .astype(np.int64),
        })
        g = out.groupby(["event_type", "day"], sort=False)["c"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    daily = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], {"c": ("c", "sum")})

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ty, sub in df.groupby("event_type", sort=False):  # days-scale
            sub = sub.sort_values("day")
            cs = [int(x) for x in sub["c"]]
            days = sub["day"].tolist()
            for i in range(6, len(cs)):
                w = cs[i - 6:i + 1]
                s = sum(w)
                ss = sum(x * x for x in w)  # python ints: exact
                x = cs[i]
                lhs = 7 * x - s
                rhs = 4 * (7 * ss - s * s)
                br = (1 if (lhs > 0 and lhs * lhs > rhs)
                      else (-1 if (lhs < 0 and lhs * lhs > rhs) else 0))
                rows.append((ty, days[i], x, br))
        out = pd.DataFrame(rows, columns=["event_type", "day", "c",
                                          "breakout"])
        if out.empty:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=str),
                "day": pd.Series(dtype=str),
                "c": pd.Series(dtype=np.int64),
                "breakout": pd.Series(dtype=np.int64)})
        out["c"] = out["c"].astype(np.int64)
        out["breakout"] = out["breakout"].astype(np.int64)
        return out

    return grouped_map(daily, "event_type", bands)


SQL_EVENTS_BOLLINGER = """
WITH d AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
w AS (
  SELECT event_type, day, c,
         CAST(SUM(c) OVER f AS HUGEINT) AS s,
         SUM(CAST(c AS HUGEINT) * c) OVER f AS ss,
         COUNT(*) OVER f AS n
  FROM d WINDOW f AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT event_type, day, c,
       CAST(CASE WHEN 7 * c - s > 0
                      AND (7 * c - s) * (7 * c - s) > 4 * (7 * ss - s * s)
                 THEN 1
                 WHEN 7 * c - s < 0
                      AND (7 * c - s) * (7 * c - s) > 4 * (7 * ss - s * s)
                 THEN -1 ELSE 0 END AS BIGINT) AS breakout
FROM w WHERE n = 7 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Adamic-Adar supplier link prediction
# ---------------------------------------------------------------------------


def q_supplier_adamic_adar(sf_dir: str):
    """Adamic-Adar affinity between supplier pairs over the bipartite
    supplier-part graph from lineitem: AA(s1,s2) = sum over common
    parts p of 1/ln(deg(p)), restricted to parts with 2 <= deg <= 50
    (the standard low-degree blocking rule — hub parts carry ~no signal
    and would explode the pair fan-out; identical filter in the SQL).
    Per-batch Arrow dedup collapses the edge stream, ONE part-keyed
    cogroup emits (s1, s2, deg) pair partials via a vectorized
    self-merge, and ONE s1-keyed cogroup folds the score with ln(deg)
    memoized through C libm math.log (bit parity with DuckDB ln — numpy
    vectorized log drifts one ulp).  Top-100 by rounded score, (s1,s2)
    tie-break."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def dedup(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    edges = li.map_batches(dedup, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_partkey", "l_suppkey"])
        deg = d.groupby("l_partkey", sort=False)["l_suppkey"] \
               .transform("size").astype(np.int64)
        d = d.assign(deg=deg)
        d = d[(d["deg"] >= 2) & (d["deg"] <= 50)]
        m = d.merge(d[["l_partkey", "l_suppkey"]], on="l_partkey",
                    suffixes=("", "_b"))
        m = m[m["l_suppkey"] < m["l_suppkey_b"]]
        g = m.groupby(["l_suppkey", "l_suppkey_b", "deg"],
                      sort=False).size().reset_index(name="cnt")
        g.columns = ["s1", "s2", "deg", "cnt"]
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    pairs = grouped_map(edges, "l_partkey", per_part)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        gg = df.groupby(["s1", "s2", "deg"], sort=False)["cnt"] \
               .sum().reset_index()
        logs = {int(x): math.log(float(x)) for x in pd.unique(gg["deg"])}
        gg["term"] = gg["cnt"].to_numpy(np.float64) \
            / np.array([logs[int(x)] for x in gg["deg"]], np.float64)
        g = gg.groupby(["s1", "s2"], sort=False)
        out = pd.DataFrame({
            "n_common": g["cnt"].sum().astype(np.int64),
            "aa": round_half_up(g["term"].sum().to_numpy(np.float64), 6),
        }).reset_index()
        return out

    scored = grouped_map(pairs, "s1", fold)
    return scored.sort(["aa", "s1", "s2"],
                       descending=[True, False, False]).limit(100)


SQL_SUPPLIER_ADAMIC_ADAR = """
WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
d AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY p),
pr AS (SELECT a.s AS s1, b.s AS s2, d.deg
       FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
       JOIN d ON d.p = a.p
       WHERE d.deg BETWEEN 2 AND 50),
g AS (SELECT s1, s2, deg, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pr GROUP BY 1, 2, 3)
SELECT s1, s2, CAST(SUM(cnt) AS BIGINT) AS n_common,
       ROUND(SUM(CAST(cnt AS DOUBLE) / ln(CAST(deg AS DOUBLE))), 6) AS aa
FROM g GROUP BY 1, 2
ORDER BY aa DESC, s1, s2 LIMIT 100
"""


# ---------------------------------------------------------------------------
# NDCG@5 ranking evaluation per user
# ---------------------------------------------------------------------------


def q_events_ndcg(sf_dir: str):
    """NDCG@5 of the frequency ranking against value relevance, per
    user: the "predicted" ranking orders a user's event types by count
    (desc, type asc tie-break), relevance is the type's total cents,
    and the ideal ranking orders by relevance itself.  DCG is the
    EXPLICIT left-fold ((((t1+t2)+t3)+t4)+t5) with missing ranks
    contributing +0.0 (an exact identity on non-negative doubles), and
    discounts are ln(i+1)/ln(2) composed from the same libm calls in
    both engines — so the <=5-term float sum is order-identical, not
    merely close.  One combiner fold to (user, type) aggregates, one
    user-keyed cogroup."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["c"] = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = df.groupby(["user_id", "event_type"], sort=False).agg(
            n=("c", "size"), c=("c", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], {"n": ("n", "sum"), "c": ("c", "sum")})

    disc = [math.log(i + 1) / math.log(2) for i in range(1, 6)]

    def ndcg(df: pd.DataFrame) -> pd.DataFrame:
        a = df.sort_values(["user_id", "n", "event_type"],
                           ascending=[True, False, True])
        a = a.assign(rr=a.groupby("user_id", sort=False).cumcount() + 1)
        b = df.sort_values(["user_id", "c", "event_type"],
                           ascending=[True, False, True])
        b = b.assign(ri=b.groupby("user_id", sort=False).cumcount() + 1)
        users = pd.unique(df["user_id"])
        uidx = pd.Series(np.arange(len(users)), index=users)
        dcg = np.zeros(len(users))
        idcg = np.zeros(len(users))
        for pos in range(1, 6):  # explicit left-fold, rank order
            t = a[a["rr"] == pos]
            add = np.zeros(len(users))
            add[uidx[t["user_id"]].to_numpy()] = \
                t["c"].to_numpy(np.float64) / disc[pos - 1]
            dcg = dcg + add
            t2 = b[b["ri"] == pos]
            add2 = np.zeros(len(users))
            add2[uidx[t2["user_id"]].to_numpy()] = \
                t2["c"].to_numpy(np.float64) / disc[pos - 1]
            idcg = idcg + add2
        keep = idcg > 0
        return pd.DataFrame({
            "user_id": np.asarray(users)[keep],
            "ndcg5": round_half_up(dcg[keep] / idcg[keep], 6),
        })

    return grouped_map(agg, "user_id", ndcg)


SQL_EVENTS_NDCG = """
WITH a AS (
  SELECT user_id, event_type AS t, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, c,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, t) AS rr,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY c DESC, t) AS ri
  FROM a),
p AS (
  SELECT user_id,
         CAST(COALESCE(MAX(CASE WHEN rr = 1 THEN c END), 0) AS DOUBLE) AS p1,
         CAST(COALESCE(MAX(CASE WHEN rr = 2 THEN c END), 0) AS DOUBLE) AS p2,
         CAST(COALESCE(MAX(CASE WHEN rr = 3 THEN c END), 0) AS DOUBLE) AS p3,
         CAST(COALESCE(MAX(CASE WHEN rr = 4 THEN c END), 0) AS DOUBLE) AS p4,
         CAST(COALESCE(MAX(CASE WHEN rr = 5 THEN c END), 0) AS DOUBLE) AS p5,
         CAST(COALESCE(MAX(CASE WHEN ri = 1 THEN c END), 0) AS DOUBLE) AS q1,
         CAST(COALESCE(MAX(CASE WHEN ri = 2 THEN c END), 0) AS DOUBLE) AS q2,
         CAST(COALESCE(MAX(CASE WHEN ri = 3 THEN c END), 0) AS DOUBLE) AS q3,
         CAST(COALESCE(MAX(CASE WHEN ri = 4 THEN c END), 0) AS DOUBLE) AS q4,
         CAST(COALESCE(MAX(CASE WHEN ri = 5 THEN c END), 0) AS DOUBLE) AS q5
  FROM r GROUP BY 1)
SELECT user_id,
       ROUND(((((p1 / (ln(2) / ln(2)) + p2 / (ln(3) / ln(2)))
                + p3 / (ln(4) / ln(2))) + p4 / (ln(5) / ln(2)))
              + p5 / (ln(6) / ln(2)))
             / ((((q1 / (ln(2) / ln(2)) + q2 / (ln(3) / ln(2)))
                  + q3 / (ln(4) / ln(2))) + q4 / (ln(5) / ln(2)))
                + q5 / (ln(6) / ln(2))), 6) AS ndcg5
FROM p
WHERE q1 + q2 + q3 + q4 + q5 > 0
ORDER BY user_id
"""
