"""kgray.queries.analytics5 — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)
from kgray.queries.analytics2 import q_part_name_fuzzy_pairs
from kgray.queries.docs import SQL_LANGID



def q_events_day_overlap(sf_dir: str):
    """Day-over-day user-set Jaccard (audience churn/overlap monitor):
    ONE user cogroup dedups each user's day set and — because
    consecutive calendar days are a sorted diff==1 check — emits both
    the per-day presence partial and the present-tomorrow-too partial
    in the same pass; a tiny day-level fold (≤366 rows) computes
    |A∩B| / (|A| + |B| - |A∩B|) as the pinned int-ratio division.
    Days with an empty intersection drop on both engines (the oracle's
    inner join)."""

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_user(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.cast(
                    pc.floor_temporal(batch["ts"], unit="day"),
                    pa.date32(),
                ),
            }
        ).group_by(["user_id", "day"]).aggregate([])

    du = ev.map_batches(day_user, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        us = df["user_id"].to_numpy(np.int64)
        days = df["day"].to_numpy("datetime64[D]").astype(np.int64)
        nxt = np.zeros(len(df), np.int64)
        if len(df) > 1:
            nxt[:-1] = ((us[1:] == us[:-1])
                        & (days[1:] == days[:-1] + 1)).astype(np.int64)
        return pd.DataFrame({"day": days, "present": 1, "both": nxt})

    folded = (
        pre_aggregate(
            grouped_map(du, "user_id", per_user), ["day"],
            {"n": ("present", "sum"), "i": ("both", "sum")},
        )
        .to_pandas().sort_values("day")
    )
    sizes = dict(zip(folded["day"].to_numpy(np.int64).tolist(),
                     folded["n"].to_numpy(np.int64).tolist()))
    keep = folded[folded["i"] > 0]
    days = keep["day"].to_numpy(np.int64)
    i = keep["i"].to_numpy(np.int64)
    a = keep["n"].to_numpy(np.int64)
    b = np.array([sizes[d + 1] for d in days.tolist()], np.int64)
    jac = i / (a + b - i)
    day_str = np.array(
        [str(np.datetime64(int(d), "D")) for d in days.tolist()]
    )
    return pa.table(
        {
            "day": pa.array(day_str),
            "jaccard": pa.array(round_half_up(jac, 6), pa.float64()),
        }
    )


SQL_EVENTS_DAY_OVERLAP = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
inter AS (SELECT a.d, CAST(COUNT(*) AS BIGINT) AS i
          FROM du a JOIN du b
            ON a.user_id = b.user_id AND b.d = a.d + 1
          GROUP BY 1),
sz AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1)
SELECT strftime(i.d, '%Y-%m-%d') AS day,
       ROUND(CAST(i.i AS DOUBLE) / (a.n + b.n - i.i), 6) AS jaccard
FROM inter i JOIN sz a ON i.d = a.d JOIN sz b ON b.d = i.d + 1
"""


def q_events_cusum(sf_dir: str):
    """Per-user CUSUM change-point score: the running sum of deviations
    from the corpus mean, reported as max |cusum| per user — in EXACT
    integer arithmetic.  Values quantize to int64 cents (the testdata
    is 2-decimal; general inputs are cent-quantized by definition), and
    the deviation is scaled by n: dev·n = v_cents·n - Σcents, so the
    per-user running sum is an exact integer in ANY association order —
    float cusums proved unfixable here, landing exactly on ROUND-4 half
    boundaries (quantized inputs) where numpy's sequential cumsum and
    DuckDB's windowed-sum tree disagree by one ulp.  The single final
    division /(100·n) is pinned in both engines.  NB v_cents·n needs
    int128 beyond ~1e5-value · 1e13-row corpora — shard the mean or
    drop the n-scaling (accepting one rational division) there."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def gpartial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = round_half_up(v * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "s": pa.array([int(cents.sum())], pa.int64()),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    tot = (
        pre_aggregate(
            ev.map_batches(gpartial, batch_format="pyarrow"), ["g"],
            {"s": ("s", "sum"), "n": ("n", "sum")},
        )
        .to_pandas().iloc[0]
    )
    s_cents, n = int(tot["s"]), int(tot["n"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        cents = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        dev = cents * np.int64(n) - np.int64(s_cents)
        cs = (
            pd.Series(dev).groupby(pd.Series(us), sort=False).cumsum()
            .to_numpy(np.int64)
        )
        m = (
            pd.DataFrame({"u": us, "a": np.abs(cs)})
            .groupby("u", sort=False)["a"].max()
        )
        return pd.DataFrame(
            {
                "user_id": m.index.to_numpy(np.int64),
                "max_cusum": round_half_up(
                    m.to_numpy(np.float64) / (100.0 * n), 4
                ),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_CUSUM = """
WITH g AS (SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events),
c AS (SELECT user_id, g.n,
             SUM(CAST(round(value * 100) AS BIGINT) * g.n - g.s)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cs
      FROM events CROSS JOIN g)
SELECT user_id,
       ROUND(CAST(MAX(ABS(cs)) AS DOUBLE) / (100.0 * MAX(n)), 4)
         AS max_cusum
FROM c GROUP BY 1
"""


def q_events_lead_lag(sf_dir: str):
    """Lead-lag cross-correlation of the click and purchase daily count
    series (lags -3..+3) — does one stream anticipate the other?  The
    corpus-scale pass is one (day, x, y) count fold; the seven
    correlations run on the metadata-scale series with the
    grouped_corr sufficient-statistics formula (algebraically identical
    to SQL CORR, ulp drift absorbed by ROUND 4)."""

    ev = _read(sf_dir, "events", ["ts", "event_type"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'"
    )

    def day_type(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.cast(
                    pc.floor_temporal(batch["ts"], unit="day"),
                    pa.date32(),
                ),
                "event_type": batch["event_type"],
            }
        )

    c = (
        pre_aggregate(
            ev.map_batches(day_type, batch_format="pyarrow"),
            ["day", "event_type"], {"n": (None, "count")},
        )
        .to_pandas()
    )
    piv = c.pivot_table(index="day", columns="event_type", values="n",
                        fill_value=0, aggfunc="sum").reset_index()
    for col in ("click", "purchase"):
        if col not in piv:
            piv[col] = 0
    days = pd.to_datetime(piv["day"]).to_numpy("datetime64[D]") \
        .astype(np.int64)
    x = piv["click"].to_numpy(np.float64)
    y = piv["purchase"].to_numpy(np.float64)
    by_day = dict(zip(days.tolist(), range(len(days))))
    out_lag, out_r = [], []
    for lag in range(-3, 4):
        xi, yi = [], []
        for d, i in by_day.items():
            j = by_day.get(d + lag)
            if j is not None:
                xi.append(x[i])
                yi.append(y[j])
        if not xi:
            continue  # empty shifted overlap: the SQL join emits no row
        xa, ya = np.array(xi), np.array(yi)
        n = float(len(xa))
        cov = n * float((xa * ya).sum()) - float(xa.sum()) * float(
            ya.sum())
        vx = n * float((xa * xa).sum()) - float(xa.sum()) ** 2
        vy = n * float((ya * ya).sum()) - float(ya.sum()) ** 2
        denom = (vx * vy) ** 0.5
        out_lag.append(lag)
        # constant series: CORR is NULL in SQL, not nan/inf
        out_r.append(
            float(round_half_up(np.array([cov / denom]), 4)[0])
            if denom > 0 else None
        )
    return pa.table(
        {
            "lag": pa.array(out_lag, pa.int64()),
            "r": pa.array(out_r, pa.float64()),
        }
    )


SQL_EVENTS_LEAD_LAG = """
WITH c AS (SELECT CAST(ts AS DATE) AS d,
                  CAST(COUNT(*) FILTER (event_type = 'click')
                       AS DOUBLE) AS x,
                  CAST(COUNT(*) FILTER (event_type = 'purchase')
                       AS DOUBLE) AS y
           FROM events
           WHERE event_type IN ('click', 'purchase') GROUP BY 1),
l AS (SELECT CAST(UNNEST(range(-3, 4)) AS INTEGER) AS lag)
SELECT CAST(l.lag AS BIGINT) AS lag, ROUND(corr(a.x, b.y), 4) AS r
FROM l JOIN c a ON TRUE JOIN c b ON b.d = a.d + l.lag
GROUP BY 1
"""


def q_user_value_interp(sf_dir: str):
    """Per-user daily-value series with interior gaps LINEARLY
    INTERPOLATED (timeseries repair; the zero-fill twin is
    user_daily_dense): observed days carry their daily value sum,
    missing days get vp + (vn - vp) * Δprev / Δspan on exact integer
    day deltas — the identical expression tree in numpy and SQL.  One
    user cogroup; the spine expands with the repeat/cumsum arithmetic
    and prev/next observed indices are searchsorted lookups, no
    per-day python."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.cast(
                    pc.cast(
                        pc.floor_temporal(batch["ts"], unit="day"),
                        pa.date32(),
                    ),
                    pa.int32(),
                ),
                "v": batch["value"],
            }
        )
        return t.group_by(["user_id", "day"]).aggregate([("v", "sum")]) \
            .rename_columns(["user_id", "day", "v"])

    daily = ev.map_batches(day_partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        obs = (
            df.groupby(["user_id", "day"], sort=False)["v"].sum()
            .reset_index().sort_values(["user_id", "day"],
                                       kind="mergesort")
        )
        us = obs["user_id"].to_numpy(np.int64)
        od = obs["day"].to_numpy(np.int64)
        ov = obs["v"].to_numpy(np.float64)
        first = np.ones(len(obs), bool)
        first[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(first)
        ends = np.concatenate([starts[1:], [len(obs)]])
        span = od[ends - 1] - od[starts] + 1
        # spine: for each user, days start..end via repeat/cumsum
        spine_user = np.repeat(us[starts], span)
        base = np.repeat(od[starts], span)
        step = np.arange(len(spine_user)) - np.repeat(
            np.concatenate([[0], np.cumsum(span)[:-1]]), span
        )
        spine_day = base + step
        # prev/next observed index per spine row (within the global
        # sorted (user, day) obs array — user blocks are contiguous and
        # spine days never leave their user's [min, max] range)
        prev_i = np.searchsorted(od + us * (10 ** 6), spine_day
                                 + spine_user * (10 ** 6), "right") - 1
        next_i = np.searchsorted(od + us * (10 ** 6), spine_day
                                 + spine_user * (10 ** 6), "left")
        vp, dp = ov[prev_i], od[prev_i]
        vn, dn = ov[next_i], od[next_i]
        observed = spine_day == dp
        ddp = (spine_day - dp).astype(np.float64)
        ddn = (dn - dp).astype(np.float64)
        filled = np.where(
            observed, vp,
            vp + (vn - vp) * ddp / np.where(ddn == 0, 1.0, ddn),
        )
        day_str = np.array(
            [str(np.datetime64(int(d), "D")) for d in spine_day.tolist()]
        )
        return pd.DataFrame(
            {
                "user_id": spine_user,
                "day": day_str,
                "v_filled": round_half_up(filled, 4),
                "interpolated": (~observed).astype(np.int64),
            }
        )

    return grouped_map(daily, "user_id", per_bucket)


SQL_USER_VALUE_INTERP = """
WITH o AS (SELECT user_id, CAST(ts AS DATE) AS d, SUM(value) AS v
           FROM events GROUP BY 1, 2),
span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM o GROUP BY 1),
spine AS (SELECT s.user_id,
                 CAST(UNNEST(generate_series(s.d0, s.d1,
                                             INTERVAL 1 DAY)) AS DATE)
                   AS d
          FROM span s),
j AS (SELECT sp.user_id, sp.d, o.v
      FROM spine sp LEFT JOIN o
        ON sp.user_id = o.user_id AND sp.d = o.d),
f AS (SELECT user_id, d, v,
             LAST_VALUE(v IGNORE NULLS) OVER w AS vp,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER w AS dp,
             FIRST_VALUE(v IGNORE NULLS) OVER wf AS vn,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER wf AS dn
      FROM j
      WINDOW w AS (PARTITION BY user_id ORDER BY d),
             wf AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
       ROUND(CASE WHEN v IS NOT NULL THEN v
             ELSE vp + (vn - vp)
                  * CAST(date_diff('day', dp, d) AS DOUBLE)
                  / CAST(date_diff('day', dp, dn) AS DOUBLE) END,
             4) AS v_filled,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS interpolated
FROM f
"""


def q_events_geomean(sf_dir: str):
    """Per-type geometric mean of events.value (exp of the mean log —
    the multiplicative-scale center): ln is C-libm ``math.log`` memoized
    over DISTINCT values (the tf-idf parity trick; a python loop over
    distinct floats is ms-scale because the memo, not the loop, does
    the work), partial (Σln, n) pairs fold through the combiner, and
    the final exp(Σ/n) is the identical two-op expression both
    engines.  Domain-restricted to value > 0 on BOTH sides (the
    geometric mean is undefined at zero; DuckDB ln(0) raises)."""


    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="value > 0"
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        memo: dict[float, float] = {}
        logs = np.empty(len(df), np.float64)
        for i, v in enumerate(df["value"].tolist()):
            lv = memo.get(v)
            if lv is None:
                lv = math.log(v)
                memo[v] = lv
            logs[i] = lv
        df = df.assign(__l=logs)
        g = df.groupby("event_type", sort=False)["__l"]
        return pa.Table.from_pandas(
            pd.DataFrame({"event_type": g.sum().index, "s": g.sum(),
                          "n": g.size()}),
            preserve_index=False,
        )

    folded = (
        pre_aggregate(
            ev.map_batches(partial, batch_format="pyarrow"),
            ["event_type"], {"s": ("s", "sum"), "n": ("n", "sum")},
        )
        .to_pandas()
    )
    gm = np.array(
        [math.exp(s / n) for s, n in zip(folded["s"], folded["n"])]
    )
    return pa.table(
        {
            "event_type": pa.array(folded["event_type"]),
            "geomean": pa.array(round_half_up(gm, 4), pa.float64()),
        }
    )


SQL_EVENTS_GEOMEAN = """
SELECT event_type, ROUND(exp(SUM(ln(value)) / COUNT(*)), 4) AS geomean
FROM events WHERE value > 0 GROUP BY 1
"""


def q_events_minmax_norm(sf_dir: str):
    """Per-type min-max feature scaling (x - min)/(max - min) — the
    classic normalization stage: a tiny (type, min, max) fold broadcast
    by closure, then a stateless row-scale pass with the pinned
    two-op expression (single-value types emit 0 by convention, both
    engines)."""

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    mm = (
        pre_aggregate(
            ev.select_columns(["event_type", "value"]), ["event_type"],
            {"lo": ("value", "min"), "hi": ("value", "max")},
        )
        .to_pandas()
    )
    lo = dict(zip(mm["event_type"], mm["lo"]))
    hi = dict(zip(mm["event_type"], mm["hi"]))

    def scale(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        l = df["event_type"].map(lo).to_numpy(np.float64)
        h = df["event_type"].map(hi).to_numpy(np.float64)
        x = df["value"].to_numpy(np.float64)
        span = h - l
        scaled = np.where(span == 0, 0.0,
                          (x - l) / np.where(span == 0, 1.0, span))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "scaled": pa.array(round_half_up(scaled, 6),
                                   pa.float64()),
            }
        )

    return ev.map_batches(scale, batch_format="pyarrow")


SQL_EVENTS_MINMAX_NORM = """
WITH m AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
           FROM events GROUP BY 1)
SELECT e.event_id,
       ROUND(CASE WHEN m.hi - m.lo = 0 THEN 0.0
             ELSE (e.value - m.lo) / (m.hi - m.lo) END, 6) AS scaled
FROM events e JOIN m ON e.event_type = m.event_type
"""


def q_events_fano(sf_dir: str):
    """Fano factor (variance/mean of daily counts) per event type — the
    burstiness screen.  Counts are INTEGERS, so Σc and Σc² fold exactly
    and the (n·Σc² - (Σc)²) / (n·(n-1)) / (Σc/n) expression involves no
    order-sensitive float sums at all — the only float ops are the
    final pinned divisions.  n is the number of ACTIVE days (days with
    ≥1 event of the type), spelled out in both engines."""

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def day_type(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
                "event_type": batch["event_type"],
            }
        )

    c = (
        pre_aggregate(
            ev.map_batches(day_type, batch_format="pyarrow"),
            ["day", "event_type"], {"c": (None, "count")},
        )
        .to_pandas()
    )
    g = c.groupby("event_type", sort=True)
    n = g.size().to_numpy(np.int64)
    s = g["c"].sum().to_numpy(np.int64)
    ss = c.assign(cc=c["c"] * c["c"]).groupby("event_type",
                                              sort=True)["cc"].sum() \
        .to_numpy(np.int64)
    var = (n * ss - s * s).astype(np.float64) / (n * (n - 1)).astype(
        np.float64)
    mean = s.astype(np.float64) / n.astype(np.float64)
    fano = var / mean
    return pa.table(
        {
            "event_type": pa.array(g.size().index.to_numpy()),
            "fano": pa.array(round_half_up(fano, 6), pa.float64()),
        }
    )


SQL_EVENTS_FANO = """
WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT event_type,
       ROUND((CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
              / CAST(COUNT(*) * (COUNT(*) - 1) AS DOUBLE))
             / (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
             6) AS fano
FROM c GROUP BY 1
"""


def q_events_cuped(sf_dir: str):
    """CUPED variance-reduced A/B read-out (the experiment-analytics
    staple): units are users, the deterministic arm is user_id % 2, the
    pre-period covariate x is each user's value sum in the first half
    of the date range and the outcome y the second half.
    θ = cov(x, y)/var(x) over ALL units, y_cuped = y - θ·(x - x̄), and
    the output is one row per arm (n, mean_y, mean_y_cuped).  Fully
    distributed: ONE user cogroup folds per-unit (x, y) and emits
    per-arm moment partials (n, Σx, Σy, Σx², Σxy) — two rows per
    bucket — so no unit-scale table ever reaches the driver; θ/x̄ come
    from the summed-over-arms row and the per-arm adjusted mean is the
    linear identity (Σy - θ·(Σx - n·x̄))/n.  ROUND 4 absorbs the
    summation-order ulp (the corr/Welch precedent)."""


    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    b = _read(sf_dir, "events", ["ts"]).aggregate(Min("ts"), Max("ts"))
    t0 = pd.Timestamp(b["min(ts)"]).value // 1000
    t1 = pd.Timestamp(b["max(ts)"]).value // 1000
    mid = t0 + (t1 - t0) // 2

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        pre = ts < mid
        d = pd.DataFrame({"u": us, "x": np.where(pre, v, 0.0),
                          "y": np.where(pre, 0.0, v)})
        g = d.groupby("u", sort=False)[["x", "y"]].sum()
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        arm = (g.index.to_numpy(np.int64) % 2).astype(np.int64)
        p = pd.DataFrame(
            {"arm": arm, "n": 1, "sx": x, "sy": y, "sxx": x * x,
             "sxy": x * y}
        ).groupby("arm", sort=False).sum().reset_index()
        return p

    arms = (
        pre_aggregate(
            grouped_map(ev, "user_id", per_bucket), ["arm"],
            {"n": ("n", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
             "sxx": ("sxx", "sum"), "sxy": ("sxy", "sum")},
        )
        .to_pandas().sort_values("arm")
    )
    n = float(arms["n"].sum())
    sx, sy = float(arms["sx"].sum()), float(arms["sy"].sum())
    sxx, sxy = float(arms["sxx"].sum()), float(arms["sxy"].sum())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    na = arms["n"].to_numpy(np.float64)
    mean_y = arms["sy"].to_numpy(np.float64) / na
    mean_yc = (
        arms["sy"].to_numpy(np.float64)
        - theta * (arms["sx"].to_numpy(np.float64) - na * xbar)
    ) / na
    return pa.table(
        {
            "arm": pa.array(arms["arm"].to_numpy(np.int64)),
            "n": pa.array(arms["n"].to_numpy(np.int64)),
            "mean_y": pa.array(round_half_up(mean_y, 4), pa.float64()),
            "mean_y_cuped": pa.array(round_half_up(mean_yc, 4),
                                     pa.float64()),
        }
    )


SQL_EVENTS_CUPED = """
WITH b AS (SELECT epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1
           FROM events),
u AS (SELECT user_id,
             SUM(CASE WHEN epoch_us(ts) < b.t0 + (b.t1 - b.t0) // 2
                      THEN value ELSE 0.0 END) AS x,
             SUM(CASE WHEN epoch_us(ts) < b.t0 + (b.t1 - b.t0) // 2
                      THEN 0.0 ELSE value END) AS y
      FROM events CROSS JOIN b GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM u),
t AS (SELECT (m.n * m.sxy - m.sx * m.sy)
             / (m.n * m.sxx - m.sx * m.sx) AS theta,
             m.sx / m.n AS xbar
      FROM m)
SELECT CAST(u.user_id % 2 AS BIGINT) AS arm,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(y) / COUNT(*), 4) AS mean_y,
       ROUND(SUM(y - t.theta * (x - t.xbar)) / COUNT(*), 4)
         AS mean_y_cuped
FROM u CROSS JOIN t
GROUP BY 1
"""


def q_events_winsorized(sf_dir: str):
    """Per-type winsorized mean (clip at the exact p05/p95 order
    statistics; the clip twin of doclen_trimmed's drop) — EXACT: values
    quantize to cents, one (type, cents) histogram fold is the only
    corpus-scale pass, thresholds are integer-rank selections
    (rank = (n+19)//20 / (19n+19)//20 — never ceil(0.05·n), whose float
    product overshoots on exact multiples), and the winsorized mean
    folds from the histogram itself as Σ clipped-cents / (100·n)."""

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "v": pa.array(c)})

    h = (
        pre_aggregate(
            ev.map_batches(cents, batch_format="pyarrow"),
            ["event_type", "v"], {"c": (None, "count")},
        )
        .to_pandas().sort_values(["event_type", "v"], kind="mergesort")
    )
    out = []
    for et, g in h.groupby("event_type", sort=True):
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = v[np.searchsorted(cum, (n + 19) // 20)]
        hi = v[np.searchsorted(cum, (19 * n + 19) // 20)]
        clipped = np.clip(v, lo, hi)
        total = int((clipped * c).sum())
        n_lo = int(c[v < lo].sum())
        n_hi = int(c[v > hi].sum())
        out.append((et, n_lo, n_hi, total / (100.0 * n)))
    df = pd.DataFrame(out, columns=["event_type", "n_lo", "n_hi",
                                    "mean_winsor"])
    return pa.table(
        {
            "event_type": pa.array(df["event_type"]),
            "n_lo": pa.array(df["n_lo"].to_numpy(np.int64)),
            "n_hi": pa.array(df["n_hi"].to_numpy(np.int64)),
            "mean_winsor": pa.array(
                round_half_up(df["mean_winsor"].to_numpy(np.float64), 4),
                pa.float64(),
            ),
        }
    )


SQL_EVENTS_WINSORIZED = """
WITH b AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS v
           FROM events),
h AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2),
w AS (SELECT event_type, v, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h),
lo AS (SELECT event_type, MIN(v) AS v FROM w
       WHERE cum >= (n + 19) // 20 GROUP BY 1),
hi AS (SELECT event_type, MIN(v) AS v FROM w
       WHERE cum >= (19 * n + 19) // 20 GROUP BY 1)
SELECT w.event_type,
       CAST(COALESCE(SUM(w.c) FILTER (w.v < lo.v), 0) AS BIGINT)
         AS n_lo,
       CAST(COALESCE(SUM(w.c) FILTER (w.v > hi.v), 0) AS BIGINT)
         AS n_hi,
       ROUND(CAST(SUM(CASE WHEN w.v < lo.v THEN lo.v
                           WHEN w.v > hi.v THEN hi.v
                           ELSE w.v END * w.c) AS DOUBLE)
             / (100.0 * MAX(w.n)), 4) AS mean_winsor
FROM w JOIN lo ON w.event_type = lo.event_type
JOIN hi ON w.event_type = hi.event_type
GROUP BY 1
"""


def q_events_mannwhitney(sf_dir: str):
    """Mann-Whitney U (rank-sum) comparing click vs purchase values —
    the nonparametric A/B test, computed EXACTLY from the shared
    (value, group) histogram: tie-averaged ranks are half-integers
    (cumBefore + (count+1)/2 — exact binary doubles), so R1 and U1 are
    association-order-proof; no row-scale ranking shuffle exists at
    all.  Metadata-scale driver fold over distinct cents values (the
    quantized-domain trade; a continuous domain would use the DDSketch
    histogram instead)."""

    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'"
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        g = pc.cast(pc.equal(batch["event_type"], "click"), pa.int64())
        return pa.table({"v": pa.array(c), "g": g})

    h = (
        pre_aggregate(
            ev.map_batches(cents, batch_format="pyarrow"), ["v"],
            {"c": (None, "count"), "c1": ("g", "sum")},
        )
        .to_pandas().sort_values("v", kind="mergesort")
    )
    c = h["c"].to_numpy(np.int64)
    c1 = h["c1"].to_numpy(np.int64)
    cb = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.float64)
    avg_rank = cb + (c.astype(np.float64) + 1.0) / 2.0
    r1 = float((c1.astype(np.float64) * avg_rank).sum())
    n1 = int(c1.sum())
    n2 = int(c.sum()) - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "r1": pa.array(round_half_up(np.array([r1]), 1),
                           pa.float64()),
            "u1": pa.array(round_half_up(np.array([u1]), 1),
                           pa.float64()),
        }
    )


SQL_EVENTS_MANNWHITNEY = """
WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
           FROM events
           WHERE event_type IN ('click', 'purchase')),
h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(g) AS BIGINT) AS c1
      FROM b GROUP BY 1),
w AS (SELECT v, c, c1,
             CAST(COALESCE(SUM(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS DOUBLE) AS cb
      FROM h),
m AS (SELECT SUM(c1 * (cb + (CAST(c AS DOUBLE) + 1.0) / 2.0)) AS r1,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n2
      FROM w)
SELECT n1, n2, ROUND(r1, 1) AS r1,
       ROUND(r1 - n1 * (n1 + 1) / 2.0, 1) AS u1
FROM m
"""


def q_events_bounce_rate(sf_dir: str):
    """Per-day session bounce rate (sessions of exactly one event /
    sessions started that day; 30-min idle gap) — ONE user cogroup does
    the whole gaps-and-islands pass vectorized (shift-compare on exact
    integer microseconds), emits per-(day) session/bounce count
    partials, and a ≤366-row fold computes the pinned ratio."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_s = np.ones(len(df), bool)
        if len(df) > 1:
            new_s[1:] = (us[1:] != us[:-1]) | (
                ts[1:] - ts[:-1] > 1_800_000_000
            )
        sid = np.cumsum(new_s)
        g = pd.DataFrame({"sid": sid, "ts": ts}).groupby("sid",
                                                         sort=False)
        start = g["ts"].min().to_numpy(np.int64)
        size = g.size().to_numpy(np.int64)
        day = (start // 86_400_000_000).astype(np.int64)
        out = pd.DataFrame({"day": day, "n": 1,
                            "b": (size == 1).astype(np.int64)})
        return out.groupby("day", sort=False).sum().reset_index()

    folded = (
        pre_aggregate(
            grouped_map(ev, "user_id", per_bucket), ["day"],
            {"n_sessions": ("n", "sum"), "n_bounce": ("b", "sum")},
        )
        .to_pandas().sort_values("day")
    )
    day_str = np.array(
        [str(np.datetime64(int(d), "D"))
         for d in folded["day"].to_numpy(np.int64).tolist()]
    )
    ns = folded["n_sessions"].to_numpy(np.int64)
    nb = folded["n_bounce"].to_numpy(np.int64)
    return pa.table(
        {
            "day": pa.array(day_str),
            "n_sessions": pa.array(ns),
            "n_bounce": pa.array(nb),
            "bounce_rate": pa.array(
                round_half_up(nb / ns, 4), pa.float64()
            ),
        }
    )


SQL_EVENTS_BOUNCE_RATE = """
WITH s AS (SELECT user_id, ts, event_id,
                  CASE WHEN LAG(ts) OVER w IS NULL
                            OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                               > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS sid
      FROM s),
g AS (SELECT user_id, sid, MIN(ts) AS start_ts,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2)
SELECT strftime(start_ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS bounce_rate
FROM g GROUP BY 1
"""


def q_events_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix: users grouped by first-activity
    week, revenue (value, cents-exact) folded per (cohort_week,
    age_weeks) with the active-user count — the retention matrix's
    revenue twin.  ONE user cogroup computes each user's cohort week
    and per-age partials (one row per user per active week), so the
    (cohort, age) fold is exact integers end-to-end."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wk = ts // 86_400_000_000 // 7
        cents = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        d = pd.DataFrame({"u": us, "wk": wk, "cents": cents})
        cwk = d.groupby("u", sort=False)["wk"].transform("min")
        d = d.assign(cohort_wk=cwk, age_wk=d["wk"] - cwk)
        g = d.groupby(["cohort_wk", "age_wk", "u"], sort=False)["cents"] \
            .sum().reset_index()
        out = g.groupby(["cohort_wk", "age_wk"], sort=False).agg(
            n_users=("u", "size"), cents=("cents", "sum")
        ).reset_index()
        return out

    folded = pre_aggregate(
        grouped_map(ev, "user_id", per_bucket), ["cohort_wk", "age_wk"],
        {"n_users": ("n_users", "sum"), "cents": ("cents", "sum")},
    ).to_pandas()

    return pa.table(
        {
            "cohort_wk": pa.array(
                folded["cohort_wk"].to_numpy(np.int64)),
            "age_wk": pa.array(folded["age_wk"].to_numpy(np.int64)),
            "n_users": pa.array(folded["n_users"].to_numpy(np.int64)),
            "revenue": pa.array(
                round_half_up(
                    folded["cents"].to_numpy(np.float64) / 100.0, 2
                ),
                pa.float64(),
            ),
        }
    )


SQL_EVENTS_COHORT_LTV = """
WITH d AS (SELECT user_id,
                  epoch_us(ts) // 86400000000 // 7 AS wk,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
c AS (SELECT user_id, MIN(wk) AS cwk FROM d GROUP BY 1)
SELECT CAST(c.cwk AS BIGINT) AS cohort_wk,
       CAST(d.wk - c.cwk AS BIGINT) AS age_wk,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(d.cents) AS DOUBLE) / 100.0, 2) AS revenue
FROM d JOIN c ON d.user_id = c.user_id
GROUP BY 1, 2
"""


def q_doc_simpson(sf_dir: str):
    """Per-doc Simpson diversity index of the token distribution
    (Σc(c-1) / n(n-1)) — the ORACLE-EXACT twin of doc_entropy: no logs,
    all counts integral, the single final division pinned.  A doc is a
    row, so the whole computation is stateless per batch — no shuffle.
    Restricted to n >= 2 in both engines (the index is undefined on
    singleton docs)."""

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def simpson(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        e = df[["doc_id"]].join(
            df["text"].str.split(" ").rename("t")
        ).explode("t")
        e = e[e["t"] != ""]
        tc = e.groupby(["doc_id", "t"], sort=False).size().reset_index(
            name="c")
        c = tc["c"].to_numpy(np.int64)
        agg = pd.DataFrame(
            {"doc_id": tc["doc_id"], "s": c * (c - 1), "n": c}
        ).groupby("doc_id", sort=False).sum().reset_index()
        agg = agg[agg["n"] >= 2]
        n = agg["n"].to_numpy(np.int64)
        s = agg["s"].to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
                "simpson": pa.array(
                    round_half_up(
                        s.astype(np.float64)
                        / (n * (n - 1)).astype(np.float64), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(simpson, batch_format="pyarrow")


SQL_DOC_SIMPSON = """
WITH tc AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> '' GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(c) AS n, SUM(c * (c - 1)) AS s
      FROM tc GROUP BY 1)
SELECT doc_id,
       ROUND(CAST(s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6)
         AS simpson
FROM n WHERE n >= 2
"""


def q_parts_abc(sf_dir: str):
    """ABC (Pareto) classification of parts by revenue: class A covers
    the first 80% of cumulative revenue in descending order, B to 95%,
    C the tail — EXACT, via the Gini-style value-range decomposition
    run DESCENDING with per-range revenue-sum offsets (ints), so each
    range resolves its rows' cumulative totals without any global sort;
    the class compares are integer cross-products (cum·100 <= 80·total),
    never float shares.  Ties broken by (revenue desc, partkey)."""
    from kgray.util import default_num_buckets, grouped_map, round_half_up

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0, 0
        ).astype(np.int64)
        return pa.table({"p": batch["l_partkey"], "c": pa.array(c)})

    rev = pre_aggregate(
        line.map_batches(cents, batch_format="pyarrow"), ["p"],
        {"c": ("c", "sum")},
    ).materialize()


    bounds = rev.aggregate(Min("c"), Max("c"))
    lo, hi = int(bounds["min(c)"]), int(bounds["max(c)"])
    n_ranges = default_num_buckets()
    width = max((hi - lo) // n_ranges + 1, 1)

    def rng_of(c: np.ndarray) -> np.ndarray:
        # descending: range 0 holds the LARGEST revenues
        return (n_ranges - 1
                - np.minimum((c - lo) // width, n_ranges - 1)).astype(
                    np.int64)

    def range_sums(batch: pa.Table) -> pa.Table:
        r = rng_of(batch["c"].to_numpy())
        s = np.bincount(r, weights=batch["c"].to_numpy(),
                        minlength=n_ranges).astype(np.int64)
        nz = np.nonzero(s)[0]
        return pa.table({"rng": pa.array(nz, pa.int64()),
                         "s": pa.array(s[nz])})

    hist = (
        pre_aggregate(
            rev.map_batches(range_sums, batch_format="pyarrow"),
            ["rng"], {"s": ("s", "sum")},
        )
        .to_pandas().sort_values("rng")
    )
    offsets = np.zeros(n_ranges, np.int64)
    idx = hist["rng"].to_numpy(np.int64)
    csum = np.concatenate([[0],
                           np.cumsum(hist["s"].to_numpy(np.int64))[:-1]])
    offsets[idx] = csum
    total = int(hist["s"].sum())

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rng", pa.array(rng_of(batch["c"].to_numpy()))
        )

    tagged = rev.map_batches(tag, batch_format="pyarrow")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r, grp in df.groupby("rng", sort=False):
            g = grp.sort_values(["c", "p"], ascending=[False, True],
                                kind="mergesort")
            cum = offsets[int(r)] + np.cumsum(g["c"].to_numpy(np.int64))
            abc = np.where(
                cum * 100 <= 80 * total, "A",
                np.where(cum * 100 <= 95 * total, "B", "C"),
            )
            out.append(pd.DataFrame(
                {"p_partkey": g["p"].to_numpy(np.int64), "abc": abc}
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"p_partkey": [], "abc": []})

    return grouped_map(tagged, "rng", classify)


SQL_PARTS_ABC = """
WITH r AS (SELECT l_partkey AS p,
                  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM lineitem GROUP BY 1),
w AS (SELECT p, c,
             SUM(c) OVER (ORDER BY c DESC, p) AS cum,
             SUM(c) OVER () AS tot
      FROM r)
SELECT p AS p_partkey,
       CASE WHEN cum * 100 <= 80 * tot THEN 'A'
            WHEN cum * 100 <= 95 * tot THEN 'B'
            ELSE 'C' END AS abc
FROM w
"""


def q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix (predicted vs labeled lang, counts)
    — the eval composition over the langid heuristic: the predictor is
    the SAME add_langid kernel langid uses, the label is the documents
    table's lang column, and the matrix folds through the combiner
    (|langs|² keys).  The oracle embeds langid's own SQL as a
    subquery — query composition, not a new rule."""
    from kgray.ops.text import add_langid

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def pred(batch: pa.Table) -> pa.Table:
        t = add_langid(batch)
        return pa.table({"lang": batch["lang"],
                         "lang_pred": t["lang_pred"]})

    return pre_aggregate(
        docs.map_batches(pred, batch_format="pyarrow"),
        ["lang", "lang_pred"], {"n": (None, "count")},
    )


SQL_LANGID_CONFUSION = """
SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN (""" + SQL_LANGID + """) p ON d.doc_id = p.doc_id
GROUP BY 1, 2
"""


def q_events_churn_labels(sf_dir: str):
    """Training-label generation for churn prediction: one row per
    (user, active day) labeled 1 iff the user has NO activity in the
    next 7 calendar days — the canonical supervised-dataset builder.
    ONE user cogroup: distinct sorted day ints, next-day shift, exact
    integer compare (the last active day is churned by definition)."""

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_user(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.cast(
                    pc.cast(
                        pc.floor_temporal(batch["ts"], unit="day"),
                        pa.date32(),
                    ),
                    pa.int32(),
                ),
            }
        ).group_by(["user_id", "day"]).aggregate([])

    du = ev.map_batches(day_user, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        us = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        churned = np.ones(len(df), np.int64)
        if len(df) > 1:
            returned = (us[1:] == us[:-1]) & (d[1:] - d[:-1] <= 7)
            churned[:-1] = (~returned).astype(np.int64)
        day_str = np.array(
            [str(np.datetime64(int(x), "D")) for x in d.tolist()]
        )
        return pd.DataFrame(
            {"user_id": us, "day": day_str, "churned": churned}
        )

    return grouped_map(du, "user_id", per_bucket)


SQL_EVENTS_CHURN_LABELS = """
WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT a.user_id, strftime(a.d, '%Y-%m-%d') AS day,
       CAST(CASE WHEN EXISTS (
              SELECT 1 FROM du b
              WHERE b.user_id = a.user_id
                AND b.d > a.d AND b.d <= a.d + 7)
            THEN 0 ELSE 1 END AS BIGINT) AS churned
FROM du a
"""


def q_part_sorted_neighbor_pairs(sf_dir: str):
    """Sorted-neighborhood blocking (the classic entity-resolution
    candidate generator the LSH/token-block family lacks): candidate
    pairs are rows within window 2 of each other in the GLOBAL
    (p_name, p_partkey) sort order — without a global sort: the
    distinct-name histogram (metadata-scale: the name vocabulary, not
    the part count) gives every name its rank offset, a name cogroup
    emits in-name window pairs from tie ranks, and only each name's
    head-2/tail-2 rows (≤ 4·|names|) return to the driver to close the
    cross-name boundary pairs.  Exactly equals the oracle's ROW_NUMBER
    self-join."""

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    hist = (
        pre_aggregate(part.select_columns(["p_name"]), ["p_name"],
                      {"c": (None, "count")})
        .to_pandas().sort_values("p_name")
    )
    names = hist["p_name"].to_numpy()
    counts = hist["c"].to_numpy(np.int64)
    offsets = dict(
        zip(names.tolist(),
            np.concatenate([[0], np.cumsum(counts)[:-1]]).tolist())
    )
    cnt_of = dict(zip(names.tolist(), counts.tolist()))

    def per_name(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for name, grp in df.groupby("p_name", sort=False):
            g = grp.sort_values("p_partkey", kind="mergesort")
            keys = g["p_partkey"].to_numpy(np.int64)
            base = offsets[name]
            n = len(g)
            for w in (1, 2):
                if n > w:
                    out.append(pd.DataFrame(
                        {"k1": keys[:-w], "k2": keys[w:],
                         "is_pair": 1, "rank": -1, "name": ""}
                    ))
            # boundary rows: global head-2 / tail-2 of this name block
            sel = np.zeros(n, bool)
            sel[:2] = True
            sel[max(n - 2, 0):] = True
            ranks = base + np.flatnonzero(sel) + 1
            out.append(pd.DataFrame(
                {"k1": keys[sel], "k2": -1, "is_pair": 0,
                 "rank": ranks, "name": name}
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"k1": [], "k2": [], "is_pair": [], "rank": [], "name": []}
        )

    rows = grouped_map(part, "p_name", per_name).to_pandas()
    pairs = rows[rows["is_pair"] == 1][["k1", "k2"]]
    b = rows[rows["is_pair"] == 0].sort_values("rank")
    br = b["rank"].to_numpy(np.int64)
    bk = b["k1"].to_numpy(np.int64)
    bn = b["name"].to_numpy()
    cross = []
    for w in (1, 2):
        if len(b) > w:
            close = (br[w:] - br[:-w] <= 2) & (bn[w:] != bn[:-w])
            cross.append(pd.DataFrame(
                {"k1": bk[:-w][close], "k2": bk[w:][close]}
            ))
    allp = pd.concat([pairs] + cross, ignore_index=True)
    return pa.table(
        {
            "k1": pa.array(allp["k1"].to_numpy(np.int64)),
            "k2": pa.array(allp["k2"].to_numpy(np.int64)),
        }
    )


SQL_PART_SORTED_NEIGHBOR_PAIRS = """
WITH r AS (SELECT p_partkey, p_name,
                  ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rn
           FROM part)
SELECT a.p_partkey AS k1, b.p_partkey AS k2
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2
"""


def q_part_name_clusters(sf_dir: str):
    """Entity-resolution END-TO-END with a full SQL oracle: the blocked
    fuzzy pair graph (q_part_name_fuzzy_pairs — distinct-name
    vocabulary, trailing-token blocking, vectorized Levenshtein <= 2)
    feeds :func:`canonical.connected_components` (min-label closure,
    driver union-find under the gate / MapReduce-CC above it) and every
    name maps to its cluster representative (isolated names map to
    themselves).  The oracle runs the identical edge SQL through a
    recursive-CTE closure — the dedup_purge pattern applied to the ER
    chain, proving candidate-generation + clustering + canonical-pick
    as ONE checked unit."""
    from kgray.ops.canonical import connected_components

    edges = q_part_name_fuzzy_pairs(sf_dir).map_batches(
        lambda b: pa.table({"u": b["name_a"], "v": b["name_b"]}),
        batch_format="pyarrow",
    )
    comp = connected_components(edges)
    comp_df = (
        comp.to_pandas() if hasattr(comp, "to_pandas")
        else comp
    )
    rep_of = dict(zip(comp_df["node"], comp_df["component"]))


    names = pre_aggregate(
        _read(sf_dir, "part", ["p_name"]), ["p_name"],
        {"c": (None, "count")},
    )

    def attach(batch: pa.Table) -> pa.Table:
        nm = batch["p_name"].to_pylist()
        return pa.table(
            {
                "p_name": batch["p_name"],
                "cluster_rep": pa.array(
                    [rep_of.get(n, n) for n in nm], pa.string()
                ),
            }
        )

    return names.map_batches(attach, batch_format="pyarrow")


SQL_PART_NAME_CLUSTERS = """
WITH RECURSIVE
n AS (SELECT DISTINCT p_name FROM part),
p AS (SELECT a.p_name AS u, b.p_name AS v
      FROM n a JOIN n b
        ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
       AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2),
sym AS (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
cc AS (SELECT src AS node, src AS label FROM sym
       UNION
       SELECT s.dst AS node, cc.label FROM cc JOIN sym s
         ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)
SELECT n.p_name, COALESCE(comp.component, n.p_name) AS cluster_rep
FROM n LEFT JOIN comp ON n.p_name = comp.node
"""


def q_events_weekday_adjusted(sf_dir: str):
    """Seasonal (weekday-effect) adjustment of the daily event series:
    residual = day count − that weekday's cross-corpus mean — the
    classic decomposition step before anomaly detection.  Counts fold
    through the combiner (integers), the 7-row weekday baseline is
    exact-rational (Σ/n of ints) with the identical expression both
    engines, and only the final subtraction is float (ROUND 4).
    Weekday convention pinned to ISO (Mon=1..Sun=7) in both engines."""

    ev = _read(sf_dir, "events", ["ts"])

    def day(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                            pa.date32())}
        )

    daily = (
        pre_aggregate(
            ev.map_batches(day, batch_format="pyarrow"), ["day"],
            {"n": (None, "count")},
        )
        .to_pandas().sort_values("day")
    )
    days = daily["day"].to_numpy("datetime64[D]").astype(np.int64)
    # 1970-01-01 was a Thursday: ISO weekday = ((epoch_days + 3) % 7) + 1
    wd = ((days + 3) % 7 + 1).astype(np.int64)
    n = daily["n"].to_numpy(np.int64)
    base = pd.DataFrame({"wd": wd, "n": n}).groupby("wd")["n"]
    mean_of = (base.sum() / base.count()).to_dict()
    resid = n - np.array([mean_of[w] for w in wd.tolist()])
    day_str = np.array([str(np.datetime64(int(d), "D"))
                        for d in days.tolist()])
    return pa.table(
        {
            "day": pa.array(day_str),
            "n": pa.array(n),
            "resid": pa.array(round_half_up(resid, 4), pa.float64()),
        }
    )


SQL_EVENTS_WEEKDAY_ADJUSTED = """
WITH c AS (SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
b AS (SELECT isodow(d) AS wd,
             CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
      FROM c GROUP BY 1)
SELECT strftime(c.d, '%Y-%m-%d') AS day, c.n,
       ROUND(c.n - b.m, 4) AS resid
FROM c JOIN b ON isodow(c.d) = b.wd
"""
