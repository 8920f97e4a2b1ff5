"""Session-20 operator batch — corpus-diagnostics / forecasting-eval /
privacy family: pairwise source vocabulary-overlap Jaccard (cross-source
contamination matrix at vocab scale), seasonal-naive forecast backtest
(MASE over integer daily cents), user-contribution-bounded DP counts
(cap-3 per user-day, seeded Laplace at sensitivity 3), lift/gain at
score percentile thresholds, k-fold cross-validated exact AUC (md5
folds x the rank-sum histogram), two-feature grouped OLS solved by
integer Cramer determinants, and an A/B sample-ratio-mismatch
chi-square.

Exactness strategy (house rules): every cross-engine sum is integral
(cents / counts / moments); python-int final folds make the Ray side
overflow-immune; floats appear only in final per-row expressions whose
operation tree is written identically in both engines.
"""

from ._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Pairwise source vocabulary overlap (cross-source contamination matrix)
# ---------------------------------------------------------------------------


def q_source_vocab_overlap(sf_dir: str):
    """Jaccard overlap of the distinct-token sets of every source pair —
    the corpus-mixing diagnostic ("how much does source A's vocabulary
    already live in source B?").  Row-scale text collapses to the
    distinct (source, token) table via a per-batch set + count fold
    (vocab-scale, bounded by |vocab| x |sources|, not rows), which is
    materialized once and consumed twice: per-source set sizes (tiny
    groupby) and per-token source lists (one grouped_map cogroup whose
    pair fan-out is <= C(|sources|,2) per token).  Jaccard is a final
    identical-operand division; tokenization is the corpus convention
    (split on ' ', empties kept) so the SQL oracle is bit-identical."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        seen = set()
        for s, t in zip(src, batch["text"].to_pylist()):
            for w in t.split(" "):
                seen.add((s, w))
        ss = sorted(seen)
        return pa.table({
            "source": pa.array([p[0] for p in ss], pa.string()),
            "word": pa.array([p[1] for p in ss], pa.string()),
        })

    dd = pre_aggregate(
        docs.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["source", "word"], {"n": (None, "count")},
    ).materialize()  # vocab-scale checkpoint, consumed twice

    sizes = (
        dd.groupby("source").aggregate(Count(alias_name="nw")).to_pandas()
    )
    nw = dict(zip(sizes["source"].astype(str), sizes["nw"].astype(int)))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in df.groupby("word", sort=False):
            ss = sorted(set(grp["source"]))
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    rows.append((ss[i], ss[j]))
        out = pd.DataFrame(rows, columns=["s1", "s2"])
        if out.empty:
            return pd.DataFrame({"s1": pd.Series(dtype=str),
                                 "s2": pd.Series(dtype=str),
                                 "inter": pd.Series(dtype=np.int64)})
        g = out.groupby(["s1", "s2"], sort=False).size().reset_index(
            name="inter")
        g["inter"] = g["inter"].astype(np.int64)
        return g

    inter_df = pre_aggregate(
        grouped_map(dd, "word", pair_partial),
        ["s1", "s2"], {"inter": ("inter", "sum")},
    ).to_pandas()  # |sources|^2-scale
    inter = {(r.s1, r.s2): int(r.inter) for r in inter_df.itertuples()}

    srcs = sorted(nw)
    s1s, s2s, n1s, n2s, ints, jac = [], [], [], [], [], []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            iv = inter.get((a, b), 0)
            s1s.append(a); s2s.append(b)
            n1s.append(nw[a]); n2s.append(nw[b]); ints.append(iv)
            jac.append(round_half_up(
                float(iv) / float(nw[a] + nw[b] - iv), 6))
    return pa.table({
        "s1": pa.array(s1s, pa.string()),
        "s2": pa.array(s2s, pa.string()),
        "n1": pa.array(n1s, pa.int64()),
        "n2": pa.array(n2s, pa.int64()),
        "inter": pa.array(ints, pa.int64()),
        "jaccard": pa.array(jac, pa.float64()),
    })


SQL_SOURCE_VOCAB_OVERLAP = """
WITH w AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nw FROM w GROUP BY 1),
i AS (SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS inter
      FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
      GROUP BY 1, 2)
SELECT sa.source AS s1, sb.source AS s2, sa.nw AS n1, sb.nw AS n2,
       COALESCE(i.inter, 0) AS inter,
       ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / CAST(sa.nw + sb.nw - COALESCE(i.inter, 0) AS DOUBLE), 6)
         AS jaccard
FROM s sa JOIN s sb ON sa.source < sb.source
LEFT JOIN i ON i.s1 = sa.source AND i.s2 = sb.source
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest: MASE per event type over daily cents
# ---------------------------------------------------------------------------


def q_events_mase(sf_dir: str):
    """Forecast-quality backtest without fitting anything: for each
    event type's daily value series (integer cents sums), score the
    seasonal-naive forecast s[t-7] by MASE = sum|s[t]-s[t-7]| /
    sum|s[t]-s[t-1]| over the rows where the 7-back lag exists (observed
    -day order, both engines).  The row-scale pass is one daily-cents
    combiner fold; lags run over the aggregate-scale (type x day) table
    with python-int absolute-difference sums (exact in any order).  Only
    the final num/den division is float."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = pa.table({
            "event_type": batch["event_type"],
            "day": pc.strftime(batch["ts"], "%Y-%m-%d"),
            "s": pa.array(cents),
        })
        return t.group_by(["event_type", "day"]).aggregate([("s", "sum")]) \
                .rename_columns(["event_type", "day", "s"])

    daily = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], {"s": ("s", "sum")},
    ).to_pandas()  # aggregate-scale: types x days
    daily = daily.sort_values(["event_type", "day"], ignore_index=True)

    types, n_eval, nums, dens, mase = [], [], [], [], []
    for ty, grp in daily.groupby("event_type", sort=True):
        s = [int(v) for v in grp["s"]]
        num = den = cnt = 0
        for i in range(7, len(s)):
            num += abs(s[i] - s[i - 7])
            den += abs(s[i] - s[i - 1])
            cnt += 1
        if cnt == 0 or den == 0:
            continue
        types.append(ty); n_eval.append(cnt)
        nums.append(num); dens.append(den)
        mase.append(round_half_up(float(num) / float(den), 6))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_eval": pa.array(n_eval, pa.int64()),
        "num": pa.array(nums, pa.int64()),
        "den": pa.array(dens, pa.int64()),
        "mase": pa.array(mase, pa.float64()),
    })


SQL_EVENTS_MASE = """
WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
           FROM events GROUP BY 1, 2),
l AS (SELECT event_type, s,
             LAG(s, 1) OVER (PARTITION BY event_type ORDER BY day) AS s1,
             LAG(s, 7) OVER (PARTITION BY event_type ORDER BY day) AS s7
      FROM d),
a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(ABS(s - s7)) AS BIGINT) AS num,
             CAST(SUM(ABS(s - s1)) AS BIGINT) AS den
      FROM l WHERE s7 IS NOT NULL GROUP BY 1)
SELECT event_type, n_eval, num, den,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS mase
FROM a WHERE n_eval > 0 AND den > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Contribution-bounded DP daily counts (cap 3 events per user-day)
# ---------------------------------------------------------------------------


def q_dp_user_capped_counts(sf_dir: str):
    """User-level DP release of daily event counts: each user
    contributes at most 3 events per day (first 3 by (ts, event_id) —
    the deterministic tie-break), bounding the sensitivity at 3, then
    seeded Laplace noise at scale 3/eps (eps=1) is added from the
    md5-uniform (13 hex digits / 2^52, exactly representable) so the
    DuckDB oracle reproduces the release bit-for-bit.  The cap is a
    per-user cogroup (pandas cumcount inside grouped_map buckets); the
    day counts fold with a combiner; one libm ln per output row."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        df = df.sort_values(["user_id", "day", "ts", "event_id"],
                            kind="mergesort")
        keep = df.groupby(["user_id", "day"], sort=False).cumcount() < 3
        g = df.loc[keep].groupby("day", sort=False).size().reset_index(
            name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    g = pre_aggregate(
        grouped_map(ev, "user_id", cap), ["day"], {"n": ("n", "sum")},
    ).to_pandas().sort_values("day", ignore_index=True)

    noisy = []
    for day, n in zip(g["day"], g["n"]):
        h = int(hashlib.md5(f"dpcap:{day}".encode()).hexdigest()[:13], 16)
        u = h / 16 ** 13
        a = abs(u - 0.5)
        if a == 0.0:
            noise = 0.0
        else:
            sgn = -1.0 if u >= 0.5 else 1.0
            noise = sgn * 3.0 * math.log(1.0 - 2.0 * a)
        noisy.append(round_half_up(int(n) + noise, 6))
    return pa.table({
        "day": pa.array(g["day"].astype(str), pa.string()),
        "n": pa.array(g["n"].to_numpy(np.int64)),
        "noisy_n": pa.array(noisy, pa.float64()),
    })


SQL_DP_USER_CAPPED_COUNTS = """
WITH r AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         ROW_NUMBER() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                            ORDER BY ts, event_id) AS rn
  FROM events),
c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM r WHERE rn <= 3
      GROUP BY 1),
u AS (SELECT day, n,
             CAST(CAST('0x' || substr(md5('dpcap:' || day), 1, 13)
                       AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS u
      FROM c)
SELECT day, n,
       ROUND(n + CASE WHEN abs(u - 0.5) = 0.0 THEN 0.0
                      ELSE (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                           * 3.0 * ln(1.0 - 2.0 * abs(u - 0.5)) END, 6)
         AS noisy_n
FROM u ORDER BY day
"""


# ---------------------------------------------------------------------------
# Lift / gain at score percentile thresholds
# ---------------------------------------------------------------------------

_LIFT_QS = [0.5, 0.75, 0.9, 0.95, 0.99]


def q_events_lift_at(sf_dir: str):
    """Marketing-style gains table: using ``value`` as a score for
    event_type = 'purchase', report size, positives and lift of the
    population at or above each score percentile threshold.  One
    (cents -> n, n_pos) histogram fold; thresholds are exact rank
    selections over the aggregate-scale histogram (rank(p) = ceil(p*N),
    the repo's percentile_disc-pinned semantics, ops/sample.py); counts
    at each threshold are suffix sums of the histogram; lift is a final
    identical-operand float expression."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        y = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df = pd.DataFrame({"cents": cents, "one": 1, "y": y})
        g = df.groupby("cents", sort=False).sum().reset_index()
        return pa.table({
            "cents": pa.array(g["cents"].to_numpy(np.int64)),
            "n": pa.array(g["one"].to_numpy(np.int64)),
            "n_pos": pa.array(g["y"].to_numpy(np.int64)),
        })

    hist = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["cents"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")},
    ).to_pandas().sort_values("cents", ignore_index=True)

    n_arr = hist["n"].to_numpy(np.int64)
    pos_arr = hist["n_pos"].to_numpy(np.int64)
    cents_arr = hist["cents"].to_numpy(np.int64)
    cum = np.cumsum(n_arr)
    total_n = int(cum[-1])
    total_pos = int(pos_arr.sum())

    qs, thr, n_at, pos_at, lift = [], [], [], [], []
    for q in _LIFT_QS:
        rank = int(np.ceil(q * total_n))  # ops/sample.py's pinned rank(p)
        idx = int(np.searchsorted(cum, rank, side="left"))
        t = int(cents_arr[idx])
        na = int(n_arr[idx:].sum())
        pa_ = int(pos_arr[idx:].sum())
        if na == 0 or total_pos == 0:
            continue
        qs.append(q); thr.append(t); n_at.append(na); pos_at.append(pa_)
        lift.append(round_half_up(
            (float(pa_) / float(na))
            / (float(total_pos) / float(total_n)), 6))
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "threshold": pa.array(thr, pa.int64()),
        "n_at": pa.array(n_at, pa.int64()),
        "pos_at": pa.array(pos_at, pa.int64()),
        "lift": pa.array(lift, pa.float64()),
    })


def _lift_sql() -> str:
    sels = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"(SELECT percentile_disc({q}) WITHIN GROUP "
        f"(ORDER BY cents) FROM c) AS t"
        for q in _LIFT_QS
    )
    return f"""
WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
               CAST(SUM(y) AS BIGINT) AS pos_tot FROM c),
sel AS ({sels})
SELECT s.q, CAST(s.t AS BIGINT) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_at,
       CAST(SUM(c.y) AS BIGINT) AS pos_at,
       ROUND((CAST(SUM(c.y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             / (CAST(MAX(tot.pos_tot) AS DOUBLE)
                / CAST(MAX(tot.n_tot) AS DOUBLE)), 6) AS lift
FROM sel s JOIN c ON c.cents >= s.t CROSS JOIN tot
GROUP BY s.q, s.t
HAVING COUNT(*) > 0 AND MAX(tot.pos_tot) > 0
ORDER BY s.q
"""


SQL_EVENTS_LIFT_AT = _lift_sql()


# ---------------------------------------------------------------------------
# k-fold cross-validated exact AUC (md5 folds)
# ---------------------------------------------------------------------------


def q_events_cv_auc(sf_dir: str):
    """Cross-validation of the 'value predicts purchase' scorer: a
    deterministic md5 5-fold assignment on event_id (stateless map, no
    RNG) and the exact Mann-Whitney AUC per fold via the (fold, cents)
    histogram fold — same rank-sum cumulative pass as q_events_auc, so
    fold-to-fold variance of the metric is measured without a single
    float crossing engines before the final division."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_pylist()
        fold = np.fromiter(
            (int(hashlib.md5(f"cv:{i}".encode()).hexdigest()[:13], 16) % 5
             for i in ids), np.int64, len(ids))
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        y = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df = pd.DataFrame({"fold": fold, "cents": cents, "one": 1, "y": y})
        g = df.groupby(["fold", "cents"], sort=False).sum().reset_index()
        return pa.table({
            "fold": pa.array(g["fold"].to_numpy(np.int64)),
            "cents": pa.array(g["cents"].to_numpy(np.int64)),
            "n": pa.array(g["one"].to_numpy(np.int64)),
            "pos": pa.array(g["y"].to_numpy(np.int64)),
        })

    hist = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["fold", "cents"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
    ).to_pandas().sort_values(["fold", "cents"], ignore_index=True)

    folds, n_poss, n_negs, aucs = [], [], [], []
    for fold, grp in hist.groupby("fold", sort=True):
        pos = grp["pos"].to_numpy(np.int64)
        neg = (grp["n"] - grp["pos"]).to_numpy(np.int64)
        u2 = 0
        below = 0
        for p, ng in zip(pos.tolist(), neg.tolist()):
            u2 += p * (2 * below + ng)
            below += ng
        n_pos = int(pos.sum())
        n_neg = int(neg.sum())
        if n_pos == 0 or n_neg == 0:
            continue
        folds.append(int(fold)); n_poss.append(n_pos); n_negs.append(n_neg)
        aucs.append(round_half_up(float(u2) / (2.0 * n_pos * n_neg), 6))
    return pa.table({
        "fold": pa.array(folds, pa.int64()),
        "n_pos": pa.array(n_poss, pa.int64()),
        "n_neg": pa.array(n_negs, pa.int64()),
        "auc": pa.array(aucs, pa.float64()),
    })


SQL_EVENTS_CV_AUC = """
WITH b AS (
  SELECT CAST('0x' || substr(md5('cv:' || CAST(event_id AS VARCHAR)), 1, 13)
              AS BIGINT) % 5 AS fold,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
c AS (SELECT fold, cents, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM b GROUP BY 1, 2),
w AS (SELECT fold, pos, neg,
             SUM(neg) OVER (PARTITION BY fold ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) - neg AS below
      FROM c),
u AS (SELECT fold,
             SUM(CAST(pos AS HUGEINT) * (2 * CAST(below AS HUGEINT) + neg))
               AS u2,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg
      FROM w GROUP BY 1)
SELECT fold, n_pos, n_neg,
       ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
FROM u WHERE n_pos > 0 AND n_neg > 0
ORDER BY fold
"""


# ---------------------------------------------------------------------------
# Two-feature grouped OLS via integer Cramer determinants
# ---------------------------------------------------------------------------


def q_events_ols2(sf_dir: str):
    """Multiple regression the moment-fold way: per event type, fit
    cents ~ 1 + hour + dow by normal equations.  The nine sufficient
    moments (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y) fold as
    int64 batch partials + a python-int final fold, so the 3x3 Cramer
    determinants are EXACT integers — parity with the SQL's HUGEINT
    determinant expressions is algebraic, not numeric.  Only the final
    det_i/det divisions (identical int operands -> identical doubles)
    are float.  dow uses DuckDB's 0=Sunday convention via the epoch+4
    mod-7 trick (see q_events_chi2)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        x1 = (ts.astype("datetime64[h]").astype(np.int64) % 24)
        x2 = (ts.astype("datetime64[D]").astype(np.int64) + 4) % 7
        y = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "n": 1, "sx1": x1, "sx2": x2,
            "sx11": x1 * x1, "sx12": x1 * x2, "sx22": x2 * x2,
            "sy": y, "sx1y": x1 * y, "sx2y": x2 * y,
        })
        g = df.groupby("event_type", sort=False).sum().reset_index()
        cols = {"event_type": pa.array(g["event_type"].astype(str),
                                       pa.string())}
        for c in ["n", "sx1", "sx2", "sx11", "sx12", "sx22",
                  "sy", "sx1y", "sx2y"]:
            cols[c] = pa.array(g[c].to_numpy(np.int64))
        return pa.table(cols)

    moments = ["n", "sx1", "sx2", "sx11", "sx12", "sx22",
               "sy", "sx1y", "sx2y"]
    parts = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], {m: (m, "sum") for m in moments},
    ).to_pandas()

    types, ns, b0s, b1s, b2s = [], [], [], [], []
    for r in parts.sort_values("event_type").itertuples(index=False):
        n, sx1, sx2 = int(r.n), int(r.sx1), int(r.sx2)
        sx11, sx12, sx22 = int(r.sx11), int(r.sx12), int(r.sx22)
        sy, sx1y, sx2y = int(r.sy), int(r.sx1y), int(r.sx2y)

        def det3(a, b, c, d, e, f, g, h, i):
            return a * (e * i - f * h) - b * (d * i - f * g) \
                + c * (d * h - e * g)

        det = det3(n, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
        if det == 0:
            continue
        det0 = det3(sy, sx1, sx2, sx1y, sx11, sx12, sx2y, sx12, sx22)
        det1 = det3(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22)
        det2 = det3(n, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y)
        types.append(r.event_type); ns.append(n)
        b0s.append(round_half_up(float(det0) / float(det), 6))
        b1s.append(round_half_up(float(det1) / float(det), 6))
        b2s.append(round_half_up(float(det2) / float(det), 6))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "beta0": pa.array(b0s, pa.float64()),
        "beta_hour": pa.array(b1s, pa.float64()),
        "beta_dow": pa.array(b2s, pa.float64()),
    })


SQL_EVENTS_OLS2 = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(hour(ts)) AS HUGEINT) AS sx1,
         CAST(SUM(dayofweek(ts)) AS HUGEINT) AS sx2,
         CAST(SUM(hour(ts) * hour(ts)) AS HUGEINT) AS sx11,
         CAST(SUM(hour(ts) * dayofweek(ts)) AS HUGEINT) AS sx12,
         CAST(SUM(dayofweek(ts) * dayofweek(ts)) AS HUGEINT) AS sx22,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sy,
         CAST(SUM(hour(ts) * CAST(round(value * 100) AS BIGINT))
              AS HUGEINT) AS sx1y,
         CAST(SUM(dayofweek(ts) * CAST(round(value * 100) AS BIGINT))
              AS HUGEINT) AS sx2y
  FROM events GROUP BY 1),
d AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
         n * (sx11 * sx22 - sx12 * sx12)
           - sx1 * (sx1 * sx22 - sx12 * sx2)
           + sx2 * (sx1 * sx12 - sx11 * sx2) AS det,
         sy * (sx11 * sx22 - sx12 * sx12)
           - sx1 * (sx1y * sx22 - sx12 * sx2y)
           + sx2 * (sx1y * sx12 - sx11 * sx2y) AS det0,
         n * (sx1y * sx22 - sx12 * sx2y)
           - sy * (sx1 * sx22 - sx12 * sx2)
           + sx2 * (sx1 * sx2y - sx1y * sx2) AS det1,
         n * (sx11 * sx2y - sx1y * sx12)
           - sx1 * (sx1 * sx2y - sx1y * sx2)
           + sy * (sx1 * sx12 - sx11 * sx2) AS det2
  FROM m)
SELECT event_type, n,
       ROUND(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS beta0,
       ROUND(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS beta_hour,
       ROUND(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS beta_dow
FROM d WHERE det <> 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov: each source's length distribution
# vs the rest of the corpus
# ---------------------------------------------------------------------------


def q_source_ks(sf_dir: str):
    """Distribution-drift audit: the exact two-sample KS statistic of
    n_chars for every source against the REST of the corpus.  One
    (n_chars, source) histogram fold (aggregate-scale: distinct lengths
    x sources); D = max_v |F_s(v) - F_rest(v)| is computed over the
    histogram with python-int cross-products |cum_s*(N-n_s) -
    cum_rest*n_s| — exact at any scale (the naive float-CDF subtraction
    loses bits exactly where D is decided), divided once at the end."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch["source"], "n_chars": batch["n_chars"]})
        return t.group_by(["source", "n_chars"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["source", "n_chars", "n"])

    hist = pre_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source", "n_chars"], {"n": ("n", "sum")},
    ).to_pandas()
    piv = hist.pivot_table(index="n_chars", columns="source", values="n",
                           aggfunc="sum", fill_value=0).sort_index()
    tot_by_src = {s: int(piv[s].sum()) for s in piv.columns}
    n_total = sum(tot_by_src.values())

    srcs, ns_out, ks_out = [], [], []
    for s in sorted(piv.columns):
        ns = tot_by_src[s]
        nr = n_total - ns
        if ns == 0 or nr == 0:
            continue
        cs = cr = 0
        best = 0
        col = piv[s].to_numpy(np.int64)
        tot = piv.sum(axis=1).to_numpy(np.int64)
        for a, t in zip(col.tolist(), tot.tolist()):  # aggregate-scale
            cs += a
            cr += t - a
            d = abs(cs * nr - cr * ns)
            if d > best:
                best = d
        srcs.append(s); ns_out.append(ns)
        ks_out.append(round_half_up(
            float(best) / (float(ns) * float(nr)), 6))
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_s": pa.array(ns_out, pa.int64()),
        "ks": pa.array(ks_out, pa.float64()),
    })


SQL_SOURCE_KS = """
WITH h AS (SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns FROM h GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM documents),
v AS (SELECT n_chars, CAST(SUM(n) AS BIGINT) AS n FROM h GROUP BY 1),
g AS (SELECT s.source, v.n_chars, v.n AS n_tot, COALESCE(h.n, 0) AS n_s
      FROM s CROSS JOIN v
      LEFT JOIN h ON h.source = s.source AND h.n_chars = v.n_chars),
c AS (SELECT source, n_chars,
             SUM(n_s) OVER (PARTITION BY source ORDER BY n_chars) AS cs,
             SUM(n_tot - n_s) OVER (PARTITION BY source ORDER BY n_chars)
               AS cr
      FROM g),
d AS (SELECT c.source,
             MAX(ABS(CAST(c.cs AS HUGEINT) * (tot.nt - s.ns)
                     - CAST(c.cr AS HUGEINT) * s.ns)) AS best
      FROM c JOIN s ON s.source = c.source CROSS JOIN tot
      GROUP BY 1)
SELECT d.source, s.ns AS n_s,
       ROUND(CAST(d.best AS DOUBLE)
             / (CAST(s.ns AS DOUBLE) * CAST(tot.nt - s.ns AS DOUBLE)), 6)
         AS ks
FROM d JOIN s ON s.source = d.source CROSS JOIN tot
WHERE s.ns > 0 AND tot.nt - s.ns > 0
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# Point-in-time join against a synthesized SCD2 dimension
# ---------------------------------------------------------------------------


def q_events_pit_join(sf_dir: str):
    """Temporal snapshot join (the SCD2 consumption side — q_user_scd2
    builds histories, this JOINS against one): a 4-version validity
    dimension is synthesized per user with md5-jittered boundaries
    (cut i lands inside day-quarter i, so versions are ordered WITHOUT
    a sort and both engines derive the identical dimension), and every
    event joins the version active at its timestamp.  The Ray path is
    the honest distributed shape: equi bucket_join on user_id with a
    4x fan-out, then the interval filter — never a per-row driver
    lookup.  Integer epoch-day compares; cents fold by version tier."""
    import hashlib

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    mn = ev.aggregate(Min("ts"))["min(ts)"]
    mx = ev.aggregate(Max("ts"))["max(ts)"]
    d0 = int(np.datetime64(mn, "D").astype(np.int64))
    d4 = int(np.datetime64(mx, "D").astype(np.int64)) + 1
    span = d4 - d0

    users = pre_aggregate(ev, ["user_id"], {"c": (None, "count")})

    def versions(batch: pa.Table) -> pa.Table:
        uids, vers, starts = [], [], []
        for u in batch["user_id"].to_pylist():
            for i in range(4):
                if i == 0:
                    s = d0
                else:
                    lo = i * span // 4
                    hi = (i + 1) * span // 4
                    h = int(hashlib.md5(
                        f"pit:{u}:{i}".encode()).hexdigest()[:13], 16)
                    s = d0 + lo + h % max(hi - lo, 1)
                uids.append(u); vers.append(i); starts.append(s)
        ends = [starts[i + 1] if (i + 1) % 4 else d4
                for i in range(len(starts))]
        return pa.table({
            "user_id": pa.array(uids, pa.int64()),
            "ver": pa.array(vers, pa.int64()),
            "s": pa.array(starts, pa.int64()),
            "e": pa.array(ends, pa.int64()),
        })

    dim = users.map_batches(versions, batch_format="pyarrow")

    def prep(batch: pa.Table) -> pa.Table:
        day = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({
            "user_id": batch["user_id"],
            "day": pa.array(day),
            "cents": pa.array(cents),
        })

    joined = bucket_join(
        ev.map_batches(prep, batch_format="pyarrow"), dim, "user_id",
        how="inner",
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df["day"] >= df["s"]) & (df["day"] < df["e"])]
        g = df.groupby("ver", sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")).reset_index()
        return pa.table({
            "tier": pa.array(["T" + str(int(v)) for v in g["ver"]],
                             pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "cents": pa.array(g["cents"].to_numpy(np.int64)),
        })

    return pre_aggregate(
        joined.map_batches(finish, batch_format="pyarrow"),
        ["tier"], {"n": ("n", "sum"), "cents": ("cents", "sum")},
    )


SQL_EVENTS_PIT_JOIN = """
WITH bounds AS (
  SELECT DATEDIFF('day', DATE '1970-01-01', CAST(MIN(ts) AS DATE)) AS d0,
         DATEDIFF('day', DATE '1970-01-01', CAST(MAX(ts) AS DATE)) + 1 AS d4
  FROM events),
u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT u.user_id, i.i AS ver,
             CASE WHEN i.i = 0 THEN b.d0
                  ELSE b.d0 + (i.i * (b.d4 - b.d0)) // 4
                       + (CAST('0x' || substr(md5('pit:'
                              || CAST(u.user_id AS VARCHAR) || ':'
                              || CAST(i.i AS VARCHAR)), 1, 13) AS BIGINT)
                          % GREATEST(((i.i + 1) * (b.d4 - b.d0)) // 4
                                     - (i.i * (b.d4 - b.d0)) // 4, 1))
             END AS s
      FROM u CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
      CROSS JOIN bounds b),
w AS (SELECT user_id, ver, s,
             COALESCE(LEAD(s) OVER (PARTITION BY user_id ORDER BY ver),
                      (SELECT d4 FROM bounds)) AS e
      FROM v)
SELECT 'T' || CAST(w.ver AS VARCHAR) AS tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(ev.value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events ev JOIN w ON w.user_id = ev.user_id
 AND DATEDIFF('day', DATE '1970-01-01', CAST(ev.ts AS DATE)) >= w.s
 AND DATEDIFF('day', DATE '1970-01-01', CAST(ev.ts AS DATE)) < w.e
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Jaro-Winkler blocked fuzzy pairs (ER candidate scoring, similarity form)
# ---------------------------------------------------------------------------


def q_part_name_jaro_pairs(sf_dir: str):
    """Blocked fuzzy self-join scored by Jaro-Winkler similarity — the
    similarity-form twin of q_part_name_fuzzy_pairs (edit distance):
    DISTINCT-name combiner fold, trailing-token blocking, in-block pair
    expansion filtered at round(jw, 4) >= 0.88.  The JW kernel
    (ops/fuzzy.jaro_winkler_batch) is bit-for-bit DuckDB
    jaro_winkler_similarity (calibration-tested), and BOTH engines
    threshold on the ROUNDED value so a one-ulp excursion can never
    flip pair membership."""
    from kgray.ops.fuzzy import jaro_winkler_batch

    names = pre_aggregate(
        _read(sf_dir, "part", ["p_name"]), ["p_name"],
        {"c": (None, "count")},
    )

    def add_block(batch: pa.Table) -> pa.Table:
        nm = batch["p_name"].to_pylist()
        return pa.table({
            "p_name": batch["p_name"],
            "blk": pa.array([s.rsplit(" ", 1)[-1] for s in nm],
                            pa.string()),
        })

    blocked = names.map_batches(add_block, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["blk", "p_name"]]
        m = d.merge(d, on="blk")
        m = m[m["p_name_x"] < m["p_name_y"]]
        jw = round_half_up(jaro_winkler_batch(
            m["p_name_x"].tolist(), m["p_name_y"].tolist()), 4)
        keep = jw >= 0.88
        return pd.DataFrame({
            "name_a": m["p_name_x"].to_numpy()[keep],
            "name_b": m["p_name_y"].to_numpy()[keep],
            "jw": jw[keep],
        })

    return grouped_map(blocked, "blk", pairs)


SQL_PART_NAME_JARO_PAIRS = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
FROM n a JOIN n b
  ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND a.p_name < b.p_name
WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.88
"""


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch chi-square
# ---------------------------------------------------------------------------


def q_orders_ab_srm(sf_dir: str):
    """Experiment-hygiene check: a deterministic md5 coin on o_orderkey
    assigns each order to arm 0/1, and the chi-square statistic against
    the designed 50/50 split flags sample-ratio mismatch.  Arm counts
    fold with a combiner; the statistic is one identical-operand float
    expression over two integers."""
    import hashlib

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["o_orderkey"].to_pylist()
        arm = np.fromiter(
            (int(hashlib.md5(f"ab:{i}".encode()).hexdigest()[:13], 16) % 2
             for i in ids), np.int64, len(ids))
        return pa.table({
            "arm": pa.array([0, 1], pa.int64()),
            "n": pa.array([int((arm == 0).sum()), int((arm == 1).sum())],
                          pa.int64()),
        })

    g = pre_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["arm"], {"n": ("n", "sum")},
    ).to_pandas().set_index("arm")["n"]
    n0 = int(g.get(0, 0))
    n1 = int(g.get(1, 0))
    n = n0 + n1
    e = n / 2.0
    chi2 = (n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e
    return pa.table({
        "n0": pa.array([n0], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "chi2": pa.array([round_half_up(chi2, 6)], pa.float64()),
    })


SQL_ORDERS_AB_SRM = """
WITH a AS (
  SELECT CAST('0x' || substr(md5('ab:' || CAST(o_orderkey AS VARCHAR)),
                             1, 13) AS BIGINT) % 2 AS arm
  FROM orders),
c AS (SELECT CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
             CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1
      FROM a)
SELECT n0, n1,
       ROUND((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
               / ((n0 + n1) / 2.0)
             + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0)
               / ((n0 + n1) / 2.0), 6) AS chi2
FROM c
"""
