"""Session-22 operator batch — window order-statistics / curation
ablation / process mining / interval joins / blocking eval family.

Exactness strategy (house rules): integer accumulations end-to-end
(cents, microseconds, counts); every float the driver hashes is a
final division whose operands are bit-identical integers in both
engines, rounded with ``round_half_up``.
"""

from ._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Rolling (ROWS-frame) median per user — windowed ORDER STATISTIC, the
# window class the ROWS-mean / RANGE-sum family doesn't cover
# ---------------------------------------------------------------------------


def q_events_rolling_median(sf_dir: str):
    """Per event: the lower median of the same user's trailing 7 values
    (ROWS 6 PRECEDING), on integer cents so the order statistic is
    bit-exact in any engine.  DuckDB's windowed ``quantile_disc(0.5)``
    picks element ``ceil(n/2)-1 == (n-1)//2`` of the sorted frame —
    reproduced here by sorting 7-wide sliding windows over each user's
    sentinel-padded cents (int64.max pads sort PAST every real value,
    so index ``(n_eff-1)//2`` always lands on a real element).  One
    user cogroup; per-user work is two numpy kernels, no row loop."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    W = 7
    SENTINEL = np.iinfo(np.int64).max

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        c = round_half_up(df["value"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64)
        eid = df["event_id"].to_numpy()
        outs = []
        for _, idx in df.groupby("user_id", sort=False).indices.items():
            a = np.concatenate([np.full(W - 1, SENTINEL, np.int64), c[idx]])
            S = np.sort(np.lib.stride_tricks.sliding_window_view(a, W),
                        axis=1)
            n_eff = np.minimum(np.arange(len(idx)) + 1, W)
            med = S[np.arange(len(idx)), (n_eff - 1) // 2]
            outs.append(pd.DataFrame({"event_id": eid[idx],
                                      "roll_med_c": med}))
        return pd.concat(outs, ignore_index=True)

    return grouped_map(ev, "user_id", win)


SQL_EVENTS_ROLLING_MEDIAN = """
SELECT event_id,
       CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS roll_med_c
FROM events
"""


# ---------------------------------------------------------------------------
# Leave-one-source-out ablation sweep (curation: what does dropping a
# source do to the corpus profile, computed by sum-minus-group — one
# fold, NO per-ablation rescan)
# ---------------------------------------------------------------------------


def q_source_ablation(sf_dir: str):
    """For every source: the corpus document count and mean length the
    corpus WOULD have without that source.  One per-source combiner
    fold; each ablated aggregate is pure arithmetic on the totals
    ((C - c) / (N - n)) — the sweep costs one scan regardless of how
    many ablations it answers, where a naive per-ablation rescan is
    |sources| x the corpus.  Divisions have identical integer operands
    in both engines."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    per = pre_aggregate(
        docs, ["source"],
        {"n": (None, "count"), "c": ("n_chars", "sum")},
    ).to_pandas()  # source-vocabulary scale
    per = per.sort_values("source", ignore_index=True)
    n = per["n"].to_numpy(np.int64)
    c = per["c"].to_numpy(np.int64)
    N, C = int(n.sum()), int(c.sum())
    return pa.table({
        "source": pa.array(per["source"], pa.string()),
        "n_docs_excl": pa.array(N - n),
        "mean_chars_excl": pa.array(
            round_half_up((C - c) / (N - n).astype(np.float64), 6)),
        "doc_share": pa.array(round_half_up(n / float(N), 6)),
    })


SQL_SOURCE_ABLATION = """
WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(n_chars) AS BIGINT) AS c
           FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS N, CAST(SUM(c) AS BIGINT) AS C
      FROM s)
SELECT source, CAST(t.N - s.n AS BIGINT) AS n_docs_excl,
       ROUND(CAST(t.C - s.c AS DOUBLE) / (t.N - s.n), 6)
         AS mean_chars_excl,
       ROUND(CAST(s.n AS DOUBLE) / t.N, 6) AS doc_share
FROM s, t ORDER BY source
"""


# ---------------------------------------------------------------------------
# Eventually-follows matrix (process mining): for each ordered pair of
# event types, in how many users does SOME a-event precede SOME b-event
# ---------------------------------------------------------------------------


def q_events_eventually_follows(sf_dir: str):
    """Process-mining eventually-follows relation over user event logs:
    EF(a,b) counts users where an ``a`` occurs strictly before a ``b``
    — equivalently ``min_us(a) < max_us(b)`` on the per-(user,type)
    first/last microsecond aggregate, so the corpus pass is ONE
    combiner fold to |users| x |types| rows and the quadratic part is a
    vectorized self-merge inside a user cogroup (<= |types|^2 rows per
    user).  The a == b diagonal means "type recurs".  Integer
    microseconds; outputs are counts only."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "t": batch["event_type"],
            "us": pc.cast(batch["ts"], pa.int64()),
        })

    fl = pre_aggregate(
        ev.map_batches(to_us, batch_format="pyarrow"),
        ["user_id", "t"], {"f": ("us", "min"), "l": ("us", "max")},
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
        m = m[m["f_a"] < m["l_b"]]
        g = m.groupby(["t_a", "t_b"], sort=False).size()
        out = g.reset_index(name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out.rename(columns={"t_a": "a", "t_b": "b"})

    ef = grouped_map(fl, "user_id", pairs)
    return pre_aggregate(ef, ["a", "b"], {"n_users": ("n_users", "sum")})


SQL_EVENTS_EVENTUALLY_FOLLOWS = """
WITH m AS (SELECT user_id, event_type AS t, epoch_us(MIN(ts)) AS f,
                  epoch_us(MAX(ts)) AS l
           FROM events GROUP BY 1, 2)
SELECT a.t AS a, b.t AS b, CAST(COUNT(*) AS BIGINT) AS n_users
FROM m a JOIN m b ON a.user_id = b.user_id AND a.f < b.l
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Keyed interval-OVERLAP join: click sessions x purchase sessions
# ---------------------------------------------------------------------------

_SESS_GAP_US = 86_400_000_000  # 1-day gap: sessions long enough to overlap


def _session_intervals(sf_dir: str, gap_us: int = _SESS_GAP_US):
    """Per (user, type in {click, purchase}): gap-based session
    intervals [first us, last us] with a per-group session index."""
    ev = _read(sf_dir, "events",
               ["user_id", "event_type", "ts", "event_id"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'")

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        df["us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        g = df.groupby(["user_id", "event_type"], sort=False)
        prev = g["us"].shift()
        df["sid"] = (prev.isna() | (df["us"] - prev > gap_us)) \
            .groupby([df["user_id"], df["event_type"]], sort=False).cumsum() \
            .astype(np.int64)
        iv = df.groupby(["user_id", "event_type", "sid"], sort=False) \
            .agg(s=("us", "min"), e=("us", "max")).reset_index()
        return iv

    return grouped_map(ev, "user_id", sess)


def q_events_session_join(sf_dir: str):
    """Big-big keyed interval-overlap join (``joins.interval_join``):
    per user, every (click-session, purchase-session) pair whose 1-day
    gap session intervals intersect, aggregated to per-user pair count
    and total overlap microseconds.  The generic join cogroups the two
    interval sets ONCE on user and resolves each right interval to a
    contiguous candidate range with two binary searches (running-max
    end trick — exact for arbitrary intervals, output-linear for the
    disjoint-session case here).  Integer microseconds end-to-end."""
    from kgray.ops.joins import interval_join

    iv = _session_intervals(sf_dir).materialize()
    clicks = iv.filter(expr="event_type == 'click'") \
        .select_columns(["user_id", "sid", "s", "e"])
    buys = iv.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "sid", "s", "e"])
    pairs = interval_join(clicks, buys, "user_id",
                          l_id="sid", r_id="sid")
    return pre_aggregate(
        pairs, ["user_id"],
        {"n_pairs": (None, "count"), "ov_us_total": ("ov", "sum")},
    )


SQL_EVENTS_SESSION_JOIN = """
WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
           WHERE event_type IN ('click', 'purchase')),
g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 86400000000
                     THEN 1 ELSE 0 END AS ns
      FROM e WINDOW w AS (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id)),
s AS (SELECT user_id, event_type,
             SUM(ns) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS sid, ts FROM g),
iv AS (SELECT user_id, event_type, sid, epoch_us(MIN(ts)) AS s,
              epoch_us(MAX(ts)) AS e
       FROM s GROUP BY 1, 2, 3)
SELECT c.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(LEAST(c.e, p.e) - GREATEST(c.s, p.s)) AS BIGINT)
         AS ov_us_total
FROM iv c JOIN iv p
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND p.event_type = 'purchase' AND c.s <= p.e AND p.s <= c.e
GROUP BY 1 ORDER BY 1
"""
