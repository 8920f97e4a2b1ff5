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


# ---------------------------------------------------------------------------
# Entity-resolution blocking-quality eval: pair completeness + reduction
# ratio of sorted-neighborhood blocking vs the exact near-dup golden
# ---------------------------------------------------------------------------


def q_blocking_eval(sf_dir: str):
    """How good is sorted-neighborhood blocking (window 2 over the
    global (text, doc_id) order) as a near-dup CANDIDATE GENERATOR?
    Reports the two standard ER blocking metrics against the exact
    3-gram-Jaccard >= 0.8 golden pairs (the ngram_dup_pairs
    computation): pair_completeness = |cand n golden| / |golden| and
    reduction_ratio = 1 - |cand| / C(n,2).

    Dataflow: the SN pairs use the part_sorted_neighbor_pairs
    decomposition with the 8-char text PREFIX as the block key —
    prefix groups are contiguous in the global sort order (truncation
    is monotone under lexicographic order), the prefix histogram is
    vocabulary-scale driver state (911 prefixes for 5000 docs at
    sf0.1), in-prefix window pairs come from one prefix cogroup, and
    only each prefix's head-2/tail-2 rows close the cross-prefix
    boundary.  Golden pairs reuse dedup.ngram_jaccard_pairs; the
    intersection is a semi_join on the normalized (u,v) pair key.
    Only scalar counts and two integer-operand ratios reach the
    driver."""
    from kgray.ops.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_prefix(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "p": pc.utf8_slice_codeunits(batch["text"], 0, 8),
        })

    dp = docs.map_batches(with_prefix, batch_format="pyarrow") \
        .materialize()
    hist = (
        pre_aggregate(dp.select_columns(["p"]), ["p"],
                      {"c": (None, "count")})
        .to_pandas().sort_values("p")
    )
    counts = hist["c"].to_numpy(np.int64)
    offsets = dict(zip(
        hist["p"].tolist(),
        np.concatenate([[0], np.cumsum(counts)[:-1]]).tolist(),
    ))

    def per_prefix(df: pd.DataFrame) -> pd.DataFrame:
        # emits in-prefix window PAIRS (corpus-scale: they STAY in the
        # dataset — only the <= 4-per-prefix boundary rows return to
        # the driver) already normalized to pk = "min|max"
        out = []
        for p, grp in df.groupby("p", sort=False):
            g = grp.sort_values(["text", "doc_id"], kind="mergesort")
            keys = g["doc_id"].to_numpy(np.int64)
            n = len(g)
            for w in (1, 2):
                if n > w:
                    u = np.minimum(keys[:-w], keys[w:])
                    v = np.maximum(keys[:-w], keys[w:])
                    out.append(pd.DataFrame(
                        {"pk": [f"{a}|{b_}" for a, b_ in zip(u, v)],
                         "is_pair": 1, "rank": -1, "p": "",
                         "k": 0}))
            sel = np.zeros(n, bool)
            sel[:2] = True
            sel[max(n - 2, 0):] = True
            ranks = offsets[p] + np.flatnonzero(sel) + 1
            out.append(pd.DataFrame(
                {"pk": "", "is_pair": 0, "rank": ranks, "p": p,
                 "k": keys[sel]}))
        return pd.concat(out) if out else pd.DataFrame(
            {"pk": pd.array([], dtype="str"),
             "is_pair": pd.array([], dtype="int64"),
             "rank": pd.array([], dtype="int64"),
             "p": pd.array([], dtype="str"),
             "k": pd.array([], dtype="int64")})

    rows = grouped_map(dp, "p", per_prefix).materialize()
    b = rows.filter(expr="is_pair == 0") \
        .to_pandas().sort_values("rank")  # <= 4 rows per prefix
    br = b["rank"].to_numpy(np.int64)
    bk = b["k"].to_numpy(np.int64)
    bp = b["p"].to_numpy()
    cross_pk = []
    for w in (1, 2):
        if len(b) > w:
            close = (br[w:] - br[:-w] <= 2) & (bp[w:] != bp[:-w])
            u = np.minimum(bk[:-w][close], bk[w:][close])
            v = np.maximum(bk[:-w][close], bk[w:][close])
            cross_pk.extend(f"{a}|{b_}" for a, b_ in zip(u, v))
    cand = rows.filter(expr="is_pair == 1").select_columns(["pk"]) \
        .union(rd.from_arrow(pa.table(
            {"pk": pa.array(cross_pk, pa.string())})))

    gold = ngram_jaccard_pairs(docs, tau=0.8)

    def gold_keys(batch: pa.Table) -> pa.Table:
        uu = batch["u"].to_numpy(zero_copy_only=False)
        vv = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array(
            [f"{a}|{b_}" for a, b_ in zip(uu, vv)], pa.string())})

    gk = gold.map_batches(gold_keys, batch_format="pyarrow").materialize()
    cand = cand.materialize()
    n_hit = semi_join(gk, cand, on="pk").count()
    n_golden = gk.count()
    n_cand = cand.count()
    n_docs = dp.count()
    comb = n_docs * (n_docs - 1) // 2
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_golden": pa.array([n_golden], pa.int64()),
        "n_cand": pa.array([n_cand], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "pair_completeness": pa.array(
            [float(round_half_up(n_hit / n_golden, 6))
             if n_golden else None], pa.float64()),
        "reduction_ratio": pa.array(
            [float(round_half_up(1.0 - n_cand / comb, 6))]),
    })


SQL_BLOCKING_EVAL = """
WITH r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY text, doc_id) AS rn
           FROM documents),
cand AS (SELECT LEAST(a.doc_id, b.doc_id) AS u,
                GREATEST(a.doc_id, b.doc_id) AS v
         FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM documents WHERE len(string_split(text,' ')) >= 3),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
cd AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
       FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
gold AS (SELECT cd.u, cd.v
         FROM cd JOIN sh a ON cd.u = a.doc_id JOIN sh b ON cd.v = b.doc_id
         WHERE CAST(cd.common AS DOUBLE) /
               (len(a.shingles) + len(b.shingles) - cd.common) >= 0.8),
m AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
             CAST((SELECT COUNT(*) FROM gold) AS BIGINT) AS n_golden,
             CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand,
             CAST((SELECT COUNT(*) FROM gold g
                   WHERE EXISTS (SELECT 1 FROM cand c
                                 WHERE c.u = g.u AND c.v = g.v))
                  AS BIGINT) AS n_hit)
SELECT n_docs, n_golden, n_cand, n_hit,
       CASE WHEN n_golden = 0 THEN NULL
            ELSE ROUND(CAST(n_hit AS DOUBLE) / n_golden, 6)
       END AS pair_completeness,
       ROUND(1 - CAST(n_cand AS DOUBLE) / (n_docs * (n_docs - 1) // 2), 6)
         AS reduction_ratio
FROM m
"""


# ---------------------------------------------------------------------------
# Split-conformal calibration audit (finite-sample coverage guarantee)
# ---------------------------------------------------------------------------


def q_events_conformal(sf_dir: str):
    """Split-conformal prediction audit: events split into CALIBRATION
    / TEST halves by md5(event_id); the per-type point predictor is
    the calibration mean, the nonconformity score is the SCALED
    absolute residual |n_t * cents - S_t| (multiplying the residual by
    the calibration count n_t keeps every score an exact int64 — the
    integral-units move — valid while n_t * max_cents < 2^63), the
    per-type threshold is the k-th smallest calibration score with the
    finite-sample conformal rank k = min(n, ceil(0.9 * (n + 1)))
    computed as the INTEGER (9 * (n + 1) + 9) // 10, and coverage is
    the share of test rows at or under the threshold (>= 90% in
    expectation by exchangeability).  One stat fold + broadcast, one
    type cogroup for the selection + coverage; scale path for huge
    per-type score sets is the exact distributed rank-selection used
    by orders_gini / value deciles."""
    import ray

    from kgray.ops.sample import _md5_hex

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        cal = np.array(
            [h < "8" for h in _md5_hex(batch["event_id"].to_pylist())],
            np.bool_)
        return pa.table({"t": batch["event_type"], "c": pa.array(c),
                         "cal": pa.array(cal)})

    scored_in = ev.map_batches(prep, batch_format="pyarrow").materialize()
    stats = pre_aggregate(
        scored_in.filter(expr="cal == True").select_columns(["t", "c"]),
        ["t"], {"n": (None, "count"), "s": ("c", "sum")},
    ).to_pandas()  # type-vocabulary scale
    st_ref = ray.put({r.t: (int(r.n), int(r.s))
                      for r in stats.itertuples()})

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        ts = batch["t"].to_pylist()
        n = np.array([st[t][0] for t in ts], np.int64)
        s = np.array([st[t][1] for t in ts], np.int64)
        c = batch["c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "t": batch["t"], "cal": batch["cal"],
            "score": pa.array(np.abs(n * c - s)),
        })

    sc = scored_in.map_batches(score, batch_format="pyarrow")

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, grp in df.groupby("t", sort=False):
            cal = grp.loc[grp["cal"], "score"].to_numpy(np.int64)
            tst = grp.loc[~grp["cal"], "score"].to_numpy(np.int64)
            n = len(cal)
            k = min(n, (9 * (n + 1) + 9) // 10)
            q = np.partition(cal, k - 1)[k - 1]
            out.append({
                "event_type": t, "n_calib": n, "n_test": len(tst),
                "q_scaled": int(q),
                "coverage": float(round_half_up(
                    (tst <= q).sum() / len(tst), 6)),
            })
        return pd.DataFrame(out)

    return grouped_map(sc, "t", per_type)


SQL_EVENTS_CONFORMAL = """
WITH e AS (SELECT event_type AS t,
                  CAST(round(value * 100) AS BIGINT) AS c,
                  md5(CAST(event_id AS VARCHAR)) < '8' AS cal
           FROM events),
st AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(c) AS BIGINT) AS s
       FROM e WHERE cal GROUP BY 1),
sc AS (SELECT e.t, e.cal, abs(st.n * e.c - st.s) AS score
       FROM e JOIN st ON e.t = st.t),
q AS (SELECT t, score AS qv FROM (
        SELECT t, score,
               ROW_NUMBER() OVER (PARTITION BY t ORDER BY score) AS rn,
               COUNT(*) OVER (PARTITION BY t) AS n
        FROM sc WHERE cal)
      WHERE rn = LEAST(n, (9 * (n + 1) + 9) // 10))
SELECT sc.t AS event_type, CAST(st.n AS BIGINT) AS n_calib,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(q.qv AS BIGINT) AS q_scaled,
       ROUND(CAST(SUM(CASE WHEN sc.score <= q.qv THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS coverage
FROM sc JOIN st ON sc.t = st.t JOIN q ON sc.t = q.t
WHERE NOT sc.cal
GROUP BY 1, 2, 4 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Exact Shapley data valuation of sources (vocabulary-coverage game)
# ---------------------------------------------------------------------------


def q_source_shapley(sf_dir: str):
    """EXACT Shapley value of each source for the vocabulary-coverage
    game v(S) = |distinct words appearing in some source of S| — the
    data-valuation question ("which source contributes the marginal
    vocabulary?") answered with the real Shapley axioms, not a
    heuristic.  Players are the top-5 sources by (doc count DESC,
    name) plus one '(other)' bucket, so the subset lattice is <= 2^6.

    The exponential part never touches the corpus: ONE vocab-scale
    fold maps every word to its player BITMASK (distinct (word,
    player) per batch, bit-sum inside a word cogroup), a <=64-row
    count-per-mask table comes back to the driver, and v(S) for all
    subsets plus the factorial-weighted Shapley sums are integer
    arithmetic on those 64 counts.  shap_num is the P!-scaled EXACT
    integer value (sum over players = P! * |total vocab|, the
    efficiency axiom, pinned by a test); shap_value divides identical
    integers in both engines."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    per_src = pre_aggregate(
        docs.select_columns(["source"]), ["source"],
        {"n": (None, "count")},
    ).to_pandas().sort_values(["n", "source"], ascending=[False, True],
                              kind="mergesort", ignore_index=True)
    n_src = len(per_src)
    top = per_src["source"].head(5).tolist()
    has_other = n_src > 5
    P = min(n_src, 5) + (1 if has_other else 0)
    idx_of = {s: i for i, s in enumerate(top)}

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        bit = np.repeat(
            np.array([1 << idx_of.get(s, 5) for s in src], np.int64),
            lens)
        df = pd.DataFrame({"w": pc.list_flatten(toks).to_pylist(),
                           "bit": bit})
        df = df.drop_duplicates()  # per-batch combiner
        return pa.Table.from_pandas(df, preserve_index=False)

    ew = docs.map_batches(explode, batch_format="pyarrow")

    def word_masks(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["w", "bit"])
        mask = d.groupby("w", sort=False)["bit"].sum()
        mc = mask.value_counts()
        return pd.DataFrame({"mask": mc.index.to_numpy(np.int64),
                             "n": mc.to_numpy(np.int64)})

    cnt = pre_aggregate(
        grouped_map(ew, "w", word_masks), ["mask"], {"n": ("n", "sum")},
    ).to_pandas()  # <= 2^P rows
    masks = cnt["mask"].to_numpy(np.int64)
    ns = cnt["n"].to_numpy(np.int64)
    v = np.array([int(ns[(masks & m) != 0].sum()) for m in range(1 << P)],
                 dtype=object)  # python ints: exact factorial sums
    fact = [math.factorial(k) for k in range(P + 1)]
    denom = fact[P]
    names = top[:min(n_src, 5)] + (["(other)"] if has_other else [])
    rows = []
    for i, name in enumerate(names):
        bit = 1 << i
        num = 0
        for m in range(1 << P):
            if m & bit:
                continue
            k = bin(m).count("1")
            num += fact[k] * fact[P - 1 - k] * (v[m | bit] - v[m])
        rows.append((name, num))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "shap_num": pa.array([r[1] for r in rows], pa.int64()),
        "shap_value": pa.array(
            [float(round_half_up(r[1] / denom, 6)) for r in rows],
            pa.float64()),
    })


SQL_SOURCE_SHAPLEY = """
WITH rk AS (SELECT source,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS r,
                   COUNT(*) OVER () AS n_src
            FROM documents GROUP BY source),
pl AS (SELECT source, CAST(CASE WHEN r <= 5 THEN r - 1 ELSE 5 END AS BIGINT)
              AS idx, n_src FROM rk),
dims AS (SELECT CAST(LEAST(MAX(n_src), 5)
                     + CASE WHEN MAX(n_src) > 5 THEN 1 ELSE 0 END
                     AS BIGINT) AS p FROM pl),
wm AS (SELECT w, CAST(SUM(DISTINCT (1 << idx)) AS BIGINT) AS mask FROM (
         SELECT unnest(string_split(d.text, ' ')) AS w, pl.idx
         FROM documents d JOIN pl ON d.source = pl.source)
       GROUP BY w),
cnt AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n FROM wm GROUP BY 1),
sub AS (SELECT CAST(t.range AS BIGINT) AS m FROM range(64) t, dims
        WHERE t.range < (1 << dims.p)),
v AS (SELECT sub.m, CAST(COALESCE(SUM(cnt.n), 0) AS BIGINT) AS val
      FROM sub LEFT JOIN cnt ON (cnt.mask & sub.m) != 0 GROUP BY 1),
f AS (SELECT CAST(k AS BIGINT) AS k, CAST(CASE k
         WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 6
         WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720 END AS BIGINT)
         AS fct
      FROM range(7) t(k)),
players AS (
  SELECT source, idx FROM pl WHERE idx < 5
  UNION ALL
  SELECT '(other)', 5 FROM dims WHERE p = 6 LIMIT 1000),
shap AS (SELECT p.source, p.idx,
                CAST(SUM(fk.fct * fpk.fct * (v1.val - v0.val)) AS BIGINT)
                  AS shap_num
         FROM (SELECT DISTINCT source, idx FROM players) p
         JOIN sub s ON (s.m & (1 << p.idx)) = 0
         JOIN v v0 ON v0.m = s.m
         JOIN v v1 ON v1.m = (s.m | (1 << p.idx))
         JOIN dims ON TRUE
         JOIN f fk ON fk.k = bit_count(s.m)
         JOIN f fpk ON fpk.k = dims.p - 1 - bit_count(s.m)
         GROUP BY 1, 2)
SELECT shap.source, shap.shap_num,
       ROUND(CAST(shap.shap_num AS DOUBLE) / f.fct, 6) AS shap_value
FROM shap JOIN dims ON TRUE JOIN f ON f.k = dims.p
ORDER BY shap.source
"""


# ---------------------------------------------------------------------------
# Difference-in-differences estimator (quasi-experimental causal read)
# ---------------------------------------------------------------------------


def q_events_did(sf_dir: str):
    """Difference-in-differences over a synthetic natural experiment:
    treatment = md5(user_id) < '8' (the deterministic split move),
    post-period = integer day > midpoint of the observed day range.
    Four cells of exact integer (n, sum-cents) fold through the
    combiner; each cell mean divides identical integers and the DiD
    estimate is the SAME 4-term expression tree in both engines —
    (m_t_post - m_t_pre) - (m_c_post - m_c_pre).  Day bounds come from
    a metadata-scale min/max pre-pass."""
    from kgray.ops.sample import _md5_hex

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def days(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"g": pa.array(np.zeros(len(batch), np.int8)),
                         "day": pa.array(us // 86_400_000_000)})

    dd = pre_aggregate(
        ev.map_batches(days, batch_format="pyarrow"), ["g"],
        {"lo": ("day", "min"), "hi": ("day", "max")},
    ).to_pandas()
    lo, hi = int(dd["lo"][0]), int(dd["hi"][0])
    split_day = lo + (hi - lo) // 2

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        treat = np.array(
            [h < "8" for h in _md5_hex(batch["user_id"].to_pylist())],
            np.bool_)
        return pa.table({
            "treat": pa.array(treat),
            "post": pa.array(us // 86_400_000_000 > split_day),
            "c": pa.array(c),
        })

    cm = pre_aggregate(
        ev.map_batches(cells, batch_format="pyarrow"),
        ["treat", "post"],
        {"n": (None, "count"), "s": ("c", "sum")},
    ).to_pandas().set_index(["treat", "post"])

    def m(t, p):
        r = cm.loc[(t, p)]
        return int(r["s"]) / int(r["n"]), int(r["n"])

    m00, n00 = m(False, False)
    m01, n01 = m(False, True)
    m10, n10 = m(True, False)
    m11, n11 = m(True, True)
    did = (m11 - m10) - (m01 - m00)
    return pa.table({
        "n_ctl_pre": pa.array([n00], pa.int64()),
        "n_ctl_post": pa.array([n01], pa.int64()),
        "n_trt_pre": pa.array([n10], pa.int64()),
        "n_trt_post": pa.array([n11], pa.int64()),
        "m_ctl_pre": pa.array([float(round_half_up(m00, 6))]),
        "m_ctl_post": pa.array([float(round_half_up(m01, 6))]),
        "m_trt_pre": pa.array([float(round_half_up(m10, 6))]),
        "m_trt_post": pa.array([float(round_half_up(m11, 6))]),
        "did_cents": pa.array([float(round_half_up(did, 6))]),
    })


SQL_EVENTS_DID = """
WITH e AS (SELECT md5(CAST(user_id AS VARCHAR)) < '8' AS treat,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
b AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS sd FROM e),
cell AS (SELECT treat, e.day > b.sd AS post,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(c) AS BIGINT) AS s
         FROM e, b GROUP BY 1, 2),
p AS (SELECT
  MAX(CASE WHEN NOT treat AND NOT post THEN n END) AS n00,
  MAX(CASE WHEN NOT treat AND post THEN n END) AS n01,
  MAX(CASE WHEN treat AND NOT post THEN n END) AS n10,
  MAX(CASE WHEN treat AND post THEN n END) AS n11,
  CAST(MAX(CASE WHEN NOT treat AND NOT post THEN s END) AS DOUBLE)
    / MAX(CASE WHEN NOT treat AND NOT post THEN n END) AS m00,
  CAST(MAX(CASE WHEN NOT treat AND post THEN s END) AS DOUBLE)
    / MAX(CASE WHEN NOT treat AND post THEN n END) AS m01,
  CAST(MAX(CASE WHEN treat AND NOT post THEN s END) AS DOUBLE)
    / MAX(CASE WHEN treat AND NOT post THEN n END) AS m10,
  CAST(MAX(CASE WHEN treat AND post THEN s END) AS DOUBLE)
    / MAX(CASE WHEN treat AND post THEN n END) AS m11
  FROM cell)
SELECT n00 AS n_ctl_pre, n01 AS n_ctl_post, n10 AS n_trt_pre,
       n11 AS n_trt_post,
       ROUND(m00, 6) AS m_ctl_pre, ROUND(m01, 6) AS m_ctl_post,
       ROUND(m10, 6) AS m_trt_pre, ROUND(m11, 6) AS m_trt_post,
       ROUND((m11 - m10) - (m01 - m00), 6) AS did_cents
FROM p
"""


# ---------------------------------------------------------------------------
# Temperature-scaled language mixture planning (multilingual sampling)
# ---------------------------------------------------------------------------


def q_lang_temperature_mixture(sf_dir: str):
    """Temperature-scaled (alpha = 0.7) sampling mixture over languages
    — the multilingual-pretraining rebalancing move: p_temp(l) ~
    p(l)^0.7 flattens head languages and boosts the tail; also the
    expected epochs each language's data sees under a 10M-token
    budget.  One per-lang token fold; the <= 8-language normalizer
    Z = sum(p^0.7) is written as an EXPLICIT left-fold in rank order
    in BOTH engines (the NDCG trick — cross-group float sums have no
    order guarantee in SQL), and pow comes from C libm on both sides
    (the tf-idf ln lesson).  Supports up to 8 languages by
    construction; more would extend the pivot."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch["lang"],
            "k": pc.list_value_length(pc.split_pattern(batch["text"], " ")),
        })

    per = pre_aggregate(
        docs.map_batches(toks, batch_format="pyarrow"),
        ["lang"], {"n": ("k", "sum")},
    ).to_pandas().sort_values("lang", ignore_index=True)
    assert len(per) <= 8, "rank pivot supports <= 8 languages"
    n = per["n"].to_numpy(np.int64)
    N = int(n.sum())
    w = [math.pow(int(v) / N, 0.7) for v in n]
    z = 0.0
    for v in w:  # explicit left-fold, rank order == lang order
        z = z + v
    budget = 10_000_000
    return pa.table({
        "lang": pa.array(per["lang"], pa.string()),
        "n_tokens": pa.array(n),
        "p": pa.array([float(round_half_up(int(v) / N, 6)) for v in n]),
        "p_temp": pa.array(
            [float(round_half_up(wi / z, 6)) for wi in w]),
        "epochs_at_10m": pa.array(
            [float(round_half_up(wi / z * budget / int(v), 6))
             for wi, v in zip(w, n)]),
    })


SQL_LANG_TEMPERATURE_MIXTURE = """
WITH l AS (SELECT lang,
                  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n
           FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM l),
r AS (SELECT lang, n, ROW_NUMBER() OVER (ORDER BY lang) AS rk FROM l),
w AS (SELECT rk, lang, n, pow(CAST(n AS DOUBLE) / tot.tn, 0.7) AS wk
      FROM r, tot),
z AS (SELECT ((((((
        COALESCE(MAX(CASE WHEN rk = 1 THEN wk END), 0)
        + COALESCE(MAX(CASE WHEN rk = 2 THEN wk END), 0))
        + COALESCE(MAX(CASE WHEN rk = 3 THEN wk END), 0))
        + COALESCE(MAX(CASE WHEN rk = 4 THEN wk END), 0))
        + COALESCE(MAX(CASE WHEN rk = 5 THEN wk END), 0))
        + COALESCE(MAX(CASE WHEN rk = 6 THEN wk END), 0))
        + COALESCE(MAX(CASE WHEN rk = 7 THEN wk END), 0))
        + COALESCE(MAX(CASE WHEN rk = 8 THEN wk END), 0) AS z
      FROM w)
SELECT w.lang, w.n AS n_tokens,
       ROUND(CAST(w.n AS DOUBLE) / tot.tn, 6) AS p,
       ROUND(w.wk / z.z, 6) AS p_temp,
       ROUND(w.wk / z.z * 10000000 / w.n, 6) AS epochs_at_10m
FROM w, z, tot ORDER BY w.lang
"""


# ---------------------------------------------------------------------------
# Landmark distance sketch (multi-source BFS labeling)
# ---------------------------------------------------------------------------

_LANDMARKS = (1, 2, 3, 4)


def q_supplier_landmark_dists(sf_dir: str):
    """Landmark distance labeling over the supplier-part bipartite
    graph: hop distances from 4 landmark suppliers to every node
    within 3 hops (graph.landmark_distances) — the pivot-labeling
    primitive that answers approximate d(x, y) queries via
    min_l d(x,l) + d(l,y) without all-pairs work.  The oracle unrolls
    the bfs_hops min-relax recurrence with a landmark column; equality
    is the per-landmark BFS level invariant."""
    from kgray.ops.graph import landmark_distances
    from kgray.queries.analytics4 import _part_supplier_edges

    return landmark_distances(_part_supplier_edges(sf_dir),
                              landmarks=_LANDMARKS, max_hops=3)


def _landmark_sql(max_hops: int = 3) -> str:
    from kgray.queries.analytics4 import _GRAPH_EDGE_SQL

    seeds = ", ".join(str(x) for x in _LANDMARKS)
    prev = "d0"
    ctes = [
        "d0 AS (SELECT DISTINCT src AS node, src AS lm,\n"
        "              CAST(0 AS BIGINT) AS dist\n"
        f"       FROM sym WHERE src IN ({seeds}))"
    ]
    for i in range(1, max_hops + 1):
        ctes.append(
            f"d{i} AS (SELECT node, lm, CAST(MIN(dist) AS BIGINT) AS dist"
            " FROM (\n"
            f"         SELECT node, lm, dist FROM {prev}\n"
            "         UNION ALL\n"
            "         SELECT s.dst AS node, d.lm, d.dist + 1 AS dist\n"
            f"         FROM sym s JOIN {prev} d ON s.src = d.node\n"
            "       ) GROUP BY 1, 2)"
        )
        prev = f"d{i}"
    return (
        "WITH " + _GRAPH_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + f"\nSELECT node, lm, dist FROM {prev}"
    )


SQL_SUPPLIER_LANDMARK_DISTS = _landmark_sql(max_hops=3)


# ---------------------------------------------------------------------------
# Exact Wasserstein-1 (earth mover) distance between two distributions
# ---------------------------------------------------------------------------


def q_events_wasserstein(sf_dir: str):
    """EXACT Wasserstein-1 distance between the click and purchase
    value distributions — the transport-metric complement of the KS
    (sup-norm) and KL/JS (density) drift audits already in the
    catalog.  W1 = integral |F_a - F_b| becomes the INTEGER
    w1_scaled = sum over consecutive distinct cents values of
    |cumA * NB - cumB * NA| * gap (cross-multiplied ECDFs — no float
    until the single final division by NA*NB).  One distinct-value
    histogram fold (value-vocabulary scale, <= cents-range rows) comes
    to the driver sorted; valid while NA * NB * value_range < 2^63."""
    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'")

    def vals(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"v": c, "a": (t == "click").astype(np.int64),
                           "b": (t == "purchase").astype(np.int64)})
        g = df.groupby("v", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = pre_aggregate(
        ev.map_batches(vals, batch_format="pyarrow"),
        ["v"], {"a": ("a", "sum"), "b": ("b", "sum")},
    ).to_pandas().sort_values("v", ignore_index=True)  # value-vocab scale
    v = g["v"].to_numpy(np.int64)
    ca = np.cumsum(g["a"].to_numpy(np.int64))
    cb = np.cumsum(g["b"].to_numpy(np.int64))
    na, nb = int(ca[-1]), int(cb[-1])
    w1s = int(np.sum(np.abs(ca[:-1] * nb - cb[:-1] * na)
                     * (v[1:] - v[:-1])))
    return pa.table({
        "n_click": pa.array([na], pa.int64()),
        "n_purchase": pa.array([nb], pa.int64()),
        "w1_scaled": pa.array([w1s], pa.int64()),
        "w1_cents": pa.array(
            [float(round_half_up(w1s / (na * nb), 6))], pa.float64()),
    })


SQL_EVENTS_WASSERSTEIN = """
WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type AS t
           FROM events WHERE event_type IN ('click', 'purchase')),
g AS (SELECT v,
             CAST(SUM(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM e GROUP BY 1),
c AS (SELECT v, SUM(a) OVER (ORDER BY v) AS ca,
             SUM(b) OVER (ORDER BY v) AS cb,
             LEAD(v) OVER (ORDER BY v) AS nv
      FROM g),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM g),
w AS (SELECT CAST(SUM(abs(ca * t.nb - cb * t.na) * (nv - v)) AS BIGINT)
        AS w1s
      FROM c, t WHERE nv IS NOT NULL)
SELECT t.na AS n_click, t.nb AS n_purchase, w.w1s AS w1_scaled,
       ROUND(CAST(w.w1s AS DOUBLE) / (t.na * t.nb), 6) AS w1_cents
FROM w, t
"""


# ---------------------------------------------------------------------------
# Isotonic regression (monotone calibration fit, closed-form minimax)
# ---------------------------------------------------------------------------


def q_events_isotonic(sf_dir: str):
    """Isotonic (monotone non-decreasing) regression of the error rate
    over 500-cent value bands — the calibration-curve smoother.
    Instead of the sequential pool-adjacent-violators loop (iteration
    count is data-dependent, so a fixed unroll can't be faithful), the
    fit uses the exact MINIMAX closed form fit_i = max_{j<=i}
    min_{k>=i} mean(y[j..k]): every candidate mean divides identical
    integer (pos, cnt) prefix sums in both engines, and min/max over
    identical double sets are bit-stable.  One band fold (<= 21 rows);
    the O(B^3) lattice is driver/SQL arithmetic on that fold."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def bands(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"band": c // 500,
                           "pos": (t == "error").astype(np.int64)})
        g = df.groupby("band", sort=False).agg(
            n=("pos", "size"), p=("pos", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    g = pre_aggregate(
        ev.map_batches(bands, batch_format="pyarrow"),
        ["band"], {"n": ("n", "sum"), "p": ("p", "sum")},
    ).to_pandas().sort_values("band", ignore_index=True)  # <= 21 rows
    n = g["n"].to_numpy(np.int64)
    p = g["p"].to_numpy(np.int64)
    B = len(g)
    cp = np.concatenate([[0], np.cumsum(p)]).astype(np.float64)
    cn = np.concatenate([[0], np.cumsum(n)]).astype(np.float64)
    # av[j, k] = mean(y[j..k]); IEEE division is bit-exact, min/max are
    # order-exact, so the vectorized minimax equals the SQL lattice
    with np.errstate(divide="ignore", invalid="ignore"):
        # the k < j lower triangle divides by <= 0 and is overwritten
        av = (cp[None, 1:] - cp[:B, None]) \
            / (cn[None, 1:] - cn[:B, None])
    av[np.tril_indices(B, -1)] = math.inf  # k < j never participates
    mn = np.minimum.accumulate(av[:, ::-1], axis=1)[:, ::-1]
    fit = np.diagonal(np.maximum.accumulate(mn, axis=0)).tolist()
    return pa.table({
        "band": pa.array(g["band"].to_numpy(np.int64)),
        "n": pa.array(n), "p": pa.array(p),
        "rate_raw": pa.array(
            [float(round_half_up(int(pi) / int(ni), 6))
             for pi, ni in zip(p, n)]),
        "rate_iso": pa.array(
            [float(round_half_up(f, 6)) for f in fit]),
    })


SQL_EVENTS_ISOTONIC = """
WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) // 500 AS band,
                  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
           FROM events),
b AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS p
      FROM e GROUP BY 1),
r AS (SELECT band, n, p,
             ROW_NUMBER() OVER (ORDER BY band) AS i,
             SUM(p) OVER (ORDER BY band) AS cp,
             SUM(n) OVER (ORDER BY band) AS cn
      FROM b),
tri AS (SELECT j.i AS ji, i.i AS ii,
               CAST(k.cp - j.cp + j.p AS DOUBLE)
                 / (k.cn - j.cn + j.n) AS av
        FROM r j, r i, r k WHERE j.i <= i.i AND k.i >= i.i),
mn AS (SELECT ji, ii, MIN(av) AS mv FROM tri GROUP BY 1, 2),
fit AS (SELECT ii, MAX(mv) AS fv FROM mn GROUP BY 1)
SELECT r.band, r.n, r.p,
       ROUND(CAST(r.p AS DOUBLE) / r.n, 6) AS rate_raw,
       ROUND(f.fv, 6) AS rate_iso
FROM r JOIN fit f ON r.i = f.ii ORDER BY r.band
"""


# ---------------------------------------------------------------------------
# Instance-based schema matching (data integration): which customer
# column corresponds to which supplier column, by value overlap
# ---------------------------------------------------------------------------

_C_COLS = [("c_custkey", "int"), ("c_name", "str"),
           ("c_nationkey", "int"), ("c_acctbal", "cents"),
           ("c_mktsegment", "str")]
_S_COLS = [("s_suppkey", "int"), ("s_name", "str"),
           ("s_nationkey", "int"), ("s_acctbal", "cents")]


def q_schema_match(sf_dir: str):
    """Instance-based schema matching between the customer and supplier
    tables: every (customer column, supplier column) pair ranked by
    JACCARD OVERLAP of their canonicalized distinct value sets (ints
    and cent-quantized doubles print identically in both engines; raw
    double-to-string is NOT cross-engine-stable, hence the
    canonicalization step).  Columns become ITEMS of the generic
    set-similarity self-join (dedup.set_jaccard_pairs — the
    ngram/link-prediction kernel with item=column, token=value), ids
    0..4 for customer and 10..13 for supplier so cross-side pairs are
    u < 10 <= v.  Zero-overlap pairs (e.g. the name columns) are
    absent on both sides by the shared-token blocking invariant."""
    from kgray.ops.dedup import set_jaccard_pairs

    def explode(side_cols, base):
        def apply(batch: pa.Table) -> pa.Table:
            outs = []
            for i, (col, kind) in enumerate(side_cols):
                a = batch[col]
                if kind == "int":
                    vs = pc.cast(a, pa.string())
                elif kind == "cents":
                    c = round_half_up(
                        a.to_numpy(zero_copy_only=False) * 100.0, 0
                    ).astype(np.int64)
                    vs = pa.array([str(x) for x in c], pa.string())
                else:
                    vs = a
                outs.append(pa.table({
                    "shingle": vs,
                    "doc": pa.array(np.full(len(batch), base + i,
                                            np.int64)),
                }))
            t = pa.concat_tables(outs)
            # per-batch combiner: distinct (value, column)
            g = t.group_by(["shingle", "doc"]).aggregate(
                [("doc", "count")])
            return g.select(["shingle", "doc"])

        return apply

    cust = _read(sf_dir, "customer",
                 [c for c, _ in _C_COLS]).map_batches(
        explode(_C_COLS, 0), batch_format="pyarrow")
    supp = _read(sf_dir, "supplier",
                 [c for c, _ in _S_COLS]).map_batches(
        explode(_S_COLS, 10), batch_format="pyarrow")
    ded = pre_aggregate(cust.union(supp), ["doc", "shingle"],
                        {"n": (None, "count")}) \
        .select_columns(["doc", "shingle"])
    counts = pre_aggregate(ded.select_columns(["doc"]), ["doc"],
                           {"nsh": (None, "count")})
    pairs = set_jaccard_pairs(
        ded, counts, n_items=len(_C_COLS) + len(_S_COLS),
        tau=0.000001)

    names = {i: c for i, (c, _) in enumerate(_C_COLS)}
    names.update({10 + i: c for i, (c, _) in enumerate(_S_COLS)})

    def finish(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        keep = (u < 10) & (v >= 10)
        return pa.table({
            "c_col": pa.array([names[int(x)] for x in u[keep]],
                              pa.string()),
            "s_col": pa.array([names[int(x)] for x in v[keep]],
                              pa.string()),
            "jac": pa.array(
                batch["jac"].to_numpy(zero_copy_only=False)[keep]),
        })

    return pairs.map_batches(finish, batch_format="pyarrow")


def _schema_match_sql() -> str:
    def side(cols, tbl):
        parts = []
        for col, kind in cols:
            if kind == "int":
                v = f"CAST({col} AS VARCHAR)"
            elif kind == "cents":
                v = (f"CAST(CAST(round({col} * 100) AS BIGINT)"
                     " AS VARCHAR)")
            else:
                v = col
            parts.append(f"SELECT '{col}' AS col, {v} AS v FROM {tbl}")
        return " UNION ALL ".join(parts)

    return f"""
WITH cv AS (SELECT DISTINCT col, v FROM ({side(_C_COLS, 'customer')})),
sv AS (SELECT DISTINCT col, v FROM ({side(_S_COLS, 'supplier')})),
cd AS (SELECT col, CAST(COUNT(*) AS BIGINT) AS n FROM cv GROUP BY 1),
sd AS (SELECT col, CAST(COUNT(*) AS BIGINT) AS n FROM sv GROUP BY 1),
pr AS (SELECT cv.col AS c_col, sv.col AS s_col,
              CAST(COUNT(*) AS BIGINT) AS shared
       FROM cv JOIN sv ON cv.v = sv.v GROUP BY 1, 2)
SELECT pr.c_col, pr.s_col,
       ROUND(CAST(pr.shared AS DOUBLE)
             / (cd.n + sd.n - pr.shared), 4) AS jac
FROM pr JOIN cd ON pr.c_col = cd.col JOIN sd ON pr.s_col = sd.col
WHERE CAST(pr.shared AS DOUBLE) / (cd.n + sd.n - pr.shared) >= 0.000001
ORDER BY 1, 2
"""


SQL_SCHEMA_MATCH = _schema_match_sql()


# ---------------------------------------------------------------------------
# Integer fixed-point spectral power iteration on the term-doc matrix
# ---------------------------------------------------------------------------

_SPEC_S = 1_000_000  # fixed-point scale; bound: total_tokens * S < 2^63


def q_term_doc_spectral(sf_dir: str):
    """Top singular direction of the doc x term count matrix by TWO
    rounds of integer fixed-point power iteration on A^T A — the
    spectral 'topic axis' (terms loading heaviest on the dominant
    co-occurrence direction).  The pagerank_int move applied to linear
    algebra: every mat-vec is an integer multiply-sum,每 round
    L-infinity-normalizes by max * S // max (floor-div, positive
    operands), so ANY summation order gives identical ints and the
    DuckDB oracle just unrolls the same recurrence.

    Dataflow: documents keep their (terms, counts) as LIST columns so
    a doc is atomic inside its row — w = A v needs NO shuffle at all
    (per-row dot products against the broadcast vocab vector); only
    u = A^T w pays one vocab-scale fold per round.  Valid while
    total_token_count * S < 2^63 (shrink S for larger corpora)."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks).to_pylist()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        did = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), lens)
        df = pd.DataFrame({"d": did, "t": flat})
        # rows arrive doc-contiguous, so first-occurrence group order
        # keeps each doc's (d, t) pairs contiguous — list offsets are a
        # per-doc cumsum, no python loop
        g = df.groupby(["d", "t"], sort=False).size().reset_index(name="c")
        dl = g.groupby("d", sort=False).size()
        off = np.concatenate([[0], np.cumsum(dl.to_numpy(np.int64))]) \
            .astype(np.int32)
        return pa.table({
            "d": pa.array(dl.index.to_numpy(np.int64)),
            "ts": pa.ListArray.from_arrays(
                pa.array(off), pa.array(g["t"], pa.string())),
            "cs": pa.ListArray.from_arrays(
                pa.array(off), pa.array(g["c"].to_numpy(np.int64))),
        })

    A = docs.map_batches(doc_rows, batch_format="pyarrow").materialize()

    def _row_dots(batch: pa.Table, v: dict) -> tuple:
        """Vectorized per-row dot products c . v[t] (integers: any
        summation order is exact).  Returns (w per row, flat terms,
        flat counts, row lengths)."""
        ts = batch["ts"].combine_chunks()
        flat_t = pc.list_flatten(ts).to_pandas()
        flat_c = pc.list_flatten(
            batch["cs"].combine_chunks()).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(ts).to_numpy(zero_copy_only=False)
        x = flat_t.map(v).to_numpy(np.int64)
        prod = flat_c * x
        off = np.concatenate([[0], np.cumsum(lens)])
        if len(prod):
            # clip: a trailing empty doc's offset == len(prod) is out
            # of range for reduceat; its slot is zeroed below anyway
            w = np.add.reduceat(
                prod, np.minimum(off[:-1], len(prod) - 1))
        else:
            w = np.zeros(len(batch), np.int64)
        w[lens == 0] = 0  # reduceat repeats on empty slices
        return w.astype(np.int64), flat_t, flat_c, lens

    # v0: uniform S over the vocabulary
    vocab = pre_aggregate(
        A.map_batches(
            lambda b: pa.table(
                {"t": pc.unique(pc.list_flatten(b["ts"]))}),
            batch_format="pyarrow"),
        ["t"], {"n": (None, "count")},
    ).to_pandas()["t"].tolist()  # vocab scale (the documented bound)
    v = {t: _SPEC_S for t in vocab}

    for _ in range(2):
        v_ref = ray.put(v)

        def w_pass(batch: pa.Table) -> pa.Table:
            w, _, _, _ = _row_dots(batch, ray.get(v_ref))
            return pa.table({"w": pa.array(w)})

        mw = int(A.map_batches(w_pass, batch_format="pyarrow").max("w"))

        def u_pass(batch: pa.Table) -> pa.Table:
            # docs are atomic rows, so w is recomputed per row (exact
            # same integers) instead of joining a doc-scale vector back
            w, flat_t, flat_c, lens = _row_dots(batch, ray.get(v_ref))
            wn = w * _SPEC_S // mw
            part = flat_c * np.repeat(wn, lens)
            g = pd.DataFrame({"t": flat_t, "x": part}) \
                .groupby("t", sort=False)["x"].sum().reset_index()
            g["x"] = g["x"].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        u = pre_aggregate(
            A.map_batches(u_pass, batch_format="pyarrow"),
            ["t"], {"x": ("x", "sum")},
        ).to_pandas()  # vocab scale
        mu = int(u["x"].max())
        v = {t: int(x) * _SPEC_S // mu
             for t, x in zip(u["t"], u["x"])}

    out = pd.DataFrame({"term": list(v), "score": list(v.values())})
    out = out.sort_values(["score", "term"], ascending=[False, True],
                          kind="mergesort").head(20)
    return pa.table({
        "term": pa.array(out["term"], pa.string()),
        "score": pa.array(out["score"].to_numpy(np.int64)),
    })


def _spectral_sql(rounds: int = 2, s: int = _SPEC_S) -> str:
    prev_v = "v0"
    ctes = [
        """a AS (SELECT doc_id AS d, t, CAST(COUNT(*) AS BIGINT) AS c
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents) GROUP BY 1, 2)""",
        f"v0 AS (SELECT DISTINCT t, CAST({s} AS BIGINT) AS x FROM a)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"w{i} AS (SELECT a.d, CAST(SUM(a.c * {prev_v}.x) AS BIGINT)"
            f" AS y FROM a JOIN {prev_v} ON a.t = {prev_v}.t GROUP BY 1)")
        ctes.append(
            f"w{i}n AS (SELECT d, y * {s} // (SELECT MAX(y) FROM w{i})"
            f" AS y FROM w{i})")
        ctes.append(
            f"u{i} AS (SELECT a.t, CAST(SUM(a.c * w{i}n.y) AS BIGINT)"
            f" AS x FROM a JOIN w{i}n ON a.d = w{i}n.d GROUP BY 1)")
        ctes.append(
            f"v{i} AS (SELECT t, CAST(x * {s} // (SELECT MAX(x)"
            f" FROM u{i}) AS BIGINT) AS x FROM u{i})")
        prev_v = f"v{i}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT t AS term, x AS score FROM {prev_v}"
            "\nORDER BY score DESC, term LIMIT 20")


SQL_TERM_DOC_SPECTRAL = _spectral_sql()


# ---------------------------------------------------------------------------
# Greedy max-coverage data selection (submodular corpus pruning)
# ---------------------------------------------------------------------------

_COVER_K = 5


def q_docs_greedy_cover(sf_dir: str):
    """Submodular greedy data selection: pick K=5 documents that
    maximize marginal VOCABULARY coverage, one at a time (the
    facility-location/max-coverage corpus-pruning move; greedy is the
    classic (1 - 1/e) approximation).  Each round is one broadcast-
    covered-set scan computing per-doc marginal gains (per-batch
    distinct-token combiner + batch-local top-1, so only
    batches-scale candidates reach the driver) + one pushdown-filtered
    read of the winner's tokens; ties break (gain DESC, doc_id).
    Zero-gain docs stay candidates (the LEFT-join face in SQL) so the
    tie-break stays total.  Integer outputs only: (round, doc_id,
    gain, covered_after)."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    covered: set = set()
    picked: set = set()
    rows = []
    for r in range(1, _COVER_K + 1):
        cov_ref = ray.put(covered)
        picked_ref = ray.put(picked)

        def gains(batch: pa.Table) -> pa.Table:
            cov = ray.get(cov_ref)
            pk = ray.get(picked_ref)
            toks = pc.split_pattern(batch["text"], " ")
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False)
            did = np.repeat(
                batch["doc_id"].to_numpy(zero_copy_only=False), lens)
            df = pd.DataFrame(
                {"d": did, "t": pc.list_flatten(toks).to_pylist()}
            ).drop_duplicates()
            df = df[~df["t"].isin(cov)]
            g = df.groupby("d", sort=False).size()
            all_d = pd.Index(
                batch["doc_id"].to_numpy(zero_copy_only=False))
            gain = g.reindex(all_d, fill_value=0).astype(np.int64)
            keep = ~all_d.isin(pk)
            cand = pd.DataFrame({"doc_id": all_d[keep],
                                 "gain": gain[keep].to_numpy()})
            if not len(cand):
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "gain": pa.array([], pa.int64())})
            cand = cand.sort_values(["gain", "doc_id"],
                                    ascending=[False, True],
                                    kind="mergesort").head(1)
            return pa.Table.from_pandas(cand, preserve_index=False)

        cands = docs.map_batches(
            gains, batch_format="pyarrow").to_pandas()  # batches-scale
        cands = cands.sort_values(["gain", "doc_id"],
                                  ascending=[False, True],
                                  kind="mergesort")
        win, gain = int(cands["doc_id"].iloc[0]), int(cands["gain"].iloc[0])
        txt = docs.filter(expr=f"doc_id == {win}") \
            .to_pandas()["text"].iloc[0]
        covered |= set(txt.split(" "))
        picked.add(win)
        rows.append((r, win, gain, len(covered)))
    return pa.table({
        "round": pa.array([r[0] for r in rows], pa.int64()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "gain": pa.array([r[2] for r in rows], pa.int64()),
        "covered_after": pa.array([r[3] for r in rows], pa.int64()),
    })


def _greedy_cover_sql(k: int = _COVER_K) -> str:
    ctes = [
        """tok AS (SELECT DISTINCT doc_id,
              unnest(string_split(text, ' ')) AS w FROM documents)""",
        "alld AS (SELECT DISTINCT doc_id FROM tok)",
        "c0 AS (SELECT w FROM tok WHERE 1 = 0)",
        "pk0 AS (SELECT doc_id FROM alld WHERE 1 = 0)",
    ]
    for r in range(1, k + 1):
        ctes.append(
            f"""g{r} AS (SELECT a.doc_id, CAST(COALESCE(x.gain, 0) AS BIGINT)
            AS gain
       FROM alld a LEFT JOIN (
         SELECT doc_id, COUNT(DISTINCT w) AS gain FROM tok
         WHERE w NOT IN (SELECT w FROM c{r - 1}) GROUP BY 1) x
       ON a.doc_id = x.doc_id
       WHERE a.doc_id NOT IN (SELECT doc_id FROM pk{r - 1}))""")
        ctes.append(
            f"p{r} AS (SELECT doc_id, gain FROM g{r}"
            " ORDER BY gain DESC, doc_id LIMIT 1)")
        ctes.append(
            f"c{r} AS (SELECT w FROM c{r - 1} UNION"
            f" SELECT w FROM tok JOIN p{r} USING (doc_id))")
        ctes.append(
            f"pk{r} AS (SELECT doc_id FROM pk{r - 1} UNION ALL"
            f" SELECT doc_id FROM p{r})")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, doc_id, gain,"
        f" CAST((SELECT COUNT(*) FROM c{r}) AS BIGINT) AS covered_after"
        f" FROM p{r}"
        for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel + "\nORDER BY round"


SQL_DOCS_GREEDY_COVER = _greedy_cover_sql()


# ---------------------------------------------------------------------------
# Greedy maximal matching (combinatorial optimization on the big graph)
# ---------------------------------------------------------------------------


def q_supplier_matching(sf_dir: str):
    """Parallel greedy maximal matching over the supplier-part
    bipartite graph (graph.greedy_matching): each round every node
    nominates its minimum incident edge and mutually-nominated edges
    enter the matching — a deterministic distributed approximation of
    maximum matching (assignment of suppliers to parts with no node
    reused).  3 fixed rounds; the oracle unrolls the identical
    nominate/match/drop recurrence."""
    from kgray.ops.graph import greedy_matching
    from kgray.queries.analytics4 import _part_supplier_edges

    return greedy_matching(_part_supplier_edges(sf_dir), rounds=3)


def _matching_sql(rounds: int = 3) -> str:
    # every CTE is MATERIALIZED: the default inlining re-evaluates each
    # referenced CTE per use, which compounds across the unrolled rounds
    # (e{r} references m{r} twice, m{r} references n{r} twice, ...) —
    # the un-hinted form spilled DuckDB to disk-full at sf0.1
    ctes = [
        """e0 AS MATERIALIZED (SELECT u, v, u * 4294967296 + v AS eid FROM (
       SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
              CAST(l_partkey + 10000000 AS BIGINT) AS v
       FROM lineitem))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""n{r} AS MATERIALIZED (SELECT node,
              CAST(MIN(eid) AS BIGINT) AS me FROM (
         SELECT u AS node, eid FROM e{p}
         UNION ALL SELECT v AS node, eid FROM e{p}) GROUP BY 1)""")
        ctes.append(
            f"""m{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{p} e
       JOIN n{r} a ON e.u = a.node AND e.eid = a.me
       JOIN n{r} b ON e.v = b.node AND e.eid = b.me)""")
        ctes.append(
            f"""e{r} AS MATERIALIZED (SELECT * FROM e{p}
       WHERE u NOT IN (SELECT u FROM m{r} UNION ALL SELECT v FROM m{r})
         AND v NOT IN (SELECT u FROM m{r} UNION ALL SELECT v FROM m{r}))"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT u, v, CAST({r} AS BIGINT) AS round FROM m{r}"
        for r in range(1, rounds + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel + "\nORDER BY round, u, v"


SQL_SUPPLIER_MATCHING = _matching_sql()


# ---------------------------------------------------------------------------
# Weighted interval scheduling (per-user DP over event windows)
# ---------------------------------------------------------------------------

_SCHED_G_US = 1_800_000_000  # each event books a half-open 30-min window


def q_user_interval_schedule(sf_dir: str):
    """Weighted interval scheduling per user: each event books the
    half-open window [ts, ts+30min) worth its integer cents; the
    answer is the maximum total value of a NON-OVERLAPPING subset —
    the classic O(n log n) DP dp[i] = max(dp[i-1], v_i + dp[p(i)])
    with p(i) = #(ends <= start_i) by binary search.  The DP is
    inherently sequential per user, so the per-user loop is the
    documented exception (positions, not rows; each user's p-vector is
    one searchsorted).  The oracle carries the dp PREFIX AS A LIST
    through a recursive CTE (dp[p+1] needs arbitrary lookback, unlike
    the scalar-state EWMA recurrence) — list_append per row, 1-based
    list[1] = dp[0] = 0."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def sched(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        c = round_half_up(df["value"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64)
        out = []
        for uid, idx in df.groupby("user_id", sort=False).indices.items():
            s = us[idx]
            e = s + _SCHED_G_US  # ends sorted because starts are
            v = c[idx]
            p = np.searchsorted(e, s, side="right")
            dp = np.zeros(len(idx) + 1, np.int64)
            for i in range(len(idx)):
                dp[i + 1] = max(dp[i], v[i] + dp[p[i]])
            out.append((uid, len(idx), int(dp[-1])))
        return pd.DataFrame(out, columns=["user_id", "n_events",
                                          "best_cents"])

    return grouped_map(ev, "user_id", sched)


SQL_USER_INTERVAL_SCHEDULE = f"""
WITH RECURSIVE r AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_SCHED_G_US} AS e,
         CAST(round(value * 100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
p AS MATERIALIZED (
  SELECT a.user_id, a.rn, CAST(COALESCE(MAX(b.rn), 0) AS BIGINT) AS pi
  FROM r a LEFT JOIN r b
    ON a.user_id = b.user_id AND b.e <= a.s AND b.rn < a.rn
  GROUP BY 1, 2),
d AS (
  SELECT r.user_id, r.rn,
         [CAST(0 AS BIGINT), GREATEST(CAST(0 AS BIGINT), r.v)] AS l
  FROM r WHERE r.rn = 1
  UNION ALL
  SELECT r.user_id, r.rn,
         list_append(d.l, GREATEST(d.l[len(d.l)],
                                   r.v + d.l[p.pi + 1]))
  FROM d
  JOIN r ON r.user_id = d.user_id AND r.rn = d.rn + 1
  JOIN p ON p.user_id = r.user_id AND p.rn = r.rn),
sel AS (SELECT user_id, rn, l,
               MAX(rn) OVER (PARTITION BY user_id) AS mx FROM d)
SELECT user_id, CAST(mx AS BIGINT) AS n_events,
       CAST(l[len(l)] AS BIGINT) AS best_cents
FROM sel WHERE rn = mx ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Propensity-score matching ATT (nearest-control matching estimator)
# ---------------------------------------------------------------------------


def q_events_psm_att(sf_dir: str):
    """Matching estimator for the treatment effect on the treated:
    treatment = md5(user), score = the user's PRE-period cents (the
    propensity proxy), outcome = POST-period cents; every treated user
    matches the nearest control in (score, user_id) order — the closer
    of the previous/next control by |score gap|, previous on ties —
    and ATT = mean(outcome - matched outcome).  All gaps, sums and
    counts are exact integers; the user-profile table here is
    aggregate-scale, and the scale path is the sorted-neighborhood
    decomposition (range-partition by score, head/tail boundary
    controls per partition) since matching only ever needs each
    treated's score-neighbors."""
    from kgray.ops.sample import _md5_hex

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def days(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"g": pa.array(np.zeros(len(batch), np.int8)),
                         "day": pa.array(us // 86_400_000_000)})

    dd = pre_aggregate(
        ev.map_batches(days, batch_format="pyarrow"), ["g"],
        {"lo": ("day", "min"), "hi": ("day", "max")},
    ).to_pandas()
    lo, hi = int(dd["lo"][0]), int(dd["hi"][0])
    split_day = lo + (hi - lo) // 2

    def per_user(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        post = us // 86_400_000_000 > split_day
        df = pd.DataFrame({"user_id": batch["user_id"].to_numpy(
            zero_copy_only=False),
            "score": np.where(post, 0, c),
            "outcome": np.where(post, c, 0)})
        g = df.groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    u = pre_aggregate(
        ev.map_batches(per_user, batch_format="pyarrow"),
        ["user_id"],
        {"score": ("score", "sum"), "outcome": ("outcome", "sum")},
    ).to_pandas()  # aggregate-scale (see docstring for the scale path)
    u["treat"] = [h < "8" for h in _md5_hex(u["user_id"].tolist())]
    u = u.sort_values(["score", "user_id"], ignore_index=True)
    cs = np.where(u["treat"], np.nan, u["score"].astype(float))
    co = np.where(u["treat"], np.nan, u["outcome"].astype(float))
    ps = pd.Series(cs).ffill().to_numpy()
    po = pd.Series(co).ffill().to_numpy()
    ns = pd.Series(cs).bfill().to_numpy()
    no = pd.Series(co).bfill().to_numpy()
    t = u["treat"].to_numpy()
    sc = u["score"].to_numpy(np.int64)
    out = u["outcome"].to_numpy(np.int64)
    prev_ok = ~np.isnan(ps[t])
    next_ok = ~np.isnan(ns[t])
    use_prev = prev_ok & (~next_ok | (sc[t] - np.where(prev_ok, ps[t], 0)
                                      <= np.where(next_ok, ns[t], 0)
                                      - sc[t]))
    mo = np.where(use_prev, po[t], no[t]).astype(np.int64)
    n_t = int(t.sum())
    n_c = int((~t).sum())
    so = int(out[t].sum())
    sm = int(mo.sum())
    return pa.table({
        "n_treated": pa.array([n_t], pa.int64()),
        "n_control": pa.array([n_c], pa.int64()),
        "mean_treated": pa.array(
            [float(round_half_up(so / n_t, 6))]),
        "mean_matched": pa.array(
            [float(round_half_up(sm / n_t, 6))]),
        "att_cents": pa.array(
            [float(round_half_up((so - sm) / n_t, 6))]),
    })


SQL_EVENTS_PSM_ATT = """
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
b AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS sd FROM e),
u AS (SELECT user_id,
             md5(CAST(user_id AS VARCHAR)) < '8' AS treat,
             CAST(SUM(CASE WHEN day <= b.sd THEN c ELSE 0 END)
                  AS BIGINT) AS score,
             CAST(SUM(CASE WHEN day > b.sd THEN c ELSE 0 END)
                  AS BIGINT) AS outcome
      FROM e, b GROUP BY 1, 2),
o AS (SELECT *,
        last_value(CASE WHEN NOT treat THEN score END IGNORE NULLS)
          OVER w1 AS ps,
        last_value(CASE WHEN NOT treat THEN outcome END IGNORE NULLS)
          OVER w1 AS po,
        first_value(CASE WHEN NOT treat THEN score END IGNORE NULLS)
          OVER w2 AS ns,
        first_value(CASE WHEN NOT treat THEN outcome END IGNORE NULLS)
          OVER w2 AS no
      FROM u
      WINDOW w1 AS (ORDER BY score, user_id ROWS UNBOUNDED PRECEDING),
             w2 AS (ORDER BY score, user_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
m AS (SELECT score, outcome,
             CASE WHEN ps IS NULL THEN no
                  WHEN ns IS NULL THEN po
                  WHEN score - ps <= ns - score THEN po
                  ELSE no END AS mo
      FROM o WHERE treat)
SELECT CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_treated,
       CAST((SELECT COUNT(*) FROM u WHERE NOT treat) AS BIGINT)
         AS n_control,
       ROUND(CAST(SUM(outcome) AS DOUBLE) / COUNT(*), 6)
         AS mean_treated,
       ROUND(CAST(SUM(mo) AS DOUBLE) / COUNT(*), 6) AS mean_matched,
       ROUND(CAST(SUM(outcome) - SUM(mo) AS DOUBLE) / COUNT(*), 6)
         AS att_cents
FROM m
"""


# ---------------------------------------------------------------------------
# Qini uplift curve (cumulative incremental responders by score decile)
# ---------------------------------------------------------------------------


def q_events_qini(sf_dir: str):
    """Qini uplift curve: users ranked by activity (total cents DESC,
    user_id), split into 10 rank bands; per cumulative band the Qini
    value R_t - R_c * N_t / N_c counts incremental responders
    (responder = user with any purchase) among the treated over the
    control baseline scaled to the treated exposure.  All band
    aggregates are integer folds; the single float per band is the
    identical (R_c * N_t) / N_c expression in both engines.  Band of a
    user = (10 * (rank - 1)) // n — integer, no NTILE remainder
    ambiguity."""
    from kgray.ops.sample import _md5_hex

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def per_user(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "score": c,
            "resp": (t == "purchase").astype(np.int64)})
        g = df.groupby("user_id", sort=False).agg(
            score=("score", "sum"), resp=("resp", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    u = pre_aggregate(
        ev.map_batches(per_user, batch_format="pyarrow"),
        ["user_id"],
        {"score": ("score", "sum"), "resp": ("resp", "max")},
    ).to_pandas()  # aggregate-scale; scale path = distributed NTILE
    u["treat"] = [h < "8" for h in _md5_hex(u["user_id"].tolist())]
    u = u.sort_values(["score", "user_id"], ascending=[False, True],
                      ignore_index=True, kind="mergesort")
    n = len(u)
    band = (10 * np.arange(n, dtype=np.int64)) // n
    t = u["treat"].to_numpy()
    resp = u["resp"].to_numpy(np.int64)
    rows = []
    for b in range(10):
        cum = band <= b
        nt = int((cum & t).sum())
        nc = int((cum & ~t).sum())
        rt = int(resp[cum & t].sum())
        rc = int(resp[cum & ~t].sum())
        rows.append((b, nt, nc, rt, rc,
                     float(round_half_up(rt - (rc * nt) / nc, 6))
                     if nc else None))
    return pa.table({
        "band": pa.array([r[0] for r in rows], pa.int64()),
        "n_t": pa.array([r[1] for r in rows], pa.int64()),
        "n_c": pa.array([r[2] for r in rows], pa.int64()),
        "r_t": pa.array([r[3] for r in rows], pa.int64()),
        "r_c": pa.array([r[4] for r in rows], pa.int64()),
        "qini": pa.array([r[5] for r in rows], pa.float64()),
    })


SQL_EVENTS_QINI = """
WITH u AS (SELECT user_id,
                  md5(CAST(user_id AS VARCHAR)) < '8' AS treat,
                  CAST(SUM(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS score,
                  CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS resp
           FROM events GROUP BY 1),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM u),
bd AS (SELECT *, (10 * (rn - 1)) // n AS band FROM r),
agg AS (SELECT band,
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                 AS bnt,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                 AS bnc,
               CAST(SUM(CASE WHEN treat THEN resp ELSE 0 END) AS BIGINT)
                 AS brt,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE resp END) AS BIGINT)
                 AS brc
        FROM bd GROUP BY 1),
cum AS (SELECT CAST(band AS BIGINT) AS band,
               CAST(SUM(bnt) OVER w AS BIGINT) AS n_t,
               CAST(SUM(bnc) OVER w AS BIGINT) AS n_c,
               CAST(SUM(brt) OVER w AS BIGINT) AS r_t,
               CAST(SUM(brc) OVER w AS BIGINT) AS r_c
        FROM agg WINDOW w AS (ORDER BY band ROWS UNBOUNDED PRECEDING))
SELECT band, n_t, n_c, r_t, r_c,
       CASE WHEN n_c = 0 THEN NULL
            ELSE ROUND(r_t - CAST(r_c * n_t AS DOUBLE) / n_c, 6)
       END AS qini
FROM cum ORDER BY band
"""


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (quality gate -> near-dup purge ->
# decontamination -> mixture stats), ONE oracle over the whole chain
# ---------------------------------------------------------------------------


def q_curation_e2e(sf_dir: str):
    """The standing LLM-curation chain as ONE value-hash-checked unit:
    (1) Gopher-style quality gate — 5 <= tokens <= 5000 and top-word
    fraction <= 3/10 by integer cross-multiply; (2) exact near-dup
    purge on the survivors — 3-gram Jaccard >= 0.8 pairs -> connected
    components -> keep the min-id representative; (3) GPT-3-style
    decontamination — the md5 < '2' eighth of survivors is the
    held-out set, training docs sharing any word-5-gram with it drop;
    (4) per-source doc/token mixture of the final corpus.  Every stage
    is an existing auto-gated operator (quality kernel, set-similarity
    self-join, CC, broadcast contamination probe); what this adds is
    the proof that the COMPOSITION matches the composed SQL, filters
    included."""
    from kgray.ops.canonical import connected_components
    from kgray.ops.dedup import ngram_contamination, ngram_jaccard_pairs
    from kgray.ops.sample import _md5_hex

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def quality(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        did = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False),
                        lens)
        df = pd.DataFrame({"d": did,
                           "t": pc.list_flatten(toks).to_pylist()})
        mx = df.groupby(["d", "t"], sort=False).size() \
            .groupby("d", sort=False).max()
        mx = mx.reindex(batch["doc_id"].to_numpy(zero_copy_only=False),
                        fill_value=0).to_numpy(np.int64)
        nt = lens.astype(np.int64)
        keep = (nt >= 5) & (nt <= 5000) & (mx * 10 <= nt * 3)
        return batch.filter(pa.array(keep)).append_column(
            "n_tokens", pa.array(nt[keep]))

    q = docs.map_batches(quality, batch_format="pyarrow").materialize()

    pairs = ngram_jaccard_pairs(q.select_columns(["doc_id", "text"]),
                                tau=0.8)
    comp = connected_components(pairs)
    dropped = comp.map_batches(
        lambda t: pa.table({"node": t.filter(
            pc.not_equal(t["node"], t["component"]))["node"]}),
        batch_format="pyarrow")
    kept = semi_join(q, dropped, on="doc_id", right_on="node",
                     anti=True).materialize()

    def is_test(ids: np.ndarray) -> np.ndarray:
        return np.array([h < "2" for h in _md5_hex(ids.tolist())],
                        np.bool_)

    cont = ngram_contamination(kept, is_test, n=5)
    clean = cont.filter(expr="n_shared == 0").select_columns(["doc_id"])
    final = semi_join(kept.select_columns(["doc_id", "source",
                                           "n_tokens"]),
                      clean, on="doc_id")
    return pre_aggregate(
        final, ["source"],
        {"n_docs": (None, "count"), "n_tokens": ("n_tokens", "sum")},
    )


SQL_CURATION_E2E = """
WITH RECURSIVE
tw AS MATERIALIZED (SELECT doc_id, MAX(c) AS mx FROM (
    SELECT doc_id, COUNT(*) AS c FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents)
    GROUP BY doc_id, w) GROUP BY doc_id),
q AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.source,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
  FROM documents d JOIN tw ON d.doc_id = tw.doc_id
  WHERE len(string_split(d.text, ' ')) BETWEEN 5 AND 5000
    AND tw.mx * 10 <= len(string_split(d.text, ' ')) * 3),
sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM q WHERE len(string_split(text, ' ')) >= 3),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
         FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
p AS MATERIALIZED (
  SELECT c.u, c.v
  FROM cand c JOIN sh a ON c.u = a.doc_id JOIN sh b ON c.v = b.doc_id
  WHERE CAST(c.common AS DOUBLE) /
        (len(a.shingles) + len(b.shingles) - c.common) >= 0.8),
sym AS (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
cc AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
kept AS MATERIALIZED (
  SELECT * FROM q WHERE doc_id NOT IN
    (SELECT node FROM comp WHERE node <> component)),
g5 AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text,' ')) - 3),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2] || ' '
                || string_split(text,' ')[i+3] || ' '
                || string_split(text,' ')[i+4]))) AS g
  FROM kept WHERE len(string_split(text, ' ')) >= 5),
ev AS (SELECT DISTINCT g FROM g5
       WHERE md5(CAST(doc_id AS VARCHAR)) < '2'),
contam AS (SELECT DISTINCT g5.doc_id FROM g5 JOIN ev ON g5.g = ev.g
           WHERE md5(CAST(g5.doc_id AS VARCHAR)) >= '2'),
final AS (SELECT * FROM kept
          WHERE md5(CAST(doc_id AS VARCHAR)) >= '2'
            AND doc_id NOT IN (SELECT doc_id FROM contam))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM final GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Integer fixed-point Holt-Winters (level + trend + weekly seasonality)
# ---------------------------------------------------------------------------

_HW_S = 1_000_000       # micro-units
_HW_OFF = 1 << 40       # shift-positive: floor-div == truncate-div
_HW_DAYS = 120          # first 120 days of the order stream
_HW_M = 7               # weekly season


def _hw_fd(x, d):
    """floor(x / d) via shifted positive operands — numpy floors
    negative //, DuckDB truncates toward zero; adding OFF*d makes the
    numerator positive so both engines agree (the EWMA/Holt lesson,
    third appearance)."""
    return (x + _HW_OFF * d) // d - _HW_OFF


def q_orders_hw_forecast(sf_dir: str):
    """Holt-Winters (additive, weekly season) 7-day forecast of daily
    order counts per priority, in EXACT integer micro-units: alpha =
    1/4, beta = 1/4, gamma = 1/2 as shifted floor-divs, the seasonal
    state a rotating 7-slot integer vector.  Completes the forecasting
    family (EWMA -> Holt -> Holt-Winters); the oracle carries (level,
    trend, season-list) through a per-priority recursive CTE — the
    dp-list trick from user_interval_schedule applied to a
    triple-recurrence.  Days gap-fill to the global [lo, lo+120)
    window so the recurrence index is contiguous in both engines."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def days(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "p": batch["o_orderpriority"],
            "day": pa.array(us // 86_400_000_000),
        })

    dd = orders.map_batches(days, batch_format="pyarrow").materialize()
    lo = int(dd.min("day"))

    cnt = pre_aggregate(
        dd.filter(expr=f"day >= {lo} and day < {lo + _HW_DAYS}"),
        ["p", "day"], {"y": (None, "count")},
    )

    def hw(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p, grp in df.groupby("p", sort=False):
            y = np.zeros(_HW_DAYS, np.int64)
            y[grp["day"].to_numpy(np.int64) - lo] = \
                grp["y"].to_numpy(np.int64)
            lvl = _HW_S * int(y[0])
            b = 0
            s = [0] * _HW_M
            for t in range(1, _HW_DAYS):
                sy = _HW_S * int(y[t])
                sprev = s[0]
                lnew = _hw_fd(sy - sprev + 3 * (lvl + b), 4)
                b = _hw_fd(lnew - lvl + 3 * b, 4)
                snew = _hw_fd(sy - lnew + sprev, 2)
                lvl = lnew
                s = s[1:] + [snew]
            for h in range(1, _HW_M + 1):
                out.append((p, h, int(lvl + h * b + s[h - 1])))
        return pd.DataFrame(out, columns=["o_orderpriority", "h",
                                          "forecast_micro"])

    return grouped_map(cnt, "p", hw)


SQL_ORDERS_HW_FORECAST = f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT o_orderpriority AS p,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders),
b AS (SELECT MIN(day) AS lo FROM base),
cal AS (SELECT p, lo + gs.g AS day, CAST(gs.g + 1 AS BIGINT) AS rn
        FROM (SELECT DISTINCT p FROM base), b,
             (SELECT unnest(range(0, {_HW_DAYS})) AS g) gs),
y AS MATERIALIZED (
  SELECT cal.p, cal.rn,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS y
  FROM cal LEFT JOIN (
    SELECT p, day, COUNT(*) AS n FROM base, b
    WHERE day >= lo AND day < lo + {_HW_DAYS} GROUP BY 1, 2) c
  ON cal.p = c.p AND cal.day = c.day),
hw AS (
  SELECT p, rn, CAST({_HW_S} * y AS BIGINT) AS l,
         CAST(0 AS BIGINT) AS b,
         [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS s
  FROM y WHERE rn = 1
  UNION ALL
  SELECT y.p, y.rn,
         (({_HW_S} * y.y - hw.s[1] + 3 * (hw.l + hw.b)
           + {_HW_OFF} * 4) // 4 - {_HW_OFF}) AS lnew,
         (((({_HW_S} * y.y - hw.s[1] + 3 * (hw.l + hw.b)
             + {_HW_OFF} * 4) // 4 - {_HW_OFF}) - hw.l + 3 * hw.b
           + {_HW_OFF} * 4) // 4 - {_HW_OFF}),
         hw.s[2:7] ||
           [({_HW_S} * y.y
             - (({_HW_S} * y.y - hw.s[1] + 3 * (hw.l + hw.b)
                 + {_HW_OFF} * 4) // 4 - {_HW_OFF})
             + hw.s[1] + {_HW_OFF} * 2) // 2 - {_HW_OFF}]
  FROM hw JOIN y ON y.p = hw.p AND y.rn = hw.rn + 1),
fin AS (SELECT p, l, b, s,
               ROW_NUMBER() OVER (PARTITION BY p ORDER BY rn DESC) AS rr
        FROM hw)
SELECT fin.p AS o_orderpriority, CAST(h.h AS BIGINT) AS h,
       CAST(fin.l + h.h * fin.b + fin.s[h.h] AS BIGINT)
         AS forecast_micro
FROM fin, (SELECT unnest(range(1, 8)) AS h) h
WHERE fin.rr = 1 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Functional-dependency discovery sweep (data profiling)
# ---------------------------------------------------------------------------

_FD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_orderpriority"]


def q_orders_fd_discovery(sf_dir: str):
    """Functional-dependency DISCOVERY over every ordered column pair
    of orders (the profiling generalization of the single-pair
    fd_violations audit): A -> B holds iff |distinct(A,B)| ==
    |distinct A|, and the violation count |distinct(A,B)| - |distinct
    A| measures how far it fails.  5 single-column + 10 pair distinct
    folds (each a combiner fold + count, integers only); the 20
    ordered verdicts are arithmetic on those 15 numbers."""
    sets = []
    for i, a in enumerate(_FD_COLS):
        sets.append((a,))
        for b_ in _FD_COLS[i + 1:]:
            sets.append((a, b_))

    def explode_sets(batch: pa.Table) -> pa.Table:
        # ONE corpus pass serves all 15 distinct counts: per column
        # set, the batch's distinct value tuples as injectively
        # encoded strings (\x1f never appears in the values).  The
        # encoding is Ray-internal only — the oracle counts its own
        # DISTINCTs, so no cross-engine string parity is needed.
        df = pd.DataFrame({c: batch[c].to_pylist() for c in _FD_COLS})
        for c in _FD_COLS:
            df[c] = df[c].astype(str)
        outs = []
        for si, cols in enumerate(sets):
            u = df[list(cols)].drop_duplicates()
            v = u[cols[0]] if len(cols) == 1 else \
                u[cols[0]] + "\x1f" + u[cols[1]]
            outs.append(pd.DataFrame({
                "sid": np.full(len(u), si, np.int64), "v": v}))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    ex = _read(sf_dir, "orders", _FD_COLS).map_batches(
        explode_sets, batch_format="pyarrow")

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        # (sid, v) keys are near-unique (orderkey sets are row-scale),
        # so a groupby.aggregate would pay the full sort-shuffle
        # pathology; ONE v-keyed cogroup dedups and pre-counts per
        # bucket instead (all copies of a value land together)
        g = df.drop_duplicates(["sid", "v"]).groupby("sid", sort=False) \
            .size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    cnt = pre_aggregate(
        grouped_map(ex, "v", bucket_counts),
        ["sid"], {"n": ("n", "sum")},
    ).to_pandas().set_index("sid")["n"]
    res = {cols: int(cnt[si]) for si, cols in enumerate(sets)}
    d1 = {k[0]: v for k, v in res.items() if len(k) == 1}
    d2 = {k: v for k, v in res.items() if len(k) == 2}
    rows = []
    for a in _FD_COLS:
        for b_ in _FD_COLS:
            if a == b_:
                continue
            dab = d2.get((a, b_)) or d2[(b_, a)]
            v = dab - d1[a]
            rows.append((a, b_, d1[a], dab, v, v == 0))
    rows.sort()
    return pa.table({
        "col_a": pa.array([r[0] for r in rows], pa.string()),
        "col_b": pa.array([r[1] for r in rows], pa.string()),
        "n_distinct_a": pa.array([r[2] for r in rows], pa.int64()),
        "n_distinct_ab": pa.array([r[3] for r in rows], pa.int64()),
        "n_violations": pa.array([r[4] for r in rows], pa.int64()),
        "holds": pa.array([r[5] for r in rows], pa.bool_()),
    })


# ---------------------------------------------------------------------------
# EM-learned Fellegi-Sunter linkage parameters (unsupervised ER)
# ---------------------------------------------------------------------------

_EM_INIT = (0.1, [0.9, 0.9, 0.9], [0.1, 0.1, 0.1])
_EM_ITERS = 2


def _em_step(p, m, u, n):
    """One EM iteration on the 8 agreement-pattern counts.  Every float
    op is written in the EXACT order the generated SQL uses (left-assoc
    products over fields, left-assoc sums in pattern order 0..7) so
    the doubles are bit-identical."""
    gam = []
    for g in range(8):
        mp, up = 1.0, 1.0
        for i in range(3):
            bit = (g >> i) & 1
            mp = mp * (m[i] if bit else 1.0 - m[i])
            up = up * (u[i] if bit else 1.0 - u[i])
        num = p * mp
        gam.append(num / (num + (1.0 - p) * up))
    S = 0.0
    for g in range(8):
        S = S + gam[g] * n[g]
    T = 0
    for g in range(8):
        T = T + n[g]
    def clamp(x):
        # degenerate patterns (a field agreeing in zero pairs) drive
        # m/u to EXACT 0/1 and the next iteration's gamma to 0/0 —
        # clamp identically in both engines
        return min(max(x, 1e-06), 0.999999)

    m2, u2 = [], []
    for i in range(3):
        sm, su = 0.0, 0.0
        for g in range(8):
            if (g >> i) & 1:
                sm = sm + gam[g] * n[g]
                su = su + (1.0 - gam[g]) * n[g]
        m2.append(clamp(sm / S))
        u2.append(clamp(su / (T - S)))
    return clamp(S / T), m2, u2


def _em_sql_level(prev: str | None) -> str:
    """SELECT list for one EM level: expressions mirror _em_step
    exactly.  ``prev`` is None for the literal-init first level, else
    the prior CTE name whose columns (pm, m1..m3, u1..u3) hold the
    params."""
    if prev is None:
        p0, m0, u0 = _EM_INIT
        p = repr(p0)
        m = [repr(x) for x in m0]
        u = [repr(x) for x in u0]
    else:
        p = f"{prev}.pm"
        m = [f"{prev}.m{i + 1}" for i in range(3)]
        u = [f"{prev}.u{i + 1}" for i in range(3)]
    gam = []
    for g in range(8):
        mp, up = "1.0", "1.0"
        for i in range(3):
            bit = (g >> i) & 1
            mt = m[i] if bit else f"(1.0 - {m[i]})"
            ut = u[i] if bit else f"(1.0 - {u[i]})"
            mp = f"({mp} * {mt})"
            up = f"({up} * {ut})"
        num = f"({p} * {mp})"
        gam.append(f"({num} / ({num} + ((1.0 - {p}) * {up})))")
    S = " + ".join(f"{gam[g]} * n{g}" for g in range(8))
    T = " + ".join(f"n{g}" for g in range(8))

    def clamp(expr: str) -> str:
        return f"LEAST(GREATEST({expr}, 1e-06), 0.999999)"

    cols = [f"{clamp(f'(({S}) / ({T}))')} AS pm"]
    for i in range(3):
        sm = " + ".join(f"{gam[g]} * n{g}"
                        for g in range(8) if (g >> i) & 1)
        su = " + ".join(f"(1.0 - {gam[g]}) * n{g}"
                        for g in range(8) if (g >> i) & 1)
        cols.append(f"{clamp(f'(({sm}) / ({S}))')} AS m{i + 1}")
        cols.append(
            f"{clamp(f'(({su}) / (({T}) - ({S})))')} AS u{i + 1}")
    return ", ".join(cols)


def q_customer_linkage_em(sf_dir: str):
    """UNSUPERVISED Fellegi-Sunter parameter learning: candidate
    customer pairs blocked on (nation, segment) compare on three
    fields — 1000-dollar balance band (shift-positive floor), the
    last-2 name digits, custkey mod 10 — and the 8 agreement-pattern
    counts drive 2 fixed EM iterations estimating the match prevalence
    p and per-field m/u probabilities.  The corpus pass is ONE block
    cogroup with per-bucket pattern pre-counts (8-row fold); EM runs
    on those 8 integers with float expression trees generated by the
    SAME code that emits the SQL (left-assoc products and pattern-
    order sums), so the unrolled-CTE oracle is bit-identical."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                  "c_mktsegment"])

    def blockkey(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        names = batch["c_name"].to_pylist()
        return pa.table({
            "blk": pc.binary_join_element_wise(
                pc.cast(batch["c_nationkey"], pa.string()),
                batch["c_mktsegment"], "|"),
            "key": batch["c_custkey"],
            "band": pa.array((cents + 10_000_000) // 100_000),
            "suf": pa.array([s[-2:] for s in names], pa.string()),
            "mod": pa.array(
                batch["c_custkey"].to_numpy(zero_copy_only=False) % 10),
        })

    bk = cust.map_batches(blockkey, batch_format="pyarrow")

    def pair_patterns(df: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(8, np.int64)
        for _, grp in df.groupby("blk", sort=False):
            g = grp.sort_values("key")
            n = len(g)
            if n < 2:
                continue
            iu, iv = np.triu_indices(n, k=1)
            band = g["band"].to_numpy(np.int64)
            suf = g["suf"].to_numpy()
            mod = g["mod"].to_numpy(np.int64)
            pat = ((band[iu] == band[iv]).astype(np.int64)
                   + 2 * (suf[iu] == suf[iv]).astype(np.int64)
                   + 4 * (mod[iu] == mod[iv]).astype(np.int64))
            out += np.bincount(pat, minlength=8)
        return pd.DataFrame({"g": np.arange(8, dtype=np.int64),
                             "n": out})

    cnt = pre_aggregate(
        grouped_map(bk, "blk", pair_patterns), ["g"], {"n": ("n", "sum")},
    ).to_pandas().set_index("g")["n"]
    n = [int(cnt.get(g, 0)) for g in range(8)]
    p, m, u = _EM_INIT
    for _ in range(_EM_ITERS):
        p, m, u = _em_step(p, m, u, n)
    return pa.table({
        **{f"n{g}": pa.array([n[g]], pa.int64()) for g in range(8)},
        "pm": pa.array([float(round_half_up(p, 6))]),
        **{f"m{i + 1}": pa.array([float(round_half_up(m[i], 6))])
           for i in range(3)},
        **{f"u{i + 1}": pa.array([float(round_half_up(u[i], 6))])
           for i in range(3)},
    })


def _linkage_em_sql() -> str:
    lvl1 = _em_sql_level(None)
    lvl2 = _em_sql_level("e1")
    pats = ", ".join(
        f"CAST(COUNT(*) FILTER (pat = {g}) AS BIGINT) AS n{g}"
        for g in range(8))
    final = ("ROUND(e2.pm, 6) AS pm, "
             + ", ".join(f"ROUND(e2.m{i + 1}, 6) AS m{i + 1}"
                         for i in range(3)) + ", "
             + ", ".join(f"ROUND(e2.u{i + 1}, 6) AS u{i + 1}"
                         for i in range(3)))
    return f"""
WITH c AS MATERIALIZED (
  SELECT c_custkey AS key,
         CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS blk,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 10000000) // 100000
           AS band,
         substr(c_name, len(c_name) - 1, 2) AS suf,
         c_custkey % 10 AS md
  FROM customer),
pat AS MATERIALIZED (
  SELECT {pats} FROM (
    SELECT CASE WHEN a.band = b.band THEN 1 ELSE 0 END
           + 2 * (CASE WHEN a.suf = b.suf THEN 1 ELSE 0 END)
           + 4 * (CASE WHEN a.md = b.md THEN 1 ELSE 0 END) AS pat
    FROM c a JOIN c b ON a.blk = b.blk AND a.key < b.key)),
e1 AS (SELECT {lvl1} FROM pat),
e2 AS (SELECT {lvl2} FROM pat, e1)
SELECT pat.*, {final} FROM pat, e2
"""


SQL_CUSTOMER_LINKAGE_EM = _linkage_em_sql()


# ---------------------------------------------------------------------------
# Cramer-von Mises two-sample statistic (L2 drift, exact integers)
# ---------------------------------------------------------------------------


def q_events_cvm(sf_dir: str):
    """Exact two-sample Cramer-von Mises statistic between the click
    and purchase value distributions — the L2 complement of KS (sup)
    and Wasserstein (L1) already in the drift family.  Same
    distinct-cents histogram fold as W1; the integer core is
    t_scaled = sum over pooled values of (cumA*NB - cumB*NA)^2 *
    (nA_v + nB_v), the pooled-weight L2 form; the classic normalized
    T = t_scaled / (NA*NB*(NA+NB)^2 ... ) is left as the single final
    division with identical operands.  Valid while NA^2*NB^2*(NA+NB)
    < 2^63 x granularity — at larger scales keep the scaled integer
    (it is the hash-checked value anyway)."""
    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'")

    def vals(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"v": c, "a": (t == "click").astype(np.int64),
                           "b": (t == "purchase").astype(np.int64)})
        g = df.groupby("v", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = pre_aggregate(
        ev.map_batches(vals, batch_format="pyarrow"),
        ["v"], {"a": ("a", "sum"), "b": ("b", "sum")},
    ).to_pandas().sort_values("v", ignore_index=True)
    na_v = g["a"].to_numpy(np.int64)
    nb_v = g["b"].to_numpy(np.int64)
    ca = np.cumsum(na_v)
    cb = np.cumsum(nb_v)
    na, nb = int(ca[-1]), int(cb[-1])
    d = ca * nb - cb * na
    # python ints: d^2 * weight sums exceed int64 at sf0.1
    t_scaled = int(sum(int(x) * int(x) * int(w)
                       for x, w in zip(d, na_v + nb_v)))
    n = na + nb
    return pa.table({
        "n_click": pa.array([na], pa.int64()),
        "n_purchase": pa.array([nb], pa.int64()),
        "t_scaled": pa.array([str(t_scaled)], pa.string()),
        "cvm_t": pa.array(
            # float() FIRST: the oracle CASTs the HUGEINT to DOUBLE
            # before dividing; python's exact-int true division would
            # round differently in the last ulp
            [float(round_half_up(
                float(t_scaled) / (na * nb) / (na * nb) / n, 6))],
            pa.float64()),
    })


SQL_EVENTS_CVM = """
WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type AS t
           FROM events WHERE event_type IN ('click', 'purchase')),
g AS (SELECT v,
             CAST(SUM(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM e GROUP BY 1),
c AS (SELECT v, a, b, SUM(a) OVER (ORDER BY v) AS ca,
             SUM(b) OVER (ORDER BY v) AS cb
      FROM g),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM g),
w AS (SELECT SUM((ca * t.nb - cb * t.na) * (ca * t.nb - cb * t.na)
                 * (a + b)) AS ts
      FROM c, t)
SELECT t.na AS n_click, t.nb AS n_purchase,
       CAST(w.ts AS VARCHAR) AS t_scaled,
       ROUND(CAST(w.ts AS DOUBLE) / (t.na * t.nb) / (t.na * t.nb)
             / (t.na + t.nb), 6) AS cvm_t
FROM w, t
"""


# ---------------------------------------------------------------------------
# Markov next-event prediction accuracy (sequence-model train/eval)
# ---------------------------------------------------------------------------


def q_events_markov_acc(sf_dir: str):
    """First-order Markov next-event model TRAINED on the md5 < '8'
    user split and EVALUATED on the rest: prediction for state a is
    the argmax transition count (ties to the lexicographically
    smallest target), accuracy is the share of held-out consecutive
    pairs the argmax gets right.  One user cogroup emits consecutive
    (from, to) pairs with the split flag; everything after is a
    |types|^2-row fold + integer arithmetic.  States unseen in
    training drop from the eval on both sides (inner join
    semantics)."""
    from kgray.ops.sample import _md5_hex

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)
        nxt = g["event_type"].shift(-1)
        keep = nxt.notna()
        users = df["user_id"].to_numpy()[keep.to_numpy()]
        out = pd.DataFrame({
            "a": df["event_type"].to_numpy()[keep.to_numpy()],
            "b": nxt[keep].to_numpy(),
            "train": pd.Series(
                [h < "8" for h in _md5_hex(users.tolist())]),
        })
        r = out.groupby(["train", "a", "b"], sort=False).size() \
            .reset_index(name="n")
        r["n"] = r["n"].astype(np.int64)
        return r

    cnt = pre_aggregate(
        grouped_map(ev, "user_id", pairs),
        ["train", "a", "b"], {"n": ("n", "sum")},
    ).to_pandas()  # <= 2 * |types|^2 rows
    tr = cnt[cnt["train"]]
    te = cnt[~cnt["train"]]
    pred = {}
    for a, grp in tr.groupby("a"):
        g = grp.sort_values(["n", "b"], ascending=[False, True],
                            kind="mergesort")
        pred[a] = g["b"].iloc[0]
    rows = []
    for a in sorted(pred):
        sub = te[te["a"] == a]
        n_test = int(sub["n"].sum())
        if n_test == 0:
            continue
        n_ok = int(sub.loc[sub["b"] == pred[a], "n"].sum())
        rows.append((a, pred[a], n_test, n_ok,
                     float(round_half_up(n_ok / n_test, 6))))
    return pa.table({
        "state": pa.array([r[0] for r in rows], pa.string()),
        "predicted": pa.array([r[1] for r in rows], pa.string()),
        "n_test": pa.array([r[2] for r in rows], pa.int64()),
        "n_correct": pa.array([r[3] for r in rows], pa.int64()),
        "acc": pa.array([r[4] for r in rows], pa.float64()),
    })


SQL_EVENTS_MARKOV_ACC = """
WITH s AS (SELECT user_id, event_type AS a,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS b,
                  md5(CAST(user_id AS VARCHAR)) < '8' AS train
           FROM events),
p AS (SELECT train, a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE b IS NOT NULL GROUP BY 1, 2, 3),
pr AS (SELECT a, b AS predicted FROM (
         SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a
                        ORDER BY n DESC, b) AS rn
         FROM p WHERE train) WHERE rn = 1),
ev AS (SELECT a, CAST(SUM(n) AS BIGINT) AS n_test,
              CAST(SUM(CASE WHEN b = pr.predicted THEN n ELSE 0 END)
                   AS BIGINT) AS n_correct,
              MIN(pr.predicted) AS predicted
       FROM p JOIN pr USING (a) WHERE NOT train GROUP BY a)
SELECT a AS state, predicted, n_test, n_correct,
       ROUND(CAST(n_correct AS DOUBLE) / n_test, 6) AS acc
FROM ev ORDER BY state
"""


# ---------------------------------------------------------------------------
# Bradley-Terry strengths from pairwise precedence outcomes
# ---------------------------------------------------------------------------

_BT_SLOTS = 6
_BT_ITERS = 2


def _bt_step(w, n):
    """One MM iteration of Bradley-Terry on the slot-pivoted win
    matrix n[i][j] (i beat j), guard-zeroed for absent slots; the
    float ops mirror the generated SQL exactly (CASE guards included,
    left-assoc sums in slot order)."""
    K = _BT_SLOTS
    w2 = []
    for i in range(K):
        W = 0
        for j in range(K):
            W = W + n[i][j]
        den = 0.0
        for j in range(K):
            if j == i:
                continue
            tot = n[i][j] + n[j][i]
            den = den + (tot / (w[i] + w[j]) if tot > 0 else 0.0)
        w2.append(W / den if den > 0.0 else 0.0)
    Z = 0.0
    for i in range(K):
        Z = Z + w2[i]
    return [wi / Z if Z > 0.0 else 0.0 for wi in w2]


def _bt_sql_level(prev: str | None) -> str:
    K = _BT_SLOTS
    if prev is None:
        w = ["1.0"] * K
    else:
        w = [f"{prev}.w{i}" for i in range(K)]
    raw = []
    for i in range(K):
        W = " + ".join(f"n{i}_{j}" for j in range(K))
        terms = []
        for j in range(K):
            if j == i:
                continue
            tot = f"(n{i}_{j} + n{j}_{i})"
            terms.append(
                f"(CASE WHEN {tot} > 0 THEN CAST({tot} AS DOUBLE)"
                f" / ({w[i]} + {w[j]}) ELSE 0.0 END)")
        den = " + ".join(terms)
        raw.append(f"(CASE WHEN ({den}) > 0.0 THEN ({W}) / ({den})"
                   " ELSE 0.0 END)")
    Z = " + ".join(raw)
    cols = [
        f"(CASE WHEN ({Z}) > 0.0 THEN {raw[i]} / ({Z}) ELSE 0.0 END)"
        f" AS w{i}" for i in range(K)
    ]
    return ", ".join(cols)


def q_events_bradley_terry(sf_dir: str):
    """Bradley-Terry strength ranking of event types from pairwise
    PRECEDENCE outcomes: type i 'beats' j for a user when the user's
    first i-event strictly precedes their first j-event; 2 fixed MM
    iterations turn the win matrix into normalized strengths.  Types
    rank-pivot into 6 slots alphabetically (absent slots are
    guard-zeroed CASEs so sparse fixtures can't divide by zero — the
    linkage-EM clamp lesson as structure), and the float recurrence is
    emitted by the SAME generator as the SQL.  The corpus pass is the
    eventually-follows (user, type) first-time fold; everything after
    is |types|^2 integers."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "t": batch["event_type"],
            "us": pc.cast(batch["ts"], pa.int64()),
        })

    fl = pre_aggregate(
        ev.map_batches(to_us, batch_format="pyarrow"),
        ["user_id", "t"], {"f": ("us", "min")},
    )

    def wins(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
        m = m[(m["t_a"] != m["t_b"]) & (m["f_a"] < m["f_b"])]
        g = m.groupby(["t_a", "t_b"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    cnt = pre_aggregate(
        grouped_map(fl, "user_id", wins),
        ["t_a", "t_b"], {"n": ("n", "sum")},
    ).to_pandas()
    types = sorted(set(cnt["t_a"]) | set(cnt["t_b"]))
    assert len(types) <= _BT_SLOTS, "rank pivot supports <= 6 types"
    idx = {t: i for i, t in enumerate(types)}
    n = [[0] * _BT_SLOTS for _ in range(_BT_SLOTS)]
    for r in cnt.itertuples():
        n[idx[r.t_a]][idx[r.t_b]] = int(r.n)
    w = [1.0] * _BT_SLOTS
    for _ in range(_BT_ITERS):
        w = _bt_step(w, n)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "strength": pa.array(
            [float(round_half_up(w[idx[t]], 6)) for t in types],
            pa.float64()),
    })


def _bt_sql() -> str:
    K = _BT_SLOTS
    pats = ", ".join(
        f"CAST(COALESCE(SUM(n) FILTER (ri = {i} AND rj = {j}), 0)"
        f" AS BIGINT) AS n{i}_{j}"
        for i in range(K) for j in range(K))
    lvls = []
    prev = None
    for it in range(1, _BT_ITERS + 1):
        lvls.append(f"b{it} AS (SELECT {_bt_sql_level(prev)} FROM nm"
                    + (f", {prev}" if prev else "") + ")")
        prev = f"b{it}"
    w_case = " ".join(f"WHEN {i} THEN b{_BT_ITERS}.w{i}"
                      for i in range(K))
    return f"""
WITH f AS (SELECT user_id, event_type AS t, epoch_us(MIN(ts)) AS fu
           FROM events GROUP BY 1, 2),
ty AS (SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY t) - 1 AS BIGINT)
              AS r
       FROM (SELECT DISTINCT t FROM f)),
wn AS (SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS n
       FROM f a JOIN f b ON a.user_id = b.user_id AND a.t <> b.t
                AND a.fu < b.fu
       GROUP BY 1, 2),
nm AS (SELECT {pats} FROM wn
       JOIN ty x ON wn.ta = x.t JOIN ty y ON wn.tb = y.t,
       LATERAL (SELECT x.r AS ri, y.r AS rj) l),
{", ".join(lvls)}
SELECT ty.t AS event_type,
       ROUND(CASE ty.r {w_case} END, 6) AS strength
FROM ty, b{_BT_ITERS} ORDER BY 1
"""


SQL_EVENTS_BRADLEY_TERRY = _bt_sql()


# ---------------------------------------------------------------------------
# Keyless band self-join: near-identical order totals
# ---------------------------------------------------------------------------


def q_orders_price_twins(sf_dir: str):
    """Order pairs whose totals differ by <= 5 cents
    (joins.band_self_join — the keyless |a-b| <= d theta-join via
    width-delta bucket replication; the naive SQL BETWEEN form
    nested-loops for minutes, so the oracle uses the same rewrite),
    aggregated to per-$1000-band pair counts and total absolute gap.
    Integer cents end-to-end."""
    from kgray.ops.joins import band_self_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        return pa.table({"k": batch["o_orderkey"], "c": pa.array(c)})

    pairs = band_self_join(
        orders.map_batches(cents, batch_format="pyarrow"),
        id_col="k", value_col="c", delta=5)

    def bands(batch: pa.Table) -> pa.Table:
        return pa.table({
            "band": pc.divide(batch["vmin"], pa.scalar(100_000,
                                                       pa.int64())),
            "d": batch["d"],
        })

    out = pre_aggregate(
        pairs.map_batches(bands, batch_format="pyarrow"),
        ["band"], {"n_pairs": (None, "count"), "gap_c": ("d", "sum")},
    ).materialize()
    if out.count() == 0:
        # typed empty: sparse corpora can genuinely have no twin pairs
        # and a schema-less empty dataset can't be compared
        return pa.table({"band": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64()),
                         "gap_c": pa.array([], pa.int64())})
    return out


SQL_ORDERS_PRICE_TWINS = """
WITH o AS (SELECT o_orderkey AS k,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
rep AS (SELECT k, c, c // 5 AS nb, c // 5 + g.g AS g
        FROM o, (VALUES (0), (1)) g(g)),
pr AS (SELECT LEAST(a.c, b.c) AS vmin, abs(a.c - b.c) AS d
       FROM rep a JOIN rep b ON a.g = b.g AND a.k < b.k
       WHERE abs(a.c - b.c) <= 5 AND GREATEST(a.nb, b.nb) = a.g)
SELECT vmin // 100000 AS band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(d) AS BIGINT) AS gap_c
FROM pr GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Integer-exact MMR (maximal marginal relevance) diversity re-ranking
# ---------------------------------------------------------------------------

_MMR_K = 5


def _q127(m: np.ndarray) -> np.ndarray:
    """floor(x*127 + 0.5) on float64 — the pinned quantize grid; dot
    products of these integer-valued vectors stay < 2^53, so their
    sums are EXACT in any engine and any summation order."""
    return np.floor(m.astype(np.float64) * 127.0 + 0.5)


def q_embed_mmr(sf_dir: str):
    """Maximal-marginal-relevance top-5 for query vec 0: pick k =
    argmax of 2*rel(x) - max_{s in picked} sim(x, s) (lambda = 2/3 as
    the integer combo 2*rel - maxsim; the first pick is pure rel) —
    the diversity-aware re-ranking every RAG stack bolts onto ANN.
    Iterative float argmax over raw cosines would flip on ulps, so
    similarities are integer dot products on the floor(x*127 + 0.5)
    grid (order-exact even through float accumulation).  Each round is
    one broadcast-selected-set scan with batch-local argmax
    (greedy-cover shape); the oracle unrolls K selection levels."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def fetch_q(vid: int) -> np.ndarray:
        t = emb.filter(expr=f"vec_id == {vid}") \
            .take_batch(1, batch_format="pyarrow")
        return _q127(_matrix(t, "embedding"))[0]

    qv = fetch_q(0)
    picked: list[tuple[int, int]] = []  # (vec_id, score)
    sel_vecs: list[np.ndarray] = []
    for _ in range(_MMR_K):
        sel = np.array(sel_vecs) if sel_vecs else None
        pids = [p for p, _ in picked]

        def best(batch: pa.Table) -> pa.Table:
            m = _q127(_matrix(batch, "embedding"))
            vid = batch["vec_id"].to_numpy(zero_copy_only=False)
            keep = vid != 0
            for p in pids:
                keep &= vid != p
            if not keep.any():
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.int64())})
            m = m[keep]
            vid = vid[keep]
            rel = (m @ qv).astype(np.int64)
            if sel is None:
                score = rel
            else:
                score = 2 * rel - (m @ sel.T).max(axis=1).astype(
                    np.int64)
            i = np.lexsort((vid, -score))[0]
            return pa.table({"vec_id": pa.array([int(vid[i])]),
                             "score": pa.array([int(score[i])])})

        cands = emb.map_batches(
            best, batch_format="pyarrow").to_pandas()  # batches-scale
        cands = cands.sort_values(["score", "vec_id"],
                                  ascending=[False, True],
                                  kind="mergesort")
        win = int(cands["vec_id"].iloc[0])
        picked.append((win, int(cands["score"].iloc[0])))
        sel_vecs.append(fetch_q(win))
    return pa.table({
        "rank": pa.array(range(1, _MMR_K + 1), pa.int64()),
        "vec_id": pa.array([p for p, _ in picked], pa.int64()),
        "score": pa.array([s for _, s in picked], pa.int64()),
    })


def _mmr_sql(k: int = _MMR_K) -> str:
    ctes = [
        """e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) * 127 + 0.5)) AS q
  FROM embeddings)""",
        """r AS MATERIALIZED (
  SELECT vec_id, e.q,
         list_dot_product(e.q, (SELECT q FROM e WHERE vec_id = 0))
           AS rel
  FROM e WHERE vec_id <> 0)""",
        """p1 AS MATERIALIZED (
  SELECT vec_id, q, rel, rel AS sc FROM r
  ORDER BY rel DESC, vec_id LIMIT 1)""",
    ]
    for i in range(2, k + 1):
        excl = " UNION ALL ".join(
            f"SELECT vec_id FROM p{j}" for j in range(1, i))
        sims = ", ".join(
            f"list_dot_product(r.q, (SELECT q FROM p{j}))"
            for j in range(1, i))
        mx = sims if i == 2 else f"GREATEST({sims})"
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT vec_id, q, rel, 2 * rel - {mx} AS sc FROM r
  WHERE vec_id NOT IN ({excl})
  ORDER BY sc DESC, vec_id LIMIT 1)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id,"
        f" CAST(sc AS BIGINT) AS score FROM p{i}"
        for i in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel + "\nORDER BY rank"


SQL_EMBED_MMR = _mmr_sql()


# ---------------------------------------------------------------------------
# Facility-location (coverage) selection over embeddings
# ---------------------------------------------------------------------------

_FL_K = 5
_FL_CANDS = 50


def q_embed_facility_loc(sf_dir: str):
    """Facility-location data selection: from the 50-candidate pool
    (vec_id < 50) greedily pick 5 representatives maximizing the
    corpus coverage objective sum_x max_{s in S} sim(x, s) — the
    coreset-selection twin of docs_greedy_cover with geometric
    coverage instead of vocabulary.  Similarities are int8-grid dot
    products (order-exact integer sums, the MMR trick), so the greedy
    argmax never flips on ulps.  Each round is ONE corpus scan with
    the candidate matrix broadcast (per-batch partial gain sums per
    candidate — a 50-float... 50-INTEGER fold); coverage is recomputed
    from the <= 5 selected vectors instead of carrying per-row state.
    The oracle unrolls K greedy levels over the same integer sums."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    cand_t = emb.filter(expr=f"vec_id < {_FL_CANDS}") \
        .take_batch(_FL_CANDS, batch_format="pyarrow")
    cand_ids = np.asarray(cand_t["vec_id"].to_numpy(
        zero_copy_only=False), np.int64)
    order = np.argsort(cand_ids)
    cand_ids = cand_ids[order]
    C = _q127(_matrix(cand_t, "embedding"))[order]  # (50, d)

    picked: list[int] = []
    gains: list[int] = []
    for _ in range(_FL_K):
        sel = C[[int(np.searchsorted(cand_ids, p)) for p in picked]] \
            if picked else None

        def partial(batch: pa.Table) -> pa.Table:
            m = _q127(_matrix(batch, "embedding"))
            dots = (m @ C.T).astype(np.int64)  # (rows, 50)
            if sel is None:
                cov = np.zeros(len(m), np.int64)
            else:
                # empty-set coverage is 0 and stays a floor (the
                # standard monotone submodular form; without it a
                # negative-similarity facility would LOWER coverage)
                cov = np.maximum(
                    (m @ sel.T).max(axis=1).astype(np.int64), 0)
            tot = np.maximum(dots, cov[:, None]).sum(axis=0)
            base = int(cov.sum())
            return pa.table({
                "ci": pa.array(np.arange(_FL_CANDS, dtype=np.int64)),
                "s": pa.array(tot.astype(np.int64)),
                "b": pa.array(np.full(_FL_CANDS, base, np.int64)),
            })

        agg = pre_aggregate(
            emb.map_batches(partial, batch_format="pyarrow"),
            ["ci"], {"s": ("s", "sum"), "b": ("b", "sum")},
        ).to_pandas().sort_values("ci", ignore_index=True)
        gain = (agg["s"] - agg["b"]).to_numpy(np.int64)
        free = ~np.isin(cand_ids, np.array(picked, np.int64))
        g_f, id_f = gain[free], cand_ids[free]
        # NB -gain on a sentinel int64.min wraps back to int64.min —
        # filter picked candidates out instead of masking
        i = int(np.lexsort((id_f, -g_f))[0])
        picked.append(int(id_f[i]))
        gains.append(int(g_f[i]))
    return pa.table({
        "rank": pa.array(range(1, _FL_K + 1), pa.int64()),
        "vec_id": pa.array(picked, pa.int64()),
        "gain": pa.array(gains, pa.int64()),
    })


def _fl_sql(k: int = _FL_K) -> str:
    ctes = [
        """e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) * 127 + 0.5)) AS q
  FROM embeddings)""",
        f"cand AS MATERIALIZED (SELECT vec_id, q FROM e"
        f" WHERE vec_id < {_FL_CANDS})",
        """d AS MATERIALIZED (
  SELECT e.vec_id AS x, cand.vec_id AS c,
         CAST(list_dot_product(e.q, cand.q) AS BIGINT) AS s
  FROM e, cand)""",
        "cov0 AS (SELECT vec_id AS x, CAST(0 AS BIGINT) AS cv FROM e)",
    ]
    for i in range(1, k + 1):
        p = i - 1
        excl = ("" if i == 1 else
                " WHERE d.c NOT IN (" + " UNION ALL ".join(
                    f"SELECT c FROM p{j}" for j in range(1, i)) + ")")
        ctes.append(
            f"""g{i} AS (SELECT d.c,
       CAST(SUM(GREATEST(d.s, cov{p}.cv) - cov{p}.cv) AS BIGINT)
         AS gain
       FROM d JOIN cov{p} ON d.x = cov{p}.x{excl} GROUP BY 1)""")
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT c, gain FROM g{i}"
            " ORDER BY gain DESC, c LIMIT 1)")
        ctes.append(
            f"""cov{i} AS MATERIALIZED (
  SELECT cov{p}.x, GREATEST(cov{p}.cv, d.s) AS cv
  FROM cov{p} JOIN d ON d.x = cov{p}.x
  JOIN p{i} ON d.c = p{i}.c)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, c AS vec_id, gain"
        f" FROM p{i}" for i in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel + "\nORDER BY rank"


SQL_EMBED_FACILITY_LOC = _fl_sql()


# ---------------------------------------------------------------------------
# Entropic optimal transport (Sinkhorn) between value-band histograms
# ---------------------------------------------------------------------------

_SK_B = 8
_SK_ITERS = 2


def _sk_step(u, v, a, b, K):
    """One Sinkhorn iteration, float ops in generator order: u_i =
    a_i / sum_j K_ij v_j (left fold over j), then v_j = b_j /
    sum_i K_ij u_i with the FRESH u."""
    B = _SK_B
    u2 = []
    for i in range(B):
        s = 0.0
        for j in range(B):
            s = s + K[i][j] * v[j]
        u2.append(a[i] / s)
    v2 = []
    for j in range(B):
        s = 0.0
        for i in range(B):
            s = s + K[i][j] * u2[i]
        v2.append(b[j] / s)
    return u2, v2


def q_events_sinkhorn(sf_dir: str):
    """Entropic optimal transport between the click and purchase
    $50-band value histograms: 2 Sinkhorn iterations on the 8x8
    kernel K_ij = exp(-|i-j|) (epsilon = 1), reporting the resulting
    transport-plan cost sum_ij u_i K_ij v_j |i-j| — the computational
    OT face next to the closed-form W1.  Band masses are identical
    integer divisions; every exp is the SAME libm call in both
    engines (the time-decay lesson) and every cross-band sum an
    explicit left fold emitted by the shared generator (_sk_step ==
    the generated SQL level by level)."""
    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'")

    def bands(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        band = np.minimum(c // 5000, _SK_B - 1)
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"band": band,
                           "a": (t == "click").astype(np.int64),
                           "b": (t == "purchase").astype(np.int64)})
        g = df.groupby("band", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = pre_aggregate(
        ev.map_batches(bands, batch_format="pyarrow"),
        ["band"], {"a": ("a", "sum"), "b": ("b", "sum")},
    ).to_pandas().set_index("band")
    na_v = [int(g["a"].get(i, 0)) for i in range(_SK_B)]
    nb_v = [int(g["b"].get(i, 0)) for i in range(_SK_B)]
    NA, NB = sum(na_v), sum(nb_v)
    a = [n / NA for n in na_v]
    b = [n / NB for n in nb_v]
    K = [[math.exp(-abs(i - j)) for j in range(_SK_B)]
         for i in range(_SK_B)]
    u = [1.0] * _SK_B
    v = [1.0] * _SK_B
    for _ in range(_SK_ITERS):
        u, v = _sk_step(u, v, a, b, K)
    cost = 0.0
    for i in range(_SK_B):
        for j in range(_SK_B):
            cost = cost + u[i] * K[i][j] * v[j] * abs(i - j)
    return pa.table({
        "n_click": pa.array([NA], pa.int64()),
        "n_purchase": pa.array([NB], pa.int64()),
        "sinkhorn_cost": pa.array(
            [float(round_half_up(cost, 6))], pa.float64()),
        **{f"u{i}": pa.array([float(round_half_up(u[i], 6))])
           for i in range(_SK_B)},
    })


def _sk_sql() -> str:
    B = _SK_B

    def K(i, j):
        return f"exp(CAST({-abs(i - j)} AS DOUBLE))"

    # histogram CTE pivots band masses into a0..a7 / b0..b7 columns
    hist = ", ".join(
        f"CAST(COALESCE(SUM(a) FILTER (band = {i}), 0) AS BIGINT)"
        f" AS na{i}, "
        f"CAST(COALESCE(SUM(b) FILTER (band = {i}), 0) AS BIGINT)"
        f" AS nb{i}"
        for i in range(B))
    tot_a = " + ".join(f"na{i}" for i in range(B))
    tot_b = " + ".join(f"nb{i}" for i in range(B))
    probs = ", ".join(
        f"CAST(na{i} AS DOUBLE) / ({tot_a}) AS a{i}, "
        f"CAST(nb{i} AS DOUBLE) / ({tot_b}) AS b{i}"
        for i in range(B))
    lvls = []
    u = ["1.0"] * B
    v = ["1.0"] * B
    for it in range(1, _SK_ITERS + 1):
        prev = f"s{it - 1}" if it > 1 else "pr"
        un = []
        for i in range(B):
            s = " + ".join(f"{K(i, j)} * {v[j]}" for j in range(B))
            un.append(f"(pr.a{i} / ({s}))")
        vn = []
        for j in range(B):
            s = " + ".join(f"{K(i, j)} * {un[i]}" for i in range(B))
            vn.append(f"(pr.b{j} / ({s}))")
        cols = (", ".join(f"{un[i]} AS u{i}" for i in range(B)) + ", "
                + ", ".join(f"{vn[j]} AS v{j}" for j in range(B)))
        lvls.append(f"s{it} AS (SELECT {cols} FROM pr"
                    + (f", s{it - 1}" if it > 1 else "") + ")")
        u = [f"s{it}.u{i}" for i in range(B)]
        v = [f"s{it}.v{j}" for j in range(B)]
    cost = " + ".join(
        f"{u[i]} * {K(i, j)} * {v[j]} * {abs(i - j)}"
        for i in range(B) for j in range(B) if i != j)
    outs = ", ".join(f"ROUND({u[i]}, 6) AS u{i}" for i in range(B))
    return f"""
WITH e AS (SELECT LEAST(CAST(round(value * 100) AS BIGINT) // 5000,
                        {B - 1}) AS band,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS b
           FROM events WHERE event_type IN ('click', 'purchase')),
h AS (SELECT {hist} FROM e),
pr AS (SELECT h.*, {probs} FROM h),
{", ".join(lvls)}
SELECT ({tot_a}) AS n_click, ({tot_b}) AS n_purchase,
       ROUND({cost}, 6) AS sinkhorn_cost, {outs}
FROM pr, s{_SK_ITERS}
"""


SQL_EVENTS_SINKHORN = _sk_sql()


# ---------------------------------------------------------------------------
# AR(1) fit per event type (Yule-Walker on exact integer moments)
# ---------------------------------------------------------------------------


def q_events_ar1(sf_dir: str):
    """AR(1) coefficient of each type's daily cents series by
    Yule-Walker: phi = lag-1 autocovariance / variance, both computed
    from EXACT integer moments over the gap-filled day grid (sum x,
    sum x^2, sum x_t*x_{t-1}, n — the raw-moment discipline from
    Welch t).  One (type, day) fold; the lag pairing and the final two
    divisions run on the days-scale series with identical operands in
    both engines."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def day_cents(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({"t": batch["event_type"],
                         "day": pa.array(us // 86_400_000_000),
                         "c": pa.array(c)})

    g = pre_aggregate(
        ev.map_batches(day_cents, batch_format="pyarrow"),
        ["t", "day"], {"x": ("c", "sum")},
    ).to_pandas()  # (types x days)-scale
    lo, hi = int(g["day"].min()), int(g["day"].max())
    n_days = hi - lo + 1
    rows = []
    for t, grp in sorted(g.groupby("t")):
        x = np.zeros(n_days, np.int64)
        x[grp["day"].to_numpy(np.int64) - lo] = \
            grp["x"].to_numpy(np.int64)
        n = n_days - 1  # lag pairs
        sx = int(x[:-1].sum())
        sy = int(x[1:].sum())
        sxx = int((x[:-1].astype(object) ** 2).sum())
        sxy = int((x[:-1].astype(object) * x[1:].astype(object)).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        # float() each side first: moments can exceed 2^53 and the
        # oracle CASTs to DOUBLE before dividing (the CvM lesson)
        rows.append((t, n, float(round_half_up(
            float(num) / float(den), 6))))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "phi": pa.array([r[2] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Weekly periodogram power (frequency-domain seasonality detection)
# ---------------------------------------------------------------------------


def q_events_weekly_power(sf_dir: str):
    """Spectral power of each type's daily cents series at the weekly
    frequency — the periodogram face of seasonality detection:
    P = (sum_t x_t cos(2*pi*t/7))^2 + (sin...)^2.  A direct float sum
    over thousands of days is summation-order-sensitive, so the series
    folds to SEVEN exact integer residue-class sums S_r (t mod 7)
    first and the trig mixing is a 7-term explicit left fold of
    cos(2*pi*r/7) * S_r — identical libm calls and fold order in both
    engines."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({"t": batch["event_type"],
                         "r": pa.array((us // 86_400_000_000) % 7),
                         "c": pa.array(c)})

    g = pre_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["t", "r"], {"s": ("c", "sum")},
    ).to_pandas()  # |types| x 7 rows
    rows = []
    for t, grp in sorted(g.groupby("t")):
        S = [0] * 7
        for rr in grp.itertuples():
            S[int(rr.r)] = int(rr.s)
        cr = 0.0
        si = 0.0
        tot = 0
        for r in range(7):
            ang = 2.0 * math.pi * r / 7.0
            cr = cr + math.cos(ang) * S[r]
            si = si + math.sin(ang) * S[r]
            tot = tot + S[r]
        power = cr * cr + si * si
        # normalize by total^2: the raw power's 4-decimal round sits
        # past double precision at ~1e11 magnitude (measured one-ulp
        # flip); the O(1e-3) amplitude share rounds cleanly
        rows.append((t, tot,
                     float(round_half_up(power / (tot * tot), 6))))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "total_c": pa.array([r[1] for r in rows], pa.int64()),
        "weekly_amp2": pa.array([r[2] for r in rows], pa.float64()),
    })


def _weekly_power_sql() -> str:
    cr = " + ".join(
        f"cos(2.0 * pi() * {r} / 7.0) * s{r}" for r in range(7))
    si = " + ".join(
        f"sin(2.0 * pi() * {r} / 7.0) * s{r}" for r in range(7))
    tot = " + ".join(f"s{r}" for r in range(7))
    pats = ", ".join(
        f"CAST(COALESCE(SUM(c) FILTER (r = {r}), 0) AS BIGINT) AS s{r}"
        for r in range(7))
    return f"""
WITH e AS (SELECT event_type AS t,
                  (epoch_us(ts) // 86400000000) % 7 AS r,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
p AS (SELECT t, {pats} FROM e GROUP BY 1)
SELECT t AS event_type, CAST({tot} AS BIGINT) AS total_c,
       ROUND((({cr}) * ({cr}) + ({si}) * ({si}))
             / (CAST({tot} AS DOUBLE) * ({tot})), 6) AS weekly_amp2
FROM p ORDER BY 1
"""


SQL_EVENTS_WEEKLY_POWER = _weekly_power_sql()


# ---------------------------------------------------------------------------
# Regression discontinuity (local linear, integer-Cramer both sides)
# ---------------------------------------------------------------------------

def q_events_rdd(sf_dir: str):
    """Sharp regression discontinuity at the cents-range MIDPOINT
    (scale-invariant — a fixed dollar cutoff empties one side on
    narrow distributions): fit the error rate linearly in centered
    cents on EACH side within a quarter-range bandwidth and report the
    intercept jump at the cutoff — the fourth corner of the causal
    quartet (DiD, PSM, Qini, RDD).  Per-side OLS uses the
    integer-Cramer moment fold (events_ols2): 5 int64 moments per
    side, exact integer determinants, float-FIRST divisions
    (numerators pass 2^53 at scale, the CvM rule).  jump = a_R - a_L
    of identical-operand divisions."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents_col(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({"g": pa.array(np.zeros(len(batch), np.int8)),
                         "c": pa.array(c)})

    bounds = pre_aggregate(
        ev.map_batches(cents_col, batch_format="pyarrow"), ["g"],
        {"lo": ("c", "min"), "hi": ("c", "max")},
    ).to_pandas()
    lo, hi = int(bounds["lo"][0]), int(bounds["hi"][0])
    cut = lo + (hi - lo) // 2
    bw = (hi - lo) // 4

    def partial(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        x = c - cut
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        y = (t == "error").astype(np.int64)
        keep = (x >= -bw) & (x <= bw)
        x, y = x[keep], y[keep]
        side = (x >= 0).astype(np.int64)
        df = pd.DataFrame({"side": side, "n": 1, "sx": x,
                           "sxx": x * x, "sy": y, "sxy": x * y})
        g = df.groupby("side", sort=False).sum().reset_index()
        for col in g.columns:
            g[col] = g[col].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    m = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["side"], {k: (k, "sum")
                   for k in ["n", "sx", "sxx", "sy", "sxy"]},
    ).to_pandas().set_index("side")

    def fit(s):
        r = m.loc[s]
        n, sx, sxx, sy, sxy = (int(r["n"]), int(r["sx"]),
                               int(r["sxx"]), int(r["sy"]),
                               int(r["sxy"]))
        den = n * sxx - sx * sx
        a = float(sy * sxx - sx * sxy) / float(den)
        b = float(n * sxy - sx * sy) / float(den)
        return n, a, b

    nl, al, bl = fit(0)
    nr, ar, br = fit(1)
    return pa.table({
        "n_left": pa.array([nl], pa.int64()),
        "n_right": pa.array([nr], pa.int64()),
        "a_left": pa.array([float(round_half_up(al, 6))]),
        "b_left": pa.array([float(round_half_up(bl, 6))]),
        "a_right": pa.array([float(round_half_up(ar, 6))]),
        "b_right": pa.array([float(round_half_up(br, 6))]),
        "jump": pa.array([float(round_half_up(ar - al, 6))]),
    })


SQL_EVENTS_RDD = """
WITH c0 AS (SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                     AS y
            FROM events),
b AS (SELECT MIN(c) + (MAX(c) - MIN(c)) // 2 AS cut,
             (MAX(c) - MIN(c)) // 4 AS bw FROM c0),
e AS (SELECT c - b.cut AS x, y FROM c0, b),
w AS (SELECT x, y, CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side
      FROM e, b WHERE x BETWEEN -b.bw AND b.bw),
m AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM w GROUP BY 1),
f AS (SELECT side, n,
             CAST(sy * sxx - sx * sxy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS a,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS b
      FROM m)
SELECT l.n AS n_left, r.n AS n_right,
       ROUND(l.a, 6) AS a_left, ROUND(l.b, 6) AS b_left,
       ROUND(r.a, 6) AS a_right, ROUND(r.b, 6) AS b_right,
       ROUND(r.a - l.a, 6) AS jump
FROM f l, f r WHERE l.side = 0 AND r.side = 1
"""


# ---------------------------------------------------------------------------
# Burstiness + memory of inter-arrival times (Goh-Barabasi)
# ---------------------------------------------------------------------------


def q_events_burstiness(sf_dir: str):
    """Goh-Barabasi temporal dynamics per event type: burstiness
    B = (sigma - mu)/(sigma + mu) of the per-(user, type)
    inter-arrival times and memory M = Pearson correlation of
    consecutive inter-arrivals — the human-dynamics signature pair.
    Inter-arrivals quantize to whole MINUTES so every raw moment fits
    int64 (microsecond squares would need 128-bit); one user cogroup
    emits 9 integer moment partials per type, and the driver applies
    the identical float-first formula trees the SQL uses (each HUGEINT
    moment CASTs to DOUBLE before any arithmetic — the CvM rule).
    Degenerate types (zero variance) emit NULL on both sides."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts",
                                  "event_id"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        df["us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        g = df.groupby(["user_id", "event_type"], sort=False)
        d = (df["us"] - g["us"].shift()) // 60_000_000
        df["d"] = d
        pd_ = df.groupby(["user_id", "event_type"], sort=False)["d"] \
            .shift()
        t = df["event_type"].to_numpy()
        have_d = d.notna().to_numpy()
        have_p = (pd_.notna() & d.notna()).to_numpy()
        dd = d.to_numpy()[have_d].astype(np.int64)
        td = t[have_d]
        x = pd_.to_numpy()[have_p].astype(np.int64)
        y = d.to_numpy()[have_p].astype(np.int64)
        tp = t[have_p]
        rows = []
        for tt in sorted(set(t)):
            di = dd[td == tt]
            xi = x[tp == tt]
            yi = y[tp == tt]
            rows.append({
                "t": tt, "n1": len(di), "sd": int(di.sum()),
                "sd2": int((di ** 2).sum()), "n2": len(xi),
                "sx": int(xi.sum()), "sy": int(yi.sum()),
                "sxy": int((xi * yi).sum()),
                "sxx": int((xi ** 2).sum()),
                "syy": int((yi ** 2).sum()),
            })
        out = pd.DataFrame(rows)
        for c in out.columns:
            if c != "t":
                out[c] = out[c].astype(np.int64)
        return out

    m = pre_aggregate(
        grouped_map(ev, "user_id", partials), ["t"],
        {c: (c, "sum") for c in ["n1", "sd", "sd2", "n2", "sx", "sy",
                                 "sxy", "sxx", "syy"]},
    ).to_pandas()
    rows = []
    for r in m.sort_values("t").itertuples():
        mu = float(r.sd) / r.n1
        var = float(r.sd2) / r.n1 - mu * mu
        sig = math.sqrt(var)
        B = (sig - mu) / (sig + mu) if sig + mu > 0 else None
        mx = float(r.sx) / r.n2
        my = float(r.sy) / r.n2
        cov = float(r.sxy) / r.n2 - mx * my
        vx = float(r.sxx) / r.n2 - mx * mx
        vy = float(r.syy) / r.n2 - my * my
        M = (cov / (math.sqrt(vx) * math.sqrt(vy))
             if vx > 0 and vy > 0 else None)
        rows.append((r.t, int(r.n1), int(r.n2),
                     float(round_half_up(B, 6)) if B is not None
                     else None,
                     float(round_half_up(M, 6)) if M is not None
                     else None))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_gaps": pa.array([r[1] for r in rows], pa.int64()),
        "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
        "burstiness": pa.array([r[3] for r in rows], pa.float64()),
        "memory": pa.array([r[4] for r in rows], pa.float64()),
    })


SQL_EVENTS_BURSTINESS = """
WITH s AS (SELECT user_id, event_type AS t, epoch_us(ts) AS us,
                  event_id FROM events),
d AS (SELECT t,
             (us - lag(us) OVER w) // 60000000 AS d
      FROM s WINDOW w AS (PARTITION BY user_id, t
                          ORDER BY us, event_id)),
m AS (SELECT t,
             CAST(COUNT(d) AS BIGINT) AS n1,
             CAST(SUM(d) AS BIGINT) AS sd,
             CAST(SUM(d * d) AS BIGINT) AS sd2
      FROM d WHERE d IS NOT NULL GROUP BY 1),
p AS (SELECT t, d, pd FROM (
        SELECT t, d,
               lag(d) OVER (PARTITION BY user_id, t
                            ORDER BY us, event_id) AS pd
        FROM (SELECT user_id, t, us, event_id,
                     (us - lag(us) OVER w) // 60000000 AS d
              FROM s WINDOW w AS (PARTITION BY user_id, t
                                  ORDER BY us, event_id)))
      WHERE d IS NOT NULL AND pd IS NOT NULL),
m2 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n2,
              CAST(SUM(pd) AS BIGINT) AS sx,
              CAST(SUM(d) AS BIGINT) AS sy,
              CAST(SUM(pd * d) AS BIGINT) AS sxy,
              CAST(SUM(pd * pd) AS BIGINT) AS sxx,
              CAST(SUM(d * d) AS BIGINT) AS syy
       FROM p GROUP BY 1)
SELECT m.t AS event_type, m.n1 AS n_gaps, m2.n2 AS n_pairs,
       CASE WHEN sqrt(CAST(sd2 AS DOUBLE) / n1
                      - (CAST(sd AS DOUBLE) / n1)
                        * (CAST(sd AS DOUBLE) / n1))
                 + CAST(sd AS DOUBLE) / n1 > 0
            THEN ROUND((sqrt(CAST(sd2 AS DOUBLE) / n1
                             - (CAST(sd AS DOUBLE) / n1)
                               * (CAST(sd AS DOUBLE) / n1))
                        - CAST(sd AS DOUBLE) / n1)
                       / (sqrt(CAST(sd2 AS DOUBLE) / n1
                               - (CAST(sd AS DOUBLE) / n1)
                                 * (CAST(sd AS DOUBLE) / n1))
                          + CAST(sd AS DOUBLE) / n1), 6)
            ELSE NULL END AS burstiness,
       CASE WHEN CAST(sxx AS DOUBLE) / n2
                 - (CAST(sx AS DOUBLE) / n2) * (CAST(sx AS DOUBLE) / n2)
                 > 0
             AND CAST(syy AS DOUBLE) / n2
                 - (CAST(sy AS DOUBLE) / n2) * (CAST(sy AS DOUBLE) / n2)
                 > 0
            THEN ROUND((CAST(sxy AS DOUBLE) / n2
                        - (CAST(sx AS DOUBLE) / n2)
                          * (CAST(sy AS DOUBLE) / n2))
                       / (sqrt(CAST(sxx AS DOUBLE) / n2
                               - (CAST(sx AS DOUBLE) / n2)
                                 * (CAST(sx AS DOUBLE) / n2))
                          * sqrt(CAST(syy AS DOUBLE) / n2
                                 - (CAST(sy AS DOUBLE) / n2)
                                   * (CAST(sy AS DOUBLE) / n2))), 6)
            ELSE NULL END AS memory
FROM m JOIN m2 ON m.t = m2.t ORDER BY 1
"""


SQL_EVENTS_AR1 = """
WITH e AS (SELECT event_type AS t,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
cal AS (SELECT t.t, b.lo + g.g AS day FROM
        (SELECT DISTINCT t FROM e) t, b,
        (SELECT unnest(range(0, (SELECT hi - lo + 1 FROM b))) AS g) g),
d AS (SELECT cal.t, cal.day, CAST(COALESCE(s.x, 0) AS BIGINT) AS x
      FROM cal LEFT JOIN (SELECT t, day, SUM(c) AS x FROM e
                          GROUP BY 1, 2) s
      ON cal.t = s.t AND cal.day = s.day),
lagd AS (SELECT t, x,
                lag(x) OVER (PARTITION BY t ORDER BY day) AS px
         FROM d),
m AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(px) AS BIGINT) AS sx,
             CAST(SUM(x) AS BIGINT) AS sy,
             CAST(SUM(px * px) AS BIGINT) AS sxx,
             CAST(SUM(px * x) AS BIGINT) AS sxy
      FROM lagd WHERE px IS NOT NULL GROUP BY 1)
SELECT t AS event_type, n AS n_pairs,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx), 6) AS phi
FROM m ORDER BY 1
"""


def _fd_sql() -> str:
    parts = []
    for a in _FD_COLS:
        for b_ in _FD_COLS:
            if a == b_:
                continue
            parts.append(f"""
SELECT '{a}' AS col_a, '{b_}' AS col_b,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {a} FROM orders))
            AS BIGINT) AS n_distinct_a,
       CAST((SELECT COUNT(*) FROM
             (SELECT DISTINCT {a}, {b_} FROM orders)) AS BIGINT)
         AS n_distinct_ab,
       CAST((SELECT COUNT(*) FROM
             (SELECT DISTINCT {a}, {b_} FROM orders))
            - (SELECT COUNT(*) FROM (SELECT DISTINCT {a} FROM orders))
            AS BIGINT) AS n_violations,
       (SELECT COUNT(*) FROM (SELECT DISTINCT {a}, {b_} FROM orders))
         = (SELECT COUNT(*) FROM (SELECT DISTINCT {a} FROM orders))
         AS holds""")
    return " UNION ALL ".join(parts) + " ORDER BY col_a, col_b"


SQL_ORDERS_FD_DISCOVERY = _fd_sql()
