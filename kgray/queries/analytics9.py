"""Session-18 operator batch: per-user Kendall tau-b rank correlation
(exact integer concordant/discordant/tie counts), per-language
Flesch-Kincaid-style readability from integer word/syllable folds,
asymmetric shingle CONTAINMENT near-dup pairs (sub/superset detector),
integer fixed-point personalized PageRank from a seed nation's
suppliers, a functional-dependency profiling audit, Kaplan-Meier
survival of inter-arrival gaps (integer micro-unit log factors), and
blocked exact-Levenshtein fuzzy-match pairs.
"""

from ._common import *  # noqa: F401,F403

from kgray.queries.analytics4 import _GRAPH_EDGE_SQL, _part_supplier_edges

# ---------------------------------------------------------------------------
# Kendall tau-b per user: rank correlation between event time and value
# ---------------------------------------------------------------------------


def q_events_kendall(sf_dir: str):
    """Kendall tau-b between event time and value per user — "do this
    user's values trend with time, rank-wise?".  Concordant /
    discordant / tie counts are EXACT int64 (ts in epoch us, value in
    cents), so only the final tau = (C-D)/sqrt((n0-n1)(n0-n2)) touches
    floats — both engines divide the identical int64s and sqrt the
    identical exact-double product (n0 <= 4851 at 99 events/user, far
    inside 2^53).  The O(n^2) pair expansion runs per user INSIDE a
    user cogroup on <=99-row groups (the Theil-Sen aggregate-scale
    argument); the SQL oracle self-joins pairs per user.  Users with
    <2 events or an all-tied axis (zero denominator) are dropped on
    both sides."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            x = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
            y = round_half_up(
                g["value"].to_numpy(np.float64) * 100.0, 0
            ).astype(np.int64)
            n = len(x)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            dx = np.sign(x[j] - x[i])
            dy = np.sign(y[j] - y[i])
            s = dx * dy
            conc = int((s > 0).sum())
            disc = int((s < 0).sum())
            n0 = n * (n - 1) // 2
            d1 = n0 - int((dx == 0).sum())
            d2 = n0 - int((dy == 0).sum())
            if d1 == 0 or d2 == 0:
                continue
            tau = (conc - disc) / math.sqrt(float(d1 * d2))
            rows.append((uid, n, conc, disc, round_half_up(tau, 6)))
        return pd.DataFrame(
            rows,
            columns=["user_id", "n_events", "conc", "disc", "tau_b"],
        ).astype({"user_id": np.int64, "n_events": np.int64,
                  "conc": np.int64, "disc": np.int64})

    return grouped_map(ev, "user_id", per_user)


SQL_EVENTS_KENDALL = """
WITH e AS (
  SELECT user_id, ROW_NUMBER() OVER () AS rid,
         epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
n AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM e GROUP BY 1 HAVING COUNT(*) >= 2),
p AS (
  SELECT a.user_id,
         CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                         OR (a.x > b.x AND a.y > b.y)
                  THEN 1 ELSE 0 END) AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                         OR (a.x > b.x AND a.y < b.y)
                  THEN 1 ELSE 0 END) AS BIGINT) AS disc,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM e a JOIN e b ON a.user_id = b.user_id AND a.rid < b.rid
  GROUP BY 1)
SELECT p.user_id, n.n_events, p.conc, p.disc,
       ROUND((p.conc - p.disc) /
             sqrt(CAST((n.n_events * (n.n_events - 1) // 2 - p.tx)
                       * (n.n_events * (n.n_events - 1) // 2 - p.ty)
                       AS DOUBLE)), 6) AS tau_b
FROM p JOIN n USING (user_id)
WHERE n.n_events * (n.n_events - 1) // 2 - p.tx > 0
  AND n.n_events * (n.n_events - 1) // 2 - p.ty > 0
"""


# ---------------------------------------------------------------------------
# readability: Flesch-Kincaid grade from integer word / vowel-group folds
# ---------------------------------------------------------------------------

_VOWEL_RE = re.compile(r"[aeiou]+")


def q_lang_readability(sf_dir: str):
    """Flesch-Kincaid grade level per language, doc-as-sentence (the
    corpus has no sentence punctuation): FK = 0.39*(W/S) + 11.8*(Syl/W)
    - 15.59 with S = docs, W = space-split tokens, Syl = vowel-group
    runs ([aeiou]+, the classic syllable heuristic).  All three counts
    fold as exact int64 (combiner before the lang groupby); the final
    expression is the IDENTICAL left-associated double arithmetic in
    both engines, so no rounding slack is needed beyond the display
    round."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        nt = len(texts)
        w = np.fromiter((t.count(" ") + 1 for t in texts), np.int64, nt)
        syl = np.fromiter(
            (len(_VOWEL_RE.findall(t)) for t in texts), np.int64, nt
        )
        df = pd.DataFrame({"lang": langs, "w": w, "syl": syl})
        g = df.groupby("lang", sort=False).agg(
            n_docs=("w", "size"), n_words=("w", "sum"),
            n_syllables=("syl", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = pre_aggregate(
        docs.map_batches(counts, batch_format="pyarrow"),
        ["lang"],
        {"n_docs": ("n_docs", "sum"), "n_words": ("n_words", "sum"),
         "n_syllables": ("n_syllables", "sum")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["n_docs"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = batch["n_words"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        syl = batch["n_syllables"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        grade = 0.39 * (w / d) + 11.8 * (syl / w) - 15.59
        return pa.table(
            {
                "lang": batch["lang"],
                "n_docs": batch["n_docs"],
                "n_words": batch["n_words"],
                "n_syllables": batch["n_syllables"],
                "fk_grade": pa.array(round_half_up(grade, 4),
                                     pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LANG_READABILITY = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
         CAST(SUM(len(regexp_extract_all(text, '[aeiou]+'))) AS BIGINT)
           AS n_syllables
  FROM documents GROUP BY 1)
SELECT lang, n_docs, n_words, n_syllables,
       ROUND(0.39 * (n_words / CAST(n_docs AS DOUBLE))
             + 11.8 * (n_syllables / CAST(n_words AS DOUBLE))
             - 15.59, 4) AS fk_grade
FROM c
"""


# ---------------------------------------------------------------------------
# asymmetric containment near-dup pairs over word 3-gram shingles
# ---------------------------------------------------------------------------

_CONT_TAU = 0.6


def q_doc_containment_pairs(sf_dir: str):
    """Directed shingle-containment pairs C(u in v) = |Su ∩ Sv| / |Su|
    >= {tau}: the sub/superset near-dup detector (a doc quoted whole
    inside a longer one scores high containment but low Jaccard, so
    symmetric dedup misses it).  Same lossless shared-shingle inverted
    index and count-attach machinery as ngram_jaccard_pairs — only the
    finish differs (both directions of each undirected candidate are
    tested)."""
    from kgray.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=_CONT_TAU,
        metric="containment",
    )


SQL_DOC_CONTAINMENT_PAIRS = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM documents
  WHERE len(string_split(text,' ')) >= 3),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
-- shared-shingle blocking stays lossless for containment >= tau > 0
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
         FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
dir AS (
  SELECT c.u, c.v,
         CAST(c.common AS DOUBLE) / len(a.shingles) AS cont
  FROM cand c JOIN sh a ON c.u = a.doc_id
  UNION ALL
  SELECT c.v AS u, c.u AS v,
         CAST(c.common AS DOUBLE) / len(b.shingles) AS cont
  FROM cand c JOIN sh b ON c.v = b.doc_id)
SELECT u, v, ROUND(cont, 4) AS cont
FROM dir WHERE cont >= {_CONT_TAU}
"""


# ---------------------------------------------------------------------------
# personalized PageRank from one nation's suppliers
# ---------------------------------------------------------------------------

_PPR_ITERS = 3
_PPR_SCALE = 10**12
_PPR_NATION = 0


def q_supplier_part_ppr(sf_dir: str):
    """Integer fixed-point PERSONALIZED PageRank over the supplier-part
    bipartite graph, restarted at nation-{n}'s suppliers — "which parts
    and suppliers are closest to this nation's supply base".  The seed
    set is a dim-table subset (a query parameter, the bfs_hops
    convention); the propagation recurrence is exact int64 floor
    division, so the oracle unrolls it (the pagerank_int pattern,
    seed-conditional base term via CASE)."""
    from kgray.ops.graph import ppr_int

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    seeds = [
        int(k) for k in sup.to_pandas().query(
            f"s_nationkey == {_PPR_NATION}"
        )["s_suppkey"]
    ]
    return ppr_int(_part_supplier_edges(sf_dir), seeds,
                   iters=_PPR_ITERS, scale=_PPR_SCALE)


def _ppr_sql(iters: int = _PPR_ITERS, scale: int = _PPR_SCALE) -> str:
    prev = "r0"
    ctes = [
        f"seeds AS (SELECT CAST(s_suppkey AS BIGINT) AS node FROM supplier"
        f" WHERE s_nationkey = {_PPR_NATION}"
        "  AND s_suppkey IN (SELECT node FROM deg))",
        "q AS (SELECT CAST(COUNT(*) AS BIGINT) AS q FROM seeds)",
        f"r0 AS (SELECT d.node, CAST(CASE WHEN s.node IS NULL THEN 0"
        f" ELSE {scale} // q.q END AS BIGINT) AS r\n"
        "       FROM deg d LEFT JOIN seeds s ON d.node = s.node"
        " CROSS JOIN q)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"r{i} AS (SELECT d.node,\n"
            "         CAST(CASE WHEN s.node IS NULL THEN 0\n"
            f"              ELSE (15 * {scale}) // (100 * q.q) END\n"
            "         + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)"
            " AS r\n"
            "       FROM deg d LEFT JOIN seeds s ON d.node = s.node"
            " CROSS JOIN q\n"
            "       LEFT JOIN (SELECT sy.dst AS node,"
            " SUM(r.r // sd.degree) AS contrib\n"
            f"                  FROM sym sy JOIN {prev} r"
            " ON sy.src = r.node\n"
            "                  JOIN deg sd ON sy.src = sd.node\n"
            "                  GROUP BY 1) c ON d.node = c.node)"
        )
        prev = f"r{i}"
    return (
        "WITH " + _GRAPH_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + f"\nSELECT node, r FROM {prev}"
    )


SQL_SUPPLIER_PART_PPR = _ppr_sql()


# ---------------------------------------------------------------------------
# functional-dependency profiling audit
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("orders", "o_custkey", "o_orderpriority"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("documents", "source", "lang"),
]


def q_fd_violations(sf_dir: str):
    """Functional-dependency audit (the schema-profiling op): for each
    candidate FD det -> dep, count determinant values, how many violate
    (more than one distinct dependent), and the worst fan-out.  Shape:
    one distinct-pair combiner fold per candidate, a det-scale count
    fold, then three scalar aggregates — the only driver-side state is
    the 4-row output table itself."""
    rows = []
    for tbl, det, dep in _FD_CANDIDATES:
        ds = _read(sf_dir, tbl, [det, dep])
        pairs = pre_aggregate(ds, [det, dep], {"nrows": (None, "count")})
        per_det = pre_aggregate(pairs, [det], {"n_dep": (None, "count")})

        def flags(batch: pa.Table) -> pa.Table:
            nd = batch["n_dep"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "one": pa.array(np.ones(len(nd), np.int64)),
                    "viol": pa.array((nd > 1).astype(np.int64)),
                    "mx": pa.array(nd.astype(np.int64)),
                }
            )

        f = per_det.map_batches(flags, batch_format="pyarrow") \
            .materialize()
        rows.append(
            (
                f"{tbl}.{det}->{dep}",
                int(f.sum("one") or 0),
                int(f.sum("viol") or 0),
                int(f.max("mx") or 0),
            )
        )
    return pa.table(
        {
            "fd": pa.array([r[0] for r in rows], pa.string()),
            "n_det": pa.array([r[1] for r in rows], pa.int64()),
            "n_violating": pa.array([r[2] for r in rows], pa.int64()),
            "max_dep": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _fd_sql() -> str:
    parts = []
    for tbl, det, dep in _FD_CANDIDATES:
        parts.append(
            f"SELECT '{tbl}.{det}->{dep}' AS fd,\n"
            "       CAST(COUNT(*) AS BIGINT) AS n_det,\n"
            "       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_violating,\n"
            "       CAST(MAX(c) AS BIGINT) AS max_dep\n"
            f"FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS c"
            f" FROM {tbl} GROUP BY 1)"
        )
    return "\nUNION ALL\n".join(parts)


SQL_FD_VIOLATIONS = _fd_sql()


# ---------------------------------------------------------------------------
# Kaplan-Meier survival in integer log micro-units
# ---------------------------------------------------------------------------

def q_events_km_survival(sf_dir: str):
    """Kaplan-Meier survival of INTER-ARRIVAL gaps (recurrent-event KM,
    "how long until a user's next event"): per user, every gap between
    consecutive event hours is an OBSERVED duration, and the open gap
    from the last event to the corpus end is CENSORED — the classic
    right-censoring structure (a lifetime-based definition is
    degenerate on this corpus: every user is active the whole window).
    The survival curve's running product Π(1 - d_t/n_t) is
    summation-order-sensitive as floats, so it ships as the RUNNING SUM
    of integer micro-unit log factors floor(1e6·ln((n-d)/n)+0.5) — the
    dsir/NB quantization convention: C-libm ln of the identical double
    on both engines, then exact int64 cumsum in a deterministic order.
    Gap extraction is tie-order-invariant (diffs of a sorted multiset);
    everything after the (dur, ev) fold runs on the duration-scale
    aggregate (<= corpus-span-in-hours rows).  Terminal rows where the
    whole risk set dies (ln 0) are excluded on both sides."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_hours(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {"user_id": batch["user_id"], "hr": pa.array(
                us // 3_600_000_000, pa.int64())}
        )

    hrs = ev.map_batches(to_hours, batch_format="pyarrow").materialize()
    gmax = int(hrs.max("hr"))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("user_id", sort=False):
            h = np.sort(g["hr"].to_numpy(np.int64))
            d = np.diff(h)
            outs.append((d, gmax - h[-1]))
        durs = np.concatenate(
            [d for d, _ in outs] + [np.fromiter(
                (c for _, c in outs), np.int64, len(outs))]
        )
        evf = np.concatenate(
            [np.ones(sum(len(d) for d, _ in outs), np.int64),
             np.zeros(len(outs), np.int64)]
        )
        out = pd.DataFrame({"dur": durs, "ev": evf})
        g2 = out.groupby("dur", sort=False).agg(
            n=("ev", "size"), d=("ev", "sum")
        ).reset_index()
        return g2.astype({"dur": np.int64, "n": np.int64, "d": np.int64})

    agg = pre_aggregate(
        grouped_map(hrs, "user_id", gaps),
        ["dur"], {"n": ("n", "sum"), "d": ("d", "sum")},
    )

    # duration-scale finish (<= max lifetime days rows): suffix-sum the
    # risk set, quantize each log factor, exact int64 running sum
    df = agg.to_pandas().sort_values("dur").reset_index(drop=True)
    n = df["n"].to_numpy(np.int64)
    d = df["d"].to_numpy(np.int64)
    at_risk = n[::-1].cumsum()[::-1]
    keep = (d > 0) & (at_risk > d)
    ar, dk = at_risk[keep], d[keep]
    step = np.fromiter(
        (
            math.floor(1_000_000 * math.log((a - e) / float(a)) + 0.5)
            for a, e in zip(ar, dk)
        ),
        np.int64, len(ar),
    )
    return pa.table(
        {
            "dur": pa.array(df["dur"].to_numpy(np.int64)[keep]),
            "at_risk": pa.array(ar, pa.int64()),
            "n_events": pa.array(dk, pa.int64()),
            "log_surv_micro": pa.array(np.cumsum(step), pa.int64()),
        }
    )


SQL_EVENTS_KM_SURVIVAL = """
WITH h AS (
  SELECT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr
  FROM events),
g AS (SELECT CAST(MAX(hr) AS BIGINT) AS gmax FROM h),
nx AS (SELECT user_id, hr,
              LEAD(hr) OVER (PARTITION BY user_id ORDER BY hr) AS nxt
       FROM h),
lif AS (SELECT CASE WHEN nxt IS NULL THEN gmax - hr
                    ELSE nxt - hr END AS dur,
               CAST(nxt IS NOT NULL AS INT) AS ev
        FROM nx CROSS JOIN g),
agg AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ev) AS BIGINT) AS d
        FROM lif GROUP BY 1),
r AS (SELECT dur, n, d,
             CAST(SUM(n) OVER (ORDER BY dur DESC) AS BIGINT) AS at_risk
      FROM agg),
k AS (SELECT dur, at_risk, d,
             CAST(floor(1000000 * ln((at_risk - d)
                                     / CAST(at_risk AS DOUBLE)) + 0.5)
                  AS BIGINT) AS step
      FROM r WHERE d > 0 AND at_risk > d)
SELECT dur, at_risk, d AS n_events,
       CAST(SUM(step) OVER (ORDER BY dur) AS BIGINT) AS log_surv_micro
FROM k
"""


# ---------------------------------------------------------------------------
# blocked Levenshtein fuzzy-match pairs
# ---------------------------------------------------------------------------

_LEV_MAX_DIST = 2


def _lev_pairs_block(names_u, names_v):
    """Exact Levenshtein distance for aligned pair arrays, vectorized
    ACROSS pairs: the classic two-row DP runs its (i, j) loops in
    python but every cell update is one numpy op over all pairs at
    once.  Unit costs — identical to DuckDB's levenshtein()."""
    npairs = len(names_u)
    enc_u = [s.encode() for s in names_u]
    enc_v = [s.encode() for s in names_v]
    # stripping a prefix common to BOTH strings of every pair preserves
    # edit distance; the GLOBAL common prefix of all strings (the LCP of
    # the lexicographic min and max) is common to every pair, and for
    # templated ids ("Customer#000...") it cuts the DP area ~4x
    if enc_u and enc_v:
        lo = min(min(enc_u), min(enc_v))
        hi = max(max(enc_u), max(enc_v))
        cp = 0
        for a, b in zip(lo, hi):
            if a != b:
                break
            cp += 1
        if cp:
            enc_u = [b[cp:] for b in enc_u]
            enc_v = [b[cp:] for b in enc_v]
    la = np.fromiter((len(b) for b in enc_u), np.int64, npairs)
    lb = np.fromiter((len(b) for b in enc_v), np.int64, npairs)
    L1, L2 = int(la.max()), int(lb.max())
    A = np.frombuffer(
        b"".join(b.ljust(L1, b"\x00") for b in enc_u), np.uint8
    ).reshape(npairs, L1)
    B = np.frombuffer(
        b"".join(b.ljust(L2, b"\x00") for b in enc_v), np.uint8
    ).reshape(npairs, L2)
    ans = np.empty(npairs, np.int64)
    done0 = la == 0
    ans[done0] = lb[done0]
    prev = np.broadcast_to(
        np.arange(L2 + 1, dtype=np.int64), (npairs, L2 + 1)
    ).copy()
    cur = np.empty_like(prev)
    for i in range(1, L1 + 1):
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]
        sub = prev[:, :-1] + (ai != B)
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=sub)
        # the left-cell dependency forces the j loop; it's one numpy
        # op per column over all pairs
        for j in range(1, L2 + 1):
            cur[:, j] = np.minimum(sub[:, j - 1], cur[:, j - 1] + 1)
        hit = la == i
        if hit.any():
            ans[hit] = cur[hit, lb[hit]]
        prev, cur = cur, prev
    return ans


def q_customer_fuzzy_pairs(sf_dir: str):
    """Blocked fuzzy-match pairs by EXACT edit distance: customer names
    within a (nation, mktsegment) block with Levenshtein distance <=
    {k} — the deterministic-metric face of fuzzy entity resolution
    (the Fellegi-Sunter scores are probabilistic; this is the
    string-metric blocker that usually feeds them).  Integer distances
    hash-match DuckDB's levenshtein() exactly.  The O(block^2) pair
    expansion runs inside a nation cogroup (blocks are dim-scale); the
    DP vectorizes across all pairs in the block, so the python-level
    loop is O(len^2) regardless of pair count."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (_, _), g in df.groupby(["c_nationkey", "c_mktsegment"],
                                    sort=False):
            k = g["c_custkey"].to_numpy(np.int64)
            nm = g["c_name"].to_numpy(object)
            o = np.argsort(k)
            k, nm = k[o], nm[o]
            n = len(k)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            dist = _lev_pairs_block(nm[i], nm[j])
            hit = dist <= _LEV_MAX_DIST
            outs.append(pd.DataFrame(
                {"u": k[i][hit], "v": k[j][hit], "dist": dist[hit]}
            ))
        if not outs:
            return pd.DataFrame(
                {"u": pd.array([], dtype="int64"),
                 "v": pd.array([], dtype="int64"),
                 "dist": pd.array([], dtype="int64")}
            )
        out = pd.concat(outs, ignore_index=True)
        return out.astype({"u": np.int64, "v": np.int64,
                           "dist": np.int64})

    return grouped_map(cust, "c_nationkey", per_block)


SQL_CUSTOMER_FUZZY_PAIRS = f"""
SELECT a.c_custkey AS u, b.c_custkey AS v,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_LEV_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# HMM Viterbi decode with integer log weights (oracle-checked)
# ---------------------------------------------------------------------------

# micro-unit (1e6-scaled) log weights: state 0 = "browse", 1 = "trouble".
# Constants are shared verbatim by the Ray kernel and the generated SQL.
_VIT_E = {
    "click": (-600_000, -1_800_000),
    "view": (-700_000, -2_000_000),
    "signup": (-2_000_000, -2_200_000),
    "purchase": (-2_500_000, -1_200_000),
    "error": (-3_000_000, -800_000),
}
_VIT_E_OTHER = (-5_000_000, -5_000_000)
_VIT_T = (-200_000, -1_700_000, -1_100_000, -500_000)  # t00 t01 t10 t11
_VIT_PI = (-300_000, -1_400_000)


def q_events_viterbi(sf_dir: str):
    """HMM Viterbi decode over each user's (ts, event_id)-ordered
    event-type sequence — the oracle-checked face of the sequence-model
    family (the CRF/BiLSTM decoders in ops/ are reference-parity
    test-pinned; this one is END-TO-END hash-checked against SQL).
    A 2-state HMM with integer micro-unit log weights: max/plus over
    int64 is bit-exact in any evaluation order, so the DuckDB oracle
    advances the identical per-user recurrence v'_s = emit_s(x) +
    GREATEST(v_0 + t_0s, v_1 + t_1s) with a ROW_NUMBER-indexed
    recursive CTE (the events_int_ewma pattern — O(rows) per
    iteration, all users step together).  Output per user: sequence
    length, best final log score, argmax final state (tie -> state 0).
    Ray side is ONE user cogroup running the same recurrence."""
    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    t00, t01, t10, t11 = _VIT_T
    pi0, pi1 = _VIT_PI

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        users = df["user_id"].to_numpy(np.int64)
        kinds = df["event_type"].to_numpy(object)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        ends = np.r_[starts[1:], len(users)]
        out = np.empty((len(starts), 4), np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            e0, e1 = _VIT_E.get(kinds[s], _VIT_E_OTHER)
            v0, v1 = pi0 + e0, pi1 + e1
            for j in range(s + 1, e):
                e0, e1 = _VIT_E.get(kinds[j], _VIT_E_OTHER)
                v0, v1 = (
                    e0 + max(v0 + t00, v1 + t10),
                    e1 + max(v0 + t01, v1 + t11),
                )
            out[i] = (users[s], e - s, max(v0, v1), 1 if v1 > v0 else 0)
        return pd.DataFrame(
            out,
            columns=["user_id", "n_events", "best_score", "best_state"],
        )

    return grouped_map(ev, "user_id", per_bucket)


def _viterbi_sql() -> str:
    def case(idx: int) -> str:
        whens = "\n          ".join(
            f"WHEN '{k}' THEN {w[idx]}" for k, w in _VIT_E.items()
        )
        return (f"CASE event_type\n          {whens}\n"
                f"          ELSE {_VIT_E_OTHER[idx]} END")

    t00, t01, t10, t11 = _VIT_T
    pi0, pi1 = _VIT_PI
    return f"""
WITH RECURSIVE r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
e AS (SELECT user_id, rn,
        {case(0)} AS e0,
        {case(1)} AS e1
      FROM r),
s AS (
  SELECT user_id, rn, {pi0} + e0 AS v0, {pi1} + e1 AS v1
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         e.e0 + GREATEST(s.v0 + ({t00}), s.v1 + ({t10})),
         e.e1 + GREATEST(s.v0 + ({t01}), s.v1 + ({t11}))
  FROM s JOIN e ON e.user_id = s.user_id AND e.rn = s.rn + 1),
sel AS (SELECT user_id, rn, v0, v1,
               MAX(rn) OVER (PARTITION BY user_id) AS mx FROM s)
SELECT user_id, CAST(mx AS BIGINT) AS n_events,
       CAST(GREATEST(v0, v1) AS BIGINT) AS best_score,
       CAST(CASE WHEN v1 > v0 THEN 1 ELSE 0 END AS BIGINT) AS best_state
FROM sel WHERE rn = mx
"""


SQL_EVENTS_VITERBI = _viterbi_sql()


# ---------------------------------------------------------------------------
# Spearman rho per event type: daily volume vs daily mean value
# ---------------------------------------------------------------------------

def q_events_daily_spearman(sf_dir: str):
    """Spearman rank correlation per event type between daily volume
    and daily mean value ("do busy days run hot or cold?") — the
    tie-averaged-rank complement to events_kendall.  Exactness chain:
    daily (n, cents) fold is exact int64; the mean n->cents/n is the
    identical double division in both engines; tie-averaged ranks are
    HALF-INTEGERS (exact doubles, the Mann-Whitney rank lesson); and
    every Pearson-on-ranks moment is a sum of quarter-integers bounded
    by days^3 — exactly representable, so the raw-moment formula is
    summation-order-exact with NO integer trick needed.  Rank + fit
    run per event type over day-scale aggregates (~30 rows each)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def daily(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(
                    zero_copy_only=False),
                "day": us // 86_400_000_000,
                "cents": cents,
            }
        )
        g = df.groupby(["event_type", "day"], sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = pre_aggregate(
        ev.map_batches(daily, batch_format="pyarrow"),
        ["event_type", "day"], {"n": ("n", "sum"), "cents": ("cents", "sum")},
    )

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            n = g["n"].to_numpy(np.int64)
            cents = g["cents"].to_numpy(np.int64)
            mean = cents / n.astype(np.float64)
            rx = pd.Series(n).rank(method="average").to_numpy()
            ry = pd.Series(mean).rank(method="average").to_numpy()
            nd = len(rx)
            sx, sy = rx.sum(), ry.sum()
            sxx, syy = (rx * rx).sum(), (ry * ry).sum()
            sxy = (rx * ry).sum()
            vx = nd * sxx - sx * sx
            vy = nd * syy - sy * sy
            if vx <= 0 or vy <= 0:
                continue
            rho = (nd * sxy - sx * sy) / math.sqrt(vx * vy)
            rows.append((et, nd, round_half_up(rho, 6)))
        return pd.DataFrame(
            rows, columns=["event_type", "n_days", "rho"]
        ).astype({"n_days": np.int64})

    return grouped_map(agg, "event_type", fit)


SQL_EVENTS_DAILY_SPEARMAN = """
WITH d AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type,
         (2 * RANK() OVER (PARTITION BY event_type ORDER BY n)
          + COUNT(*) OVER (PARTITION BY event_type, n) - 1) / 2.0 AS rx,
         (2 * RANK() OVER (PARTITION BY event_type
                           ORDER BY cents / CAST(n AS DOUBLE))
          + COUNT(*) OVER (PARTITION BY event_type,
                           cents / CAST(n AS DOUBLE)) - 1) / 2.0 AS ry
  FROM d),
a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * rx) AS sxx,
             SUM(ry * ry) AS syy, SUM(rx * ry) AS sxy
      FROM r GROUP BY 1)
SELECT event_type, n_days,
       ROUND((n_days * sxy - sx * sy)
             / sqrt((n_days * sxx - sx * sx)
                    * (n_days * syy - sy * sy)), 6) AS rho
FROM a
WHERE n_days * sxx - sx * sx > 0 AND n_days * syy - sy * sy > 0
"""


# ---------------------------------------------------------------------------
# association rules (confidence + lift) over co-purchase baskets
# ---------------------------------------------------------------------------

_RULE_MINSUP = 2


def q_basket_rules(sf_dir: str):
    """Association rules ante -> cons with support / confidence / lift
    over order baskets — the step AFTER basket_pairs (which mines raw
    pair supports): conf = n12/n_ante, lift = n12·N / (n_ante·n_cons).
    All counts are exact int64 (basket rows live whole in one order
    cogroup, so distinct-pair and per-item supports fold exactly); the
    two ratios divide identical integers, so they are bit-equal doubles
    in both engines.  Item supports are a part-scale table broadcast
    once into the rule finish (never a row-scale join); N is one
    scalar fold."""
    import ray

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (
            m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size().rename("n").reset_index()
        )
        return out.rename(columns={"l_partkey_x": "p1",
                                   "l_partkey_y": "p2"})

    buckets = grouped_map(line, "l_orderkey", per_bucket)

    def fold_pairs(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["p1", "p2"], sort=False)["n"].sum()
            .rename("n12").reset_index()
        )
        return c[c["n12"] >= _RULE_MINSUP]

    pairs = grouped_map(buckets, "p1", fold_pairs)

    def item_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        g = d.groupby("l_partkey", sort=False).size().rename("np") \
            .reset_index().rename(columns={"l_partkey": "p"})
        # an order's rows live whole in ONE bucket, so per-bucket
        # distinct-order counts sum to the exact global count
        g["n_orders_part"] = 0
        g.loc[g.index[:1], "n_orders_part"] = d["l_orderkey"].nunique()
        return g

    ip = grouped_map(line, "l_orderkey", item_partials).materialize()
    item = pre_aggregate(ip, ["p"], {"np": ("np", "sum")})
    n_total = int(ip.sum("n_orders_part") or 0)
    idf = item.to_pandas()  # part-scale (the lm_score broadcast gate)
    np_of = ray.put(pd.Series(idf["np"].to_numpy(np.int64),
                              index=idf["p"].to_numpy(np.int64)))

    def finish(batch: pa.Table, n=n_total) -> pa.Table:
        sup = ray.get(np_of)
        p1 = batch["p1"].to_numpy(zero_copy_only=False)
        p2 = batch["p2"].to_numpy(zero_copy_only=False)
        n12 = batch["n12"].to_numpy(zero_copy_only=False).astype(np.int64)
        ante = np.concatenate([p1, p2])
        cons = np.concatenate([p2, p1])
        nn = np.concatenate([n12, n12])
        na = sup.reindex(ante).to_numpy(np.int64)
        nc = sup.reindex(cons).to_numpy(np.int64)
        conf = nn / na.astype(np.float64)
        lift = (nn * n) / (na * nc).astype(np.float64)
        return pa.table(
            {
                "ante": pa.array(ante, pa.int64()),
                "cons": pa.array(cons, pa.int64()),
                "n12": pa.array(nn, pa.int64()),
                "n_ante": pa.array(na, pa.int64()),
                "n_cons": pa.array(nc, pa.int64()),
                "conf": pa.array(round_half_up(conf, 6), pa.float64()),
                "lift": pa.array(round_half_up(lift, 6), pa.float64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


SQL_BASKET_RULES = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
      FROM lineitem),
item AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS np
         FROM b GROUP BY 1),
pr AS (SELECT a.l_partkey AS p1, c.l_partkey AS p2,
              CAST(COUNT(*) AS BIGINT) AS n12
       FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                        AND a.l_partkey < c.l_partkey
       GROUP BY 1, 2 HAVING COUNT(*) >= {_RULE_MINSUP}),
dir AS (SELECT p1 AS ante, p2 AS cons, n12 FROM pr
        UNION ALL SELECT p2, p1, n12 FROM pr)
SELECT d.ante, d.cons, d.n12, ia.np AS n_ante, ic.np AS n_cons,
       ROUND(d.n12 / CAST(ia.np AS DOUBLE), 6) AS conf,
       ROUND((d.n12 * n.n) / CAST(ia.np * ic.np AS DOUBLE), 6) AS lift
FROM dir d JOIN item ia ON d.ante = ia.p
           JOIN item ic ON d.cons = ic.p
CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# BPE tokenizer application: per-language fertility audit (rows-only)
# ---------------------------------------------------------------------------

_BPE_FERT_MERGES = 80


def q_bpe_fertility(sf_dir: str):
    """Train a {m}-merge BPE tokenizer on the corpus (bpe_train's
    driver merge loop over the vocab-scale word-frequency fold) and
    APPLY it back — the tokenizer-inference op a training-data pipeline
    runs over every document.  Output per language: docs, words, BPE
    tokens, and fertility = tokens/word (the standard tokenizer-quality
    metric).  Rows-only: BPE inference is not SQL-expressible; the
    apply loop is pinned by Sennrich-example + round-trip property
    tests (test_session18_ops)."""
    from kgray.ops.text import bpe_encode_stats, bpe_train

    docs = _read(sf_dir, "documents", ["lang", "text"])
    merges = bpe_train(docs, num_merges=_BPE_FERT_MERGES)
    stats = bpe_encode_stats(docs, merges)

    def finish(batch: pa.Table) -> pa.Table:
        w = batch["n_words"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        t = batch["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return batch.append_column(
            "fertility", pa.array(round_half_up(t / w, 4), pa.float64())
        )

    return stats.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic half-sample bootstrap CI for the mean (md5 bit reps)
# ---------------------------------------------------------------------------

_CI_REPS = 48  # bits 0..47 of the 13-hex-digit md5 prefix
_CI_LO, _CI_HI = 0.05, 0.95


def q_events_subsample_ci(sf_dir: str):
    """Half-sample bootstrap confidence interval for the per-type mean
    value, fully deterministic: ONE md5 per row yields 48 independent
    coin flips (bits of the 52-bit hex prefix — the dsir bucket-hash
    convention), rep r keeps the rows with bit r set (~n/2 each), and
    the CI is the percentile_disc(0.05/0.95) of the 48 rep means.
    Everything before the percentile is exact: int64 cent sums per
    (type, rep) fold with a combiner, rep means divide identical
    integers.  One stateless scan + one rep-scale shuffle — each row
    contributes to all its reps in place, never a B-fold data copy
    (the Poisson-bootstrap shape).  Empty reps (possible only on tiny
    fixtures) drop from the percentile on both sides."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        hv = np.fromiter(
            (
                int(hashlib.md5(f"ci:{i}".encode()).hexdigest()[:13], 16)
                for i in ids
            ),
            np.int64, len(ids),
        )
        frames = []
        df = pd.DataFrame({"event_type": et, "cents": cents})
        # rep -1 carries the full-sample fold
        base = df.groupby("event_type", sort=False)["cents"] \
            .agg(["sum", "size"]).reset_index()
        base["rep"] = -1
        frames.append(base)
        for r in range(_CI_REPS):
            m = ((hv >> r) & 1).astype(bool)
            if not m.any():
                continue
            g = df[m].groupby("event_type", sort=False)["cents"] \
                .agg(["sum", "size"]).reset_index()
            g["rep"] = r
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "event_type": pa.array(out["event_type"].to_numpy(object),
                                       pa.string()),
                "rep": pa.array(out["rep"].to_numpy(np.int64)),
                "s": pa.array(out["sum"].to_numpy(np.int64)),
                "n": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    agg = pre_aggregate(
        ev.map_batches(partials, batch_format="pyarrow"),
        ["event_type", "rep"], {"s": ("s", "sum"), "n": ("n", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            base = g[g["rep"] == -1]
            reps = g[(g["rep"] >= 0) & (g["n"] > 0)]
            if not len(base) or not len(reps):
                continue
            means = np.sort(
                reps["s"].to_numpy(np.int64)
                / reps["n"].to_numpy(np.int64).astype(np.float64)
            )
            k = len(means)
            lo = means[max(int(np.ceil(_CI_LO * k)), 1) - 1]
            hi = means[max(int(np.ceil(_CI_HI * k)), 1) - 1]
            s, n = int(base["s"].iloc[0]), int(base["n"].iloc[0])
            rows.append((et, n, round_half_up(s / float(n), 6),
                         round_half_up(lo, 6), round_half_up(hi, 6)))
        return pd.DataFrame(
            rows,
            columns=["event_type", "n_events", "mean_cents",
                     "ci_lo", "ci_hi"],
        ).astype({"n_events": np.int64})

    return grouped_map(agg, "event_type", finish)


SQL_EVENTS_SUBSAMPLE_CI = f"""
WITH h AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST('0x' || substr(md5('ci:' || CAST(event_id AS VARCHAR)), 1, 13)
              AS BIGINT) AS hv
  FROM events),
reps AS (SELECT r FROM range({_CI_REPS}) t(r)),
m AS (SELECT event_type, r, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM h JOIN reps ON ((hv >> r) & 1) = 1 GROUP BY 1, 2),
rm AS (SELECT event_type, s / CAST(n AS DOUBLE) AS mean_r FROM m),
ci AS (SELECT event_type,
              percentile_disc({_CI_LO}) WITHIN GROUP (ORDER BY mean_r)
                AS lo,
              percentile_disc({_CI_HI}) WITHIN GROUP (ORDER BY mean_r)
                AS hi
       FROM rm GROUP BY 1),
base AS (SELECT event_type, CAST(SUM(cents) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM h GROUP BY 1)
SELECT b.event_type, b.n AS n_events,
       ROUND(b.s / CAST(b.n AS DOUBLE), 6) AS mean_cents,
       ROUND(ci.lo, 6) AS ci_lo, ROUND(ci.hi, 6) AS ci_hi
FROM base b JOIN ci USING (event_type)
"""
