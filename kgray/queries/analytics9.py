"""Session-18 operator batch: per-user Kendall tau-b rank correlation
(exact integer concordant/discordant/tie counts), per-language
Flesch-Kincaid-style readability from integer word/syllable folds,
asymmetric shingle CONTAINMENT near-dup pairs (sub/superset detector),
integer fixed-point personalized PageRank from a seed nation's
suppliers, and a functional-dependency profiling audit.
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
