"""Session-15 operator batch: Markov stationary distribution (integer
fixed-point power iteration with an unrolled-CTE oracle), degree
assortativity (integer-moment Pearson over co-purchase edges),
gazetteer phrase tagging (broadcast dictionary, replace-trick oracle),
and pairwise source Jensen-Shannon divergence over word distributions.
"""

from ._common import *  # noqa: F401,F403

from kgray.queries.analytics2 import _copurchase_pairs

# ---------------------------------------------------------------------------
# Markov-chain stationary distribution over event-type transitions
# ---------------------------------------------------------------------------

_MARKOV_SCALE = 10**12
_MARKOV_ITERS = 6


def q_events_markov_stationary(sf_dir: str):
    """Stationary distribution of the first-order event-type Markov
    chain (user-journey steady state): transition counts fold
    distributed exactly like ``events_transitions`` (shift-pair inside a
    user cogroup, tiny Sum merge), then a fixed-round INTEGER
    fixed-point power iteration runs on the K x K count matrix (K =
    distinct event types, aggregate-scale).  The recurrence
    ``pi'(j) = sum_i (pi(i) * c(i,j)) // out(i)`` is int64 floor
    arithmetic — bit-exact in ANY summation order — so the DuckDB
    oracle UNROLLS the identical recurrence (the pagerank_int pattern).
    Dangling states (no outgoing transitions) keep their mass as a
    self-loop in both engines.  Overflow headroom: pi <= 1e12 and
    c <= ~1e6 keeps pi*c < 2^63 up to ~1e6 transitions per cell."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        same = us[1:] == us[:-1]
        pairs = pd.DataFrame(
            {"prev_type": et[:-1][same], "next_type": et[1:][same]}
        )
        return (
            pairs.groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )

    trans = (
        pre_aggregate(
            grouped_map(ev, "user_id", per_bucket),
            ["prev_type", "next_type"], {"n": ("n", "sum")},
        )
        .to_pandas()  # K x K matrix: aggregate-scale (types, not rows)
    )
    states = sorted(
        s
        for s in pre_aggregate(
            ev.select_columns(["event_type"]), ["event_type"],
            {"c": (None, "count")},
        )
        .to_pandas()["event_type"]
        .tolist()
    )
    c: dict[str, dict[str, int]] = {}
    out: dict[str, int] = {}
    for p, nx, n in zip(trans["prev_type"], trans["next_type"],
                        trans["n"]):
        c.setdefault(p, {})[nx] = int(n)
        out[p] = out.get(p, 0) + int(n)

    pi = {s: _MARKOV_SCALE // len(states) for s in states}
    for _ in range(_MARKOV_ITERS):
        nxt = {s: 0 for s in states}
        for i, m in pi.items():
            o = out.get(i)
            if not o:
                nxt[i] += m  # dangling: self-loop keeps the mass
                continue
            for j, cij in c[i].items():
                nxt[j] += (m * cij) // o
        pi = nxt
    return pa.table(
        {
            "event_type": pa.array(states, pa.string()),
            "pi": pa.array([pi[s] for s in states], pa.int64()),
        }
    )


def _markov_sql() -> str:
    head = f"""
WITH t AS (
  SELECT prev AS prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events)
  WHERE prev IS NOT NULL GROUP BY 1, 2),
outd AS (SELECT prev_type AS i, CAST(SUM(n) AS BIGINT) AS o
         FROM t GROUP BY 1),
s AS (SELECT DISTINCT event_type AS i FROM events),
p0 AS (SELECT i, CAST({_MARKOV_SCALE} AS BIGINT)
                 // (SELECT COUNT(*) FROM s) AS m FROM s)"""
    body = []
    for k in range(1, _MARKOV_ITERS + 1):
        body.append(f""",
p{k} AS (
  SELECT i, CAST(SUM(m) AS BIGINT) AS m FROM (
    SELECT t.next_type AS i, (p.m * t.n) // o.o AS m
    FROM p{k - 1} p JOIN outd o ON p.i = o.i
    JOIN t ON t.prev_type = p.i
    UNION ALL
    SELECT p.i, p.m FROM p{k - 1} p
    LEFT JOIN outd o ON p.i = o.i WHERE o.i IS NULL
  ) GROUP BY i)""")
    tail = f"""
SELECT s.i AS event_type, COALESCE(p.m, 0) AS pi
FROM s LEFT JOIN p{_MARKOV_ITERS} p ON s.i = p.i ORDER BY 1"""
    return head + "".join(body) + tail


SQL_EVENTS_MARKOV_STATIONARY = _markov_sql()


# ---------------------------------------------------------------------------
# degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------

def q_graph_assortativity(sf_dir: str):
    """Degree assortativity coefficient of the co-purchase graph
    (Newman 2002): Pearson correlation of endpoint degrees over BOTH
    edge orientations.  Degrees fold from the pairs dataset (flat_map
    ends -> count); the node->degree map is user-cardinality-scale and
    ships by closure (scale path: bucket_join the degree table onto
    each endpoint).  Every moment (n, Σx, Σxy, Σx²) is an INTEGER sum —
    exact in any fold order — and only the final pinned Pearson
    expression touches floats, so the oracle matches bit-for-bit."""

    pairs = _copurchase_pairs(sf_dir).materialize()

    def ends(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"u": pa.concat_arrays(
                [batch["u1"].combine_chunks().cast(pa.int64()),
                 batch["u2"].combine_chunks().cast(pa.int64())]
            )}
        )

    deg_df = (
        pre_aggregate(
            pairs.map_batches(ends, batch_format="pyarrow"),
            ["u"], {"deg": (None, "count")},
        )
        .to_pandas()
    )
    deg = dict(zip(deg_df["u"].astype(np.int64),
                   deg_df["deg"].astype(np.int64)))

    def moments(batch: pa.Table) -> pa.Table:
        u1 = pd.Series(batch["u1"].to_numpy(zero_copy_only=False))
        u2 = pd.Series(batch["u2"].to_numpy(zero_copy_only=False))
        dx = u1.map(deg).to_numpy(np.int64)
        dy = u2.map(deg).to_numpy(np.int64)
        return pa.table(
            {
                "n": pa.array([2 * len(dx)], pa.int64()),
                "sx": pa.array([int((dx + dy).sum())], pa.int64()),
                "sxy": pa.array([2 * int((dx * dy).sum())], pa.int64()),
                "sxx": pa.array([int((dx * dx).sum())
                                 + int((dy * dy).sum())], pa.int64()),
            }
        )

    m = (
        pairs.map_batches(moments, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxy", alias_name="sxy"),
                   Sum("sxx", alias_name="sxx"))
        .to_pandas()
    )
    n = int(m["n"][0]) if len(m) else 0
    if n == 0:
        return pa.table({"n_ends": pa.array([], pa.int64()),
                         "assortativity": pa.array([], pa.float64())})
    sx, sxy, sxx = int(m["sx"][0]), int(m["sxy"][0]), int(m["sxx"][0])
    var = float(n) * sxx - float(sx) * sx  # symmetric: sy=sx, syy=sxx
    if var == 0:
        r = None
    else:
        r = round_half_up(
            np.array([(float(n) * sxy - float(sx) * sx) / var]), 6
        )[0]
    return pa.table(
        {
            "n_ends": pa.array([n], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


SQL_GRAPH_ASSORTATIVITY = """
WITH p AS (
  SELECT a.user_id AS u1, b.user_id AS u2
  FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS hr, user_id
        FROM events WHERE event_type = 'purchase') a
  JOIN (SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS hr, user_id
        FROM events WHERE event_type = 'purchase') b
    ON a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
d AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT u1 AS u FROM p UNION ALL SELECT u2 FROM p)
      GROUP BY 1),
e AS (SELECT da.deg AS x, db.deg AS y
      FROM p JOIN d da ON p.u1 = da.u JOIN d db ON p.u2 = db.u
      UNION ALL
      SELECT db.deg, da.deg
      FROM p JOIN d da ON p.u1 = da.u JOIN d db ON p.u2 = db.u),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM e)
SELECT n AS n_ends,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx = 0
            THEN NULL
            ELSE ROUND((CAST(n AS DOUBLE) * sxy
                        - CAST(sx AS DOUBLE) * sx)
                       / (CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx), 6)
       END AS assortativity
FROM m WHERE n > 0
"""


# ---------------------------------------------------------------------------
# gazetteer phrase tagging (broadcast dictionary match)
# ---------------------------------------------------------------------------

# fixed two-word gazetteer over the corpus vocabulary; non-overlapping
# substring occurrence semantics (python str.count == SQL replace trick)
_GAZETTEER = [
    "row scan", "fast table", "hash join", "sort merge",
    "table scan", "value part", "data stream", "the line",
]


def q_gazetteer_counts(sf_dir: str):
    """Dictionary/gazetteer phrase tagging (the entity-lexicon matching
    stage of a KG pipeline): the phrase list broadcasts by closure
    (ray.put for big lexicons), each batch counts NON-OVERLAPPING
    substring occurrences vectorized per phrase, and integer (n_occ,
    n_docs) partials fold through the combiner — exact, zero shuffle of
    document text.  The oracle reproduces the count with the
    length(replace()) trick, which shares python str.count's greedy
    left-to-right non-overlapping semantics."""

    docs = _read(sf_dir, "documents", ["text"])

    def count_batch(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas()
        rows = []
        for ph in _GAZETTEER:
            cnt = s.str.count(re.escape(ph))
            rows.append((ph, int(cnt.sum()), int((cnt > 0).sum())))
        return pa.table(
            {
                "phrase": pa.array([r[0] for r in rows], pa.string()),
                "n_occ": pa.array([r[1] for r in rows], pa.int64()),
                "n_docs": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    return pre_aggregate(
        docs.map_batches(count_batch, batch_format="pyarrow"),
        ["phrase"],
        {"n_occ": ("n_occ", "sum"), "n_docs": ("n_docs", "sum")},
    )


SQL_GAZETTEER_COUNTS = """
WITH g(phrase) AS (VALUES {values}),
per AS (SELECT g.phrase,
               (length(d.text) - length(replace(d.text, g.phrase, '')))
               // length(g.phrase) AS c
        FROM documents d CROSS JOIN g)
SELECT phrase, CAST(SUM(c) AS BIGINT) AS n_occ,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
FROM per GROUP BY 1
""".replace("{values}", ", ".join(f"('{p}')" for p in _GAZETTEER))


# ---------------------------------------------------------------------------
# pairwise source Jensen-Shannon divergence over word distributions
# ---------------------------------------------------------------------------

def q_source_js_divergence(sf_dir: str):
    """Corpus-mixture drift audit: Jensen-Shannon divergence between
    every pair of sources' unigram distributions.  The distributed work
    is the (source, word) count fold (combiner before the tiny
    groupby); the pairwise compute runs driver-side on the folded
    sources x vocab table (vocab-scale, noted).  Log terms keep the
    ratio 2*cp*Nq/(cp*Nq+cq*Np) in exact INTEGER numerator/denominator
    form before one float division + C-libm ln (the tf-idf parity
    trick); the remaining float sums are order-sensitive, absorbed by
    ROUND 4 on irrational values."""

    docs = _read(sf_dir, "documents", ["source", "text"])

    def words(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df.set_index("source")["text"].str.split(" ").explode()
        s = s[s != ""]
        return pa.table(
            {"source": pa.array(s.index, pa.string()),
             "word": pa.array(s.to_numpy(), pa.string())}
        )

    counts = (
        pre_aggregate(
            docs.map_batches(words, batch_format="pyarrow"),
            ["source", "word"], {"c": (None, "count")},
        )
        .to_pandas()  # sources x vocab — aggregate-scale
    )
    piv = counts.pivot_table(index="word", columns="source", values="c",
                             aggfunc="sum", fill_value=0)
    totals = {s: int(piv[s].sum()) for s in piv.columns}
    srcs = sorted(piv.columns)
    memo: dict[tuple[int, int], float] = {}

    def _term(cp: int, denom: int) -> float:
        # cp * ln(2*cp*n_other / denom) with the int ratio memoized
        key = (cp, denom)
        v = memo.get(key)
        if v is None:
            v = math.log(key[0] / denom)
            memo[key] = v
        return v

    out_s1, out_s2, out_js = [], [], []
    mat = {s: piv[s].to_numpy(np.int64) for s in srcs}
    for ai in range(len(srcs)):
        for bi in range(ai + 1, len(srcs)):
            s1, s2 = srcs[ai], srcs[bi]
            n1, n2 = totals[s1], totals[s2]
            cps, cqs = mat[s1], mat[s2]
            sa = 0.0
            sb = 0.0
            for cp, cq in zip(cps.tolist(), cqs.tolist()):
                denom = cp * n2 + cq * n1
                if cp > 0:
                    sa += cp * _term(2 * cp * n2, denom)
                if cq > 0:
                    sb += cq * _term(2 * cq * n1, denom)
            js = 0.5 * sa / n1 + 0.5 * sb / n2
            out_s1.append(s1)
            out_s2.append(s2)
            out_js.append(js)
    return pa.table(
        {
            "s1": pa.array(out_s1, pa.string()),
            "s2": pa.array(out_s2, pa.string()),
            "js": pa.array(
                round_half_up(np.array(out_js, np.float64), 4),
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic near-dup clusters over embeddings (keep-one purge)
# ---------------------------------------------------------------------------

def q_embed_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023 shape): cosine near-dup pairs over
    the embedding table (the oracle-green ``embed_dup_pairs`` generator
    — size-gated brute/IVF blocking, never N x N), connected components
    over the similarity graph, keep the min vec_id per component.
    Output is the dedup decision: one row per semantic cluster with its
    representative and member count.  Oracle: the same cosine pair SQL
    under a recursive-CTE CC (the ``dedup_purge`` pattern)."""
    from kgray.ops.canonical import connected_components
    from kgray.ops.dedup import embedding_dup_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = embedding_dup_pairs(emb, tau=0.45)
    cc = connected_components(pairs.select_columns(["u", "v"]))
    return (
        cc.groupby("component")
        .aggregate(Count(alias_name="n_members"))
        .map_batches(
            lambda b: pa.table(
                {"kept": b["component"].cast(pa.int64()),
                 "n_members": b["n_members"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )


SQL_EMBED_SEMDEDUP = """
WITH RECURSIVE
p AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
sym AS (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
cc AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)
SELECT component AS kept, CAST(COUNT(*) AS BIGINT) AS n_members
FROM comp GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth curve
# ---------------------------------------------------------------------------

def q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve (Heaps' law audit): cumulative token and
    distinct-word counts at 10 doc_id-prefix checkpoints.  Two folds,
    both integer-exact in any order: per-checkpoint token partials
    (each batch emits 10 counter rows) and the per-word FIRST
    OCCURRENCE (min doc_id) — the distinct-so-far count at checkpoint k
    is then just |{w : first(w) < k}| over the vocab-scale fold, no
    re-scan per checkpoint.  Checkpoints use integer ceil
    ``(N*q+9)//10`` in both engines."""

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = int(docs.max("doc_id")) + 1
    ks = [(n_docs * q + 9) // 10 for q in range(1, 11)]

    def tok_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ntok = (
            df["text"].str.split(" ").map(
                lambda ws: sum(1 for w in ws if w != "")
            ).to_numpy(np.int64)
        )
        did = df["doc_id"].to_numpy(np.int64)
        return pa.table(
            {
                "q": pa.array(np.arange(1, 11), pa.int64()),
                "n_tokens": pa.array(
                    [int(ntok[did < k].sum()) for k in ks], pa.int64()
                ),
            }
        )

    toks = pre_aggregate(
        docs.map_batches(tok_partial, batch_format="pyarrow"),
        ["q"], {"n_tokens": ("n_tokens", "sum")},
    ).to_pandas().set_index("q")["n_tokens"]

    def first_seen(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df.set_index("doc_id")["text"].str.split(" ").explode()
        s = s[s != ""]
        return pa.table(
            {"w": pa.array(s.to_numpy(), pa.string()),
             "fd": pa.array(s.index.to_numpy(np.int64), pa.int64())}
        )

    fo = (
        pre_aggregate(
            docs.map_batches(first_seen, batch_format="pyarrow"),
            ["w"], {"fd": ("fd", "min")},
        )
        .to_pandas()  # vocab-scale
    )
    fd = fo["fd"].to_numpy(np.int64)
    return pa.table(
        {
            "q": pa.array(np.arange(1, 11), pa.int64()),
            "k_docs": pa.array(ks, pa.int64()),
            "n_tokens": pa.array(
                [int(toks[q]) for q in range(1, 11)], pa.int64()
            ),
            "n_vocab": pa.array(
                [int((fd < k).sum()) for k in ks], pa.int64()
            ),
        }
    )


SQL_VOCAB_GROWTH = """
WITH ck AS (
  SELECT q, ((SELECT MAX(doc_id) + 1 FROM documents) * q + 9) // 10 AS k
  FROM range(1, 11) t(q)),
tok AS (SELECT doc_id, t AS w
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
              FROM documents)
        WHERE t <> ''),
fo AS (SELECT w, MIN(doc_id) AS fd FROM tok GROUP BY 1)
SELECT ck.q AS q, ck.k AS k_docs,
       CAST((SELECT COUNT(*) FROM tok WHERE tok.doc_id < ck.k)
            AS BIGINT) AS n_tokens,
       CAST((SELECT COUNT(*) FROM fo WHERE fo.fd < ck.k)
            AS BIGINT) AS n_vocab
FROM ck
"""


# ---------------------------------------------------------------------------
# join cardinality (exact, without materializing the join)
# ---------------------------------------------------------------------------

def q_join_cardinality(sf_dir: str):
    """Join-size computation for planning: |events ⋈ orders| on
    user_id = o_custkey as Σ_k c_left(k)·c_right(k) — both sides
    collapse to (key, count) folds BEFORE the one key-scale cogroup, so
    the exact join cardinality costs two combiner passes + a tiny join
    instead of materializing 10^5+ joined rows (at 100 TB this is the
    difference between a stats pass and the join itself)."""

    ev = pre_aggregate(
        _read(sf_dir, "events", ["user_id"]),
        ["user_id"], {"c1": (None, "count")},
    )
    od = pre_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"], {"c2": (None, "count")},
    )
    j = bucket_join(ev, od, on="user_id", right_on="o_custkey",
                    how="inner", num_buckets=8)

    def prod(batch: pa.Table) -> pa.Table:
        c1 = batch["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = batch["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_match_keys": pa.array([len(c1)], pa.int64()),
                "n_pairs": pa.array([int((c1 * c2).sum())], pa.int64()),
            }
        )

    m = (
        j.map_batches(prod, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_match_keys", alias_name="n_match_keys"),
                   Sum("n_pairs", alias_name="n_pairs"))
        .to_pandas()
    )
    return pa.table(
        {
            "n_match_keys": pa.array(
                [int(m["n_match_keys"][0]) if len(m) else 0], pa.int64()
            ),
            "n_pairs": pa.array(
                [int(m["n_pairs"][0]) if len(m) else 0], pa.int64()
            ),
        }
    )


SQL_JOIN_CARDINALITY = """
SELECT CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_match_keys,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events e JOIN orders o ON e.user_id = o.o_custkey
"""


# ---------------------------------------------------------------------------
# compression-ratio quality signal (rows-only: SQL has no deflate)
# ---------------------------------------------------------------------------

def q_doc_zlib_ratio(sf_dir: str):
    """Compression-ratio quality signal (the RefinedWeb/Gopher
    repetition heuristic): per-doc zlib level-6 deflate size next to
    the raw byte size — highly repetitive text compresses far below
    the corpus norm.  Deterministic pure function of the bytes
    (rows-only: SQL has no deflate; exactness is test-pinned against
    zlib directly).  Integer outputs only."""
    import zlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        raw = np.fromiter((len(t.encode()) for t in texts), np.int64,
                          len(texts))
        comp = np.fromiter(
            (len(zlib.compress(t.encode(), 6)) for t in texts),
            np.int64, len(texts),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(raw, pa.int64()),
                "z_bytes": pa.array(comp, pa.int64()),
            }
        )

    return docs.map_batches(ratio, batch_format="pyarrow")


SQL_SOURCE_JS_DIVERGENCE = """
WITH w AS (SELECT source, t AS word, CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT source, UNNEST(string_split(text, ' ')) AS t
                 FROM documents)
           WHERE t <> '' GROUP BY 1, 2),
n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt FROM w GROUP BY 1),
v AS (SELECT DISTINCT word FROM w),
pairs AS (SELECT a.source AS s1, b.source AS s2, a.nt AS n1, b.nt AS n2
          FROM n a JOIN n b ON a.source < b.source),
terms AS (SELECT p.s1, p.s2, p.n1, p.n2,
                 COALESCE(wa.c, 0) AS cp, COALESCE(wb.c, 0) AS cq
          FROM pairs p CROSS JOIN v
          LEFT JOIN w wa ON wa.source = p.s1 AND wa.word = v.word
          LEFT JOIN w wb ON wb.source = p.s2 AND wb.word = v.word)
SELECT s1, s2,
       ROUND(0.5 * SUM(CASE WHEN cp > 0 THEN
                 cp * ln(CAST(2 * cp * n2 AS DOUBLE)
                         / (cp * n2 + cq * n1)) ELSE 0 END)
             / ANY_VALUE(n1)
           + 0.5 * SUM(CASE WHEN cq > 0 THEN
                 cq * ln(CAST(2 * cq * n1 AS DOUBLE)
                         / (cp * n2 + cq * n1)) ELSE 0 END)
             / ANY_VALUE(n2), 4) AS js
FROM terms GROUP BY 1, 2
"""
