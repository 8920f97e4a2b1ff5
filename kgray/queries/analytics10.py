"""Session-19 operator batch — model-evaluation / feature-engineering
family for training-data pipelines: exact distributed AUC (one-vs-rest
rank-sum over the value-histogram fold), probability-calibration bins
with per-bin Brier scores (integer micro-unit squares, python-int final
fold), PMI term-vs-language affinity (feature selection by class
association, single libm log per row), smoothed target encoding of a
high-cardinality category, and a hashing-trick collision audit (md5
bucket load histogram).

Exactness strategy (house rules): every sum that crosses engine
boundaries is integral (cents / micro-units / counts); floats appear
only in final per-row expressions written IDENTICALLY in both engines
(int->double casts mirror DuckDB's left-to-right evaluation).
"""

from ._common import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Exact AUC, one-vs-rest per event type: does `value` rank-predict the type?
# ---------------------------------------------------------------------------


def q_events_auc(sf_dir: str):
    """Exact Mann-Whitney AUC of ``value`` as a score for each event
    type (one-vs-rest).  The row-scale data collapses to a
    (cents, event_type) -> n histogram (combiner fold; distinct cents
    is bounded by the value RANGE, not the row count), and the AUC
    rank-sum is then a cumulative pass over that aggregate-scale
    histogram: U2 = sum_v pos_v * (2*cumneg_below(v) + neg_v), an
    EXACT integer in any summation order (python-int finish, immune to
    int64 overflow at 10^12 rows).  Only the final
    u2 / (2.0 * n_pos * n_neg) touches floats — identical int64/hugeint
    operands, identical double.  Ties get the standard half-credit via
    the +neg_v term."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = pa.table({"cents": pa.array(cents),
                      "event_type": batch["event_type"]})
        return t.group_by(["cents", "event_type"]).aggregate([([], "count_all")]) \
                .rename_columns(["cents", "event_type", "n"])

    hist = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["cents", "event_type"], {"n": ("n", "sum")},
    ).to_pandas()  # aggregate-scale: distinct cents x types

    piv = hist.pivot_table(index="cents", columns="event_type",
                           values="n", aggfunc="sum", fill_value=0)
    piv = piv.sort_index()
    tot = piv.sum(axis=1).to_numpy(np.int64)
    rows = []
    for ty in sorted(piv.columns):
        pos = piv[ty].to_numpy(np.int64)
        neg = tot - pos
        u2 = 0
        below = 0
        for p, ng in zip(pos.tolist(), neg.tolist()):  # aggregate-scale loop
            u2 += p * (2 * below + ng)
            below += ng
        n_pos = int(pos.sum())
        n_neg = int(neg.sum())
        if n_pos == 0 or n_neg == 0:
            continue
        auc = round_half_up(float(u2) / (2.0 * n_pos * n_neg), 6)
        rows.append((ty, n_pos, n_neg, auc))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_pos": pa.array([r[1] for r in rows], pa.int64()),
        "n_neg": pa.array([r[2] for r in rows], pa.int64()),
        "auc": pa.array([r[3] for r in rows], pa.float64()),
    })


SQL_EVENTS_AUC = """
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
tot AS (SELECT cents, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY 1),
g AS (
  SELECT ty.event_type, t.cents,
         COALESCE(cc.n, 0) AS pos, t.nt - COALESCE(cc.n, 0) AS neg
  FROM (SELECT DISTINCT event_type FROM events) ty
  CROSS JOIN tot t
  LEFT JOIN c cc ON cc.event_type = ty.event_type AND cc.cents = t.cents),
w AS (
  SELECT event_type, pos, neg,
         SUM(neg) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) - neg AS below
  FROM g),
u AS (
  SELECT event_type,
         SUM(CAST(pos AS HUGEINT) * (2 * CAST(below AS HUGEINT) + neg)) AS u2,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(neg) AS BIGINT) AS n_neg
  FROM w GROUP BY 1)
SELECT event_type, n_pos, n_neg,
       ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
FROM u
WHERE n_pos > 0 AND n_neg > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Calibration bins + per-bin Brier for "value predicts purchase"
# ---------------------------------------------------------------------------


def q_events_calibration(sf_dir: str):
    """Reliability-diagram bins for the naive score
    p = value / max(value) predicting event_type = 'purchase'.
    p is quantized to integer MICRO-units with floor-div
    (cents * 1e6 // max_cents — all operands positive, so DuckDB's
    truncating // == numpy floor //), bins are decile cuts of p_micro,
    and every per-bin statistic folds as integers:
    n, n_pos, sum(p_micro), sum((p_micro - y*1e6)^2).  Batch partials
    stay in int64 (1e12 * 16384 rows << 2^63); the final fold over
    (num_batches x 10) partial rows is python-int, so the operator is
    overflow-immune at any scale.  pos_rate / avg_pred / brier are
    final identical-operand divisions."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    mx = ev.aggregate(Max("value"))["max(value)"]
    max_cents = int(round_half_up(np.float64(mx) * 100.0, 0))

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        y = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        p = cents * 1_000_000 // max_cents
        b = np.minimum(p // 100_000, 9)
        d = (p - y * 1_000_000)
        df = pd.DataFrame({"bin": b, "one": 1, "y": y, "p": p, "sq": d * d})
        g = df.groupby("bin", sort=False).sum().reset_index()
        return pa.table({
            "bin": pa.array(g["bin"].to_numpy(np.int64)),
            "n": pa.array(g["one"].to_numpy(np.int64)),
            "n_pos": pa.array(g["y"].to_numpy(np.int64)),
            "sum_p": pa.array(g["p"].to_numpy(np.int64)),
            "sum_sq": pa.array(g["sq"].to_numpy(np.int64)),
        })

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    # metadata-scale final fold (num_batches x <=10 rows), python ints
    agg: dict[int, list] = {}
    for b, n, npos, sp, sq in parts.itertuples(index=False):
        a = agg.setdefault(int(b), [0, 0, 0, 0])
        a[0] += int(n); a[1] += int(npos); a[2] += int(sp); a[3] += int(sq)
    bins = sorted(agg)
    n = [agg[b][0] for b in bins]
    npos = [agg[b][1] for b in bins]
    sp = [agg[b][2] for b in bins]
    sq = [agg[b][3] for b in bins]
    return pa.table({
        "bin": pa.array(bins, pa.int64()),
        "n": pa.array(n, pa.int64()),
        "n_pos": pa.array(npos, pa.int64()),
        "pos_rate": pa.array(
            [round_half_up(float(a) / float(c), 6)
             for a, c in zip(npos, n)], pa.float64()),
        "avg_pred": pa.array(
            [round_half_up(float(a) / c / 1_000_000.0, 6)
             for a, c in zip(sp, n)], pa.float64()),
        "brier": pa.array(
            [round_half_up(float(a) / c / 1e12, 6)
             for a, c in zip(sq, n)], pa.float64()),
    })


SQL_EVENTS_CALIBRATION = """
WITH mx AS (
  SELECT CAST(round(MAX(value) * 100) AS BIGINT) AS max_cents FROM events),
e AS (
  SELECT CAST(round(value * 100) AS BIGINT) * 1000000 // mx.max_cents AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events CROSS JOIN mx),
b AS (SELECT LEAST(p // 100000, 9) AS bin, p, y FROM e)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS pos_rate,
       ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS avg_pred,
       ROUND(CAST(SUM(CAST(p - y * 1000000 AS HUGEINT)
                      * (p - y * 1000000)) AS DOUBLE)
             / COUNT(*) / 1e12, 6) AS brier
FROM b GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# PMI term-vs-language affinity (feature selection by class association)
# ---------------------------------------------------------------------------


def q_term_lang_pmi(sf_dir: str):
    """For the 50 highest-document-frequency terms (single-space split
    convention, doc-level PRESENCE), the pointwise mutual information
    of (term present, lang): pmi = ln(N * a / (df * n_lang)) per
    (term, lang) cell with a > 0.  All counts are integer folds
    (per-batch distinct-(doc, word) presence combiner -> one shuffle);
    the single ln per output row is libm on both engines (the tf-idf
    ln-parity trick), with identical int->double cast order."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def presence(batch: pa.Table) -> pa.Table:
        words, langs = [], []
        for text, lang in zip(batch["text"].to_pylist(),
                              batch["lang"].to_pylist()):
            for w in set(text.split(" ")):
                words.append(w)
                langs.append(lang)
        df = pd.DataFrame({"word": words, "lang": langs})
        g = df.groupby(["word", "lang"], sort=False).size().reset_index()
        return pa.table({
            "word": pa.array(g["word"].astype(str), pa.string()),
            "lang": pa.array(g["lang"].astype(str), pa.string()),
            "n_docs": pa.array(g[0].to_numpy(np.int64)),
        })

    wl = pre_aggregate(
        docs.map_batches(presence, batch_format="pyarrow"),
        ["word", "lang"], {"n_docs": ("n_docs", "sum")},
    ).to_pandas()  # vocab-scale

    nl = pre_aggregate(
        docs.select_columns(["lang"]), ["lang"], {"n_lang": (None, "count")}
    ).to_pandas()
    n_lang = dict(zip(nl["lang"], nl["n_lang"].astype(int)))
    big_n = int(nl["n_lang"].sum())

    df_t = wl.groupby("word")["n_docs"].sum()
    top = df_t.reset_index().sort_values(
        ["n_docs", "word"], ascending=[False, True]).head(50)
    dfmap = dict(zip(top["word"], top["n_docs"].astype(int)))

    out = wl[wl["word"].isin(dfmap)].copy()
    rows = []
    for w, lang, a in out[["word", "lang", "n_docs"]].itertuples(index=False):
        a = int(a)
        dfv = dfmap[w]
        pmi = round_half_up(
            math.log(float(big_n * a) / (dfv * n_lang[lang])), 6)
        rows.append((w, lang, a, dfv, pmi))
    rows.sort()
    return pa.table({
        "word": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
        "df": pa.array([r[3] for r in rows], pa.int64()),
        "pmi": pa.array([r[4] for r in rows], pa.float64()),
    })


SQL_TERM_LANG_PMI = """
WITH dw AS (
  SELECT DISTINCT doc_id, lang, w
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents)),
wl AS (SELECT w, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM dw GROUP BY 1, 2),
dft AS (SELECT w, CAST(SUM(n_docs) AS BIGINT) AS df FROM wl GROUP BY 1),
top AS (SELECT w, df FROM dft ORDER BY df DESC, w LIMIT 50),
nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
       FROM documents GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
SELECT t.w AS word, wl.lang AS lang, wl.n_docs, t.df,
       ROUND(ln(CAST(nn.n * wl.n_docs AS DOUBLE) / (t.df * nl.n_lang)), 6)
         AS pmi
FROM top t
JOIN wl ON wl.w = t.w
JOIN nl ON nl.lang = wl.lang
CROSS JOIN nn
ORDER BY word, lang
"""


# ---------------------------------------------------------------------------
# Smoothed target encoding: p_brand -> expected lineitem quantity
# ---------------------------------------------------------------------------


def q_brand_target_encoding(sf_dir: str):
    """Smoothed mean target encoding of the high-cardinality category
    p_brand against lineitem quantity:
    enc(brand) = (sum_qty + m * global_mean) / (n + m), m = 20.
    Quantities are integral -> int64 sums.  The brand attaches FIRST
    (dimension broadcast onto the fact stream), so per-batch partials
    collapse to brand cardinality (~25/batch) and the global fold is
    trivial — a per-partkey pre-aggregate here is the near-unique-key
    groupby pathology (measured 10.8 s vs ~2 s at sf0.1).
    global_mean is the identical int/int division in both engines and
    the final expression shares its operand order with the SQL."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    joined = broadcast_join(li, part, on="l_partkey",
                            right_on="p_partkey", how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        q = round_half_up(
            batch["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        df = pd.DataFrame({"p_brand": batch["p_brand"].to_pandas(),
                           "q": q, "one": 1})
        g = df.groupby("p_brand", sort=False).sum().reset_index()
        return pa.table({
            "p_brand": pa.array(g["p_brand"].astype(str), pa.string()),
            "sum_qty": pa.array(g["q"].to_numpy(np.int64)),
            "n": pa.array(g["one"].to_numpy(np.int64)),
        })

    g = pre_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["p_brand"], {"sum_qty": ("sum_qty", "sum"), "n": ("n", "sum")},
    ).to_pandas()  # brand-scale
    tq = int(g["sum_qty"].sum())
    tn = int(g["n"].sum())
    mu = float(tq) / tn
    g = g.sort_values("p_brand").reset_index(drop=True)
    enc = [round_half_up((int(sq) + 20 * mu) / (int(n) + 20), 6)
           for sq, n in zip(g["sum_qty"], g["n"])]
    return pa.table({
        "p_brand": pa.array(g["p_brand"].astype(str), pa.string()),
        "n": pa.array(g["n"].to_numpy(np.int64)),
        "sum_qty": pa.array(g["sum_qty"].to_numpy(np.int64)),
        "enc": pa.array(enc, pa.float64()),
    })


SQL_BRAND_TARGET_ENCODING = """
WITH g AS (
  SELECT p.p_brand,
         CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1),
t AS (SELECT CAST(SUM(sum_qty) AS BIGINT) AS tq,
             CAST(SUM(n) AS BIGINT) AS tn FROM g)
SELECT g.p_brand, g.n, g.sum_qty,
       ROUND((g.sum_qty + 20 * (CAST(t.tq AS DOUBLE) / t.tn)) / (g.n + 20), 6)
         AS enc
FROM g CROSS JOIN t ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Hashing-trick collision audit: md5-bucket load histogram over the vocab
# ---------------------------------------------------------------------------


def q_feature_hash_audit(sf_dir: str):
    """Feature-hashing collision audit: distinct corpus terms
    (single-space split) hash into 1024 buckets via the md5-prefix
    convention (== DuckDB CAST('0x' || substr(md5(w),1,13) AS BIGINT)
    % 1024, the DSIR hash); the output is the bucket LOAD histogram
    (load -> number of buckets), the quantity that decides whether a
    hashing-trick feature space is too small.  One shuffle (distinct
    words); hashing + the two nested counts run at vocab scale."""
    from kgray.ops.dsir import _token_buckets

    docs = _read(sf_dir, "documents", ["text"])

    def words(batch: pa.Table) -> pa.Table:
        uniq = set()
        for t in batch["text"].to_pylist():
            uniq.update(t.split(" "))
        return pa.table({"word": pa.array(sorted(uniq), pa.string())})

    vocab = pre_aggregate(
        docs.map_batches(words, batch_format="pyarrow"),
        ["word"], {"n": (None, "count")},
    ).to_pandas()  # vocab-scale
    b = _token_buckets(vocab["word"].to_numpy(object), 1024)
    load = pd.Series(b).value_counts()
    hist = load.value_counts().sort_index()
    return pa.table({
        "load": pa.array(hist.index.to_numpy(np.int64)),
        "n_buckets": pa.array(hist.to_numpy(np.int64)),
    })


SQL_FEATURE_HASH_AUDIT = """
WITH w AS (
  SELECT DISTINCT w
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
b AS (
  SELECT CAST('0x' || substr(md5(w), 1, 13) AS BIGINT) % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS load
  FROM w GROUP BY 1)
SELECT load, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM b GROUP BY 1 ORDER BY load
"""


# ---------------------------------------------------------------------------
# Rank-1 integer ALS: customer x part implicit-feedback factorization
# ---------------------------------------------------------------------------


def q_part_als_factors(sf_dir: str):
    """Two full rounds of rank-1 integer fixed-point ALS over the
    customer x part quantity matrix (``ops/factor.als1``) — top-20 item
    factors.  The integer half-step ``S^2 * num // den`` is
    summation-order-exact, so the DuckDB oracle UNROLLS the identical
    recurrence as stacked CTE layers (the pagerank_int / kmeans_int
    iterative-ML oracle pattern); all operands non-negative, so
    truncating and flooring division agree."""
    from kgray.ops.factor import als1

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = bucket_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                    how="inner")

    def qint(batch: pa.Table) -> pa.Table:
        q = round_half_up(
            batch["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        return pa.table({"o_custkey": batch["o_custkey"],
                         "l_partkey": batch["l_partkey"],
                         "q": pa.array(q)})

    # (custkey, partkey) pairs are NEAR-UNIQUE (599k of 600k rows at
    # sf0.1): a per-batch combiner compresses nothing and
    # groupby.aggregate degenerates — dedup inside ONE custkey-keyed
    # coarse-bucket cogroup instead (19.3 s -> seconds)
    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "l_partkey"], sort=False)["q"] \
            .sum().reset_index()
        return g.rename(columns={"q": "r"}).astype({"r": np.int64})

    r = grouped_map(j.map_batches(qint, batch_format="pyarrow"),
                    "o_custkey", dedup)
    _, v = als1(r, "o_custkey", "l_partkey", "r", iters=2)
    df = v.to_pandas()  # item-key-scale
    df = df.sort_values(["f", "l_partkey"],
                        ascending=[False, True]).head(20)
    return pa.table({
        "l_partkey": pa.array(df["l_partkey"].to_numpy(np.int64)),
        "f": pa.array(df["f"].to_numpy(np.int64)),
    })


SQL_PART_ALS_FACTORS = """
WITH r AS (
  SELECT o.o_custkey AS c, l.l_partkey AS i,
         CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS r
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2),
v0 AS (SELECT DISTINCT i, CAST(10000 AS HUGEINT) AS f FROM r),
u1 AS (SELECT r.c,
              CAST(100000000 AS HUGEINT) * SUM(r.r * v0.f)
                // SUM(v0.f * v0.f) AS f
       FROM r JOIN v0 ON v0.i = r.i GROUP BY r.c),
v1 AS (SELECT r.i,
              CAST(100000000 AS HUGEINT) * SUM(r.r * u1.f)
                // SUM(u1.f * u1.f) AS f
       FROM r JOIN u1 ON u1.c = r.c GROUP BY r.i),
u2 AS (SELECT r.c,
              CAST(100000000 AS HUGEINT) * SUM(r.r * v1.f)
                // SUM(v1.f * v1.f) AS f
       FROM r JOIN v1 ON v1.i = r.i GROUP BY r.c),
v2 AS (SELECT r.i,
              CAST(100000000 AS HUGEINT) * SUM(r.r * u2.f)
                // SUM(u2.f * u2.f) AS f
       FROM r JOIN u2 ON u2.c = r.c GROUP BY r.i)
SELECT i AS l_partkey, CAST(f AS BIGINT) AS f
FROM v2 ORDER BY f DESC, l_partkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Decision-stump split finder: IG-optimal threshold of value vs purchase
# ---------------------------------------------------------------------------


def q_value_split_gain(sf_dir: str):
    """The tree-learner primitive at scale: the information-gain-optimal
    binary split of ``value`` for predicting event_type = 'purchase'.
    The row-scale pass is ONE histogram fold to (cents -> n, n_pos);
    every candidate split is then a prefix of that aggregate-scale
    histogram (cumulative n/pos), and the entropy expression is written
    IDENTICALLY in both engines over identical integer operands —
    ln(count) is a single libm call per term (memoized per distinct
    count on the Ray side), and the combining arithmetic shares its
    operation tree with the SQL, so the doubles agree bit-for-bit.
    Top-5 splits by (gain DESC, cents ASC)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        y = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df = pd.DataFrame({"cents": cents, "n": 1, "npos": y})
        g = df.groupby("cents", sort=False).sum().reset_index()
        return pa.table({
            "cents": pa.array(g["cents"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "npos": pa.array(g["npos"].to_numpy(np.int64)),
        })

    hist = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["cents"], {"n": ("n", "sum"), "npos": ("npos", "sum")},
    ).to_pandas().sort_values("cents")  # aggregate-scale

    _ln_memo: dict[int, float] = {}

    def ln(x: int) -> float:
        if x not in _ln_memo:
            _ln_memo[x] = math.log(float(x))
        return _ln_memo[x]

    def ent(n: int, p: int) -> float:
        q = n - p
        return ln(n) - ((p * ln(p) if p > 0 else 0.0)
                        + (q * ln(q) if q > 0 else 0.0)) / n

    n_arr = hist["n"].to_numpy(np.int64)
    p_arr = hist["npos"].to_numpy(np.int64)
    c_arr = hist["cents"].to_numpy(np.int64)
    nt, pt = int(n_arr.sum()), int(p_arr.sum())
    entp = ent(nt, pt)
    rows = []
    nl = pl = 0
    for c, dn, dp in zip(c_arr.tolist(), n_arr.tolist(), p_arr.tolist()):
        nl += dn
        pl += dp
        if nl >= nt:
            break  # empty right side: not a split
        nr, pr = nt - nl, pt - pl
        gain = entp - (nl * ent(nl, pl) + nr * ent(nr, pr)) / nt
        rows.append((c, nl, pl, gain))
    # order by the RAW gain exactly as the SQL does (sorting on the
    # rounded value would tie-break differently when two candidates
    # differ only beyond 6 decimals), round only for output
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:5]
    return pa.table({
        "split_cents": pa.array([r[0] for r in rows], pa.int64()),
        "nl": pa.array([r[1] for r in rows], pa.int64()),
        "pl": pa.array([r[2] for r in rows], pa.int64()),
        "gain": pa.array([round_half_up(r[3], 6) for r in rows],
                         pa.float64()),
    })


SQL_VALUE_SPLIT_GAIN = """
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS npos
  FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(npos) AS BIGINT) AS pt FROM h),
c AS (
  SELECT cents,
         CAST(SUM(n) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS nl,
         CAST(SUM(npos) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS pl,
         tot.nt, tot.pt
  FROM h CROSS JOIN tot),
g AS (
  SELECT cents, nl, pl,
         (ln(CAST(nt AS DOUBLE))
          - ((CASE WHEN pt > 0 THEN pt * ln(CAST(pt AS DOUBLE)) ELSE 0 END)
             + (CASE WHEN nt - pt > 0
                THEN (nt - pt) * ln(CAST(nt - pt AS DOUBLE)) ELSE 0 END))
            / nt)
         - (nl * (ln(CAST(nl AS DOUBLE))
              - ((CASE WHEN pl > 0
                  THEN pl * ln(CAST(pl AS DOUBLE)) ELSE 0 END)
                 + (CASE WHEN nl - pl > 0
                    THEN (nl - pl) * ln(CAST(nl - pl AS DOUBLE))
                    ELSE 0 END)) / nl)
            + (nt - nl) * (ln(CAST(nt - nl AS DOUBLE))
              - ((CASE WHEN pt - pl > 0
                  THEN (pt - pl) * ln(CAST(pt - pl AS DOUBLE)) ELSE 0 END)
                 + (CASE WHEN (nt - nl) - (pt - pl) > 0
                    THEN ((nt - nl) - (pt - pl))
                         * ln(CAST((nt - nl) - (pt - pl) AS DOUBLE))
                    ELSE 0 END)) / (nt - nl))) / nt
         AS gain_raw
  FROM c WHERE nl < nt)
SELECT cents AS split_cents, nl, pl, ROUND(gain_raw, 6) AS gain
FROM g ORDER BY gain_raw DESC, cents LIMIT 5
"""


# ---------------------------------------------------------------------------
# CDC log compaction: latest-op-wins apply with deletes and resurrections
# ---------------------------------------------------------------------------


def q_orders_cdc_apply(sf_dir: str):
    """CDC apply / log compaction — the MERGE variant ``orders_upsert``
    does NOT cover: a change log with sequenced U(pdate) and D(elete)
    ops per key, latest-op-wins, where a D can kill a key and a later U
    resurrects it.  The deterministic log derives per batch from the
    same pruned read in BOTH engines (seq 1: U +100 cents for keys %3,
    seq 2: D for keys %4, seq 3: U +500 for keys %5 — keys %12 die,
    keys %20 and %60 resurrect); compaction is ONE key cogroup
    (vectorized sort + keep-last per key), and the digest is a
    priority-level integer fold."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def log_rows(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy()
        cents = round_half_up(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        pr = np.asarray(batch["o_orderpriority"].to_pylist(), object)
        ks, cs, ps, seqs, ops = [k], [cents], [pr], \
            [np.zeros(len(k), np.int64)], [np.full(len(k), "U", object)]
        for seq, mod, delta, op in ((1, 3, 100, "U"), (2, 4, 0, "D"),
                                    (3, 5, 500, "U")):
            m = k % mod == 0
            ks.append(k[m])
            cs.append(cents[m] + delta)
            ps.append(pr[m])
            seqs.append(np.full(int(m.sum()), seq, np.int64))
            ops.append(np.full(int(m.sum()), op, object))
        return pa.table({
            "k": pa.array(np.concatenate(ks)),
            "cents": pa.array(np.concatenate(cs)),
            "pr": pa.array(np.concatenate(ps).astype(str), pa.string()),
            "seq": pa.array(np.concatenate(seqs)),
            "op": pa.array(np.concatenate(ops).astype(str), pa.string()),
        })

    log = orders.map_batches(log_rows, batch_format="pyarrow")

    def compact(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "seq"], kind="mergesort")
        last = df.drop_duplicates("k", keep="last")
        alive = last[last["op"] == "U"]
        g = alive.groupby("pr", sort=False).agg(
            n=("k", "size"), sum_cents=("cents", "sum")).reset_index()
        return g.astype({"n": np.int64, "sum_cents": np.int64})

    return pre_aggregate(
        grouped_map(log, "k", compact),
        ["pr"], {"n": ("n", "sum"), "sum_cents": ("sum_cents", "sum")},
    ).rename_columns(["o_orderpriority", "n", "sum_cents"]) \
        .sort("o_orderpriority")


SQL_ORDERS_CDC_APPLY = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS pr, 0 AS seq, 'U' AS op
  FROM orders),
log AS (
  SELECT * FROM base
  UNION ALL SELECT k, cents + 100, pr, 1, 'U' FROM base WHERE k % 3 = 0
  UNION ALL SELECT k, cents, pr, 2, 'D' FROM base WHERE k % 4 = 0
  UNION ALL SELECT k, cents + 500, pr, 3, 'U' FROM base WHERE k % 5 = 0),
last AS (
  SELECT k, cents, pr, op
  FROM log QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) = 1)
SELECT pr AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM last WHERE op = 'U'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Differentially-private noisy counts (seeded Laplace, deterministic)
# ---------------------------------------------------------------------------


def q_dp_event_counts(sf_dir: str):
    """DP release of per-type event counts with SEEDED Laplace noise —
    the privacy-preserving publication step of a curation pipeline,
    made oracle-checkable by deriving the noise deterministically:
    u = md5('dp1:' || type) 13-hex prefix / 16^13 (exactly
    representable: 16^13 = 2^52), noise = -(1/eps) * sign(u - 0.5) *
    ln(1 - 2*|u - 0.5|) (inverse-CDF Laplace), eps = 1.  One count
    fold; a single libm ln per output row over identical doubles."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_type"])
    g = pre_aggregate(ev, ["event_type"],
                      {"n": (None, "count")}).to_pandas()
    g = g.sort_values("event_type").reset_index(drop=True)
    noisy = []
    for ty, n in zip(g["event_type"], g["n"]):
        h = int(hashlib.md5(f"dp1:{ty}".encode()).hexdigest()[:13], 16)
        u = h / 16 ** 13
        a = abs(u - 0.5)
        if a == 0.0:
            noise = 0.0
        else:
            sgn = -1.0 if u >= 0.5 else 1.0
            noise = sgn * math.log(1.0 - 2.0 * a)
        noisy.append(round_half_up(int(n) + noise, 6))
    return pa.table({
        "event_type": pa.array(g["event_type"].astype(str), pa.string()),
        "n": pa.array(g["n"].to_numpy(np.int64)),
        "noisy_n": pa.array(noisy, pa.float64()),
    })


SQL_DP_EVENT_COUNTS = """
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
u AS (
  SELECT event_type, n,
         CAST(CAST('0x' || substr(md5('dp1:' || event_type), 1, 13)
                   AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS u
  FROM c)
SELECT event_type, n,
       ROUND(n + CASE WHEN abs(u - 0.5) = 0.0 THEN 0.0
                      ELSE (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                           * ln(1.0 - 2.0 * abs(u - 0.5)) END, 6)
         AS noisy_n
FROM u ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Auto-skew-defused join: hot-key census routes around the shuffle
# ---------------------------------------------------------------------------


def q_orders_skew_join(sf_dir: str):
    """``joins.skew_join`` end-to-end under REAL skew: every 5th order
    re-keys to customer 1 (a ~20% hot key no plain hash join should
    eat in one bucket), the wrapper's census detects it, routes the hot
    rows through a broadcast of customer 1's row, bucket-joins the
    rest, and the digest folds per market segment.  The SQL oracle
    applies the identical re-key and joins flat — results must agree
    because skew handling is pure routing."""
    from kgray.ops.joins import skew_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def rekey(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy().copy()
        k[k % 5 == 0] = 1
        cents = round_half_up(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({"ck": pa.array(k), "cents": pa.array(cents)})

    j = skew_join(orders.map_batches(rekey, batch_format="pyarrow"),
                  cust, on="ck", right_on="c_custkey", how="inner",
                  hot_share=0.05)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c_mktsegment": batch["c_mktsegment"].to_pandas(),
                           "cents": batch["cents"].to_numpy(),
                           "one": 1})
        g = df.groupby("c_mktsegment", sort=False).sum().reset_index()
        return pa.table({
            "c_mktsegment": pa.array(g["c_mktsegment"].astype(str),
                                     pa.string()),
            "n": pa.array(g["one"].to_numpy(np.int64)),
            "sum_cents": pa.array(g["cents"].to_numpy(np.int64)),
        })

    return pre_aggregate(
        j.map_batches(partial, batch_format="pyarrow"),
        ["c_mktsegment"],
        {"n": ("n", "sum"), "sum_cents": ("sum_cents", "sum")},
    ).sort("c_mktsegment")


SQL_ORDERS_SKEW_JOIN = """
WITH o AS (
  SELECT CASE WHEN o_custkey % 5 = 0 THEN 1 ELSE o_custkey END AS ck,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders)
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o.cents) AS BIGINT) AS sum_cents
FROM o JOIN customer c ON c.c_custkey = o.ck
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Weight-of-evidence bands: the credit-scoring / feature-binning encoder
# ---------------------------------------------------------------------------


def q_events_woe_bands(sf_dir: str):
    """Weight-of-evidence encoding of the value deciles against
    event_type = 'purchase': per band, WoE = ln(pos_share / neg_share)
    with shares as identical int/int divisions and ONE libm ln per
    row; iv_term = (pos_share - neg_share) * WoE emitted per band (the
    information-value summand; the total is the reader's sum — a
    cross-band float fold would be summation-order-sensitive).  Bands
    are fixed micro-unit decile cuts of value / max(value), the same
    quantization as events_calibration."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    mx = ev.aggregate(Max("value"))["max(value)"]
    max_cents = int(round_half_up(np.float64(mx) * 100.0, 0))

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        y = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        b = np.minimum(cents * 1_000_000 // max_cents // 100_000, 9)
        df = pd.DataFrame({"band": b, "pos": y, "neg": 1 - y})
        g = df.groupby("band", sort=False).sum().reset_index()
        return pa.table({
            "band": pa.array(g["band"].to_numpy(np.int64)),
            "pos": pa.array(g["pos"].to_numpy(np.int64)),
            "neg": pa.array(g["neg"].to_numpy(np.int64)),
        })

    g = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["band"], {"pos": ("pos", "sum"), "neg": ("neg", "sum")},
    ).to_pandas().sort_values("band")
    tp, tn = int(g["pos"].sum()), int(g["neg"].sum())
    rows = []
    for band, p, n in g.itertuples(index=False):
        p, n = int(p), int(n)
        if p == 0 or n == 0:
            continue  # undefined WoE band: dropped on both sides
        ps = p / tp
        ns = n / tn
        woe = math.log(ps / ns)
        rows.append((int(band), p, n, round_half_up(woe, 6),
                     round_half_up((ps - ns) * woe, 6)))
    return pa.table({
        "band": pa.array([r[0] for r in rows], pa.int64()),
        "n_pos": pa.array([r[1] for r in rows], pa.int64()),
        "n_neg": pa.array([r[2] for r in rows], pa.int64()),
        "woe": pa.array([r[3] for r in rows], pa.float64()),
        "iv_term": pa.array([r[4] for r in rows], pa.float64()),
    })


SQL_EVENTS_WOE_BANDS = """
WITH mx AS (
  SELECT CAST(round(MAX(value) * 100) AS BIGINT) AS max_cents FROM events),
e AS (
  SELECT LEAST(CAST(round(value * 100) AS BIGINT) * 1000000
                 // mx.max_cents // 100000, 9) AS band,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events CROSS JOIN mx),
g AS (SELECT band, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM e GROUP BY band),
t AS (SELECT CAST(SUM(pos) AS BIGINT) AS tp,
             CAST(SUM(neg) AS BIGINT) AS tn FROM g)
SELECT band, pos AS n_pos, neg AS n_neg,
       ROUND(ln((CAST(pos AS DOUBLE) / t.tp)
                / (CAST(neg AS DOUBLE) / t.tn)), 6) AS woe,
       ROUND((CAST(pos AS DOUBLE) / t.tp - CAST(neg AS DOUBLE) / t.tn)
             * ln((CAST(pos AS DOUBLE) / t.tp)
                  / (CAST(neg AS DOUBLE) / t.tn)), 6) AS iv_term
FROM g CROSS JOIN t
WHERE pos > 0 AND neg > 0
ORDER BY band
"""


# ---------------------------------------------------------------------------
# Integer Holt linear-trend forecast per order priority
# ---------------------------------------------------------------------------

_HOLT_OFF = 1 << 42  # negative-safe floor-div offset (see fdiv note)


def q_orders_holt_forecast(sf_dir: str):
    """Holt's linear-trend double exponential smoothing over the daily
    revenue series of each order priority, in INTEGER fixed point
    (alpha = beta = 1/4):

        l_t = fdiv(c_t + 3*(l_{t-1} + b_{t-1}), 4)
        b_t = fdiv((l_t - l_{t-1}) + 3*b_{t-1}, 4)

    The trend b goes NEGATIVE, where DuckDB's ``//`` truncates toward
    zero but numpy floors (the EWMA lesson) — so both engines use the
    same offset form fdiv(x, 4) = (x + OFF*4) // 4 - OFF, whose operand
    is always positive: truncate == floor, bit-exact everywhere.  The
    oracle advances every series one day per recursive-CTE step (the
    events_int_ewma variable-length-per-key recurrence pattern); the
    Ray side runs the identical python-int recurrence inside one
    priority cogroup over the (priority, day) combiner fold."""
    orders = _read(sf_dir, "orders",
                   ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        day = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        df = pd.DataFrame({"pr": batch["o_orderpriority"].to_pandas(),
                           "day": day, "c": cents})
        g = df.groupby(["pr", "day"], sort=False)["c"].sum().reset_index()
        return pa.table({
            "pr": pa.array(g["pr"].astype(str), pa.string()),
            "day": pa.array(g["day"].to_numpy("datetime64[us]")),
            "c": pa.array(g["c"].to_numpy(np.int64)),
        })

    daily = pre_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["pr", "day"], {"c": ("c", "sum")},
    )

    off4 = _HOLT_OFF * 4

    def fdiv4(x: int) -> int:
        return (x + off4) // 4 - _HOLT_OFF

    def holt(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pr, g in df.groupby("pr", sort=False):
            g = g.sort_values("day")
            cs = [int(x) for x in g["c"]]
            l, b = cs[0], 0
            for c in cs[1:]:
                l_new = fdiv4(c + 3 * (l + b))
                b = fdiv4((l_new - l) + 3 * b)
                l = l_new
            rows.append((pr, len(cs), l, b, l + b, l + 7 * b))
        return pd.DataFrame(rows, columns=[
            "o_orderpriority", "n_days", "level", "trend",
            "forecast_1", "forecast_7",
        ]).astype({c: np.int64 for c in
                   ("n_days", "level", "trend", "forecast_1",
                    "forecast_7")})

    return grouped_map(daily, "pr", holt).sort("o_orderpriority")


SQL_ORDERS_HOLT_FORECAST = f"""
WITH RECURSIVE d AS (
  SELECT o_orderpriority AS pr, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
idx AS (SELECT pr, day, c,
               ROW_NUMBER() OVER (PARTITION BY pr ORDER BY day) AS t
        FROM d),
n AS (SELECT pr, CAST(MAX(t) AS BIGINT) AS tmax FROM idx GROUP BY pr),
rec AS (
  SELECT pr, t, c AS l, CAST(0 AS BIGINT) AS b FROM idx WHERE t = 1
  UNION ALL
  SELECT i.pr, i.t,
         (i.c + 3 * (r.l + r.b) + {_HOLT_OFF * 4}) // 4 - {_HOLT_OFF} AS l,
         ((((i.c + 3 * (r.l + r.b) + {_HOLT_OFF * 4}) // 4 - {_HOLT_OFF})
           - r.l) + 3 * r.b + {_HOLT_OFF * 4}) // 4 - {_HOLT_OFF} AS b
  FROM rec r JOIN idx i ON i.pr = r.pr AND i.t = r.t + 1)
SELECT r.pr AS o_orderpriority, n.tmax AS n_days,
       r.l AS level, r.b AS trend,
       r.l + r.b AS forecast_1, r.l + 7 * r.b AS forecast_7
FROM rec r JOIN n ON n.pr = r.pr AND r.t = n.tmax
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Length-bucket padding-waste audit (training batch efficiency)
# ---------------------------------------------------------------------------


def q_doclen_padding_waste(sf_dir: str):
    """Sequence-length bucketing audit: docs bucket to the next
    multiple-of-64 token boundary (capped at 1024, the truncation
    length), and the padding waste a length-bucketed batcher would pay
    is bucket_edge - effective_len per doc.  All integer folds; the
    one ratio divides identical BIGINTs.  The whitespace token count
    uses the corpus split convention (len(string_split(text, ' ')))."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        ntok = np.fromiter(
            (len(t.split(" ")) for t in batch["text"].to_pylist()),
            np.int64, len(batch))
        eff = np.minimum(ntok, 1024)
        edge = np.minimum((ntok + 63) // 64 * 64, 1024)
        df = pd.DataFrame({"bucket": edge, "one": 1, "tok": eff,
                           "waste": edge - eff})
        g = df.groupby("bucket", sort=False).sum().reset_index()
        return pa.table({
            "bucket": pa.array(g["bucket"].to_numpy(np.int64)),
            "n_docs": pa.array(g["one"].to_numpy(np.int64)),
            "sum_tokens": pa.array(g["tok"].to_numpy(np.int64)),
            "sum_waste": pa.array(g["waste"].to_numpy(np.int64)),
        })

    g = pre_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], {"n_docs": ("n_docs", "sum"),
                     "sum_tokens": ("sum_tokens", "sum"),
                     "sum_waste": ("sum_waste", "sum")},
    ).to_pandas().sort_values("bucket")
    pct = [round_half_up(float(w) / (int(w) + int(t)), 6) if (int(w) + int(t)) else 0.0
           for w, t in zip(g["sum_waste"], g["sum_tokens"])]
    return pa.table({
        "bucket": pa.array(g["bucket"].to_numpy(np.int64)),
        "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
        "sum_tokens": pa.array(g["sum_tokens"].to_numpy(np.int64)),
        "sum_waste": pa.array(g["sum_waste"].to_numpy(np.int64)),
        "waste_pct": pa.array(pct, pa.float64()),
    })


SQL_DOCLEN_PADDING_WASTE = """
WITH d AS (
  SELECT len(string_split(text, ' ')) AS ntok FROM documents),
b AS (
  SELECT LEAST((ntok + 63) // 64 * 64, 1024) AS bucket,
         LEAST(ntok, 1024) AS eff,
         LEAST((ntok + 63) // 64 * 64, 1024) - LEAST(ntok, 1024) AS waste
  FROM d)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(eff) AS BIGINT) AS sum_tokens,
       CAST(SUM(waste) AS BIGINT) AS sum_waste,
       CASE WHEN SUM(waste) + SUM(eff) = 0 THEN 0.0
            ELSE ROUND(CAST(SUM(waste) AS DOUBLE)
                       / (SUM(waste) + SUM(eff)), 6) END AS waste_pct
FROM b GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Chunk-level exact dedup rate (RAG chunking x dedup composition)
# ---------------------------------------------------------------------------


def q_chunk_dup_rate(sf_dir: str):
    """Composition of the RAG chunker (doc_chunks window/stride
    convention: [k*90, k*90+120) char windows) with exact dedup at
    CHUNK granularity — the near-boilerplate measurement chunk-level
    retrieval corpora need.  Chunk identity is md5(chunk_text) in BOTH
    engines (identical even under collisions, so distinct counts agree
    by construction); one (source, hash) shuffle at chunk scale, then a
    source-level integer fold.  dup_rate = (n_chunks - n_distinct) /
    n_chunks on identical BIGINTs."""
    import hashlib

    docs = _read(sf_dir, "documents", ["text", "source"])

    def chunk_hashes(batch: pa.Table) -> pa.Table:
        srcs, hs = [], []
        for text, src in zip(batch["text"].to_pylist(),
                             batch["source"].to_pylist()):
            n = len(text)
            k = 1 + max(0, -(-(n - 120) // 90)) if n > 120 else 1
            for i in range(k):
                c = text[i * 90: i * 90 + 120]
                srcs.append(src)
                hs.append(hashlib.md5(c.encode()).hexdigest())
        df = pd.DataFrame({"source": srcs, "h": hs})
        g = df.groupby(["source", "h"], sort=False).size().reset_index()
        return pa.table({
            "source": pa.array(g["source"].astype(str), pa.string()),
            "h": pa.array(g["h"].astype(str), pa.string()),
            "n": pa.array(g[0].to_numpy(np.int64)),
        })

    per_hash = pre_aggregate(
        docs.map_batches(chunk_hashes, batch_format="pyarrow"),
        ["source", "h"], {"n": ("n", "sum")},
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": batch["source"].to_pandas(),
                           "n": batch["n"].to_numpy(), "one": 1})
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.table({
            "source": pa.array(g["source"].astype(str), pa.string()),
            "n_chunks": pa.array(g["n"].to_numpy(np.int64)),
            "n_distinct": pa.array(g["one"].to_numpy(np.int64)),
        })

    g = pre_aggregate(
        per_hash.map_batches(partial, batch_format="pyarrow"),
        ["source"], {"n_chunks": ("n_chunks", "sum"),
                     "n_distinct": ("n_distinct", "sum")},
    ).to_pandas().sort_values("source")
    rate = [round_half_up(float(int(c) - int(d)) / int(c), 6)
            for c, d in zip(g["n_chunks"], g["n_distinct"])]
    return pa.table({
        "source": pa.array(g["source"].astype(str), pa.string()),
        "n_chunks": pa.array(g["n_chunks"].to_numpy(np.int64)),
        "n_distinct": pa.array(g["n_distinct"].to_numpy(np.int64)),
        "dup_rate": pa.array(rate, pa.float64()),
    })


SQL_CHUNK_DUP_RATE = """
WITH c AS (
  SELECT source,
         md5(substr(text, CAST(i * 90 + 1 AS BIGINT),
                    CAST(120 AS BIGINT))) AS h
  FROM documents,
       UNNEST(range(0, 1 + GREATEST(0,
              CAST(CEIL((len(text) - 120) / 90.0) AS BIGINT)))) AS t(i)),
d AS (SELECT source, h, CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY 1, 2)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n), 6) AS dup_rate
FROM d GROUP BY source ORDER BY source
"""
