"""Session-17 operator batch: entity-resolution golden-record fusion
(survivorship over Fellegi-Sunter match clusters), graph modularity of
the LPA communities (exact-int numerator), Theil-Sen robust trend
(lower-median pairwise slope), an oracle-checked Naive-Bayes
train-and-predict loop (integer micro-unit log-likelihoods), and a
per-language Zipf-law fit.
"""

from ._common import *  # noqa: F401,F403

from kgray.queries.analytics4 import _COPURCHASE_EDGE_SQL, _copurchase_edges
from kgray.queries.analytics7 import (_FS_CTES_SQL, _FS_MATCH, _LPA_ROUNDS,
                                      _lpa_sql, q_customer_linkage_scores)

# ---------------------------------------------------------------------------
# ER golden record: linkage matches -> connected components -> survivorship
# ---------------------------------------------------------------------------


def _fs_records(sf_dir: str):
    """The two record sources the Fellegi-Sunter linkage scores compare
    (customer + its deterministically perturbed snapshot), as ONE union
    table (k, name, band) — the same derivations as
    analytics7.q_customer_linkage_scores / _FS_CTES_SQL."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal"])

    def synth(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        k = df["c_custkey"].to_numpy(np.int64)
        name = df["c_name"].to_numpy(object)
        cents = round_half_up(
            df["c_acctbal"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        band = (cents + 1_000_000) // 100_000
        name_b = np.where(k % 5 == 0, df["c_name"] + "~", name)
        band_b = band + (k % 2 == 0).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.concatenate([k, k + 1_000_000])),
                "name": pa.array(
                    np.concatenate([name, name_b.astype(object)]),
                    pa.string(),
                ),
                "band": pa.array(np.concatenate([band, band_b])),
            }
        )

    return cust.map_batches(synth, batch_format="pyarrow")


def q_customer_golden_record(sf_dir: str):
    """Golden-record fusion (the step AFTER probabilistic linkage): the
    Fellegi-Sunter match pairs become edges, connected components give
    cluster ids (min node id), and a deterministic survivorship rule
    fuses each multi-record cluster into one canonical record — name
    from the lowest-key member, band = MAX over members.  The component
    map is edge-node-scale (matched records only), so the record table
    inner-joins against it WITHOUT shuffling unmatched records; fusion
    is one cluster cogroup.  Oracle: the linkage CTE prefix + the
    recursive-CTE min-label closure + the same survivorship aggregate.
    """
    from kgray.ops.canonical import connected_components

    pairs = q_customer_linkage_scores(sf_dir)

    def only_matches(b: pa.Table) -> pa.Table:
        m = pc.equal(b["is_match"], 1)
        return pa.table({"u": b["u"].filter(m), "v": b["v"].filter(m)})

    edges = pairs.map_batches(only_matches, batch_format="pyarrow")
    comp = connected_components(edges)  # (node, component)
    recs = _fs_records(sf_dir)
    lab = broadcast_join(recs, comp, on="k", right_on="node", how="inner")

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["component", "k"], kind="mergesort")
        g = df.groupby("component", sort=False)
        out = g.agg(
            n_records=("k", "size"),
            canonical_name=("name", "first"),
            band_max=("band", "max"),
        ).reset_index()
        out = out[out["n_records"] >= 2]
        return pd.DataFrame(
            {
                "cluster": out["component"].to_numpy(np.int64),
                "n_records": out["n_records"].to_numpy(np.int64),
                "canonical_name": out["canonical_name"],
                "band_max": out["band_max"].to_numpy(np.int64),
            }
        )

    return grouped_map(lab, "component", fuse)


SQL_CUSTOMER_GOLDEN_RECORD = f"""
WITH RECURSIVE {_FS_CTES_SQL},
matches AS (SELECT u, v FROM p WHERE score >= {_FS_MATCH}),
sym AS (SELECT u AS src, v AS dst FROM matches
        UNION ALL SELECT v, u FROM matches),
cc AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
recs AS (SELECT k, name, band FROM a UNION ALL SELECT k, name, band FROM b),
lab AS (SELECT comp.component AS cluster, recs.k, recs.name, recs.band
        FROM comp JOIN recs ON recs.k = comp.node),
g AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_records,
             MIN(k) AS kmin, CAST(MAX(band) AS BIGINT) AS band_max
      FROM lab GROUP BY 1 HAVING COUNT(*) >= 2)
SELECT CAST(g.cluster AS BIGINT) AS cluster, g.n_records,
       l.name AS canonical_name, g.band_max
FROM g JOIN lab l ON l.cluster = g.cluster AND l.k = g.kmin
"""


# ---------------------------------------------------------------------------
# modularity of the LPA communities over the co-purchase graph
# ---------------------------------------------------------------------------

def q_copurchase_modularity(sf_dir: str):
    """Newman modularity per LPA community, in EXACT integers: with m =
    |edges|, e_c = intra-community edges and d_c = summed degree, the
    per-community contribution Q_c = e_c/m - (d_c/2m)^2 scales to the
    integer numerator q_num = 4*m*e_c - d_c^2 over the common
    denominator 4*m^2 — both engines then divide the identical int64 by
    the identical double (the exact-int-ratio lesson).  Label attach is
    two bucket joins (node-scale right side, no broadcast assumption);
    e_in / deg_sum / n_nodes are combiner folds; the final merge runs on
    community-scale aggregates.  Overflow headroom: |q_num| <=
    4*m*e_c + d_c^2 <= 8*m^2, safe to m ~ 10^9 edges per graph."""
    from kgray.ops.graph import lpa_labels, node_degrees

    edges = _copurchase_edges(sf_dir).materialize()
    m = edges.count()
    lab = lpa_labels(edges, rounds=_LPA_ROUNDS)
    lab_ds = rd.from_arrow(lab) if isinstance(lab, pa.Table) else lab
    lab_ds = lab_ds.materialize()

    eu = bucket_join(edges, lab_ds, on="u", right_on="node", how="inner")
    ev = bucket_join(eu, lab_ds, on="v", right_on="node", how="inner")

    def intra(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["lbl"], batch["lbl_r"])
        return pa.table({"lbl": batch["lbl"].filter(keep)})

    e_in = pre_aggregate(
        ev.map_batches(intra, batch_format="pyarrow"),
        ["lbl"], {"e_in": (None, "count")},
    )
    deg = bucket_join(node_degrees(edges), lab_ds, on="node", how="inner")
    deg_sum = pre_aggregate(deg, ["lbl"], {"deg_sum": ("degree", "sum")})
    n_nodes = pre_aggregate(lab_ds, ["lbl"], {"n_nodes": (None, "count")})

    # community-scale aggregates: driver merge is bounded by #communities
    nn = n_nodes.to_pandas()
    dg = deg_sum.to_pandas()
    ei = e_in.to_pandas()
    if "lbl" not in ei.columns:  # empty Ray datasets lose their schema
        ei = pd.DataFrame({"lbl": pd.Series(dtype=np.int64),
                           "e_in": pd.Series(dtype=np.int64)})
    df = nn.merge(dg, on="lbl").merge(ei, on="lbl", how="left")
    e_c = df["e_in"].fillna(0).to_numpy(np.int64)
    d_c = df["deg_sum"].to_numpy(np.int64)
    q_num = 4 * m * e_c - d_c * d_c
    q_part = q_num.astype(np.float64) / (4.0 * m * m)
    return pa.table(
        {
            "lbl": pa.array(df["lbl"].to_numpy(np.int64)),
            "n_nodes": pa.array(df["n_nodes"].to_numpy(np.int64)),
            "e_in": pa.array(e_c),
            "deg_sum": pa.array(d_c),
            "q_num": pa.array(q_num),
            "q_part": pa.array(round_half_up(q_part, 9), pa.float64()),
        }
    )


_MODULARITY_FINAL = """,
lab AS (SELECT node, lbl FROM {prev}),
el AS (SELECT a.lbl AS lu, b.lbl AS lv
       FROM edges e JOIN lab a ON e.u = a.node JOIN lab b ON e.v = b.node),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
ein AS (SELECT lu AS lbl, CAST(COUNT(*) AS BIGINT) AS e_in
        FROM el WHERE lu = lv GROUP BY 1),
dg AS (SELECT l.lbl, CAST(COUNT(*) AS BIGINT) AS deg_sum
       FROM sym s JOIN lab l ON s.src = l.node GROUP BY 1),
nn AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lab GROUP BY 1)
SELECT nn.lbl, nn.n_nodes, CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
       dg.deg_sum,
       CAST(4 * mm.m * COALESCE(ein.e_in, 0) - dg.deg_sum * dg.deg_sum
            AS BIGINT) AS q_num,
       ROUND(CAST(4 * mm.m * COALESCE(ein.e_in, 0)
                  - dg.deg_sum * dg.deg_sum AS DOUBLE)
             / (4.0 * mm.m * mm.m), 9) AS q_part
FROM nn JOIN dg USING (lbl) LEFT JOIN ein USING (lbl) CROSS JOIN mm
"""

# the CTE list ends with l{rounds}; the modularity tail EXTENDS the CTE
# list (leading comma) and _lpa_sql substitutes "{prev}" with the final
# label table name
SQL_COPURCHASE_MODULARITY = _lpa_sql(final_select=_MODULARITY_FINAL)


# ---------------------------------------------------------------------------
# Theil-Sen robust trend: lower-median pairwise slope per market segment
# ---------------------------------------------------------------------------

def q_mktsegment_theilsen(sf_dir: str):
    """Theil-Sen estimator per market segment over the weekly-revenue
    series: weekly sums in exact integer cents, all week-pairs yield
    slope = Δcents / Δweeks (int64 -> the identical IEEE division in
    both engines), and the robust trend is the LOWER MEDIAN (rank
    (n+1)//2, the weighted-median convention — no interpolation, so the
    picked value is bit-exact).  Weekly revenue is a combiner fold;
    the O(weeks^2) pair expansion runs on the aggregate-scale series
    inside one segment cogroup, never on row-scale data."""
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_totalprice", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def wk(batch: pa.Table) -> pa.Table:
        days = batch["o_orderdate"].to_numpy(
            zero_copy_only=False
        ).astype("datetime64[D]").astype(np.int64)
        cents = round_half_up(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "seg": batch["c_mktsegment"].to_numpy(zero_copy_only=False),
                "w": days // 7,
                "cents": cents,
            }
        )
        g = df.groupby(["seg", "w"], sort=False)["cents"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    weekly = pre_aggregate(
        j.map_batches(wk, batch_format="pyarrow"),
        ["seg", "w"], {"cents": ("cents", "sum")},
    )

    def slopes(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seg, g in df.groupby("seg", sort=False):
            wv = g["w"].to_numpy(np.int64)
            cv = g["cents"].to_numpy(np.int64)
            o = np.argsort(wv)
            wv, cv = wv[o], cv[o]
            n = len(wv)
            if n < 2:
                continue
            i, jx = np.triu_indices(n, k=1)
            sl = (cv[jx] - cv[i]) / (wv[jx] - wv[i]).astype(np.float64)
            sl.sort()
            npairs = sl.size
            med = sl[(npairs + 1) // 2 - 1]
            rows.append((seg, n, npairs, round_half_up(med, 6)))
        return pd.DataFrame(
            rows, columns=["seg", "n_weeks", "n_pairs", "ts_slope"]
        ).astype({"n_weeks": np.int64, "n_pairs": np.int64})

    return grouped_map(weekly, "seg", slopes)


SQL_MKTSEGMENT_THEILSEN = """
WITH wk AS (
  SELECT c_mktsegment AS seg,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) // 7
              AS BIGINT) AS w,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
nw AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_weeks FROM wk GROUP BY 1),
pr AS (SELECT a.seg, (b.cents - a.cents) / CAST(b.w - a.w AS DOUBLE) AS slope
       FROM wk a JOIN wk b ON a.seg = b.seg AND a.w < b.w),
r AS (SELECT seg, slope,
        ROW_NUMBER() OVER (PARTITION BY seg ORDER BY slope) AS rn,
        COUNT(*) OVER (PARTITION BY seg) AS np
      FROM pr)
SELECT r.seg, nw.n_weeks, CAST(r.np AS BIGINT) AS n_pairs,
       ROUND(r.slope, 6) AS ts_slope
FROM r JOIN nw ON nw.seg = r.seg
WHERE r.rn = (r.np + 1) // 2
"""


# ---------------------------------------------------------------------------
# Naive Bayes language classifier: oracle-checked train + predict
# ---------------------------------------------------------------------------

_NB_SCALE = 10**6


def q_docs_nb_confusion(sf_dir: str):
    """Multinomial Naive Bayes, trained AND evaluated with a full SQL
    oracle (the repo's train_predicate_clf gradient loop is rows-only;
    this is the oracle-checked ML-training face): Laplace-smoothed
    per-(lang, token) log-likelihoods and log-priors in INTEGER
    micro-units (floor(1e6*ln(x)+0.5), the dsir convention — C libm
    ln of the identical double on both engines), per-doc scores are
    exact int64 sums over token instances, argmax breaks ties toward
    the MIN lang.  Output is the self-classification confusion matrix
    (lang, pred_lang, n_docs).  Scale shape: one vocab-scale count
    fold trains the model; scoring broadcasts the dense (langs x
    vocab) int64 weight matrix (vocab-scale, the lm_score gate) and is
    shuffle-free; the confusion fold is lang^2-scale."""
    import ray

    from kgray.ops.dsir import _explode

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def tok_counts(batch: pa.Table) -> pa.Table:
        rows, flat = _explode(batch["text"].to_pylist())
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": langs[rows], "t": flat})
        g = df.groupby(["lang", "t"], sort=False).size().reset_index(
            name="c"
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = pre_aggregate(
        docs.map_batches(tok_counts, batch_format="pyarrow"),
        ["lang", "t"], {"c": ("c", "sum")},
    )
    dl = pre_aggregate(
        _read(sf_dir, "documents", ["lang"]),
        ["lang"], {"d": (None, "count")},
    )

    # model fit: vocab-scale fold lands on the driver (the lm_score
    # pattern — the model is driver-resident by construction)
    cdf = counts.to_pandas()
    ddf = dl.to_pandas().sort_values("lang").reset_index(drop=True)
    langs = ddf["lang"].tolist()
    l_of = {l: i for i, l in enumerate(langs)}
    vocab = pd.unique(cdf["t"])
    v_of = pd.Series(np.arange(len(vocab), dtype=np.int64), index=vocab)
    V = len(vocab)
    n_l = cdf.groupby("lang")["c"].sum().reindex(langs).fillna(0) \
        .to_numpy(np.int64)
    D = int(ddf["d"].sum())

    # dense weight matrix: col V = unseen-token weight
    # quantization is floor(x*1e6 + 0.5) EXACTLY (the dsir convention,
    # mirrored literally by the SQL's floor(... + 0.5))
    W = np.empty((len(langs), V + 1), np.int64)
    for li in range(len(langs)):
        denom = float(n_l[li] + V)
        W[li, :] = int(math.floor(
            _NB_SCALE * math.log(1.0 / denom) + 0.5
        ))
    li_idx = cdf["lang"].map(l_of).to_numpy(np.int64)
    ti_idx = cdf["t"].map(v_of).to_numpy(np.int64)
    cvals = cdf["c"].to_numpy(np.int64)
    wvals = np.fromiter(
        (
            math.floor(
                _NB_SCALE * math.log((c + 1) / float(n_l[li] + V)) + 0.5
            )
            for li, c in zip(li_idx, cvals)
        ),
        np.int64, len(cvals),
    )
    W[li_idx, ti_idx] = wvals
    prior = np.fromiter(
        (
            math.floor(_NB_SCALE * math.log(d / float(D)) + 0.5)
            for d in ddf["d"].to_numpy(np.int64)
        ),
        np.int64, len(langs),
    )
    model = ray.put((W, v_of, prior, langs))

    def score(batch: pa.Table) -> pa.Table:
        Wm, vmap, pri, ls = ray.get(model)
        texts = batch["text"].to_pylist()
        rows, flat = _explode(texts)
        idx = (
            pd.Series(flat).map(vmap).fillna(Wm.shape[1] - 1)
            .to_numpy(np.int64)
        )
        starts = np.searchsorted(rows, np.arange(len(texts)))
        scores = np.empty((len(texts), len(ls)), np.int64)
        for li in range(len(ls)):
            contrib = Wm[li, idx]
            sums = np.add.reduceat(contrib, starts) if len(contrib) else \
                np.zeros(len(texts), np.int64)
            scores[:, li] = sums + pri[li]
        pred = np.argmax(scores, axis=1)  # first max = MIN lang (sorted)
        out = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "pred_lang": np.asarray(ls, object)[pred],
            }
        )
        g = out.groupby(["lang", "pred_lang"], sort=False).size() \
            .reset_index(name="n_docs")
        return pa.Table.from_pandas(g, preserve_index=False)

    return pre_aggregate(
        docs.map_batches(score, batch_format="pyarrow"),
        ["lang", "pred_lang"], {"n_docs": ("n_docs", "sum")},
    )


SQL_DOCS_NB_CONFUSION = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
  FROM documents),
c AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
vv AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM tok),
dl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS d FROM documents GROUP BY 1),
dt AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
w AS (SELECT c.lang, c.t,
        CAST(floor({_NB_SCALE} * ln((c.c + 1) / CAST(nl.n + vv.v AS DOUBLE))
                   + 0.5) AS BIGINT) AS w
      FROM c JOIN nl USING (lang) CROSS JOIN vv),
w0 AS (SELECT nl.lang,
         CAST(floor({_NB_SCALE} * ln(1 / CAST(nl.n + vv.v AS DOUBLE)) + 0.5)
              AS BIGINT) AS w0
       FROM nl CROSS JOIN vv),
pri AS (SELECT dl.lang,
          CAST(floor({_NB_SCALE} * ln(dl.d / CAST(dt.d AS DOUBLE)) + 0.5)
               AS BIGINT) AS p
        FROM dl CROSS JOIN dt),
sc AS (SELECT tok.doc_id, cand.lang AS cand,
         CAST(SUM(COALESCE(w.w, w0.w0)) AS BIGINT) AS s
       FROM tok CROSS JOIN (SELECT lang FROM dl) cand
       LEFT JOIN w ON w.lang = cand.lang AND w.t = tok.t
       JOIN w0 ON w0.lang = cand.lang
       GROUP BY 1, 2),
tot AS (SELECT sc.doc_id, sc.cand, sc.s + pri.p AS score
        FROM sc JOIN pri ON pri.lang = sc.cand),
best AS (SELECT doc_id, MIN(cand) AS pred FROM (
           SELECT doc_id, cand, score,
                  MAX(score) OVER (PARTITION BY doc_id) AS ms FROM tot)
         WHERE score = ms GROUP BY 1)
SELECT d.lang, b.pred AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN best b USING (doc_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Zipf-law fit: log-log OLS slope over the per-language rank curve
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100


def q_lang_zipf_slope(sf_dir: str):
    """Zipf exponent per language: rank the top-{_ZIPF_TOP} tokens by
    (count DESC, token ASC — deterministic tie-break) and OLS-fit
    ln(count) on ln(rank).  Counts fold with a combiner; the fit runs
    per language over <= 100 aggregate rows.  ln via C libm math.log
    (the tf-idf bit-parity lesson); regr_slope's different accumulation
    order is absorbed by the 4-digit round (the events_value_trend
    pattern)."""
    from kgray.ops.dsir import _explode

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def tok_counts(batch: pa.Table) -> pa.Table:
        rows, flat = _explode(batch["text"].to_pylist())
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": langs[rows], "t": flat})
        g = df.groupby(["lang", "t"], sort=False).size().reset_index(
            name="c"
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = pre_aggregate(
        docs.map_batches(tok_counts, batch_format="pyarrow"),
        ["lang", "t"], {"cnt": ("c", "sum")},
    )

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            g = g.sort_values(
                ["cnt", "t"], ascending=[False, True], kind="mergesort"
            ).head(_ZIPF_TOP)
            n = len(g)
            if n < 2:
                continue
            x = np.fromiter(
                (math.log(float(r)) for r in range(1, n + 1)),
                np.float64, n,
            )
            y = np.fromiter(
                (math.log(float(c)) for c in g["cnt"].to_numpy()),
                np.float64, n,
            )
            sx, sy = x.sum(), y.sum()
            sxx, sxy = (x * x).sum(), (x * y).sum()
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            rows.append((lang, n, round_half_up(slope, 4)))
        return pd.DataFrame(
            rows, columns=["lang", "n_terms", "zipf_slope"]
        ).astype({"n_terms": np.int64})

    return grouped_map(counts, "lang", fit)


SQL_LANG_ZIPF_SLOPE = f"""
WITH c AS (
  SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY 1, 2),
r AS (SELECT lang, cnt,
        ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY cnt DESC, t ASC) AS rnk
      FROM c)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4)
         AS zipf_slope
FROM r WHERE rnk <= {_ZIPF_TOP}
GROUP BY 1
"""
