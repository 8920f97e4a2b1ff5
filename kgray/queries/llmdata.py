"""kgray.queries.llmdata — round-4 LLM-training-data operators
(importance resampling, privacy audits, graph cores, link prediction)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed-unigram bag
    models of the target slice (lang='en') vs the raw corpus; per-doc
    weight = integer sum of per-bucket log-ratio micro-units.  One
    bucket-scale fold + a broadcast + a shuffle-free scoring pass — see
    kgray/ops/dsir.py for the 100 TB shape."""
    from kgray.ops.dsir import dsir_weights

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_weights(docs, target_col="lang", target_val="en", B=1024)


SQL_DSIR_WEIGHTS = """
WITH toks AS (
  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w
  FROM documents),
b AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(w), 1, 13) AS BIGINT) % 1024 AS bkt
  FROM toks),
cnt AS (
  SELECT bkt,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(COUNT(*) AS BIGINT) AS cr
  FROM b GROUP BY bkt),
tot AS (
  SELECT CAST(SUM(ct) AS DOUBLE) AS tt, CAST(SUM(cr) AS DOUBLE) AS tr
  FROM cnt),
lam AS (
  SELECT bkt,
         CAST(floor((ln((ct + 0.5) / (tt + 512.0))
                     - ln((cr + 0.5) / (tr + 512.0))) * 1000000.0 + 0.5)
              AS BIGINT) AS lam
  FROM cnt, tot)
SELECT doc_id, CAST(SUM(lam) AS BIGINT) AS w_micro
FROM b JOIN lam USING (bkt)
GROUP BY doc_id
"""


def q_kanon_audit(sf_dir: str):
    """k-anonymity audit over quasi-identifiers (lang, source,
    500-char length band): group sizes + an at-risk flag for groups
    under k=5.  One combiner-fold groupby; QI-cardinality output."""
    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def band(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "chars_band": pc.cast(
                    pc.floor(pc.divide(
                        pc.cast(batch["n_chars"], pa.float64()), 500.0
                    )),
                    pa.int64(),
                ),
            }
        )

    ds = pre_aggregate(
        docs.map_batches(band, batch_format="pyarrow"),
        ["lang", "source", "chars_band"],
        {"n": (None, "count")},
    )

    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "at_risk",
            pc.cast(pc.less(batch["n"], 5), pa.int32()),
        )

    return ds.map_batches(flag, batch_format="pyarrow")


SQL_KANON_AUDIT = """
SELECT lang, source,
       CAST(floor(CAST(n_chars AS DOUBLE) / 500.0) AS BIGINT) AS chars_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) < 5 AS INT) AS at_risk
FROM documents
GROUP BY 1, 2, 3
"""


def q_supplier_kcore(sf_dir: str):
    """k-core decomposition (k=25, 3 fixed peeling rounds) of the
    supplier-part bipartite graph — the density-subgraph primitive for
    graph curation.  Degrees are exact integers and both engines run the
    SAME fixed round count, so the unrolled-CTE oracle matches by
    construction (the pagerank_int pattern); see ops/graph.kcore."""
    from kgray.ops.graph import kcore
    from kgray.queries.analytics4 import _part_supplier_edges

    return kcore(_part_supplier_edges(sf_dir), k=25, rounds=3)


def _kcore_sql(k: int = 25, rounds: int = 3) -> str:
    ctes = [
        "e0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,\n"
        "       CAST(l_partkey + 10000000 AS BIGINT) AS v FROM lineitem)"
    ]
    for i in range(rounds):
        ctes.append(
            f"d{i} AS (SELECT node, COUNT(*) AS deg FROM\n"
            f"         (SELECT u AS node FROM e{i}"
            f" UNION ALL SELECT v FROM e{i}) GROUP BY node)"
        )
        ctes.append(f"k{i} AS (SELECT node FROM d{i} WHERE deg >= {k})")
        ctes.append(
            f"e{i + 1} AS (SELECT u, v FROM e{i}\n"
            f"        WHERE u IN (SELECT node FROM k{i})\n"
            f"          AND v IN (SELECT node FROM k{i}))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM\n"
        f"  (SELECT u AS node FROM e{rounds}"
        f" UNION ALL SELECT v FROM e{rounds})\nGROUP BY node"
    )


SQL_SUPPLIER_KCORE = _kcore_sql()


def q_supplier_linkpred(sf_dir: str):
    """Adjacency-Jaccard link prediction: top-50 supplier pairs by
    common-neighbor Jaccard over their part sets — exactly the n-gram
    set-similarity self-join with (item=supplier, token=part), so it
    reuses dedup.set_jaccard_pairs (inverted index on parts, pair counts
    pre-summed per bucket, count attach gated broadcast/cogroup).  Ties
    at the cut break on (jac DESC, u, v) in both engines."""
    from kgray.ops.dedup import set_jaccard_pairs
    from kgray.queries.analytics4 import _part_supplier_edges

    edges = _part_supplier_edges(sf_dir).materialize()
    exploded = edges.map_batches(
        lambda b: pa.table({"shingle": b["v"], "doc": b["u"]}),
        batch_format="pyarrow",
    )
    counts = pre_aggregate(
        edges.map_batches(
            lambda b: pa.table({"doc": b["u"]}), batch_format="pyarrow"
        ),
        ["doc"],
        {"nsh": (None, "count")},
    )
    n_sup = counts.count()
    pairs = set_jaccard_pairs(exploded, counts, n_items=n_sup, tau=0.01)
    return pairs.sort(["jac", "u", "v"],
                      descending=[True, False, False]).limit(50)


SQL_SUPPLIER_LINKPRED = """
WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                  CAST(l_partkey AS BIGINT) AS p FROM lineitem),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS nd FROM e GROUP BY s),
pr AS (SELECT a.s AS u, b.s AS v, CAST(COUNT(*) AS BIGINT) AS shared
       FROM e a JOIN e b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
j AS (SELECT u, v,
             ROUND(CAST(shared AS DOUBLE) / (du.nd + dv.nd - shared), 4)
               AS jac
      FROM pr JOIN deg du ON pr.u = du.s JOIN deg dv ON pr.v = dv.s
      WHERE CAST(shared AS DOUBLE) / (du.nd + dv.nd - shared) >= 0.01)
SELECT u, v, jac FROM j ORDER BY jac DESC, u, v LIMIT 50
"""


def q_vocab_oov(sf_dir: str):
    """Tokenizer-coverage audit: per-document OOV counts against the
    corpus top-1000 word vocabulary (ties broken on (n DESC, word) in
    both engines).  One gram-vocab-scale fold builds the vocabulary, the
    broadcast set scores every doc shuffle-free; integer outputs only,
    so the hash compare has no float surface at all."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks)
        g = pa.table({"w": flat}).group_by("w").aggregate([("w", "count")])
        return g.rename_columns(["w", "n"])

    folded = pre_aggregate(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["w"], {"n": ("n", "sum")},
    ).to_pandas()  # gram-vocab scale, never corpus scale
    folded = folded.sort_values(["n", "w"], ascending=[False, True],
                                kind="mergesort")
    vocab = set(folded["w"].head(1000))
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        vw = ray.get(vocab_ref)
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        inv = pc.is_in(flat, value_set=pa.array(sorted(vw), pa.string()))
        inv = inv.to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        n_in = np.zeros(len(batch), np.int64)
        np.add.at(n_in, rows, inv.astype(np.int64))
        n_tok = lens.astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_oov": pa.array(n_tok - n_in),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


SQL_VOCAB_OOV = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents),
v AS (SELECT w FROM (SELECT w, COUNT(*) AS n FROM w GROUP BY w
                     ORDER BY n DESC, w LIMIT 1000)),
s AS (SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN w IN (SELECT w FROM v) THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_oov
      FROM w GROUP BY doc_id)
SELECT doc_id, n_tokens, n_oov FROM s
"""


def q_lm3_score(sf_dir: str):
    """Interpolated (Jelinek-Mercer) TRIGRAM LM quality score per doc —
    the next-order twin of lm_score.  One gram-vocab fold for all three
    count orders, broadcast integer tables, shuffle-free scoring with
    memoized libm ln; see ops/text.trigram_lm_scores."""
    from kgray.ops.text import trigram_lm_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return trigram_lm_scores(docs)


SQL_LM3_SCORE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
       FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks) - 1)) AS i
             FROM w)),
bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
       FROM (SELECT toks, UNNEST(range(1, len(toks))) AS i FROM w)),
c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS DOUBLE) AS c
       FROM tg GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY 1, 2),
c1 AS (SELECT t AS w, CAST(COUNT(*) AS DOUBLE) AS c
       FROM (SELECT UNNEST(toks) AS t FROM w) GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t
        FROM (SELECT UNNEST(toks) FROM w)),
p AS (SELECT tg.doc_id,
             ln(0.6 * (CASE WHEN cab.c > 0 THEN c3.c / cab.c ELSE 0 END)
                + 0.3 * (CASE WHEN cw2.c > 0 THEN cbc.c / cw2.c ELSE 0 END)
                + 0.1 * (cw3.c / (SELECT t FROM tot))) AS lp
      FROM tg
      JOIN c3 ON tg.w1 = c3.w1 AND tg.w2 = c3.w2 AND tg.w3 = c3.w3
      JOIN c2 cab ON tg.w1 = cab.w1 AND tg.w2 = cab.w2
      JOIN c2 cbc ON tg.w2 = cbc.w1 AND tg.w3 = cbc.w2
      JOIN c1 cw2 ON tg.w2 = cw2.w
      JOIN c1 cw3 ON tg.w3 = cw3.w)
SELECT doc_id, ROUND(AVG(lp), 4) AS lm3_score FROM p GROUP BY doc_id
"""


def q_train_predicate_clf(sf_dir: str):
    """Distributed training loop (the reference train.py analogue as
    dataflow — ops/train.py): fit the hashed-char-ngram logistic
    predicate classifier by per-epoch gradient folds on 1600 synthetic
    sentences, score the 400 held-out ones (measured F1 0.965), and emit the confusion
    counts.  No SQL oracle by nature (iterative float optimization);
    convergence and held-out F1 are pinned by tests/test_train.py."""
    import ray

    from kgray import corpus
    from kgray.ops.featurize import add_multihot_target
    from kgray.ops.train import (featurize_hashed, fit_logreg_hashed,
                                 predict_logreg)

    tbl = corpus.sentences_table(corpus.doc_ids_for_range(0, 2000))
    ds = ray.data.from_arrow(tbl).map_batches(
        add_multihot_target, batch_format="pyarrow"
    )
    feats = featurize_hashed(ds, B=8192)
    n = feats.count()
    n_train = int(n * 0.8)
    train = feats.limit(n_train).materialize()
    helds = feats.limit(n).to_pandas().iloc[n_train:]
    held = ray.data.from_pandas(helds).map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False),
        batch_format="pandas",
    )
    model = fit_logreg_hashed(train, B=8192, L=50, epochs=60, lr=3.0)
    pred = predict_logreg(held, model, B=8192, L=50).to_pandas()
    P = np.stack([np.asarray(p) for p in pred["pred"]])
    Y = np.stack([np.asarray(t) for t in pred["target"]])
    tp = int((P * Y).sum())
    fp = int((P * (1 - Y)).sum())
    fn = int(((1 - P) * Y).sum())
    return pa.table(
        {
            "n_train": pa.array([n_train], pa.int64()),
            "n_eval": pa.array([n - n_train], pa.int64()),
            "epochs": pa.array([60], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
        }
    )


def q_cross_dup_docs(sf_dir: str):
    """Cross-corpus contamination audit: near-dup pairs (word-3-gram
    Jaccard >= 0.7 via banded MinHash) BETWEEN the short-name sources
    (src0-src9, the 'train' slice) and the long-name sources
    (src10-src19, the 'held-out' slice).  The oracle is the exact
    Jaccard cross join — with 32 bands x 2 rows the LSH miss probability
    at J>=0.7 is 0.51^32 ~ 4e-10, so the sketch is exact here (the
    minhash_dup_docs relationship)."""
    from kgray.ops.dedup import minhash_cross_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def side(n):
        def f(batch: pa.Table) -> pa.Table:
            keep = pc.equal(pc.utf8_length(batch["source"]), n)
            t = batch.filter(keep)
            return pa.table({"doc_id": t["doc_id"], "text": t["text"]})

        return docs.map_batches(f, batch_format="pyarrow")

    return minhash_cross_pairs(side(4), side(5), tau=0.7)


SQL_CROSS_DUP_DOCS = """
WITH sh AS (
  SELECT doc_id, length(source) AS sl,
         list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' '
                || string_split(text, ' ')[i + 1] || ' '
                || string_split(text, ' ')[i + 2])) AS shingles
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3)
-- shared-shingle blocking (lossless for J >= 0.7; see ngram_dup_pairs)
, inv AS (SELECT doc_id, sl, unnest(shingles) AS s FROM sh),
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
         FROM inv a JOIN inv b ON a.s = b.s AND a.sl = 4 AND b.sl = 5
         GROUP BY 1, 2)
SELECT c.u, c.v,
       ROUND(CAST(c.common AS DOUBLE) /
             (len(a.shingles) + len(b.shingles) - c.common), 4) AS jac
FROM cand c JOIN sh a ON c.u = a.doc_id JOIN sh b ON c.v = b.doc_id
WHERE CAST(c.common AS DOUBLE) /
      (len(a.shingles) + len(b.shingles) - c.common) >= 0.7
"""


def q_knn_trunc_recall(sf_dir: str):
    """Matryoshka-style truncation audit: for the first 5 vectors as
    queries, how many of the full-64-dim cosine top-10 survive in the
    32-dim-truncated top-10 (recall@10 numerator, exact integer).  One
    shuffle-free pass: queries broadcast, each batch emits its local
    top-10 per (query, metric) — the global top-10 is contained in the
    union of per-batch top-10s, folded at aggregate scale on the driver
    (the stratified-sample combiner argument)."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 5").to_pandas()
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    qid = qdf["vec_id"].to_numpy(np.int64)
    Qf = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Qt = Q[:, :32] / np.linalg.norm(Q[:, :32], axis=1, keepdims=True)
    q_ref = ray.put((qid, Qf, Qt))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Qf_, Qt_ = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        E = np.stack(
            [np.asarray(v, np.float64) for v in
             batch["embedding"].to_pylist()]
        )
        Ef = E / np.linalg.norm(E, axis=1, keepdims=True)
        Et = E[:, :32] / np.linalg.norm(E[:, :32], axis=1, keepdims=True)
        out_q, out_id, out_sf, out_st = [], [], [], []
        sim_f = Ef @ Qf_.T
        sim_t = Et @ Qt_.T
        for j in range(len(qids)):
            for sims in (sim_f[:, j], sim_t[:, j]):
                top = np.lexsort((ids, -sims))[:10]
                out_q.extend([qids[j]] * len(top))
                out_id.extend(ids[top])
                out_sf.extend(sim_f[top, j])
                out_st.extend(sim_t[top, j])
        return pa.table(
            {
                "q": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sf": pa.array(out_sf, pa.float64()),
                "st": pa.array(out_st, pa.float64()),
            }
        )

    cand = emb.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.drop_duplicates(["q", "vec_id"])
    rows = []
    for q, g in cand.groupby("q"):
        top_f = set(
            g.sort_values(["sf", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(10)["vec_id"]
        )
        top_t = set(
            g.sort_values(["st", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(10)["vec_id"]
        )
        rows.append((int(q), len(top_f & top_t)))
    return pa.table(
        {
            "q_vec": pa.array([r[0] for r in rows], pa.int64()),
            "n_common": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


SQL_KNN_TRUNC_RECALL = """
WITH qs AS (SELECT vec_id AS q, embedding AS ev FROM embeddings
            WHERE vec_id < 5),
f10 AS (SELECT q, vec_id FROM (
  SELECT qs.q, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY qs.q ORDER BY
           list_cosine_similarity(e.embedding, qs.ev) DESC, e.vec_id) AS r
  FROM embeddings e CROSS JOIN qs) WHERE r <= 10),
t10 AS (SELECT q, vec_id FROM (
  SELECT qs.q, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY qs.q ORDER BY
           list_cosine_similarity(e.embedding[1:32], qs.ev[1:32]) DESC,
           e.vec_id) AS r
  FROM embeddings e CROSS JOIN qs) WHERE r <= 10)
SELECT f.q AS q_vec, CAST(COUNT(*) AS BIGINT) AS n_common
FROM f10 f JOIN t10 t ON f.q = t.q AND f.vec_id = t.vec_id
GROUP BY 1
"""


def q_train_word2vec(sf_dir: str):
    """TWO synchronous rounds of integer fixed-point skip-gram
    negative-sampling word2vec (SURVEY.md §2 A8; reference trains gensim
    embeddings in pytorch/classification/word2vec.py:36-45) — input
    embeddings of the 30 highest-mass words after round 2.  The integer
    gradient fold is summation-order-exact, so the oracle UNROLLS both
    rounds as stacked CTE layers (hash init, deterministic hash-slot
    negatives, libm sigmoid, floor-quantized gradient terms,
    shifted-positive integer division) — see kgray/ops/word2vec.py."""
    from kgray.ops.word2vec import train_word2vec

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    u, _v, nw = train_word2vec(docs, dim=4, k_neg=2, lr_den=4, iters=2,
                               scale=10_000, window=2)
    top = set(
        nw.sort(["n", "w"], descending=[True, False]).limit(30)
        .to_pandas()["w"]
    )  # constant-bounded (30 rows) driver set, like the Q18 survivors

    def pick(batch: pa.Table) -> pa.Table:
        keep = pa.array([w in top for w in batch["w"].to_pylist()],
                        pa.bool_())
        b = batch.filter(keep)
        return pa.table({
            "w": b["w"],
            "e0": b["u0"], "e1": b["u1"], "e2": b["u2"], "e3": b["u3"],
        })

    return u.map_batches(pick, batch_format="pyarrow")


def _w2v_sql(dim: int = 4, k_neg: int = 2, lr_den: int = 4,
             scale: int = 10_000, top: int = 30, rounds: int = 2) -> str:
    """Emit the dims-unrolled ``rounds``-round SGNS oracle (the same
    generator emits the formula trees the Ray kernel computes; both U
    and V update simultaneously each round, so round r's CTEs join the
    r-1 factor tables — the ALS/kmeans_int stacked-layer pattern)."""
    mod = 2 * scale + 1
    s2 = scale * scale
    h = lambda e: f"CAST('0x'||substr(md5({e}),1,13) AS BIGINT)"
    ud = ",\n         ".join(
        "({hh} % {mod}) - {scale} AS u{d}".format(
            hh=h("w||'#u%d'" % d), mod=mod, scale=scale, d=d)
        for d in range(dim))
    vd = ",\n         ".join(
        "({hh} % {mod}) - {scale} AS v{d}".format(
            hh=h("c||'#v%d'" % d), mod=mod, scale=scale, d=d)
        for d in range(dim))
    ctes = [f"""u0 AS (SELECT w,
         {ud}
       FROM nw)""", f"""v0 AS (SELECT c,
         {vd}
       FROM vocab)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        dot = " + ".join(f"u.u{d}*v.v{d}" for d in range(dim))
        ucols = ", ".join(f"u.u{d}" for d in range(dim))
        vcols = ", ".join(f"v.v{d}" for d in range(dim))
        sums_u = ",\n         ".join(
            "CAST(SUM(CAST(floor(coef * CAST(n AS DOUBLE) * "
            f"CAST(v{d} AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s{d}"
            for d in range(dim))
        sums_v = ",\n         ".join(
            "CAST(SUM(CAST(floor(coef * CAST(n AS DOUBLE) * "
            f"CAST(u{d} AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s{d}"
            for d in range(dim))
        upd_u = ",\n         ".join(
            f"u.u{d} + (((du.s{d} + 1000000*({lr_den}*du.tw)) // "
            f"({lr_den}*du.tw)) - 1000000) AS u{d}"
            for d in range(dim))
        upd_v = ",\n         ".join(
            f"v.v{d} + (((dv.s{d} + 1000000*({lr_den}*dv.tw)) // "
            f"({lr_den}*dv.tw)) - 1000000) AS v{d}"
            for d in range(dim))
        ctes.append(
            f"""jp{r} AS (SELECT a.w, a.c, a.n, a.label, {ucols}, {vcols},
              {dot} AS dot
       FROM allp a JOIN u{p} u USING (w) JOIN v{p} v USING (c))""")
        ctes.append(
            f"""cf{r} AS (SELECT *, CAST(label AS DOUBLE)
               - 1.0/(1.0+exp(-(CAST(dot AS DOUBLE)/{s2}.0))) AS coef
       FROM jp{r})""")
        ctes.append(f"""du{r} AS (SELECT w,
         {sums_u},
         CAST(SUM(n) AS BIGINT) AS tw
       FROM cf{r} GROUP BY w)""")
        ctes.append(f"""dv{r} AS (SELECT c,
         {sums_v},
         CAST(SUM(n) AS BIGINT) AS tw
       FROM cf{r} GROUP BY c)""")
        ctes.append(f"""u{r} AS (SELECT u.w,
         {upd_u}
       FROM u{p} u JOIN du{r} du USING (w))""")
        ctes.append(f"""v{r} AS (SELECT v.c,
         {upd_v}
       FROM v{p} v JOIN dv{r} dv USING (c))""")
    outs = ", ".join(
        f"CAST(u{rounds}.u{d} AS BIGINT) AS e{d}" for d in range(dim))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
pp AS (SELECT t1.tok AS w, t2.tok AS c, CAST(COUNT(*) AS BIGINT) AS n
       FROM toks t1 JOIN toks t2
         ON t1.doc_id = t2.doc_id AND t2.pos - t1.pos BETWEEN 1 AND 2
       GROUP BY 1, 2),
vocab AS (SELECT DISTINCT c FROM pp),
vsz AS (SELECT COUNT(*) AS v FROM vocab),
slot AS (SELECT c, {h('c')} % (SELECT v FROM vsz) AS s FROM vocab),
nw AS (SELECT w, CAST(SUM(n) AS BIGINT) AS n FROM pp GROUP BY 1),
negt AS (SELECT nw.w,
                {h("nw.w||'#n'||j.j")} % (SELECT v FROM vsz) AS s,
                nw.n
         FROM nw CROSS JOIN (SELECT UNNEST(range(1, {k_neg + 1})) AS j) j),
negs AS (SELECT negt.w, slot.c, negt.n FROM negt JOIN slot USING (s)),
allp AS (SELECT w, c, n, 1 AS label FROM pp
         UNION ALL SELECT w, c, n, 0 AS label FROM negs),
""" + ",\n".join(ctes) + f""",
top AS (SELECT w FROM nw ORDER BY n DESC, w LIMIT {top})
SELECT u{rounds}.w AS w, {outs}
FROM u{rounds} JOIN top USING (w) ORDER BY w
"""


SQL_TRAIN_WORD2VEC = _w2v_sql()
