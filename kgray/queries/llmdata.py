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
