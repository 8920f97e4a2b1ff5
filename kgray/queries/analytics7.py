"""Session-16 operator batch: HITS hubs/authorities (integer
fixed-point, unrolled-CTE oracle), per-node local clustering
coefficients (wedge-closure triangle counts carrying their center),
label-propagation communities (deterministic mode/min tie-break,
unrolled oracle), and the near-dup cluster-size histogram (corpus
duplication profile over the minhash->CC component sizes).
"""

from ._common import *  # noqa: F401,F403

from kgray.queries.analytics4 import (_COPURCHASE_EDGE_SQL,
                                      _GRAPH_EDGE_SQL, _copurchase_edges,
                                      _part_supplier_edges)
from kgray.queries.curation import _NEARDUP_CC_SQL

# ---------------------------------------------------------------------------
# HITS hubs & authorities over the supplier-part bipartite graph
# ---------------------------------------------------------------------------

_HITS_SCALE = 10**6
_HITS_ITERS = 2


def q_supplier_part_hits(sf_dir: str):
    """HITS mutual reinforcement on the directed supplier -> part edge
    list (hubs = suppliers ranked by breadth of strong parts,
    authorities = parts ranked by strength of their suppliers) — a
    genuinely different recurrence family from PageRank (two interleaved
    propagation passes + max-normalization per round).  Integer fixed
    point (scale 10^6, floor division) is bit-exact in any summation
    order, so the DuckDB oracle UNROLLS the identical 2-iteration
    recurrence (the pagerank_int pattern).  Overflow headroom:
    score <= S after each normalization, raw sums <= deg_max*S and the
    normalizing product <= deg_max*S^2 — safe to deg_max ~ 9e6."""
    from kgray.ops.graph import hits_int

    return hits_int(_part_supplier_edges(sf_dir), iters=_HITS_ITERS,
                    scale=_HITS_SCALE)


def _hits_sql(iters: int = _HITS_ITERS, scale: int = _HITS_SCALE) -> str:
    ctes = [
        f"h0 AS (SELECT DISTINCT u AS node, CAST({scale} AS BIGINT)"
        " AS score FROM e)"
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i}r AS (SELECT e.v AS node, CAST(SUM(h.score) AS BIGINT)"
            " AS s\n"
            f"        FROM e JOIN {prev_h} h ON e.u = h.node GROUP BY 1)"
        )
        ctes.append(
            f"a{i} AS (SELECT node, CAST(s * {scale} //"
            f" (SELECT MAX(s) FROM a{i}r) AS BIGINT) AS score FROM a{i}r)"
        )
        ctes.append(
            f"h{i}r AS (SELECT e.u AS node, CAST(SUM(a.score) AS BIGINT)"
            " AS s\n"
            f"        FROM e JOIN a{i} a ON e.v = a.node GROUP BY 1)"
        )
        ctes.append(
            f"h{i} AS (SELECT node, CAST(s * {scale} //"
            f" (SELECT MAX(s) FROM h{i}r) AS BIGINT) AS score FROM h{i}r)"
        )
        prev_h = f"h{i}"
    return (
        "WITH " + _GRAPH_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + f"\nSELECT node, score, 'hub' AS side FROM h{iters}\n"
        f"UNION ALL SELECT node, score, 'auth' AS side FROM a{iters}"
    )


SQL_SUPPLIER_PART_HITS = _hits_sql()


# ---------------------------------------------------------------------------
# per-node local clustering coefficient over the co-purchase graph
# ---------------------------------------------------------------------------

def q_copurchase_clustering(sf_dir: str):
    """Local clustering coefficient per node (Watts-Strogatz): 2*tri /
    (deg*(deg-1)) over the co-purchase part graph.  Per-node triangle
    counts come from the wedge-closure MR with wedges CARRYING their
    center (ops/graph.node_triangles — one center cogroup + one pair
    cogroup + a Sum merge); degrees from the count-combiner groupby.
    The coefficient divides two exact int64s, so both engines compute
    the identical double before the 6-digit round (the
    integer-ratio-compare lesson).  Nodes with degree < 2 are excluded
    on both sides (undefined coefficient)."""
    from kgray.ops.graph import node_degrees, node_triangles

    edges = _copurchase_edges(sf_dir).materialize()
    tri = node_triangles(edges)
    if isinstance(tri, pa.Table):
        tri = rd.from_arrow(tri)
    deg = node_degrees(edges)
    joined = bucket_join(deg, tri, on="node", how="left")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["degree"].to_numpy(zero_copy_only=False)
        t = pc.fill_null(batch["tri"], pa.scalar(0, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        keep = d >= 2
        d, t = d[keep], t[keep]
        coeff = 2.0 * t / (d * (d - 1))
        return pa.table(
            {
                "node": pc.cast(
                    pa.array(batch["node"].to_numpy(
                        zero_copy_only=False)[keep]), pa.int64()),
                "degree": pa.array(d, pa.int64()),
                "tri": pa.array(t, pa.int64()),
                "coeff": pa.array(round_half_up(coeff, 6), pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_COPURCHASE_CLUSTERING = (
    "WITH " + _COPURCHASE_EDGE_SQL + """,
sym AS (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v, u FROM edges),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM sym GROUP BY 1),
tr AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       FROM edges e1 JOIN edges e2 ON e1.v = e2.u
       JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
nt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
         SELECT a AS node FROM tr
         UNION ALL SELECT b FROM tr
         UNION ALL SELECT c FROM tr) GROUP BY 1)
SELECT CAST(d.node AS BIGINT) AS node, d.degree,
       CAST(COALESCE(nt.tri, 0) AS BIGINT) AS tri,
       ROUND(2.0 * COALESCE(nt.tri, 0) / (d.degree * (d.degree - 1)), 6)
         AS coeff
FROM deg d LEFT JOIN nt ON d.node = nt.node
WHERE d.degree >= 2
"""
)


# ---------------------------------------------------------------------------
# label-propagation communities over the co-purchase graph
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def q_copurchase_communities(sf_dir: str):
    """Fixed-round synchronous label propagation (Raghavan et al. 2007)
    over the co-purchase part graph: label <- most frequent neighbor
    label, ties -> MIN label, 3 rounds.  The deterministic integer
    tie-break makes the recurrence engine-exact, so the oracle unrolls
    the identical (count fold + window MAX + MIN-label) choice per
    round."""
    from kgray.ops.graph import lpa_labels

    return lpa_labels(_copurchase_edges(sf_dir), rounds=_LPA_ROUNDS)


def _lpa_sql(rounds: int = _LPA_ROUNDS) -> str:
    ctes = [
        "sym AS (SELECT u AS src, v AS dst FROM edges"
        " UNION ALL SELECT v, u FROM edges)",
        "l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS lbl"
        " FROM sym)",
    ]
    prev = "l0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"c{i} AS (SELECT s.dst AS node, l.lbl,"
            " CAST(COUNT(*) AS BIGINT) AS c\n"
            f"       FROM sym s JOIN {prev} l ON s.src = l.node"
            " GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{i} AS (SELECT node, lbl, c,"
            f" MAX(c) OVER (PARTITION BY node) AS mc FROM c{i})"
        )
        ctes.append(
            f"l{i} AS (SELECT node, CAST(MIN(lbl) AS BIGINT) AS lbl"
            f" FROM m{i} WHERE c = mc GROUP BY 1)"
        )
        prev = f"l{i}"
    return (
        "WITH " + _COPURCHASE_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS BIGINT) AS node, lbl FROM {prev}"
    )


SQL_COPURCHASE_COMMUNITIES = _lpa_sql()


# ---------------------------------------------------------------------------
# near-dup cluster-size histogram (corpus duplication profile)
# ---------------------------------------------------------------------------

def q_dup_cluster_sizes(sf_dir: str):
    """Histogram of near-duplicate cluster sizes — the curation
    diagnostic that tells bulk template spam (few huge clusters) from
    organic duplication (many pairs): MinHash-LSH pairs -> connected
    components -> component sizes -> (size, n_clusters).  Both folds
    run on aggregate-scale tables; the heavy lifting is the same
    auto-gated minhash + CC chain as dedup_purge."""
    from kgray.ops.canonical import connected_components
    from kgray.ops.dedup import minhash_dup_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_dup_pairs(docs, tau=0.7)
    comp = connected_components(pairs)
    sizes = pre_aggregate(comp, ["component"], {"size": (None, "count")})
    hist = pre_aggregate(sizes, ["size"], {"n_clusters": (None, "count")})

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"size": pc.cast(batch["size"], pa.int64()),
             "n_clusters": pc.cast(batch["n_clusters"], pa.int64())}
        )

    return hist.map_batches(cast, batch_format="pyarrow")


SQL_DUP_CLUSTER_SIZES = _NEARDUP_CC_SQL + """,
sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS size
          FROM comp GROUP BY 1)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM sizes GROUP BY 1
"""
