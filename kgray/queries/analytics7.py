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
    over the co-purchase part graph: label <- most frequent label among
    neighbors plus the node's own current label (the self-vote keeps
    synchronous LPA from oscillating), ties -> MIN label, 3 rounds.
    The deterministic integer tie-break makes the recurrence
    engine-exact, so the oracle unrolls the identical (count fold +
    window MAX + MIN-label) choice per round."""
    from kgray.ops.graph import lpa_labels

    return lpa_labels(_copurchase_edges(sf_dir), rounds=_LPA_ROUNDS)


def _lpa_sql(rounds: int = _LPA_ROUNDS, final_select: str | None = None) -> str:
    ctes = [
        "sym AS (SELECT u AS src, v AS dst FROM edges"
        " UNION ALL SELECT v, u FROM edges)",
        "l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS lbl"
        " FROM sym)",
    ]
    prev = "l0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"c{i} AS (SELECT node, lbl, CAST(COUNT(*) AS BIGINT) AS c"
            " FROM (\n"
            f"       SELECT s.dst AS node, l.lbl"
            f" FROM sym s JOIN {prev} l ON s.src = l.node\n"
            f"       UNION ALL SELECT node, lbl FROM {prev})"
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
    fs = final_select.replace("{prev}", prev) if final_select else (
        f"SELECT CAST(node AS BIGINT) AS node, lbl FROM {prev}"
    )
    return (
        "WITH " + _COPURCHASE_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + "\n" + fs
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

# ---------------------------------------------------------------------------
# weighted shortest paths (bounded Bellman-Ford) over supplier-part edges
# ---------------------------------------------------------------------------

_BF_ROUNDS = 3


def _weighted_edges(sf_dir: str):
    """Supplier-part edges weighted by link strength: w = 8 - min(n, 7)
    where n = lineitem rows for the pair (stronger link = shorter).
    Near-unique (u, v) keys -> per-batch Arrow count partials + ONE
    u-keyed cogroup fold (the _part_supplier_edges lesson; a row-level
    groupby.aggregate can't compress these keys)."""

    line = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": pc.cast(batch["l_suppkey"], pa.int64()),
                "v": pc.cast(pc.add(batch["l_partkey"], 10_000_000),
                             pa.int64()),
            }
        )
        g = t.group_by(["u", "v"]).aggregate([([], "count_all")])
        return pa.table({"u": g["u"], "v": g["v"],
                         "n": g["count_all"].cast(pa.int64())})

    pairs = line.map_batches(partial, batch_format="pyarrow").materialize()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["u", "v"], sort=False)["n"].sum().reset_index()
        c["w"] = 8 - np.minimum(c["n"].to_numpy(np.int64), 7)
        return c[["u", "v", "w"]]

    return grouped_map(pairs, "u", fold)


def q_supplier_part_shortest(sf_dir: str):
    """Single-source weighted shortest paths from supplier 1 over the
    supplier-part graph, 3 Bellman-Ford relaxation rounds — the weighted
    upgrade of graph_bfs_hops.  Integer weights (8 - min(lineitem rows,
    7)) keep every relaxation order-exact, so the oracle unrolls the
    identical d_i = MIN(d_{i-1}, MIN(d_{i-1}(src) + w)) recurrence."""
    from kgray.ops.graph import bellman_ford

    return bellman_ford(_weighted_edges(sf_dir), seeds=[1],
                        rounds=_BF_ROUNDS)


def _bf_sql(rounds: int = _BF_ROUNDS) -> str:
    ctes = [
        """ew AS (SELECT CAST(l_suppkey AS BIGINT) AS u,
             CAST(l_partkey + 10000000 AS BIGINT) AS v,
             CAST(8 - LEAST(COUNT(*), 7) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2)""",
        "symw AS (SELECT u AS src, v AS dst, w FROM ew"
        " UNION ALL SELECT v, u, w FROM ew)",
        "b0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist"
        " FROM symw WHERE src IN (1))",
    ]
    prev = "b0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"b{i} AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist"
            " FROM (\n"
            f"         SELECT node, dist FROM {prev}\n"
            "         UNION ALL\n"
            "         SELECT s.dst AS node, d.dist + s.w AS dist\n"
            f"         FROM symw s JOIN {prev} d ON s.src = d.node\n"
            "       ) GROUP BY 1)"
        )
        prev = f"b{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, dist FROM {prev}"
    )


SQL_SUPPLIER_PART_SHORTEST = _bf_sql()


# ---------------------------------------------------------------------------
# complex-event-processing pattern match over per-user event sequences
# ---------------------------------------------------------------------------

_CEP_PATTERN = "v[^p]*p"  # view ... purchase with no purchase in between


def q_events_cep_pattern(sf_dir: str):
    """MATCH_RECOGNIZE-style pattern matching: encode each user's
    time-ordered event-type sequence as a string (first letters are
    distinct across the 5 types) and count non-overlapping matches of
    the regex ``v[^p]*p`` (a view followed by the next purchase).  One
    user cogroup builds the ordered sequence exactly like the SQL
    ``string_agg(... ORDER BY ts, event_id)`` frame; the regex runs
    compiled per bucket (ASCII-pinned re == RE2, the pii_redact
    precedent), and leftmost non-overlapping ``findall`` semantics equal
    DuckDB ``regexp_extract_all``."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    pat = re.compile(_CEP_PATTERN)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        df["ch"] = df["event_type"].str[0]
        g = df.groupby("user_id", sort=False)["ch"]
        seqs = g.agg("".join)
        n_events = g.size()
        n_matches = np.fromiter(
            (len(pat.findall(s)) for s in seqs.to_numpy()),
            np.int64, len(seqs),
        )
        return pd.DataFrame(
            {
                "user_id": seqs.index.to_numpy(np.int64),
                "n_events": n_events.to_numpy(np.int64),
                "n_matches": n_matches,
                "matched": (n_matches > 0).astype(np.int64),
            }
        )

    return grouped_map(ev, "user_id", per_user)


SQL_EVENTS_CEP_PATTERN = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(seq, '{_CEP_PATTERN}')) AS BIGINT)
         AS n_matches,
       CAST(regexp_matches(seq, '{_CEP_PATTERN}') AS BIGINT) AS matched
FROM seqs
"""


# ---------------------------------------------------------------------------
# l-diversity audit (companion to kanon_audit)
# ---------------------------------------------------------------------------

def q_ldiv_audit(sf_dir: str):
    """l-diversity audit: for each quasi-identifier group (lang,
    source) count DISTINCT sensitive values (the 500-char length band)
    — k-anonymity alone leaks when a group's sensitive attribute is
    constant.  Two-level fold: distinct (QI, band) partials per batch,
    then a count per QI; flags groups with l < 3."""
    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def band(batch: pa.Table) -> pa.Table:
        t = pa.table(
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
        return t.group_by(["lang", "source", "chars_band"]).aggregate([])

    distinct = pre_aggregate(
        docs.map_batches(band, batch_format="pyarrow"),
        ["lang", "source", "chars_band"], {"_n": (None, "count")},
    )
    l = pre_aggregate(distinct, ["lang", "source"],
                      {"l": (None, "count")})

    def flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "l": pc.cast(batch["l"], pa.int64()),
                "at_risk": pc.cast(pc.less(batch["l"], 3), pa.int32()),
            }
        )

    return l.map_batches(flag, batch_format="pyarrow")


SQL_LDIV_AUDIT = """
SELECT lang, source,
       CAST(COUNT(DISTINCT CAST(floor(CAST(n_chars AS DOUBLE) / 500.0)
                                AS BIGINT)) AS BIGINT) AS l,
       CAST(COUNT(DISTINCT CAST(floor(CAST(n_chars AS DOUBLE) / 500.0)
                                AS BIGINT)) < 3 AS INT) AS at_risk
FROM documents
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage scoring (probabilistic ER)
# ---------------------------------------------------------------------------

# integer micro-unit log-weights (the dsir trick): the constants are
# computed ONCE here and embedded as literals into the SQL, so no
# cross-engine log evaluation exists at query time.
_FS_M_U = {"name": (0.95, 0.001), "phone": (0.9, 0.0005),
           "band": (0.8, 0.1)}
_FS_W = {
    f: (int(round(1e6 * math.log(m / u))),
        int(round(1e6 * math.log((1 - m) / (1 - u)))))
    for f, (m, u) in _FS_M_U.items()
}
_FS_REVIEW = 5_000_000   # emit pairs above this (review queue)
_FS_MATCH = 10_000_000   # classify as match above this


def q_customer_linkage_scores(sf_dir: str):
    """Fellegi-Sunter probabilistic record linkage: score candidate
    pairs between the customer table and a deterministically perturbed
    snapshot (keys +1e6; phone corrupted for key%3, name for key%5,
    balance band shifted for key%2 — the contact_extract
    synthesize-in-both-engines trick).  Candidates block on
    (nationkey, mktsegment); each pair scores Σ over fields of the
    agree/disagree log-likelihood weight, pre-scaled to INTEGER
    micro-units so summation is order-exact.  One nationkey cogroup
    does everything — the perturbed side derives from the same bucket
    rows, so there is NO join shuffle at all.  Emits pairs above the
    review threshold with the match classification."""

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey",
                  "c_acctbal", "c_mktsegment"])
    (wn_a, wn_d) = _FS_W["name"]
    (wp_a, wp_d) = _FS_W["phone"]
    (wb_a, wb_d) = _FS_W["band"]

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        # the table has no phone column: synthesize one deterministically
        # from the key in BOTH engines (the contact_extract trick)
        phone = ("555-" + pd.Series(1000 + k % 9000).astype(str)) \
            .to_numpy(object)
        cents = round_half_up(
            df["c_acctbal"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        # +1e6 shift keeps the operand positive: DuckDB's integer //
        # TRUNCATES toward zero while numpy floors — they differ on
        # negative acctbal cents (caught by the sf0.1 gate, 2 rows)
        band = (cents + 1_000_000) // 100_000
        base = pd.DataFrame(
            {
                "nk": df["c_nationkey"].to_numpy(np.int64),
                "seg": df["c_mktsegment"].to_numpy(object),
            }
        )
        a = base.assign(
            k=k, name=df["c_name"].to_numpy(object),
            phone=phone, band=band,
        )
        b = base.assign(
            k=k + 1_000_000,
            name=np.where(k % 5 == 0, df["c_name"] + "~", df["c_name"]),
            phone=np.where(k % 3 == 0, phone + "X", phone),
            band=band + (k % 2 == 0).astype(np.int64),
        )
        m = a.merge(b, on=["nk", "seg"], suffixes=("_a", "_b"))
        score = (
            np.where(m["name_a"] == m["name_b"], wn_a, wn_d)
            + np.where(m["phone_a"] == m["phone_b"], wp_a, wp_d)
            + np.where(m["band_a"] == m["band_b"], wb_a, wb_d)
        ).astype(np.int64)
        keep = score >= _FS_REVIEW
        return pd.DataFrame(
            {
                "u": m["k_a"].to_numpy(np.int64)[keep],
                "v": m["k_b"].to_numpy(np.int64)[keep],
                "score": score[keep],
                "is_match": (score[keep] >= _FS_MATCH).astype(np.int32),
            }
        )

    return grouped_map(cust, "c_nationkey", per_block)


# CTE prefix (record synthesis + blocked pair scoring) shared with the
# golden-record fusion query in analytics8.py
_FS_CTES_SQL = f"""ph AS (
  SELECT *, '555-' || CAST(1000 + c_custkey % 9000 AS VARCHAR) AS c_phone
  FROM customer),
a AS (
  SELECT c_custkey AS k, c_name AS name, c_phone AS phone,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000 AS band,
         c_nationkey, c_mktsegment
  FROM ph),
b AS (
  SELECT c_custkey + 1000000 AS k,
         CASE WHEN c_custkey % 5 = 0 THEN c_name || '~' ELSE c_name END
           AS name,
         CASE WHEN c_custkey % 3 = 0 THEN c_phone || 'X' ELSE c_phone END
           AS phone,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000
           + CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS band,
         c_nationkey, c_mktsegment
  FROM ph),
p AS (
  SELECT a.k AS u, b.k AS v,
         (CASE WHEN a.name = b.name THEN {_FS_W['name'][0]}
               ELSE {_FS_W['name'][1]} END
          + CASE WHEN a.phone = b.phone THEN {_FS_W['phone'][0]}
                 ELSE {_FS_W['phone'][1]} END
          + CASE WHEN a.band = b.band THEN {_FS_W['band'][0]}
                 ELSE {_FS_W['band'][1]} END) AS score
  FROM a JOIN b ON a.c_nationkey = b.c_nationkey
               AND a.c_mktsegment = b.c_mktsegment)"""

SQL_CUSTOMER_LINKAGE_SCORES = f"""
WITH {_FS_CTES_SQL}
SELECT u, v, CAST(score AS BIGINT) AS score,
       CAST(score >= {_FS_MATCH} AS INT) AS is_match
FROM p WHERE score >= {_FS_REVIEW}
"""


# ---------------------------------------------------------------------------
# sampled-splits range partitioner audit
# ---------------------------------------------------------------------------

def q_value_range_partition(sf_dir: str):
    """The sort-shuffle range partitioner, oracle-checked: an md5-
    deterministic 1/16 sample of events.value yields 7 exact rank-
    quantile split points (rank = ceil(i/8 · n) over the sample, the
    doclen_quantiles convention), then every row is assigned bucket =
    #boundaries <= cents (searchsorted right) and per-bucket count /
    min / max fold distributed.  Duplicate boundary VALUES are kept as
    a multiset on both sides, so bucket numbering stays consistent.
    Integer cents end-to-end."""
    from kgray.ops.sample import _md5_hex, rank_quantiles

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def cents_all(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {"event_id": batch["event_id"], "cents": pa.array(c)}
        )

    evc = ev.map_batches(cents_all, batch_format="pyarrow").materialize()

    def sample(batch: pa.Table) -> pa.Table:
        hs = _md5_hex(batch["event_id"].to_pylist())
        keep = np.fromiter((h[0] == "0" for h in hs), bool, len(hs))
        return pa.table(
            {"cents": batch["cents"].filter(pa.array(keep))}
        )

    samp = evc.map_batches(sample, batch_format="pyarrow")
    ps = [i / 8 for i in range(1, 8)]
    bounds = np.sort(
        rank_quantiles(samp, "cents", ps)["value"].to_numpy()
    ).astype(np.int64)

    def assign(batch: pa.Table, bounds=bounds) -> pa.Table:
        c = batch["cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    np.searchsorted(bounds, c, side="right")
                    .astype(np.int64)
                ),
                "cents": batch["cents"],
            }
        )

    return pre_aggregate(
        evc.map_batches(assign, batch_format="pyarrow"),
        ["bucket"],
        {"n_rows": (None, "count"), "min_cents": ("cents", "min"),
         "max_cents": ("cents", "max")},
    )


SQL_VALUE_RANGE_PARTITION = """
WITH ev AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
            FROM events),
s AS (SELECT cents FROM ev
      WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'),
r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
             COUNT(*) OVER () AS n FROM s),
b AS (SELECT r.cents AS val
      FROM r JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) t(i)
        ON r.rn = CAST(ceil(t.i * 0.125 * r.n) AS BIGINT))
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM (SELECT e.cents,
             CAST((SELECT COUNT(*) FROM b WHERE b.val <= e.cents)
                  AS BIGINT) AS bucket
      FROM ev e)
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# integer fixed-point EWMA (per-key variable-length recurrence, oracle'd)
# ---------------------------------------------------------------------------

def q_events_int_ewma(sf_dir: str):
    """Streaming per-user EWMA as INTEGER fixed point: l_t = (cents_t +
    3*l_{t-1}) // 4 over each user's (ts, event_id)-ordered values,
    final state per user.  This PROMOTES the ewma family to
    oracle-checked (the float events_user_ewma stays rows-only): integer
    floor arithmetic is engine-exact, and the 'not SQL-expressible'
    claim falls to a ROW_NUMBER-indexed recursive CTE that advances all
    users one step per iteration — O(rows), not quadratic (measured 3 s
    at sf0.1).  Ray side is ONE user cogroup with the identical
    recurrence."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        cents = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        users = df["user_id"].to_numpy(np.int64)
        # group boundaries over the sorted array
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        ends = np.r_[starts[1:], len(users)]
        out_u = np.empty(len(starts), np.int64)
        out_l = np.empty(len(starts), np.int64)
        out_n = np.empty(len(starts), np.int64)
        c = cents.tolist()  # python ints: the loop is the recurrence
        for i, (s, e) in enumerate(zip(starts, ends)):
            l = c[s]
            for j in range(s + 1, e):
                l = (c[j] + 3 * l) // 4
            out_u[i] = users[s]
            out_l[i] = l
            out_n[i] = e - s
        return pd.DataFrame(
            {"user_id": out_u, "ewma_cents": out_l, "n": out_n}
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_INT_EWMA = """
WITH RECURSIVE r AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
s AS (
  SELECT user_id, rn, cents AS l FROM r WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.rn, (r.cents + 3 * s.l) // 4
  FROM s JOIN r ON r.user_id = s.user_id AND r.rn = s.rn + 1),
sel AS (SELECT user_id, l, rn,
               MAX(rn) OVER (PARTITION BY user_id) AS mx FROM s)
SELECT user_id, CAST(l AS BIGINT) AS ewma_cents, CAST(mx AS BIGINT) AS n
FROM sel WHERE rn = mx
"""

# ---------------------------------------------------------------------------
# integer fixed-point k-means (iterative ML, oracle-checked end-to-end)
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ITERS = 2
_KM_SCALE = 10**6
_KM_SHIFT = 10**7
_KM_DIM = 64


def q_embed_kmeans_int(sf_dir: str):
    """Integer fixed-point Lloyd k-means over the embeddings table (k=4,
    2 assign/update rounds + a final assignment) — an ITERATIVE ML
    algorithm oracle-checked end-to-end (the float embed_kmeans stays
    rows-only).  Vectors quantize to shifted int64 micro-units; the
    oracle unrolls the identical argmin-assign (ties -> MIN cluster) and
    floor-mean update per round.  See ops/similarity.kmeans_int for the
    broadcast-centroid / long-format-partial scale shape."""
    from kgray.ops.similarity import kmeans_int

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_int(emb, k=_KM_K, iters=_KM_ITERS,
                      scale=_KM_SCALE, shift=_KM_SHIFT)


def _kmeans_sql(k: int = _KM_K, iters: int = _KM_ITERS,
                scale: int = _KM_SCALE, shift: int = _KM_SHIFT,
                dim: int = _KM_DIM) -> str:
    ctes = [
        "q AS (SELECT vec_id, list_transform(embedding,"
        f" x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)"
        f" + {shift}) AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS k, v FROM q WHERE vec_id < {k})",
    ]
    prev_c = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"d{i} AS (SELECT q.vec_id, c.k,\n"
            "         SUM((q.v[t.d] - c.v[t.d]) * (q.v[t.d] - c.v[t.d]))"
            " AS dist\n"
            f"       FROM q CROSS JOIN {prev_c} c, range(1, {dim + 1})"
            " t(d)\n"
            "       GROUP BY 1, 2)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, CAST(MIN(k) AS BIGINT) AS k FROM (\n"
            "         SELECT vec_id, k, dist,"
            " MIN(dist) OVER (PARTITION BY vec_id) AS md"
            f" FROM d{i})\n"
            "       WHERE dist = md GROUP BY 1)"
        )
        ctes.append(
            f"c{i} AS (SELECT c.k,"
            " CASE WHEN s.v IS NULL THEN c.v ELSE s.v END AS v\n"
            f"       FROM {prev_c} c LEFT JOIN (\n"
            "         SELECT k, list(CAST(s // n AS BIGINT) ORDER BY d)"
            " AS v FROM (\n"
            f"           SELECT a.k, t.d, SUM(q.v[t.d]) AS s,"
            " COUNT(*) AS n\n"
            f"           FROM a{i} a JOIN q USING (vec_id),"
            f" range(1, {dim + 1}) t(d)\n"
            "           GROUP BY 1, 2) GROUP BY k) s ON c.k = s.k)"
        )
        prev_c = f"c{i}"
    # final assignment against the last centroids
    ctes.append(
        f"df AS (SELECT q.vec_id, c.k,\n"
        "       SUM((q.v[t.d] - c.v[t.d]) * (q.v[t.d] - c.v[t.d]))"
        " AS dist\n"
        f"     FROM q CROSS JOIN {prev_c} c, range(1, {dim + 1}) t(d)\n"
        "     GROUP BY 1, 2)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT vec_id, CAST(MIN(k) AS BIGINT) AS cluster FROM (\n"
        "  SELECT vec_id, k, dist,"
        " MIN(dist) OVER (PARTITION BY vec_id) AS md FROM df)\n"
        "WHERE dist = md GROUP BY 1"
    )


SQL_EMBED_KMEANS_INT = _kmeans_sql()
