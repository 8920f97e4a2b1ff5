"""Session-21b operator batch — time-interval windows / itemsets /
retrieval-eval / corpus-stats family: RANGE-frame trailing-1h sums
(searchsorted prefix-sum inversion of the interval window), 3-itemset
market baskets (the near-unique-key cogroup fold from basket_pairs,
one arity up), exact mean reciprocal rank (the 1/k float killed by an
lcm(1..10)=2520 integer numerator), and per-source hapax-legomena
ratios over the vocab-scale fold.

Exactness strategy: integer accumulations everywhere (cents,
microseconds, lcm-scaled reciprocals, counts); final divisions have
identical operands in both engines.
"""

from ._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Trailing 1-hour RANGE-frame sum per user
# ---------------------------------------------------------------------------


def q_events_range_sum(sf_dir: str):
    """Per event: sum of the same user's cents over the trailing hour
    [ts - 1h, ts] — a RANGE (time-interval) frame, not a ROWS frame, so
    peers at the current timestamp are all included.  One user-keyed
    cogroup; inside, each user's window is two ``searchsorted`` probes
    against the prefix cumsum (O(n log n) per user, no per-row scan).
    Integer cents end-to-end."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        c = round_half_up(df["value"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64)
        eid = df["event_id"].to_numpy()
        outs = []
        for _, idx in df.groupby("user_id", sort=False).indices.items():
            u = us[idx]
            cum = np.concatenate([[0], np.cumsum(c[idx])])
            lo = np.searchsorted(u, u - 3_600_000_000, side="left")
            hi = np.searchsorted(u, u, side="right")  # current-ts peers
            outs.append(pd.DataFrame({
                "event_id": eid[idx],
                "range_sum_c": (cum[hi] - cum[lo]).astype(np.int64),
            }))
        return pd.concat(outs, ignore_index=True)

    return grouped_map(ev, "user_id", win)


SQL_EVENTS_RANGE_SUM = """
SELECT event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS BIGINT) AS range_sum_c
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# 3-itemset market baskets
# ---------------------------------------------------------------------------


def q_basket_triples(sf_dir: str):
    """Co-purchase 3-itemsets: distinct part triples within an order
    (basket size capped to [3, 15] in BOTH engines — the standard
    frequent-itemset cap that bounds the C(n,3) expansion), support
    counted across orders, top-100.  Same shape as basket_pairs one
    arity up: order-keyed cogroup expands combinations, triple keys are
    near-unique so the fold is a p1-keyed cogroup with an in-bucket
    top-k (never groupby.aggregate — the Q18 lesson).  No minimum
    support: a fixed >=2 threshold EMPTIES at larger SF (10x the part
    count makes triple collisions rarer — the scale-invariance lesson),
    and an empty result can never pass the driver compare."""
    import itertools

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        sz = d.groupby("l_orderkey", sort=False)["l_partkey"] \
              .transform("size")
        d = d[(sz >= 3) & (sz <= 15)]
        rows = []
        for _, grp in d.groupby("l_orderkey", sort=False):  # basket loop
            for t in itertools.combinations(
                    sorted(grp["l_partkey"].tolist()), 3):
                rows.append(t)
        out = pd.DataFrame(rows, columns=["p1", "p2", "p3"])
        if out.empty:
            return pd.DataFrame({
                "p1": pd.Series(dtype=np.int64),
                "p2": pd.Series(dtype=np.int64),
                "p3": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64)})
        g = out.groupby(["p1", "p2", "p3"], sort=False).size() \
               .rename("n").reset_index()
        return g

    triples = grouped_map(line, "l_orderkey", per_bucket)

    def fold_topk(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["p1", "p2", "p3"], sort=False)["n"].sum() \
              .rename("support").reset_index()
        c["support"] = c["support"].astype(np.int64)
        return c.sort_values(
            ["support", "p1", "p2", "p3"],
            ascending=[False, True, True, True], kind="mergesort",
        ).head(100)

    top = grouped_map(triples, "p1", fold_topk)
    return top.sort(["support", "p1", "p2", "p3"],
                    descending=[True, False, False, False]).limit(100)


SQL_BASKET_TRIPLES = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
sz AS (SELECT o, COUNT(*) AS n FROM b GROUP BY o),
e AS (SELECT b.o, b.p FROM b JOIN sz USING (o) WHERE sz.n BETWEEN 3 AND 15),
pr AS (SELECT a.o, a.p AS p1, c.p AS p2
       FROM e a JOIN e c ON a.o = c.o AND a.p < c.p),
t AS (SELECT pr.p1, pr.p2, d.p AS p3
      FROM pr JOIN e d ON pr.o = d.o AND pr.p2 < d.p),
s AS (SELECT p1, p2, p3, CAST(COUNT(*) AS BIGINT) AS support
      FROM t GROUP BY 1, 2, 3)
SELECT p1, p2, p3, support FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY support DESC, p1, p2, p3) AS r
  FROM s)
WHERE r <= 100
"""


# ---------------------------------------------------------------------------
# Mean reciprocal rank (exact, lcm-integer numerator)
# ---------------------------------------------------------------------------


def q_events_mrr(sf_dir: str):
    """MRR of the frequency ranking against each user's single
    most-valuable event type: rank k = position of the top-relevance
    type in the count-ordered list, MRR = mean(1/k).  The float sum of
    reciprocals is replaced by the integer numerator
    sum_k cnt_k * (2520 // k) (2520 = lcm(1..10); ranks are bounded by
    the distinct-type cardinality, asserted <= 10 in both engines), so
    MRR = num / (2520 * n) is a single division of identical integer
    operands — exact in any summation order."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["c"] = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = df.groupby(["user_id", "event_type"], sort=False).agg(
            n=("c", "size"), c=("c", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = pre_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], {"n": ("n", "sum"), "c": ("c", "sum")})

    def rank_hist(df: pd.DataFrame) -> pd.DataFrame:
        a = df.sort_values(["user_id", "n", "event_type"],
                           ascending=[True, False, True])
        a = a.assign(rr=a.groupby("user_id", sort=False).cumcount() + 1)
        b = df.sort_values(["user_id", "c", "event_type"],
                           ascending=[True, False, True])
        tgt = b.groupby("user_id", sort=False).head(1)[
            ["user_id", "event_type"]]
        k = tgt.merge(a, on=["user_id", "event_type"])["rr"]
        h = k[k <= 10].value_counts().reset_index()
        h.columns = ["k", "cnt"]
        h["cnt"] = h["cnt"].astype(np.int64)
        h["k"] = h["k"].astype(np.int64)
        return h

    hist = grouped_map(agg, "user_id", rank_hist).to_pandas()  # <=10 rows/bucket
    h = hist.groupby("k")["cnt"].sum()
    n = int(h.sum())
    num = int(sum(int(c) * (2520 // int(k)) for k, c in h.items()))
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "mrr": pa.array(
            [float(round_half_up(float(num) / float(2520 * n), 6))],
            pa.float64()),
    })


SQL_EVENTS_MRR = """
WITH a AS (
  SELECT user_id, event_type AS t, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, t) AS rr,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY c DESC, t) AS ri
  FROM a),
k AS (SELECT x.user_id, x.rr AS k
      FROM r x JOIN r y ON x.user_id = y.user_id AND x.t = y.t
      WHERE y.ri = 1 AND x.rr <= 10)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(2520 // k) AS DOUBLE)
             / CAST(2520 * COUNT(*) AS DOUBLE), 6) AS mrr
FROM k
"""


# ---------------------------------------------------------------------------
# Hapax-legomena ratio per source
# ---------------------------------------------------------------------------


def q_source_hapax(sf_dir: str):
    """Vocabulary size, hapax count (corpus frequency exactly 1 within
    the source) and hapax ratio per source — the lexical-richness /
    OCR-noise diagnostic.  Row-scale text folds to the vocab-scale
    (source, word, n) table via the combiner; the per-source rollup is
    a tiny second fold.  Tokenization is the corpus convention (split
    on ' ', empties kept)."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        cnt: dict = {}
        for s, t in zip(src, batch["text"].to_pylist()):
            for w in t.split(" "):
                key = (s, w)
                cnt[key] = cnt.get(key, 0) + 1
        ks = sorted(cnt)
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "word": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([cnt[k] for k in ks], pa.int64()),
        })

    wc = pre_aggregate(
        docs.map_batches(tokens, batch_format="pyarrow"),
        ["source", "word"], {"n": ("n", "sum")})

    def flag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch["source"],
            "v": pa.array(np.ones(batch.num_rows, np.int64)),
            "h": pc.cast(pc.equal(batch["n"], 1), pa.int64()),
        })

    out = pre_aggregate(
        wc.map_batches(flag, batch_format="pyarrow"),
        ["source"], {"n_vocab": ("v", "sum"), "n_hapax": ("h", "sum")})

    def ratio(batch: pa.Table) -> pa.Table:
        r = round_half_up(
            batch["n_hapax"].to_numpy(zero_copy_only=False)
            .astype(np.float64)
            / batch["n_vocab"].to_numpy(zero_copy_only=False)
            .astype(np.float64), 6)
        return batch.append_column("hapax_ratio",
                                   pa.array(r, pa.float64()))

    return out.map_batches(ratio, batch_format="pyarrow")


SQL_SOURCE_HAPAX = """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
FROM c GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Incrementally-maintained rollup (materialized-view maintenance proof)
# ---------------------------------------------------------------------------


def q_events_incr_rollup(sf_dir: str):
    """Materialized-view maintenance, value-hash proven: events are
    split into 3 deterministic append batches (event_id % 3); each
    batch appends to a partitioned base table and ``refresh_rollup``
    folds ONLY the unseen manifest-attested files (file-name watermark,
    merge against the pinned rollup snapshot version).  The final
    rollup must equal a flat GROUP BY over ALL events — the SQL oracle
    — so incremental maintenance == full recompute is checked
    end-to-end, not just asserted."""
    import os
    import shutil
    import tempfile

    import ray

    from kgray import io as kio
    from kgray.ops.rollup import refresh_rollup

    work = tempfile.mkdtemp(prefix="kgray_rollup_")
    base = os.path.join(work, "base")
    roll = os.path.join(work, "roll")
    try:
        ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

        def prep(batch: pa.Table) -> pa.Table:
            c = round_half_up(
                batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
            ).astype(np.int64)
            return pa.table({"event_id": batch["event_id"],
                             "event_type": batch["event_type"],
                             "c": pa.array(c)})

        full = ev.map_batches(prep, batch_format="pyarrow")
        existing: set[int] = set()
        out = None
        for i in range(3):
            def sel(batch: pa.Table, i=i) -> pa.Table:
                eid = batch["event_id"].to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(eid % 3 == i))

            ds_i = full.map_batches(sel, batch_format="pyarrow")
            kio.write_partitioned(
                ds_i, base, key_col="event_id", num_partitions=8,
                keep_partitions=existing or None, stage="base")
            existing = {int(p)
                        for p in kio.read_manifest(base)["partitions"]}
            out, _info = refresh_rollup(
                base, roll, ["event_type"],
                {"n": (None, "count"), "sum_c": ("c", "sum"),
                 "min_c": ("c", "min"), "max_c": ("c", "max")},
                columns=["event_type", "c"])
        return pa.concat_tables(
            [t for t in (ray.get(r) for r in out.to_arrow_refs())
             if t.num_rows])
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_EVENTS_INCR_ROLLUP = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
       CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
       CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Hierarchical subtree aggregation (BOM-style rollup)
# ---------------------------------------------------------------------------


def q_part_subtree_agg(sf_dir: str):
    """Subtree totals over a part hierarchy (parent(p) = p // 10, roots
    below 10 — a deterministic BOM-shaped forest synthesized identically
    in both engines): for every node, the total lineitem quantity and
    part count of its whole subtree.  Depth is digit-bounded (<= 7), so
    instead of iterative upward propagation each part EXPANDS to its
    ancestors-or-self chain in one vectorized flat map (bounded fan-out,
    no rounds, no driver state) and one combiner fold groups by node.
    The oracle is the recursive-CTE transitive closure — equal because
    both enumerate exactly the ancestor chains."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def direct(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qi = round_half_up(
            batch["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        df = pd.DataFrame({"p": p, "q": qi})
        g = df.groupby("p", sort=False)["q"].sum()
        return pa.table({
            "p": pa.array(g.index.to_numpy(np.int64)),
            "q": pa.array(g.to_numpy(np.int64)),
        })

    v = pre_aggregate(
        li.map_batches(direct, batch_format="pyarrow"),
        ["p"], {"q": ("q", "sum")})

    def expand(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes, qs, cnt = [p], [q], [np.ones(len(p), np.int64)]
        cur = p
        while True:
            m = cur >= 10
            if not m.any():
                break
            cur = cur[m] // 10
            q = q[m]
            nodes.append(cur)
            qs.append(q)
            cnt.append(np.ones(len(cur), np.int64))
        return pa.table({
            "node": pa.array(np.concatenate(nodes)),
            "q": pa.array(np.concatenate(qs)),
            "cnt": pa.array(np.concatenate(cnt)),
        })

    ex = v.map_batches(expand, batch_format="pyarrow")
    return pre_aggregate(
        ex, ["node"],
        {"subtree_qty": ("q", "sum"), "n_parts": ("cnt", "sum")})


SQL_PART_SUBTREE_AGG = """
WITH RECURSIVE v AS (
  SELECT l_partkey AS p,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1),
a AS (
  SELECT p AS node, p, q FROM v
  UNION ALL
  SELECT a.node // 10, a.p, a.q FROM a WHERE a.node >= 10)
SELECT node, CAST(SUM(q) AS BIGINT) AS subtree_qty,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM a GROUP BY 1 ORDER BY 1
"""
