"""kgray.queries.analytics4 — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)



def q_user_streaks(sf_dir: str):
    """Max consecutive-active-day streak per user (gaps-and-islands over
    integer day numbers): distinct (user, day) collapses inside each
    batch FIRST (combiner — the shuffle moves at most one row per
    (batch, user, day)), then the island id (day - rank) and the
    per-island counts are three vectorized passes per bucket."""

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(us, 86_400_000_000),
            }
        )

    days = pre_aggregate(
        ev.map_batches(to_days, batch_format="pyarrow"),
        ["user_id", "day"], {"nn": (None, "count")},
    )

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        new_run = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        run_id = np.cumsum(new_run)
        runs = pd.DataFrame({"user_id": u, "run": run_id})
        lens = runs.groupby(["user_id", "run"], sort=False).size()
        best = lens.groupby(level=0, sort=False).max()
        return pd.DataFrame(
            {
                "user_id": best.index.to_numpy(np.int64),
                "max_streak": best.to_numpy(np.int64),
            }
        )

    return grouped_map(days, "user_id", streaks)


SQL_USER_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)/86400) AS BIGINT) AS day
  FROM events),
r AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak FROM (
  SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2)
GROUP BY 1
"""


def q_user_daily_dense(sf_dir: str):
    """Calendar gap-fill: per-user daily counts with ZERO rows for every
    silent day between the user's first and last activity — the dense
    time-series primitive.  Counts collapse via the combiner, then one
    user cogroup; inside each bucket the calendar expands with numpy
    repeat/cumsum arithmetic (no per-user python) and a left merge
    fills the zeros.  Output size is sum of user spans, not users x
    global range — skew-safe when one user is years long."""

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(us, 86_400_000_000),
            }
        )

    counts = pre_aggregate(
        ev.map_batches(to_days, batch_format="pyarrow"),
        ["user_id", "day"], {"n": (None, "count")},
    )

    def densify(df: pd.DataFrame) -> pd.DataFrame:
        spans = df.groupby("user_id", sort=False)["day"].agg(["min", "max"])
        length = (spans["max"] - spans["min"] + 1).to_numpy(np.int64)
        users = np.repeat(spans.index.to_numpy(np.int64), length)
        starts = np.repeat(np.cumsum(length) - length, length)
        offs = np.arange(length.sum(), dtype=np.int64) - starts
        days = np.repeat(spans["min"].to_numpy(np.int64), length) + offs
        cal = pd.DataFrame({"user_id": users, "day": days})
        out = cal.merge(df, on=["user_id", "day"], how="left")
        out["n"] = out["n"].fillna(0).astype(np.int64)
        return out[["user_id", "day", "n"]]

    return grouped_map(counts, "user_id", densify)


SQL_USER_DAILY_DENSE = """
WITH c AS (
  SELECT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
s AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM c GROUP BY 1),
cal AS (SELECT user_id, UNNEST(generate_series(mn, mx)) AS day FROM s)
SELECT cal.user_id, CAST(cal.day AS BIGINT) AS day,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM cal LEFT JOIN c ON cal.user_id = c.user_id AND cal.day = c.day
"""


def q_dup_span_stats(sf_dir: str):
    """Per-doc duplicated-substring statistics (40-char windows, stride
    1, shared across >= 2 docs) — see kgray/ops/dedup.py:dup_span_stats
    for the distribution story.  The oracle is the literal substr
    self-join; the Ray side runs the SCALE path (use_hash=True: the
    shuffle moves 8-byte rolling hashes, 5x less volume than the window
    strings) — its per-doc stats OUTPUT equals the string path exactly
    absent collisions (~n²/2^64; test-pinned equal), so it still
    value-hash-matches the string oracle."""
    from kgray.ops.dedup import dup_span_stats

    return dup_span_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]), window=40,
        use_hash=True,
    )


SQL_DUP_SPAN_STATS = """
WITH w AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 40) AS w
  FROM documents, UNNEST(range(1, length(text) - 38)) AS t(i)
  WHERE length(text) >= 40),
d AS (SELECT w, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS dup_frac
FROM w JOIN d USING (w) GROUP BY 1
"""


def q_text_normalize(sf_dir: str):
    """Unicode + whitespace normalization (NFC -> collapse ASCII
    whitespace -> trim -> lower), the canonical pre-tokenization
    cleanup.  The corpus is ASCII, so a decomposed accent (e +
    combining acute) and stray whitespace are prepended IN BOTH ENGINES
    — the NFC recombination and collapse are what the oracle checks.
    Whitespace is an explicit ASCII class: Python \\s is Unicode-aware,
    RE2's is not."""
    import unicodedata

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ws = re.compile(r"[ \t\n\r\f]+")

    def norm(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            raw = "e\u0301  " + (t or "") + " "  # decomposed, as the SQL
            s = unicodedata.normalize("NFC", raw)
            s = ws.sub(" ", s).strip(" ").lower()
            out.append(s)
        normed = pa.array(out, pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm": normed,
                "n_chars_norm": pc.cast(pc.utf8_length(normed), pa.int64()),
            }
        )

    return docs.map_batches(norm, batch_format="pyarrow")


SQL_TEXT_NORMALIZE = """
WITH n AS (
  SELECT doc_id,
         lower(trim(regexp_replace(
           nfc_normalize(chr(101) || chr(769) || '  ' || text || ' '),
           '[ \t\n\r\f]+', ' ', 'g'), ' ')) AS norm
  FROM documents)
SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n_chars_norm FROM n
"""


def q_embed_label_diversity(sf_dir: str):
    """Per-label mean pairwise cosine WITHOUT pair materialization —
    (||Σv̂||² - n)/(n(n-1)) on the normalized-sum fold (the SemDeDup
    cluster-diversity score).  One partial row per (batch, label)
    shuffles; the identity runs on the label-scale aggregate."""
    from kgray.ops.similarity import label_diversity

    return label_diversity(_read(sf_dir, "embeddings",
                                 ["label", "embedding"]))


SQL_EMBED_LABEL_DIVERSITY = """
WITH nv AS (
  SELECT label,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE) /
                sqrt(list_sum(list_transform(embedding,
                       y -> CAST(y AS DOUBLE) * y)))) AS v
  FROM embeddings),
s AS (
  SELECT label, i, SUM(v[i]) AS sv
  FROM nv, UNNEST(range(1, 65)) AS t(i)
  GROUP BY 1, 2),
c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1)
SELECT s.label, CAST(c.n AS BIGINT) AS n,
       ROUND((SUM(sv * sv) - c.n) / (c.n * (c.n - 1.0)), 4) AS avg_cos
FROM s JOIN c USING (label)
GROUP BY s.label, c.n
HAVING c.n >= 2
"""


def q_user_value_mad(sf_dir: str):
    """Per-group median absolute deviation (the robust dispersion
    companion to z-score outliers): needs the group median TWICE —
    everything for a user sits in one coarse bucket after the single
    cogroup shuffle, so both median passes are pandas C groupbys with
    no extra all-to-all.  Interpolation semantics match DuckDB MEDIAN
    (quantile_cont 0.5) exactly; round(4) absorbs ulp drift."""

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def mad(df: pd.DataFrame) -> pd.DataFrame:
        med = df.groupby("user_id", sort=False)["value"].transform("median")
        dev = (df["value"] - med).abs()
        m = dev.groupby(df["user_id"], sort=False).median()
        return pd.DataFrame(
            {
                "user_id": m.index.to_numpy(np.int64),
                "mad": round_half_up(m.to_numpy(np.float64), 4),
            }
        )

    return grouped_map(ev, "user_id", mad)


SQL_USER_VALUE_MAD = """
WITH m AS (SELECT user_id, MEDIAN(value) AS med FROM events GROUP BY 1)
SELECT e.user_id, ROUND(MEDIAN(ABS(e.value - m.med)), 4) AS mad
FROM events e JOIN m USING (user_id)
GROUP BY e.user_id
"""


def q_events_session_ids(sf_dir: str):
    """Session-id ASSIGNMENT (not just counts): each event gets its
    user's running session index — LAG gap test + per-user running sum,
    both vectorized inside the single user-cogroup bucket.  The
    stateful-streaming window primitive in batch form."""

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_sess = (
            prev.isna()
            | ((df["ts"] - prev).dt.total_seconds() > 1800)
        ).astype(np.int64)
        idx = new_sess.groupby(df["user_id"], sort=False).cumsum()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "session_idx": idx.to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", assign)


SQL_EVENTS_SESSION_IDS = """
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM (SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events)
"""


def q_events_window_join(sf_dir: str):
    """Bounded stream-stream self-join: for every view, the count of
    the SAME user's clicks inside the following 10 minutes — the
    tumbling-window join primitive.  One user cogroup, then the window
    count decomposes into two vectorized merge_asof passes against the
    per-user cumulative click counter (n = F(t+W) - F(t)); no pair
    materialization, cost is O(views + clicks) per bucket."""

    W_US = 600_000_000  # 10 min in microseconds

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        views = df[df["event_type"] == "view"]
        clicks = df[df["event_type"] == "click"].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if len(clicks):
            cum = clicks.groupby("user_id", sort=False).cumcount() + 1
            cl = pd.DataFrame(
                {
                    "user_id": clicks["user_id"].to_numpy(np.int64),
                    "t": clicks["ts"].to_numpy("datetime64[us]")
                    .astype(np.int64),
                    "cum": cum.to_numpy(np.int64),
                }
            ).drop_duplicates(["user_id", "t"], keep="last")
            cl = cl.sort_values("t", kind="mergesort")
        else:
            cl = pd.DataFrame(
                {"user_id": pd.array([], dtype="int64"),
                 "t": pd.array([], dtype="int64"),
                 "cum": pd.array([], dtype="int64")}
            )
        vt = views["ts"].to_numpy("datetime64[us]").astype(np.int64)
        base = pd.DataFrame(
            {
                "event_id": views["event_id"].to_numpy(np.int64),
                "user_id": views["user_id"].to_numpy(np.int64),
                "t": vt,
            }
        ).sort_values("t", kind="mergesort")

        def cum_at(ts_col: np.ndarray) -> np.ndarray:
            q = base.assign(t=ts_col).sort_values("t", kind="mergesort")
            m = pd.merge_asof(q, cl, on="t", by="user_id",
                              direction="backward",
                              allow_exact_matches=True)
            return (
                m.set_index("event_id")["cum"]
                .reindex(base["event_id"]).fillna(0).to_numpy(np.int64)
            )

        t0 = base["t"].to_numpy(np.int64)
        n = cum_at(t0 + W_US) - cum_at(t0)
        return pd.DataFrame(
            {
                "event_id": base["event_id"].to_numpy(np.int64),
                "n_follow": n,
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_WINDOW_JOIN = """
SELECT v.event_id, CAST(COUNT(c.event_id) AS BIGINT) AS n_follow
FROM events v LEFT JOIN events c
  ON c.user_id = v.user_id AND c.event_type = 'click'
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
WHERE v.event_type = 'view'
GROUP BY 1
"""


def q_fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit over the star schema's four FK
    edges: each edge is an ANTI semi-join (broadcast key set when
    dimension-sized, bloom-gated cogroup otherwise) folded to one
    orphan count — the data-quality gate a 100-TB ingest runs before
    anything joins."""

    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
    ]
    names, counts = [], []
    for name, child, ck, parent, pk in edges:
        orphans = semi_join(
            _read(sf_dir, child, [ck]),
            _read(sf_dir, parent, [pk]),
            on=ck, right_on=pk, anti=True,
        )
        names.append(name)
        counts.append(orphans.count())
    return pa.table(
        {
            "edge": pa.array(names, pa.string()),
            "n_orphans": pa.array(counts, pa.int64()),
        }
    )


SQL_FK_INTEGRITY_AUDIT = """
SELECT 'lineitem->orders' AS edge, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
UNION ALL
SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
UNION ALL
SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
"""


def q_contact_extract(sf_dir: str):
    """Regex field extraction (named capture -> columns) over the same
    deterministic contact header the redaction query synthesizes: the
    schema-on-read pattern for semi-structured text.  Compiled-once
    patterns; ASCII classes pin Python-re == RE2 group semantics;
    no-match extracts '' in both engines."""

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    user_re = re.compile(r"([A-Za-z0-9._]+)@")
    dom_re = re.compile(r"@([A-Za-z0-9.]+)")
    ph_re = re.compile(r"([0-9]{3}-[0-9]{3,4})")

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        users, doms, phones = [], [], []
        for i, t in zip(ids, texts):
            raw = (
                f"user{i}@mail{i % 7}.example.com tel "
                f"555-{1000 + i % 9000} " + (t or "")
            )
            m = user_re.search(raw)
            users.append(m.group(1) if m else "")
            m = dom_re.search(raw)
            doms.append(m.group(1) if m else "")
            m = ph_re.search(raw)
            phones.append(m.group(1) if m else "")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "user_part": pa.array(users, pa.string()),
                "domain": pa.array(doms, pa.string()),
                "phone": pa.array(phones, pa.string()),
            }
        )

    return docs.map_batches(extract, batch_format="pyarrow")


SQL_CONTACT_EXTRACT = """
WITH raw AS (
  SELECT doc_id,
         'user' || CAST(doc_id AS VARCHAR) || '@mail' ||
         CAST(doc_id % 7 AS VARCHAR) || '.example.com tel 555-' ||
         CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ' || text AS t
  FROM documents)
SELECT doc_id,
       regexp_extract(t, '([A-Za-z0-9._]+)@', 1) AS user_part,
       regexp_extract(t, '@([A-Za-z0-9.]+)', 1) AS domain,
       regexp_extract(t, '([0-9]{3}-[0-9]{3,4})', 1) AS phone
FROM raw
"""


def q_docs_cube(sf_dir: str):
    """GROUP BY CUBE(lang, source) in ONE pass: each batch folds its
    (lang, source) counts once, then re-emits the four grouping sets
    with an 'ALL' sentinel — the combiner multiplies rows by the number
    of SETS (4), not by input size, so the shuffle stays group-scale.
    (The rollup query covers the hierarchy case; this is the full
    lattice.)"""

    docs = _read(sf_dir, "documents", ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        base = df.groupby(["lang", "source"]).size().reset_index(name="n")
        outs = []
        for gl, gs in [(1, 1), (1, 0), (0, 1), (0, 0)]:
            t = base.copy()
            if not gl:
                t["lang"] = "ALL"
            if not gs:
                t["source"] = "ALL"
            outs.append(
                t.groupby(["lang", "source"], as_index=False)["n"].sum()
            )
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True), preserve_index=False
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_DOCS_CUBE = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY CUBE(lang, source)
"""


def q_customers_all_priorities(sf_dir: str):
    """Relational division (customers whose orders span EVERY priority
    class): distinct (cust, priority) collapses via the combiner, the
    per-customer distinct count is a second group-scale fold, and the
    divisor (global distinct priorities) is a metadata-scale aggregate
    compared driver-side — no fact row crosses the shuffle twice."""

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    pairs = pre_aggregate(
        orders, ["o_custkey", "o_orderpriority"], {"nn": (None, "count")}
    )
    per_cust = pre_aggregate(pairs, ["o_custkey"],
                             {"n_pri": (None, "count")})
    n_all = pre_aggregate(
        orders, ["o_orderpriority"], {"nn": (None, "count")}
    ).count()
    return per_cust.map_batches(
        lambda b, k=n_all: b.filter(pc.equal(b["n_pri"], k)).rename_columns(
            ["c_custkey", "n_pri"]
        ),
        batch_format="pyarrow",
    )


SQL_CUSTOMERS_ALL_PRIORITIES = """
SELECT o_custkey AS c_custkey,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_pri
FROM orders GROUP BY 1
HAVING COUNT(DISTINCT o_orderpriority) =
       (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
"""


def q_dup_span_purge(sf_dir: str):
    """The dup-span removal TRANSFORM (all occurrences of cross-doc
    40-char windows cut out) — see dedup.dup_span_purge.  Oracle is a
    full string-reconstruction check: per-char explode, coverage
    anti-join, ordered string_agg."""
    from kgray.ops.dedup import dup_span_purge

    return dup_span_purge(
        _read(sf_dir, "documents", ["doc_id", "text"]), window=40
    )


SQL_DUP_SPAN_PURGE = """
WITH docs0 AS (SELECT doc_id, text FROM documents),
w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(text, CAST(i AS INTEGER), 40) AS w
  FROM docs0, UNNEST(range(1, length(text) - 38)) AS t(i)
  WHERE length(text) >= 40),
d AS (SELECT w FROM (SELECT w, COUNT(DISTINCT doc_id) AS nd
                     FROM w GROUP BY 1) WHERE nd >= 2),
dup AS (SELECT DISTINCT doc_id, i FROM w JOIN d USING (w)),
chars AS (
  SELECT doc_id, CAST(j AS BIGINT) AS j,
         substr(text, CAST(j AS INTEGER), 1) AS c
  FROM docs0, UNNEST(range(1, length(text) + 1)) AS t(j)),
cov AS (
  SELECT DISTINCT c.doc_id, c.j
  FROM chars c JOIN dup ON c.doc_id = dup.doc_id
   AND c.j >= dup.i AND c.j < dup.i + 40),
kept AS (
  SELECT ch.doc_id, ch.j, ch.c
  FROM chars ch ANTI JOIN cov
    ON ch.doc_id = cov.doc_id AND ch.j = cov.j)
SELECT d0.doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       CAST(length(d0.text) - COALESCE(k.nk, 0) AS BIGINT) AS n_removed
FROM docs0 d0 LEFT JOIN (
  SELECT doc_id, string_agg(c, '' ORDER BY j) AS clean_text,
         COUNT(*) AS nk
  FROM kept GROUP BY 1) k USING (doc_id)
"""


def _copurchase_edges(sf_dir: str):
    """Co-purchase part graph: part pairs sharing >= 2 distinct orders
    (basket-pair expansion in an order cogroup, support fold + HAVING in
    a p1 cogroup).  Shared by the triangle / clustering-coefficient /
    community queries."""

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_basket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (
            m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size().rename("n").reset_index()
        )
        return out.rename(columns={"l_partkey_x": "u", "l_partkey_y": "v"})

    pairs = grouped_map(line, "l_orderkey", per_basket)

    def fold_edges(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["u", "v"], sort=False)["n"].sum().reset_index()
        return c[c["n"] >= 2][["u", "v"]]

    return grouped_map(pairs, "u", fold_edges)


def q_copurchase_triangles(sf_dir: str):
    """Triangle count over the co-purchase graph — the graph-clustering
    primitive (full SQL oracle for ops/graph.triangle_count, whose
    kg_link_triangles entry is rows-only).  Edges = part pairs sharing
    >= 2 distinct orders (see :func:`_copurchase_edges`); triangle_count
    then does the node-iterator wedge-check MR (or its test-pinned
    in-process twin under the small-side gate)."""
    from kgray.ops.graph import triangle_count

    return triangle_count(_copurchase_edges(sf_dir))


# edge CTEs shared by every co-purchase-graph oracle
_COPURCHASE_EDGE_SQL = """d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
edges AS (SELECT u, v FROM p GROUP BY u, v HAVING COUNT(*) >= 2)"""


SQL_COPURCHASE_TRIANGLES = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
edges AS (SELECT u, v FROM p GROUP BY u, v HAVING COUNT(*) >= 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
"""


def q_orders_benford(sf_dir: str):
    """Benford first-significant-digit audit over order totals — the
    fraud/data-quality screen.  Digit extraction is pure Arrow
    (cents -> int64 -> utf8 slice; no float log10, whose libm rounding
    near exact powers of ten is not pinned), folded by the combiner."""

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def digit(batch: pa.Table) -> pa.Table:
        x = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = round_half_up(x * 100.0, 0).astype(np.int64)
        s = pc.cast(pa.array(cents), pa.string())
        return pa.table({"digit": pc.utf8_slice_codeunits(s, 0, 1)})

    return pre_aggregate(
        orders.map_batches(digit, batch_format="pyarrow"),
        ["digit"], {"n": (None, "count")},
    )


SQL_ORDERS_BENFORD = """
SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1
"""


def q_events_user_mode(sf_dir: str):
    """MODE per user with a pinned tie-break (most-frequent event type;
    ties -> lexicographically smallest) — DuckDB's mode() tie order is
    unspecified, so the oracle spells out the same ROW_NUMBER.  The
    combiner shrinks the shuffle to one row per (batch, user, type);
    the argmax is a vectorized head(1) per user in a user-keyed
    cogroup."""

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = pre_aggregate(ev, ["user_id", "event_type"],
                           {"n": (None, "count")})

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "n", "event_type"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = df.groupby("user_id", sort=False).head(1)
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy(np.int64),
                "mode_type": top["event_type"].to_numpy(),
                "n": top["n"].to_numpy(np.int64),
            }
        )

    return grouped_map(counts, "user_id", argmax)


SQL_EVENTS_USER_MODE = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1
"""


def q_word_window_pairs(sf_dir: str):
    """Skip-gram co-occurrence counts (word2vec-style window, distance
    1-2) — token pairs are emitted by numpy shift-align over the
    flattened token stream (the bigram-fold trick, one lane per
    distance), and partials fold in the combiner groupby.  No per-row
    loops; pair volume is 2x token count."""

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = batch["text"].to_pandas().str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate(toks.to_numpy()) if len(toks) else np.array(
            [], dtype=object)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        w1, w2, dist = [], [], []
        for d in (1, 2):
            if len(flat) <= d:
                continue
            same = doc_idx[d:] == doc_idx[:-d]
            w1.append(flat[:-d][same])
            w2.append(flat[d:][same])
            dist.append(np.full(int(same.sum()), d, np.int64))
        if not w1:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "dist": pa.array([], pa.int64())})
        return pa.table({"w1": pa.array(np.concatenate(w1)),
                         "w2": pa.array(np.concatenate(w2)),
                         "dist": pa.array(np.concatenate(dist))})

    return pre_aggregate(
        docs.map_batches(pairs, batch_format="pyarrow"),
        ["w1", "w2", "dist"], {"n": (None, "count")},
    )


SQL_WORD_WINDOW_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents)
SELECT t1.tok AS w1, t2.tok AS w2,
       CAST(t2.pos - t1.pos AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n
FROM toks t1 JOIN toks t2
  ON t1.doc_id = t2.doc_id AND t2.pos - t1.pos BETWEEN 1 AND 2
GROUP BY 1, 2, 3
"""


def q_events_runs(sf_dir: str):
    """Run-length encoding of per-user event-type streams (the
    gaps-and-islands rn - rt trick, vectorized): one user-keyed
    cogroup; run boundaries are a shift-compare, run ids a cumsum, and
    the per-run fold a groupby over the run id.  run_start is the
    1-based position of the run within the user's stream."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        rn = df.groupby("user_id", sort=False).cumcount().to_numpy() + 1
        new_run = np.ones(len(df), bool)
        if len(df) > 1:
            new_run[1:] = (us[1:] != us[:-1]) | (et[1:] != et[:-1])
        run_id = np.cumsum(new_run)
        g = pd.DataFrame({"user_id": us, "event_type": et, "rn": rn,
                          "run_id": run_id}).groupby("run_id", sort=False)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].first().to_numpy(np.int64),
                "event_type": g["event_type"].first().to_numpy(),
                "run_len": g.size().to_numpy(np.int64),
                "run_start": g["rn"].min().to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_RUNS = """
WITH s AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rt
  FROM events)
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS run_len,
       CAST(MIN(rn) AS BIGINT) AS run_start
FROM s GROUP BY user_id, event_type, rn - rt
"""


def q_doc_rrf(sf_dir: str):
    """Reciprocal-rank fusion of two document rankings (by n_chars and
    by token count) — the IR result-merging primitive.  Each global
    row_number decomposes exactly as in the NTILE query: a
    distinct-value histogram base (combiner fold, metadata-scale,
    broadcast by closure) plus an in-value doc_id tie rank from one
    value-keyed cogroup; the two rank streams meet in a doc_id bucket
    join, the fused score 1/(60+ra) + 1/(60+rb) is the identical
    two-term double sum on both engines (rounding is belt), and only
    the top-100 take the global sort."""

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def metrics(batch: pa.Table) -> pa.Table:
        ntok = pc.add(
            pc.count_substring(batch["text"], " "), 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "n_tokens": pc.cast(ntok, pa.int64()),
            }
        )

    m = docs.map_batches(metrics, batch_format="pyarrow").materialize()

    def rank_stream(col: str, out: str):
        hist = (
            pre_aggregate(m.select_columns(["doc_id", col]), [col],
                          {"c": (None, "count")})
            .to_pandas().sort_values(col, ascending=False)
        )
        base = dict(
            zip(
                hist[col].to_numpy(),
                np.concatenate([[0],
                                np.cumsum(hist["c"].to_numpy())[:-1]]),
            )
        )

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values([col, "doc_id"], kind="mergesort")
            tie = df.groupby(col, sort=False).cumcount().to_numpy()
            r = df[col].map(base).to_numpy(np.int64) + tie + 1
            return pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(np.int64), out: r}
            )

        return grouped_map(m.select_columns(["doc_id", col]), col,
                           per_bucket)

    ra = rank_stream("n_chars", "r_chars")
    rb = rank_stream("n_tokens", "r_tokens")
    joined = bucket_join(ra, rb, on="doc_id", how="inner")

    def fuse(batch: pa.Table) -> pa.Table:
        a = batch["r_chars"].to_numpy(zero_copy_only=False)
        b = batch["r_tokens"].to_numpy(zero_copy_only=False)
        rrf = 1.0 / (60.0 + a) + 1.0 / (60.0 + b)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "r_chars": pa.array(a, pa.int64()),
                "r_tokens": pa.array(b, pa.int64()),
                "rrf": pa.array(round_half_up(rrf, 6), pa.float64()),
            }
        )

    scored = joined.map_batches(fuse, batch_format="pyarrow")
    return scored.sort(["rrf", "doc_id"], descending=[True, False]).limit(100)


SQL_DOC_RRF = """
WITH m AS (SELECT doc_id, n_chars,
                  len(string_split(text, ' ')) AS n_tokens
           FROM documents),
ra AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
              AS r_chars FROM m),
rb AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)
              AS r_tokens FROM m)
SELECT ra.doc_id, CAST(ra.r_chars AS BIGINT) AS r_chars,
       CAST(rb.r_tokens AS BIGINT) AS r_tokens,
       ROUND(1.0 / (60 + ra.r_chars) + 1.0 / (60 + rb.r_tokens), 6) AS rrf
FROM ra JOIN rb USING (doc_id)
ORDER BY rrf DESC, doc_id LIMIT 100
"""


def _part_supplier_edges(sf_dir: str):
    """Bipartite supplier-part edge list from lineitem (distinct pairs;
    part ids offset into a disjoint id space).  Shared by the PageRank
    and BFS graph queries.  Distinct-pair extraction is the Q18/
    basket_pairs shape — (u, v) keys are near-unique, so
    groupby.aggregate's combiner can't compress and its sort shuffle
    pays full freight (measured 14 s at sf0.1); instead dedup per batch
    with an Arrow group_by (6M -> ~600k rows BEFORE any shuffle) and
    finish in ONE u-keyed cogroup (measured ~2 s)."""

    line = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def proj(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": pc.cast(batch["l_suppkey"], pa.int64()),
                "v": pc.cast(pc.add(batch["l_partkey"], 10_000_000),
                             pa.int64()),
            }
        )
        return t.group_by(["u", "v"]).aggregate([])

    # materialize between the two stages: the consumers (pagerank_int /
    # bfs_hops) materialize the edge list immediately anyway, and the
    # lazily-fused read->dedup->shuffle plan re-executes the map side
    # inside the sort shuffle (measured 7.3 s fused vs 3.0 s staged at
    # sf0.1 / 32 cpus)
    pairs = line.map_batches(proj, batch_format="pyarrow").materialize()
    return grouped_map(
        pairs, "u", lambda df: df.drop_duplicates(["u", "v"])
    )


_GRAPH_EDGE_SQL = """e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
           CAST(l_partkey + 10000000 AS BIGINT) AS v FROM lineitem),
sym AS (SELECT u AS src, v AS dst FROM e
        UNION ALL SELECT v AS src, u AS dst FROM e),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM sym GROUP BY 1)"""


def q_part_supplier_pagerank(sf_dir: str):
    """Fixed-point integer PageRank (4 iterations, scale 10^12) over the
    supplier-part bipartite graph — the oracle-checkable face of the
    PageRank family (float kg_pagerank is rows-only because per-node
    contribution sums are summation-order-sensitive across engines;
    int64 floor-division arithmetic is bit-exact in any order, so the
    DuckDB oracle unrolls the identical recurrence and value-hash
    matches).  See ops/graph.pagerank_int for the round shape."""
    from kgray.ops.graph import pagerank_int

    return pagerank_int(_part_supplier_edges(sf_dir), iters=4)


def _pagerank_sql(iters: int = 4, scale: int = 10**12) -> str:
    prev = "r0"
    ctes = [
        f"r0 AS (SELECT node, CAST({scale} // n.n AS BIGINT) AS r\n"
        "       FROM deg CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n"
        " FROM deg) n)"
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"r{i} AS (SELECT d.node, CAST((15 * {scale}) // (100 * m.n)\n"
            "         + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)"
            " AS r\n"
            "       FROM deg d\n"
            "       CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n"
            " FROM deg) m\n"
            "       LEFT JOIN (SELECT s.dst AS node,"
            " SUM(r.r // sd.degree) AS contrib\n"
            f"                  FROM sym s JOIN {prev} r ON s.src = r.node\n"
            "                  JOIN deg sd ON s.src = sd.node\n"
            "                  GROUP BY 1) c ON d.node = c.node)"
        )
        prev = f"r{i}"
    return (
        "WITH " + _GRAPH_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + f"\nSELECT node, r FROM {prev}"
    )


SQL_PART_SUPPLIER_PAGERANK = _pagerank_sql(iters=4)


def q_graph_bfs_hops(sf_dir: str):
    """Bounded-depth BFS distances from supplier node 1 over the same
    bipartite graph (k-hop neighborhood / transitive-closure
    primitive).  Exact integer min-relaxation semantics; the Ray path
    is frontier BFS (per-round shuffle shrinks with the frontier), the
    oracle unrolls the full min-relax — equal by the BFS level
    invariant."""
    from kgray.ops.graph import bfs_hops

    return bfs_hops(_part_supplier_edges(sf_dir), seeds=[1], max_hops=3)


def _bfs_sql(max_hops: int = 3) -> str:
    prev = "d0"
    ctes = [
        "d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist\n"
        "       FROM sym WHERE src IN (1))"
    ]
    for i in range(1, max_hops + 1):
        ctes.append(
            f"d{i} AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist"
            " FROM (\n"
            f"         SELECT node, dist FROM {prev}\n"
            "         UNION ALL\n"
            "         SELECT s.dst AS node, d.dist + 1 AS dist\n"
            f"         FROM sym s JOIN {prev} d ON s.src = d.node\n"
            "       ) GROUP BY 1)"
        )
        prev = f"d{i}"
    return (
        "WITH " + _GRAPH_EDGE_SQL + ",\n" + ",\n".join(ctes)
        + f"\nSELECT node, dist FROM {prev}"
    )


SQL_GRAPH_BFS_HOPS = _bfs_sql(max_hops=3)


def q_events_kl_daily(sf_dir: str):
    """Per-day KL divergence of the event-type distribution against the
    corpus-wide distribution — the drift-monitoring primitive.  The
    shuffle moves (day, type) count partials only; the divergence is
    computed on the folded metadata-scale table with ``math.log``
    memoized over distinct (n_dt, n_d, n_t, n) tuples (libm parity, the
    doc_entropy pattern)."""


    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def day_type(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
                "event_type": batch["event_type"],
            }
        )

    c = (
        pre_aggregate(
            ev.map_batches(day_type, batch_format="pyarrow"),
            ["day", "event_type"], {"n": (None, "count")},
        )
        .to_pandas()
    )
    nd = c.groupby("day")["n"].transform("sum").to_numpy(np.int64)
    ct = c.groupby("event_type")["n"].transform("sum").to_numpy(np.int64)
    n = int(c["n"].sum())
    cn = c["n"].to_numpy(np.int64)
    memo: dict[tuple[int, int, int], float] = {}
    terms = np.empty(len(c), np.float64)
    for i, (a, b, t) in enumerate(zip(cn.tolist(), nd.tolist(),
                                      ct.tolist())):
        key = (a, b, t)
        v = memo.get(key)
        if v is None:
            p = a / b
            q = t / n
            v = p * math.log(p / q)
            memo[key] = v
        terms[i] = v
    kl = (
        pd.DataFrame({"day": c["day"], "term": terms})
        .groupby("day", sort=True)["term"].sum().reset_index(name="kl")
    )
    return pa.table(
        {
            "day": pa.array(kl["day"]),
            "kl": pa.array(round_half_up(kl["kl"].to_numpy(np.float64), 4),
                           pa.float64()),
        }
    )


SQL_EVENTS_KL_DAILY = """
WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
nd AS (SELECT day, CAST(SUM(n) AS BIGINT) AS nd FROM c GROUP BY 1),
g AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS ct FROM c GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
SELECT c.day,
       ROUND(SUM((CAST(c.n AS DOUBLE) / CAST(nd.nd AS DOUBLE))
                 * ln((CAST(c.n AS DOUBLE) / CAST(nd.nd AS DOUBLE))
                      / (CAST(g.ct AS DOUBLE) / CAST(t.n AS DOUBLE)))), 4)
         AS kl
FROM c JOIN nd ON c.day = nd.day
JOIN g ON c.event_type = g.event_type
CROSS JOIN t
GROUP BY c.day
"""


def q_events_welch_t(sf_dir: str):
    """Welch's t-statistic of events.value per type vs the rest of the
    corpus (the A/B drift screen).  Both engines derive variance from
    the SAME raw-moment formula ((Σx² - (Σx)²/n)/(n-1)) so the only
    divergence is ulp-level float-sum order, absorbed by ROUND 4 (the
    events_value_corr precedent); the rest-group stats are total-minus-
    group arithmetic on the folded 5-row table, never a second scan."""

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "v": batch["value"],
                "vv": pa.array(v * v, pa.float64()),
            }
        )

    s = (
        pre_aggregate(
            ev.map_batches(moments, batch_format="pyarrow"),
            ["event_type"],
            {"n": (None, "count"), "s": ("v", "sum"), "ss": ("vv", "sum")},
        )
        .to_pandas()
    )
    tn, ts_, tss = int(s["n"].sum()), float(s["s"].sum()), float(
        s["ss"].sum())
    n1 = s["n"].to_numpy(np.float64)
    s1 = s["s"].to_numpy(np.float64)
    ss1 = s["ss"].to_numpy(np.float64)
    n2, s2, ss2 = tn - n1, ts_ - s1, tss - ss1
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    t = (s1 / n1 - s2 / n2) / np.sqrt(v1 / n1 + v2 / n2)
    return pa.table(
        {
            "event_type": pa.array(s["event_type"]),
            "t": pa.array(round_half_up(t, 4), pa.float64()),
        }
    )


SQL_EVENTS_WELCH_T = """
WITH s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                  SUM(value) AS s, SUM(value * value) AS ss
           FROM events GROUP BY 1),
tot AS (SELECT SUM(n) AS tn, SUM(s) AS ts_, SUM(ss) AS tss FROM s)
SELECT event_type,
       ROUND((s.s / s.n - (tot.ts_ - s.s) / (tot.tn - s.n))
             / sqrt(((s.ss - s.s * s.s / s.n) / (s.n - 1)) / s.n
                    + (((tot.tss - s.ss)
                        - (tot.ts_ - s.s) * (tot.ts_ - s.s)
                          / (tot.tn - s.n))
                       / (tot.tn - s.n - 1)) / (tot.tn - s.n)), 4) AS t
FROM s CROSS JOIN tot
"""


def q_user_scd2(sf_dir: str):
    """Type-2 slowly-changing-dimension history from the event stream:
    each per-user run of a repeated event_type becomes one version row
    with [valid_from, valid_to) bounds (valid_to = next version's start,
    open versions pinned to TIMESTAMP 9999-12-31) and a version number.
    ONE user cogroup: islands via the events_runs shift-compare, bounds
    via a shifted gather — all exact integer-microsecond timestamps."""

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    sentinel = np.datetime64("9999-12-31T00:00:00", "us")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        ts = df["ts"].to_numpy()
        new_run = np.ones(len(df), bool)
        if len(df) > 1:
            new_run[1:] = (us[1:] != us[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new_run)
        r_user = us[starts]
        valid_from = ts[starts]
        valid_to = np.empty(len(starts), ts.dtype)
        if len(starts) > 1:
            nxt = valid_from[1:]
            same_user = r_user[1:] == r_user[:-1]
            valid_to[:-1] = np.where(same_user, nxt, sentinel)
        if len(starts):
            valid_to[-1] = sentinel
        version = np.arange(len(starts), dtype=np.int64) + 1
        if len(starts):
            first_of_user = np.ones(len(starts), bool)
            first_of_user[1:] = r_user[1:] != r_user[:-1]
            version = version - np.maximum.accumulate(
                np.where(first_of_user, version - 1, 0)
            )
        return pd.DataFrame(
            {
                "user_id": r_user,
                "event_type": et[starts],
                "valid_from": valid_from,
                "valid_to": valid_to,
                "version": version,
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_USER_SCD2 = """
WITH s AS (SELECT user_id, event_type, ts,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rt
           FROM events),
runs AS (SELECT user_id, event_type, MIN(ts) AS valid_from
         FROM s GROUP BY user_id, event_type, rn - rt)
SELECT user_id, event_type, valid_from,
       COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY valid_from),
                TIMESTAMP '9999-12-31') AS valid_to,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY valid_from) AS BIGINT) AS version
FROM runs
"""


def q_doc_dense_rank(sf_dir: str):
    """Global DENSE_RANK of documents by length — the distinct-value
    half of the NTILE/row_number decomposition on its own: the rank of
    a row is the rank of its VALUE, so the combiner folds a distinct-
    value histogram (metadata-scale), the driver sorts it once, and the
    per-row attach is a broadcast dict lookup inside map_batches — no
    row-scale shuffle at all (vs row_number's extra tie-rank cogroup)."""

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    hist = (
        pre_aggregate(docs.select_columns(["n_chars"]), ["n_chars"],
                      {"c": (None, "count")})
        .to_pandas().sort_values("n_chars", ascending=False)
    )
    rank = dict(
        zip(hist["n_chars"].to_numpy().tolist(),
            range(1, len(hist) + 1))
    )

    def attach(batch: pa.Table) -> pa.Table:
        vals = batch["n_chars"].to_numpy()
        dr = np.fromiter((rank[v] for v in vals.tolist()), np.int64,
                         len(vals))
        return pa.table({"doc_id": batch["doc_id"], "dr": pa.array(dr)})

    return docs.map_batches(attach, batch_format="pyarrow")


SQL_DOC_DENSE_RANK = """
SELECT doc_id,
       CAST(DENSE_RANK() OVER (ORDER BY n_chars DESC) AS BIGINT) AS dr
FROM documents
"""


def q_brand_weighted_median(sf_dir: str):
    """Per-brand weighted (lower) median of line price, weighted by
    quantity — the robust-center primitive the plain median family
    can't express.  All arithmetic is exact: prices collapse to int64
    cents, quantities are integral, and the median is the smallest
    value whose doubled inclusive cumulative weight reaches the total
    (no interpolation), so both engines agree bit-for-bit.  Shape: a
    broadcast part->brand attach, a per-batch (brand, value) Arrow
    partial (near-unique values barely compress — acceptable, the rows
    are 3 int64s), then ONE brand cogroup whose per-brand work is a
    vectorized sort + cumsum.  NB brand cardinality (25) caps the
    cogroup's parallelism — for a high-cardinality value domain under a
    tiny group count, the Gini-style range partition would spread
    better."""

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_quantity"])
    joined = broadcast_join(line, part, on="l_partkey",
                            right_on="p_partkey", how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0, 0
        ).astype(np.int64)
        t = pa.table(
            {
                "p_brand": batch["p_brand"],
                "v": pa.array(cents),
                "w": pc.cast(batch["l_quantity"], pa.int64()),
            }
        )
        return t.group_by(["p_brand", "v"]).aggregate([("w", "sum")]) \
            .rename_columns(["p_brand", "v", "w"])

    partials = joined.map_batches(partial, batch_format="pyarrow")

    def per_brand(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["p_brand", "v"], sort=False)["w"].sum().reset_index()
        c = c.sort_values(["p_brand", "v"], kind="mergesort")
        cw = c.groupby("p_brand", sort=False)["w"].cumsum().to_numpy()
        tw = c.groupby("p_brand", sort=False)["w"].transform(
            "sum").to_numpy()
        hit = c[2 * cw >= tw]
        first = hit.groupby("p_brand", sort=False).head(1)
        return pd.DataFrame(
            {
                "p_brand": first["p_brand"].to_numpy(),
                "wmedian_cents": first["v"].to_numpy(np.int64),
            }
        )

    return grouped_map(partials, "p_brand", per_brand)


SQL_BRAND_WEIGHTED_MEDIAN = """
WITH j AS (SELECT p.p_brand,
                  CAST(round(l.l_extendedprice * 100) AS BIGINT) AS v,
                  CAST(l.l_quantity AS BIGINT) AS w
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
c AS (SELECT p_brand, v, SUM(w) AS w FROM j GROUP BY 1, 2),
a AS (SELECT p_brand, v,
             SUM(w) OVER (PARTITION BY p_brand ORDER BY v) AS cw,
             SUM(w) OVER (PARTITION BY p_brand) AS tw
      FROM c)
SELECT p_brand, CAST(MIN(v) AS BIGINT) AS wmedian_cents
FROM a WHERE 2 * cw >= tw GROUP BY 1
"""


def q_users_click_and_purchase(sf_dir: str):
    """INTERSECT set semantics (users present in BOTH event cohorts):
    pushed-down type filter, per-batch distinct (user, type) Arrow
    partial, ONE user cogroup keeping users whose distinct-type count
    is 2.  The EXCEPT twin is bigram_diff; together they pin the SQL
    set-operator family."""

    ev = _read(sf_dir, "events", ["user_id", "event_type"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'"
    )

    def distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([])

    pairs = ev.map_batches(distinct, batch_format="pyarrow")

    def both(df: pd.DataFrame) -> pd.DataFrame:
        nt = df.drop_duplicates(["user_id", "event_type"]) \
            .groupby("user_id", sort=False).size()
        keep = nt[nt == 2].index.to_numpy(np.int64)
        return pd.DataFrame({"user_id": keep})

    return grouped_map(pairs, "user_id", both)


SQL_USERS_CLICK_AND_PURCHASE = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_revenue_gini(sf_dir: str):
    """Gini coefficient of customer revenue concentration — exact, via
    the distributed sorted-rank decomposition (the pack/stream_offsets
    range-partition pattern, NOT a driver sort): revenues collapse to
    int64 cents per customer (combiner groupby), value-range partials
    give each range its global rank offset (a metadata-scale driver
    fold over num_buckets rows), and each range bucket sorts
    (rev, custkey) locally to assign exact global ranks and fold
    Σ rank·x / Σ x / n partials.  All sums integral (python-int driver
    fold, immune to int64 overflow at scale); the single-row final
    expression is written identically in both engines.  Scale twin of
    q_user_activity_gini, whose driver-side float fold is the right
    call at key-scale cardinality — this one never materializes the
    per-key table anywhere."""
    from kgray.util import (default_num_buckets, grouped_map,
                            round_half_up)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0,
            0,
        ).astype(np.int64)
        return pa.table({"o_custkey": batch["o_custkey"],
                         "x": pa.array(c)})

    rev = pre_aggregate(
        orders.map_batches(cents, batch_format="pyarrow"),
        ["o_custkey"], {"x": ("x", "sum")},
    ).materialize()


    bounds = rev.aggregate(Min("x"), Max("x"))
    lo, hi = int(bounds["min(x)"]), int(bounds["max(x)"])
    n_ranges = default_num_buckets()
    width = max((hi - lo) // n_ranges + 1, 1)

    def range_counts(batch: pa.Table) -> pa.Table:
        rng = np.minimum(
            (batch["x"].to_numpy() - lo) // width, n_ranges - 1
        ).astype(np.int64)
        cnt = np.bincount(rng, minlength=n_ranges)
        nz = np.nonzero(cnt)[0]
        return pa.table({"rng": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz].astype(np.int64))})

    hist = (
        pre_aggregate(
            rev.map_batches(range_counts, batch_format="pyarrow"),
            ["rng"], {"c": ("c", "sum")},
        )
        .to_pandas().sort_values("rng")
    )
    offsets = np.zeros(n_ranges, np.int64)
    idx = hist["rng"].to_numpy(np.int64)
    counts = hist["c"].to_numpy(np.int64)
    csum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offsets[idx] = csum

    def tag(batch: pa.Table) -> pa.Table:
        rng = np.minimum(
            (batch["x"].to_numpy() - lo) // width, n_ranges - 1
        ).astype(np.int64)
        return batch.append_column("rng", pa.array(rng))

    tagged = rev.map_batches(tag, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r, grp in df.groupby("rng", sort=False):
            g = grp.sort_values(["x", "o_custkey"], kind="mergesort")
            x = g["x"].to_numpy(np.int64)
            rank = offsets[int(r)] + np.arange(1, len(g) + 1,
                                               dtype=np.int64)
            # python ints: Σ rank·x can exceed int64 at scale
            s1 = sum(int(a) * int(b) for a, b in
                     zip(rank.tolist(), x.tolist()))
            out.append((str(s1), int(x.sum()), len(g)))
        return pd.DataFrame(out, columns=["s1", "sx", "n"])

    parts = grouped_map(tagged, "rng", fold).to_pandas()
    s1 = sum(int(v) for v in parts["s1"])
    sx = int(parts["sx"].sum())
    n = int(parts["n"].sum())
    gini = 2.0 * s1 / (n * sx) - (n + 1.0) / n
    return pa.table({"gini": pa.array([round_half_up(
        np.array([gini]), 6)[0]], pa.float64())})


SQL_REVENUE_GINI = """
WITH rev AS (SELECT o_custkey,
                    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS x
             FROM orders GROUP BY 1),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM rev)
SELECT ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM r
"""


def q_top_suppliers_with_ties(sf_dir: str):
    """Per-nation top-3 suppliers by account balance WITH TIES (RANK,
    not ROW_NUMBER: equal balances share a rank and all tied rows
    survive the cut) — the tie-preserving leaderboard shape.  One
    nation cogroup; ranks via vectorized min-rank on untouched float
    values (exact-equality grouping, the argmax lesson)."""

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = _read(sf_dir, "supplier",
                 ["s_nationkey", "s_name", "s_acctbal"])
    rows = broadcast_join(
        supp, nation, on="s_nationkey", right_on="n_nationkey",
        how="inner"
    ).select_columns(["n_name", "s_name", "s_acctbal"])

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        rnk = df.groupby("n_name", sort=False)["s_acctbal"].rank(
            method="min", ascending=False
        ).astype(np.int64)
        keep = df[rnk <= 3].copy()
        keep["rnk"] = rnk[rnk <= 3]
        keep["s_acctbal"] = round_half_up(
            keep["s_acctbal"].to_numpy(np.float64), 2
        )
        return keep[["n_name", "s_name", "s_acctbal", "rnk"]]

    return grouped_map(rows, "n_name", per_nation)


SQL_TOP_SUPPLIERS_WITH_TIES = """
WITH r AS (SELECT n.n_name, s.s_name, s.s_acctbal,
                  RANK() OVER (PARTITION BY n.n_name
                               ORDER BY s.s_acctbal DESC) AS rnk
           FROM supplier s JOIN nation n
             ON s.s_nationkey = n.n_nationkey)
SELECT n_name, s_name, ROUND(s_acctbal, 2) AS s_acctbal,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
"""


def q_events_value_deciles(sf_dir: str):
    """EXACT global deciles of events.value at scale — distributed
    order-statistic selection, no driver sort: a value-range histogram
    (combiner fold, metadata-scale) gives every range its global rank
    offset, target ranks r_q = ceil(q·n/10) land in known ranges, and
    only those ranges sort locally (value, event_id tie-break) to
    recover the exact element.  Selected values are returned UNTOUCHED
    (float equality is exact on untouched values — the argmax lesson);
    the oracle pins the same ranks with ROW_NUMBER, not quantile_disc,
    so the semantics are spelled out, not inherited."""
    from kgray.util import default_num_buckets, grouped_map

    ev = _read(sf_dir, "events", ["event_id", "value"]).materialize()
    n = ev.count()
    # rank -> [deciles]: on tiny inputs (n < 10) two deciles share
    # ceil(q*n/10); a plain rank->decile dict would collapse them and
    # emit fewer rows than the oracle's one-row-per-decile join
    targets: dict[int, list[int]] = {}
    for q in range(1, 10):
        targets.setdefault(((q * n) + 9) // 10, []).append(q)


    bounds = ev.aggregate(Min("value"), Max("value"))
    lo, hi = float(bounds["min(value)"]), float(bounds["max(value)"])
    n_ranges = default_num_buckets()
    width = (hi - lo) / n_ranges or 1.0

    def rng_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / width).astype(np.int64), 0,
                       n_ranges - 1)

    def range_counts(batch: pa.Table) -> pa.Table:
        r = rng_of(batch["value"].to_numpy(zero_copy_only=False))
        cnt = np.bincount(r, minlength=n_ranges)
        nz = np.nonzero(cnt)[0]
        return pa.table({"rng": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz].astype(np.int64))})

    hist = (
        pre_aggregate(
            ev.map_batches(range_counts, batch_format="pyarrow"),
            ["rng"], {"c": ("c", "sum")},
        )
        .to_pandas().sort_values("rng")
    )
    offsets = np.zeros(n_ranges, np.int64)
    idx = hist["rng"].to_numpy(np.int64)
    csum = np.concatenate([[0],
                           np.cumsum(hist["c"].to_numpy(np.int64))[:-1]])
    offsets[idx] = csum
    ends = np.zeros(n_ranges, np.int64)
    ends[idx] = csum + hist["c"].to_numpy(np.int64)
    # ranges that contain a target rank — only these pay the local sort
    hot = set(
        int(r) for r in idx
        if any(offsets[r] < t <= ends[r] for t in targets)
    )

    def tag(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        r = rng_of(v)
        keep = np.isin(r, np.fromiter(hot, np.int64, len(hot)))
        return pa.table(
            {
                "rng": pa.array(r[keep]),
                "value": pa.array(v[keep], pa.float64()),
                "event_id": batch["event_id"].filter(
                    pa.array(keep)
                ),
            }
        )

    tagged = ev.map_batches(tag, batch_format="pyarrow")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r, grp in df.groupby("rng", sort=False):
            g = grp.sort_values(["value", "event_id"], kind="mergesort")
            base = offsets[int(r)]
            for pos in range(len(g)):
                t = base + pos + 1
                for q in targets.get(t, ()):
                    out.append((q, g["value"].iloc[pos]))
        return pd.DataFrame(out, columns=["decile", "value"])

    res = grouped_map(tagged, "rng", pick).to_pandas()
    res = res.sort_values("decile").reset_index(drop=True)
    return pa.table(
        {
            "decile": pa.array(res["decile"].to_numpy(np.int64)),
            "value": pa.array(res["value"].to_numpy(np.float64),
                              pa.float64()),
        }
    )


SQL_EVENTS_VALUE_DECILES = """
WITH r AS (SELECT value,
                  ROW_NUMBER() OVER (ORDER BY value, event_id) AS i
           FROM events),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
t AS (SELECT q.q AS decile, ((q.q * n.n) + 9) // 10 AS target
      FROM (SELECT UNNEST(range(1, 10)) AS q) q CROSS JOIN n)
SELECT t.decile, r.value
FROM t JOIN r ON r.i = t.target
"""
