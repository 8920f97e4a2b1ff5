"""Driver-contract query catalog: Ray Data implementation + DuckDB oracle
SQL side by side for every operator exercised on the shared testdata
tables (TESTDATA.md).  Names of computed columns MATCH between the two
(the driver hashes values after sorting columns by name).

Float columns are rounded (ROUND n digits) on BOTH sides so value-hash
comparison is stable across summation orders.

Each Ray callable takes ``sf_dir`` and returns a Dataset / pyarrow Table;
these are wired into ``__ray_entry__.queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_col(ds, col: str, digits: int):
    """Round half-away-from-zero (SQL ROUND semantics).  Uses the numpy
    floor(x*s+0.5)/s formulation, NOT pc.round: Arrow's scale/divide
    round-trip can leave a one-ulp-off sum unchanged (e.g. 741376803.3100001
    stays put) while DuckDB lands on the nearest double of the decimal —
    the driver value-hash then mismatches on bit pattern."""
    from kgray.util import round_half_up

    def apply(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index(col)
        vals = batch[col].to_numpy(zero_copy_only=False)
        return batch.set_column(
            i, col, pa.array(round_half_up(vals, digits), pa.float64())
        )

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# documents analytics (reference G1-G4/G8/M16-M17 analogues, SURVEY.md §2.5)
# ---------------------------------------------------------------------------

def q_lang_counts(sf_dir: str):
    """G8-style distinct-count: docs per lang."""
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "documents", ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


SQL_LANG_COUNTS = "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"


def q_max_doc_length(sf_dir: str):
    """G2 global max (max_length.py:4-11 analogue)."""
    ds = _read(sf_dir, "documents", ["n_chars"])
    return pa.table({"max_chars": pa.array([ds.max("n_chars")], pa.int64())})


SQL_MAX_DOC_LENGTH = "SELECT MAX(n_chars) AS max_chars FROM documents"


def q_doclen_hist(sf_dir: str):
    """G1-style histogram: doc count per 50-char length bucket."""
    from ray.data.aggregate import Count

    def bucket(batch: pa.Table) -> pa.Table:
        b = pc.multiply(
            pc.cast(pc.divide(batch["n_chars"], 50), pa.int64()), 50
        )
        return pa.table({"bucket": b})

    return (
        _read(sf_dir, "documents", ["n_chars"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"))
    )


SQL_DOCLEN_HIST = (
    "SELECT (n_chars // 50) * 50 AS bucket, COUNT(*) AS n "
    "FROM documents GROUP BY bucket"
)


def q_token_stats(sf_dir: str):
    """Token counting rolled up per lang."""
    from ray.data.aggregate import Count, Sum

    from kgray.ops.text import add_token_count

    return (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(add_token_count, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_tokens", alias_name="total_tokens"),
                   Count(alias_name="n_docs"))
    )


SQL_TOKEN_STATS = (
    "SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens, "
    "COUNT(*) AS n_docs FROM documents GROUP BY lang"
)


def q_contains_filter(sf_dir: str):
    """M17-style substring filter: docs mentioning 'spark'."""
    def f(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch["text"], "spark")
        t = batch.filter(mask)
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"]})

    return _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


SQL_CONTAINS_FILTER = (
    "SELECT doc_id, n_chars FROM documents WHERE contains(text, 'spark')"
)


def q_avg_token_len(sf_dir: str):
    """Per-doc quality proxy: chars per token."""
    from kgray.ops.text import add_avg_token_len

    def f(batch: pa.Table) -> pa.Table:
        t = add_avg_token_len(batch)
        return pa.table({"doc_id": t["doc_id"], "avg_tok_len": t["avg_tok_len"]})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


SQL_AVG_TOKEN_LEN = (
    "SELECT doc_id, ROUND(CAST(length(text) AS DOUBLE) / "
    "len(string_split(text, ' ')), 4) AS avg_tok_len FROM documents"
)


def q_stopword_ratio(sf_dir: str):
    from kgray.ops.text import add_stopword_ratio

    def f(batch: pa.Table) -> pa.Table:
        t = add_stopword_ratio(batch)
        return pa.table({"doc_id": t["doc_id"], "stop_ratio": t["stop_ratio"]})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


SQL_STOPWORD_RATIO = (
    "SELECT doc_id, ROUND(CAST(len(list_filter(string_split(text, ' '), "
    "w -> w IN ('the','a','and','of','to','in'))) AS DOUBLE) / "
    "len(string_split(text, ' ')), 4) AS stop_ratio FROM documents"
)


def q_langid(sf_dir: str):
    """Marker-based language-ID heuristic; oracle mirrors the same rule."""
    from kgray.ops.text import add_langid

    def f(batch: pa.Table) -> pa.Table:
        t = add_langid(batch)
        return pa.table({"doc_id": t["doc_id"], "lang_pred": t["lang_pred"]})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


SQL_LANGID = """
WITH s AS (
  SELECT doc_id,
    CAST(contains(text, 'the ') AS INT) + CAST(contains(text, ' and ') AS INT) + CAST(contains(text, ' of ') AS INT) AS s_en,
    CAST(contains(text, 'der ') AS INT) + CAST(contains(text, ' und ') AS INT) + CAST(contains(text, ' sch') AS INT) AS s_de,
    CAST(contains(text, ' le ') AS INT) + CAST(contains(text, ' de ') AS INT) + CAST(contains(text, ' est') AS INT) AS s_fr,
    CAST(contains(text, ' el ') AS INT) + CAST(contains(text, ' de ') AS INT) + CAST(contains(text, 'ción') AS INT) AS s_es,
    CAST(contains(text, '的') AS INT) + CAST(contains(text, '是') AS INT) + CAST(contains(text, '了') AS INT) AS s_zh
  FROM documents)
SELECT doc_id,
  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
       WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
       WHEN s_es >= s_zh THEN 'es'
       ELSE 'zh' END AS lang_pred
FROM s
"""


def q_fingerprint(sf_dir: str):
    """Content fingerprint; md5 so the oracle is exactly expressible."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fps = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_exact_dedup(sf_dir: str):
    """Exact dedup groups: first-wins keeper + copy count per content."""
    from kgray.ops.dedup import exact_dedup_groups

    ds = exact_dedup_groups(_read(sf_dir, "documents", ["doc_id", "text"]))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"keep_id": batch["keep_id"], "n_copies": batch["n_copies"]}
        )

    return ds.map_batches(project, batch_format="pyarrow")


SQL_EXACT_DEDUP = (
    "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies "
    "FROM documents GROUP BY text"
)


def q_ngram_dup_pairs(sf_dir: str):
    """Word-3-gram Jaccard near-dup pairs (exact, tau=0.8)."""
    from kgray.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.8
    )


SQL_NGRAM_DUP_PAIRS = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM documents
  WHERE len(string_split(text,' ')) >= 3)
SELECT a.doc_id AS u, b.doc_id AS v,
       ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
             (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 4) AS jac
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.8
"""


# ---------------------------------------------------------------------------
# embeddings: similarity search + near-dup
# ---------------------------------------------------------------------------

def _query_vec(sf_dir: str) -> list[float]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(0)
    return t["embedding"][idx].as_py()


def q_embed_knn(sf_dir: str):
    """Exact cosine top-10 around vec_id=0 (brute force baseline)."""
    from kgray.ops.similarity import knn_brute

    return knn_brute(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _query_vec(sf_dir),
        k=10,
    )


SQL_EMBED_KNN = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, ROUND(list_cosine_similarity(embedding, (SELECT qv FROM q)), 4) AS sim
FROM embeddings
ORDER BY sim DESC, vec_id LIMIT 10
"""


def q_embed_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs.  tau=0.45 so the testdata's
    planted similarity structure yields a non-empty, boundary-safe result
    (max pairwise cosine in the synthetic tables is ~0.51; nothing within
    5e-4 of the threshold)."""
    from kgray.ops.dedup import embedding_dup_pairs

    return embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.45
    )


SQL_EMBED_DUP_PAIRS = """
SELECT a.vec_id AS u, b.vec_id AS v,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def q_embed_label_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "embeddings", ["label"])
        .groupby("label")
        .aggregate(Count(alias_name="n"))
    )


SQL_EMBED_LABEL_COUNTS = "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label"


# ---------------------------------------------------------------------------
# TPC-H-ish conformance: groupby / join / sort / window
# ---------------------------------------------------------------------------

def q_tpch_q1(sf_dir: str):
    """Per-batch combiner first (pre_aggregate): the shuffle moves one row
    per (batch, flag, status) instead of one per lineitem.  The money
    sums are INTEGRAL (price -> cents, disc_price -> cents x integer
    (100 - disc%) = 1e-4-dollar units) and divide back only at the final
    pinned ROUND: float accumulation of 4-decimal products lands the
    group totals exactly on half-cent boundaries at sf0.1+ (measured:
    2697140231.625), where the two engines' summation orders disagree —
    the Q9 integral-coefficient lesson applied to Q1.  Exact-int range
    holds to ~sf100 (2^53 of 1e-4 units); beyond that both engines'
    DOUBLE casts degrade identically."""
    import datetime

    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    cutoff = datetime.datetime(1998, 9, 2)

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff)))
        cents = round_half_up(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        disc_pct = round_half_up(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "cents": pa.array(cents),
                "disc_units": pa.array(cents * (100 - disc_pct)),
            }
        )

    ds = pre_aggregate(
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"],
        ).map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "cents": ("cents", "sum"),
            "disc_units": ("disc_units", "sum"),
            "count_order": (None, "count"),
        },
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(
                    round_half_up(
                        batch["sum_qty"].to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
                "sum_base_price": pa.array(
                    round_half_up(
                        batch["cents"].to_numpy().astype(np.float64)
                        / 100.0, 2
                    ),
                    pa.float64(),
                ),
                "sum_disc_price": pa.array(
                    round_half_up(
                        batch["disc_units"].to_numpy().astype(np.float64)
                        / 10000.0, 2
                    ),
                    pa.float64(),
                ),
                "count_order": batch["count_order"],
            }
        )

    return ds.map_batches(finalize, batch_format="pyarrow")


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS sum_base_price,
       ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_mktsegment_revenue(sf_dir: str):
    """orders (fact) x customer (dim): BROADCAST the small side once via
    the object store, Arrow-join per batch — no shuffle; then combiner
    groupby."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="inner"
    )
    ds = pre_aggregate(
        joined, ["c_mktsegment"],
        {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    )
    return _round_col(ds, "revenue", 2)


SQL_MKTSEGMENT_REVENUE = """
SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_supplier_balance_by_region(sf_dir: str):
    """3-way dimension join: nation and region are tiny -> both broadcast
    (no shuffle at all before the final small groupby)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    j1 = broadcast_join(sup, nat, on="s_nationkey", right_on="n_nationkey",
                        how="inner")
    j2 = broadcast_join(j1, reg, on="n_regionkey", right_on="r_regionkey",
                        how="inner")
    ds = pre_aggregate(
        j2, ["r_name", "n_name"],
        {"n_suppliers": (None, "count"), "total_bal": ("s_acctbal", "sum")},
    )
    return _round_col(ds, "total_bal", 2)


SQL_SUPPLIER_BALANCE_BY_REGION = """
SELECT r_name, n_name, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_top_customers(sf_dir: str):
    """Global sort + limit (T-ops, SURVEY.md §2.6)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    ds = _round_col(ds, "c_acctbal", 2)
    return ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(10)


SQL_TOP_CUSTOMERS = (
    "SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal FROM customer "
    "ORDER BY c_acctbal DESC, c_custkey LIMIT 10"
)


def q_part_type_stats(sf_dir: str):
    from kgray.ops.agg import pre_aggregate

    ds = pre_aggregate(
        _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"]),
        ["p_type"],
        {
            "n": (None, "count"),
            "avg_price": ("p_retailprice", "mean"),
            "max_size": ("p_size", "max"),
        },
    )
    return _round_col(ds, "avg_price", 2)


SQL_PART_TYPE_STATS = """
SELECT p_type, COUNT(*) AS n, ROUND(AVG(p_retailprice), 2) AS avg_price,
       MAX(p_size) AS max_size
FROM part GROUP BY p_type
"""


def q_orders_monthly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        s = batch["o_orderdate"].to_pandas().dt.strftime("%Y-%m")
        return pa.table(
            {
                "month": pa.array(s, pa.string()),
                "o_totalprice": batch["o_totalprice"],
            }
        )

    from kgray.ops.agg import pre_aggregate

    ds = pre_aggregate(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(bucket, batch_format="pyarrow"),
        ["month"],
        {"n_orders": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    return _round_col(ds, "total", 2)


SQL_ORDERS_MONTHLY = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY month
"""


# ---------------------------------------------------------------------------
# events: tumbling window, top-k, session windows
# ---------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type (streaming-shaped aggregate)."""
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        # unit-safe: cast to us-resolution epoch, then floor-divide
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(us, 3_600_000_000)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour_bucket": hour,
                "value": batch["value"],
            }
        )

    from kgray.ops.agg import pre_aggregate

    ds = pre_aggregate(
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "hour_bucket"],
        {"n": (None, "count"), "total_value": ("value", "sum")},
    )
    return _round_col(ds, "total_value", 2)


SQL_EVENTS_HOURLY = """
SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY event_type, hour_bucket
"""


def q_events_user_topk(sf_dir: str):
    from kgray.ops.agg import pre_aggregate

    ds = pre_aggregate(
        _read(sf_dir, "events", ["user_id", "value"]),
        ["user_id"],
        {"total_value": ("value", "sum")},
    )
    ds = _round_col(ds, "total_value", 2)
    return ds.sort(["total_value", "user_id"], descending=[True, False]).limit(20)


SQL_EVENTS_USER_TOPK = """
SELECT user_id, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 20
"""


def q_events_sessions(sf_dir: str, gap_s: int = 1800):
    """Session windows (gap 30 min) per user — coarse-bucket cogroup on
    user hash, per-user windowing vectorized inside the bucket (one sort +
    one grouped shift per bucket, no per-user python)."""
    from kgray.util import grouped_map

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_sess = prev.isna() | ((df["ts"] - prev).dt.total_seconds() > gap_s)
        g = df.groupby("user_id", sort=False)
        out = pd.DataFrame(
            {
                "n_sessions": new_sess.groupby(df["user_id"], sort=False)
                .sum()
                .astype("int64"),
                "n_events": g.size().astype("int64"),
            }
        )
        return out.reset_index()[["user_id", "n_sessions", "n_events"]]

    return grouped_map(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        "user_id", sessions,
    )


SQL_EVENTS_SESSIONS = """
WITH g AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


def q_event_type_counts(sf_dir: str):
    from kgray.ops.agg import pre_aggregate

    ds = pre_aggregate(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type"],
        {"n": (None, "count"), "avg_value": ("value", "mean")},
    )
    return _round_col(ds, "avg_value", 2)


SQL_EVENT_TYPE_COUNTS = """
SELECT event_type, COUNT(*) AS n, ROUND(AVG(value), 2) AS avg_value
FROM events GROUP BY event_type
"""


def q_orders_1995(sf_dir: str):
    """Prune at the read: row filter pushed into read_parquet so only
    matching row groups leave storage (plus column pruning)."""
    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate

    import datetime

    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
        filter=(pds.field("o_orderdate") >= lo) & (pds.field("o_orderdate") < hi),
    )
    out = pre_aggregate(
        ds, ["o_orderstatus"],
        {"n": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    return _round_col(out, "total", 2)


SQL_ORDERS_1995 = """
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY o_orderstatus
"""


def q_events_distinct_users(sf_dir: str):
    """Distinct-count: per-batch unique combiner -> one tiny groupby ->
    count (the G8 distinct pattern on a fact column)."""
    def partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch["user_id"].combine_chunks()
                      if isinstance(batch["user_id"], pa.ChunkedArray)
                      else batch["user_id"])
        return pa.table({"user_id": u})

    ds = _read(sf_dir, "events", ["user_id"]).map_batches(
        partial, batch_format="pyarrow"
    )
    n = ds.groupby("user_id").count().count()
    return pa.table({"n_users": pa.array([n], pa.int64())})


SQL_EVENTS_DISTINCT_USERS = (
    "SELECT COUNT(DISTINCT user_id) AS n_users FROM events"
)


def q_events_top_per_user(sf_dir: str):
    """Window top-1: each user's highest-value event (row_number analogue)
    — coarse-bucket cogroup, idxmax vectorized inside the bucket."""
    from kgray.util import grouped_map, round_half_up

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "value", "event_id"],
                            ascending=[True, False, True])
        out = df.groupby("user_id", sort=False).head(1)
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "event_id": out["event_id"].to_numpy(),
                "value": round_half_up(out["value"].to_numpy(), 2),
            }
        )

    return grouped_map(
        _read(sf_dir, "events", ["user_id", "event_id", "value"]),
        "user_id", top1,
    )


SQL_EVENTS_TOP_PER_USER = """
SELECT user_id, event_id, ROUND(value, 2) AS value
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
WHERE rn = 1
"""


def q_orders_priority_revenue(sf_dir: str):
    """Big-big join (lineitem x orders) via the partitioned bucket join —
    the path for joins whose small side is too big to broadcast."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def disc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "disc_price": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = bucket_join(
        li.map_batches(disc, batch_format="pyarrow"), orders,
        on="l_orderkey", right_on="o_orderkey", how="inner", num_buckets=16,
    )
    ds = pre_aggregate(
        joined, ["o_orderpriority"],
        {"revenue": ("disc_price", "sum"), "n_items": (None, "count")},
    )
    return _round_col(ds, "revenue", 2)


SQL_ORDERS_PRIORITY_REVENUE = """
SELECT o_orderpriority, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_word_topk(sf_dir: str):
    """Top-20 words over the documents corpus: per-batch value_counts
    combiner -> groupby sum -> global sort+limit."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pd.Series(
            [w for t in batch["text"].to_pylist() for w in t.split(" ")]
        )
        vc = toks.value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.astype(str), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(20)
    )


SQL_WORD_TOPK = """
SELECT w AS word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY n DESC, word LIMIT 20
"""


def q_wordpiece_stats(sf_dir: str):
    """M3: per-doc WordPiece piece/UNK/feature-length stats.  The real
    tokenizer (basic + greedy longest-match) runs per batch; the SQL
    oracle replays the hand-derived piece arithmetic of the fixed corpus
    vocabulary (kgray/ops/wordpiece.py corpus_vocab)."""
    from kgray.ops.wordpiece import UNK, WordPieceTokenizer

    class Stats:
        def __init__(self):
            self.tok = WordPieceTokenizer()

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            n_pieces, n_unk, n_input = [], [], []
            L = self.tok.max_seq_length
            for t in texts:
                pieces = self.tok.tokenize(t)
                n_pieces.append(len(pieces))
                n_unk.append(sum(p == UNK for p in pieces))
                n_input.append(min(len(pieces) + 2, L))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_pieces": pa.array(n_pieces, pa.int64()),
                    "n_unk": pa.array(n_unk, pa.int64()),
                    "n_input": pa.array(n_input, pa.int64()),
                }
            )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Stats(), batch_format="pyarrow"
    )


SQL_WORDPIECE_STATS = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
m(word, np, nu) AS (VALUES
  ('batch',2,0),('column',2,0),('customer',2,0),('filter',2,0),('group',2,0),
  ('merge',2,0),('order',2,0),('query',2,0),('spark',2,0),('stream',2,0),
  ('table',2,0),('value',2,0),('vector',2,0),('window',2,0),
  ('dup',1,1),
  ('a',1,0),('the',1,0),('data',1,0),('row',1,0),('key',1,0),('agg',1,0),
  ('fast',1,0),('slow',1,0),('hash',1,0),('join',1,0),('line',1,0),
  ('part',1,0),('scan',1,0),('sort',1,0),('small',1,0),('big',1,0))
SELECT doc_id, CAST(SUM(np) AS BIGINT) AS n_pieces,
       CAST(SUM(nu) AS BIGINT) AS n_unk,
       CAST(LEAST(SUM(np) + 2, 128) AS BIGINT) AS n_input
FROM w JOIN m USING (word) GROUP BY doc_id
"""


def q_customers_no_orders(sf_dir: str):
    """Anti-join (NOT EXISTS): customers with no big order (> 300k), per
    segment.  Right side filters at the read, then reduces to distinct
    custkeys before broadcasting."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Count

    from kgray.ops.joins import semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_totalprice") > 300000,
    )
    lonely = semi_join(cust, big, on="c_custkey", right_on="o_custkey",
                       anti=True)
    return lonely.groupby("c_mktsegment").aggregate(Count(alias_name="n"))


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c_mktsegment
"""


def q_parts_in_lineitem(sf_dir: str):
    """Semi-join (EXISTS): parts that actually ship, counted per type."""
    from ray.data.aggregate import Count

    from kgray.ops.joins import semi_join

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    used = semi_join(part, li, on="p_partkey", right_on="l_partkey")
    return used.groupby("p_type").aggregate(Count(alias_name="n"))


SQL_PARTS_IN_LINEITEM = """
SELECT p_type, COUNT(*) AS n FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p_type
"""


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape: filtered revenue — predicate pushdown into the
    parquet read, then one global sum."""
    import pyarrow.dataset as pads

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=(pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.sum(
            pc.multiply(batch["l_extendedprice"], batch["l_discount"])
        ).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], pa.float64())})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("rev") or 0.0
    from kgray.util import round_half_up

    return pa.table(
        {"revenue": pa.array([float(round_half_up(total, 2))], pa.float64())}
    )


SQL_TPCH_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_events_daily_users(sf_dir: str):
    """Distinct users per day: per-batch (day,user) dedup combiner, then
    one day-bucketed cogroup nunique."""
    from kgray.util import grouped_map

    def days(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table(
            {
                "day": pc.strftime(batch["ts"], "%Y-%m-%d"),
                "user_id": batch["user_id"],
            }
        ).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def nunique(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("day", sort=False)["user_id"].nunique()
        return g.reset_index(name="n_users")

    return grouped_map(
        _read(sf_dir, "events", ["ts", "user_id"]).map_batches(
            days, batch_format="pyarrow"
        ),
        "day", nunique,
    )


SQL_EVENTS_DAILY_USERS = """
SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY day
"""


def q_doc_quality(sf_dir: str):
    """Composite quality score (length saturation x non-stopword mass) —
    the 'quality scoring' op as one vectorized kernel chain."""
    from kgray.ops.text import add_stopword_ratio
    from kgray.util import round_half_up

    def score(batch: pa.Table) -> pa.Table:
        t = add_stopword_ratio(batch)
        n_chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        stop = t["stop_ratio"].to_numpy(zero_copy_only=False)
        q = np.minimum(n_chars / 400.0, 1.0) * (1.0 - stop)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "quality": pa.array(round_half_up(q, 4), pa.float64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


SQL_DOC_QUALITY = """
SELECT doc_id,
       ROUND(LEAST(length(text) / 400.0, 1.0) *
             (1 - ROUND(CAST(len(list_filter(string_split(text, ' '),
                 w -> w IN ('the','a','and','of','to','in'))) AS DOUBLE) /
                 len(string_split(text, ' ')), 4)), 4) AS quality
FROM documents
"""


def q_events_asof(sf_dir: str):
    """As-of join: each click matched to the user's latest prior-or-equal
    view; per-user match count + mean gap.  Tie-insensitive output (the
    gap depends only on the matched timestamp)."""
    from ray.data.aggregate import Count

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import asof_join

    def side(event_type, time_name):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], event_type))
            return pa.table({"user_id": t["user_id"], time_name: t["ts"]})

        return f

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    clicks = ev.map_batches(side("click", "ts"), batch_format="pyarrow")
    views = ev.map_batches(side("view", "vts"), batch_format="pyarrow")
    joined = asof_join(clicks, views, key="user_id", time_col="ts",
                       right_time_col="vts")

    def gaps(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["vts"].notna()]
        gap = (df["ts"] - df["vts"]).dt.total_seconds()
        return pa.Table.from_pandas(
            pd.DataFrame({"user_id": df["user_id"], "gap": gap}),
            preserve_index=False,
        )

    agg = pre_aggregate(
        joined.map_batches(gaps, batch_format="pyarrow"),
        ["user_id"],
        {"n_matched": (None, "count"), "avg_gap_s": ("gap", "mean")},
    )
    return _round_col(agg, "avg_gap_s", 2)


SQL_EVENTS_ASOF = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view')
SELECT user_id, COUNT(*) AS n_matched,
       ROUND(AVG(epoch(ts) - epoch(vts)), 2) AS avg_gap_s
FROM (SELECT c.user_id, c.ts, v.vts
      FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.vts)
GROUP BY user_id
"""


def q_events_sliding(sf_dir: str):
    """Sliding-window aggregate: 3-hour moving event count per hour.
    The hourly pre-aggregate is tiny (one row per hour), so the window
    pass runs on the collected aggregate — the scale-correct shape for
    low-cardinality windows."""
    from kgray.ops.agg import pre_aggregate

    def hour(batch: pa.Table) -> pa.Table:
        return pa.table({"hour": pc.strftime(batch["ts"], "%Y-%m-%d %H:00")})

    hourly = pre_aggregate(
        _read(sf_dir, "events", ["ts"]).map_batches(hour, batch_format="pyarrow"),
        ["hour"], {"n": (None, "count")},
    ).to_pandas().sort_values("hour", ignore_index=True)
    moving = hourly["n"].rolling(window=3, min_periods=1).sum().astype("int64")
    return pa.table(
        {
            "hour": pa.array(hourly["hour"], pa.string()),
            "n": pa.array(hourly["n"].astype("int64")),
            "n_3h": pa.array(moving),
        }
    )


SQL_EVENTS_SLIDING = """
WITH hourly AS (
  SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, COUNT(*) AS n
  FROM events GROUP BY hour)
SELECT hour, n,
       CAST(SUM(n) OVER (ORDER BY hour
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3h
FROM hourly
"""


def q_token_stats_bpe(sf_dir: str):
    """BPE-ish regex token counting (word runs | single non-space
    symbols), rolled up per lang — the regex-tokenizer complement of the
    whitespace token_stats."""
    import re

    from ray.data.aggregate import Count, Sum

    # ASCII-pinned classes: Python \w/\s are Unicode-aware while DuckDB's
    # RE2 \w is ASCII-only — the explicit classes make both engines
    # tokenize non-ASCII text identically (per-char symbol matches).
    pat = re.compile(r"[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\r\f\v]")

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = [len(pat.findall(t)) for t in texts]
        return pa.table(
            {"lang": batch["lang"], "n_bpe": pa.array(n, pa.int64())}
        )

    return (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_bpe", alias_name="total_bpe"),
                   Count(alias_name="n_docs"))
    )


SQL_TOKEN_STATS_BPE = r"""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text,
             '[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\r\f\v]'))) AS BIGINT)
         AS total_bpe,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


_PRICE_BANDS = [0.0, 50_000.0, 150_000.0, 300_000.0, 600_000.0]


def q_orders_price_bands(sf_dir: str):
    """Broadcast range (non-equi) join: orders banded by totalprice
    interval, then count + revenue per band — edges broadcast once,
    one vectorized searchsorted per batch (never an all-to-all)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import range_join_broadcast

    banded = range_join_broadcast(
        _read(sf_dir, "orders", ["o_totalprice"]), _PRICE_BANDS,
        "o_totalprice",
    )
    # inner-join semantics: out-of-range rows (band == -1) are dropped,
    # matching the oracle's BETWEEN join regardless of the data range.
    banded = banded.map_batches(
        lambda t: t.filter(pc.greater_equal(t["band"], 0)),
        batch_format="pyarrow",
    )
    agg = pre_aggregate(
        banded, ["band"],
        {"n": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    return _round_col(agg, "total", 2)


SQL_ORDERS_PRICE_BANDS = """
WITH b(band, lo, hi) AS (VALUES
  (0, 0.0, 50000.0), (1, 50000.0, 150000.0),
  (2, 150000.0, 300000.0), (3, 300000.0, 600000.0))
SELECT band, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders JOIN b ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


# ---------------------------------------------------------------------------
# curation: deterministic splits / samples / quantiles / decontamination
# (ops/sample.py, ops/dedup.py::ngram_contamination — engine additions for
# training-data curation; quantile semantics pinned to rank(p) = ceil(p*N))
# ---------------------------------------------------------------------------

def q_hash_split_counts(sf_dir: str):
    """Deterministic md5 train/val/test split (stateless map, no shuffle,
    no RNG) rolled up to per-split counts."""
    from ray.data.aggregate import Count

    from kgray.ops.sample import add_hash_split

    docs = _read(sf_dir, "documents", ["doc_id"])
    split = add_hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1,
                                            "test": 0.1})
    return split.groupby("split").aggregate(Count(alias_name="n"))


def _hash_split_sql() -> str:
    # thresholds come from the SAME split_thresholds() call the Ray path
    # uses, so float accumulation in the ratio prefix sums can never
    # diverge between the two engines.
    from kgray.ops.sample import split_thresholds

    (_, t_train), (_, t_val), _ = split_thresholds(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return (
        "SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < "
        f"'{t_train}' THEN 'train' "
        f"WHEN md5(CAST(doc_id AS VARCHAR)) < '{t_val}' THEN 'val' "
        "ELSE 'test' END AS split, COUNT(*) AS n "
        "FROM documents GROUP BY split"
    )


SQL_HASH_SPLIT_COUNTS = _hash_split_sql()


def q_stratified_sample(sf_dir: str):
    """Per-lang deterministic sample: the 5 smallest-md5 doc_ids per
    stratum (per-batch combiner keeps k candidates per stratum, so the
    cogroup moves O(batches * strata * k) rows)."""
    from kgray.ops.sample import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(docs, "lang", "doc_id", k=5)


SQL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
  FROM documents) WHERE r <= 5
"""


def q_doclen_quantiles(sf_dir: str):
    """Exact global quantiles of n_chars via the distinct-value-histogram
    combiner (shuffles one row per distinct value per batch, never rows).
    rank(p) = ceil(p*N), value = rank-th smallest — percentile_disc
    semantics, so the picked value is an existing int (no float parity
    risk)."""
    from kgray.ops.sample import rank_quantiles

    docs = _read(sf_dir, "documents", ["n_chars"])
    return rank_quantiles(docs, "n_chars", [0.5, 0.9, 0.99])


SQL_DOCLEN_QUANTILES = """
WITH s AS (SELECT n_chars AS value,
        ROW_NUMBER() OVER (ORDER BY n_chars) AS r,
        COUNT(*) OVER () AS n FROM documents)
SELECT 'p50' AS q, value FROM s WHERE r = GREATEST(CAST(ceil(0.5 * n) AS BIGINT), 1)
UNION ALL
SELECT 'p90' AS q, value FROM s WHERE r = GREATEST(CAST(ceil(0.9 * n) AS BIGINT), 1)
UNION ALL
SELECT 'p99' AS q, value FROM s WHERE r = GREATEST(CAST(ceil(0.99 * n) AS BIGINT), 1)
"""


def q_doclen_quantiles_by_lang(sf_dir: str):
    """Exact per-group quantiles (one coarse-bucket cogroup, per-group
    sort+rank-pick vectorized inside the bucket)."""
    from kgray.ops.sample import grouped_rank_quantiles

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_rank_quantiles(docs, "lang", "n_chars", [0.5, 0.9])


SQL_DOCLEN_QUANTILES_BY_LANG = """
WITH s AS (SELECT lang, n_chars AS value,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS r,
        COUNT(*) OVER (PARTITION BY lang) AS n FROM documents)
SELECT lang, 'p50' AS q, value FROM s
  WHERE r = GREATEST(CAST(ceil(0.5 * n) AS BIGINT), 1)
UNION ALL
SELECT lang, 'p90' AS q, value FROM s
  WHERE r = GREATEST(CAST(ceil(0.9 * n) AS BIGINT), 1)
"""


def q_contamination(sf_dir: str):
    """Benchmark decontamination: per-training-doc count of distinct
    word-5-grams shared with the held-out set (doc_id % 97 == 0).  The
    held-out shingle set is collected once (distinct combiner) and
    broadcast; the big side never shuffles."""
    from kgray.ops.dedup import ngram_contamination

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_contamination(docs, lambda ids: ids % 97 == 0, n=5)


SQL_CONTAMINATION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 3),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
             || ' ' || w[i+4])) AS sh
      FROM toks WHERE len(w) >= 5),
tg AS (SELECT DISTINCT UNNEST(sh) AS s FROM g WHERE doc_id % 97 = 0),
hits AS (SELECT doc_id, COUNT(*) AS n
         FROM (SELECT doc_id, UNNEST(sh) AS s FROM g WHERE doc_id % 97 <> 0) t
         WHERE s IN (SELECT s FROM tg) GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 97 <> 0
"""


def q_tfidf_topk(sf_dir: str):
    """Top-3 tf-idf terms per doc: vocab-scale df fold + broadcast idf,
    then an embarrassingly-parallel scoring pass (no shuffle on docs)."""
    from kgray.ops.text import tfidf_top_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(docs, k=3)


SQL_TFIDF_TOPK = """
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
tf AS (SELECT doc_id, w AS token, COUNT(*) AS tf
       FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
             FROM documents)
       GROUP BY doc_id, w),
df AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df
       FROM (SELECT doc_id, UNNEST(list_distinct(string_split(text, ' ')))
                AS token FROM documents)
       GROUP BY token),
scored AS (
  SELECT t.doc_id, t.token,
         CAST(t.tf AS DOUBLE) * ln((SELECT n FROM n) / df.df) AS s
  FROM tf t JOIN df USING (token))
SELECT doc_id, token, ROUND(s, 4) AS tfidf FROM (
  SELECT doc_id, token, s,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, token) AS r
  FROM scored) WHERE r <= 3
"""


_MIXTURE_RATES = {f"src{i}": ((i % 4) + 1) / 4 for i in range(20)}


def q_source_mixture(sf_dir: str):
    """Deterministic source-mixture resampling (salted md5 per key, so
    it is independent of the train/val split over the same ids), rolled
    up to kept-docs-per-source."""
    from ray.data.aggregate import Count

    from kgray.ops.sample import downsample_sources

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    kept = downsample_sources(docs, _MIXTURE_RATES)
    return kept.groupby("source").aggregate(Count(alias_name="n"))


def _source_mixture_sql() -> str:
    from kgray.ops.sample import rate_threshold

    cases = " ".join(
        f"WHEN '{s}' THEN '{rate_threshold(r)}'"
        for s, r in _MIXTURE_RATES.items()
    )
    return (
        "SELECT source, COUNT(*) AS n FROM documents "
        "WHERE md5(source || ':' || CAST(doc_id AS VARCHAR)) < "
        f"CASE source {cases} ELSE '{'g' * 32}' END "
        "GROUP BY source"
    )


SQL_SOURCE_MIXTURE = _source_mixture_sql()


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals: top-word fraction and
    duplicated-adjacent-2-gram fraction per doc (stateless map)."""
    from kgray.ops.text import repetition_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(repetition_stats, batch_format="pyarrow")


SQL_REPETITION_STATS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tf AS (SELECT doc_id, t AS token, COUNT(*) AS c
       FROM (SELECT doc_id, UNNEST(w) AS t FROM w) GROUP BY doc_id, token),
a AS (SELECT doc_id, MAX(c) AS maxc, SUM(c) AS n FROM tf GROUP BY doc_id),
g AS (SELECT doc_id,
        len(grams) AS total, len(list_distinct(grams)) AS dist
      FROM (SELECT doc_id, list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i + 1]) AS grams
            FROM w WHERE len(w) >= 2))
SELECT a.doc_id,
  ROUND(CAST(maxc AS DOUBLE) / n, 4) AS top_word_frac,
  ROUND(COALESCE(1 - CAST(dist AS DOUBLE) / total, 0.0), 4)
    AS dup_2gram_frac
FROM a LEFT JOIN g ON a.doc_id = g.doc_id
"""


def q_pack_offsets(sf_dir: str):
    """Concat-and-chunk sequence packing: distributed exclusive prefix
    sum of token counts in doc_id order (per-range sums -> driver scan of
    R bases -> one cogroup with vectorized in-range cumsum), then
    bin = start // 512."""
    from kgray.ops.pack import stream_offsets
    from kgray.ops.text import add_token_count

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: add_token_count(t).drop_columns(["text"]),
        batch_format="pyarrow",
    )
    return stream_offsets(docs, key="doc_id", len_col="n_tokens", chunk=512)


SQL_PACK_OFFSETS = """
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
s AS (SELECT doc_id, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start
      FROM t)
SELECT doc_id, n_tokens, start, start // 512 AS bin FROM s
"""


def q_skew_chaos(sf_dir: str):
    """Adversarial-skew resilience probe (the chaos fixture as a bench
    entry): a Zipf-vocab corpus with a hot head entity and a degenerate
    LSH clique (corpus.adversarial_docs) runs the capped-block minhash
    near-dup path end-to-end, and a 30%-hot-key table runs
    salted_bucket_join.  Returns one summary row (docs, pairs,
    joined).  Rows-only: the fixture is synthesized, not an sf table;
    the cap accounting identity and salted==unsalted equality are
    test-pinned in tests/test_skew_chaos.py."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from kgray.corpus import adversarial_docs
    from kgray.ops.dedup import minhash_dup_pairs
    from kgray.ops.joins import salted_bucket_join

    n_docs = max(
        2000, pq.read_metadata(
            os.path.join(sf_dir, "documents.parquet")).num_rows * 2,
    )
    docs = rd.from_arrow(adversarial_docs(n_docs)).map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    n_pairs = minhash_dup_pairs(docs, tau=0.7).count()

    rng = np.random.default_rng(11)
    n = n_docs * 4
    keys = np.where(rng.random(n) < 0.3, 0,
                    rng.integers(1, 500, n)).astype(np.int64)
    left = rd.from_arrow(pa.table(
        {"k": pa.array(keys),
         "x": pa.array(rng.integers(0, 1 << 30, n).astype(np.int64))}
    ))
    right = rd.from_arrow(pa.table(
        {"k": pa.array(np.arange(500, dtype=np.int64)),
         "y": pa.array(np.arange(500, dtype=np.int64))}
    ))
    joined = salted_bucket_join(left, right, on="k", salt_col="x",
                                salt=8, how="left").count()
    return pa.table(
        {
            "docs": pa.array([n_docs], pa.int64()),
            "dup_pairs": pa.array([n_pairs], pa.int64()),
            "joined": pa.array([joined], pa.int64()),
        }
    )


def q_dedup_purge(sf_dir: str):
    """End-to-end near-dup purge (the Dolma/RedPajama-style corpus
    cleaning step): MinHash-LSH pairs -> connected components -> keep the
    min-doc_id representative per cluster -> anti-join the corpus against
    the dropped set.  Every stage is the auto-gated scale path (LSH
    bands, capped blocks, CC with combiner, size-gated anti join)."""
    from kgray.ops.canonical import connected_components
    from kgray.ops.dedup import minhash_dup_pairs
    from kgray.ops.joins import semi_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_dup_pairs(docs, tau=0.7)
    comp = connected_components(pairs)
    dropped = comp.map_batches(
        lambda t: pa.table(
            {"node": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
    )
    keep_cols = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return semi_join(keep_cols, dropped, on="doc_id", right_on="node",
                     anti=True)


# the pair graph below is the exact word-3-gram Jaccard self-join (the
# same oracle relationship as minhash_dup_docs: with 32 bands x 2 rows,
# P(LSH misses a j>=0.7 pair) ~ 4e-10, so the sketch is exact here);
# components via the recursive-CTE min-label closure.
SQL_DEDUP_PURGE = """
WITH RECURSIVE
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM documents
  WHERE len(string_split(text,' ')) >= 3),
p AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= 0.7),
sym AS (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
cc AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
dropped AS (SELECT node FROM comp WHERE node <> component)
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM dropped)
"""


def q_events_user_cumsum(sf_dir: str):
    """Running-total window aggregate (SUM OVER PARTITION BY user ORDER
    BY ts): one cogroup on user_id, then a vectorized sort + groupby
    cumsum per bucket.  All rows of a user land in one bucket, so the
    accumulation order matches the SQL frame order exactly; sums of
    2-decimal values can never sit on a .005 round boundary, so the
    2-digit round is bit-stable against tree-vs-sequential summation."""
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cum = df.groupby("user_id", sort=False)["value"].cumsum()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "cum_value": round_half_up(cum.to_numpy(np.float64), 2),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_USER_CUMSUM = (
    "SELECT event_id, user_id, "
    "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)"
    " AS cum_value FROM events"
)


def q_events_props_stats(sf_dir: str):
    """Metadata-column parsing: extract the integer 'k' field from the
    JSON props string with ONE vectorized regex per batch (ASCII class
    pinned on both sides — Python re and DuckDB RE2 agree), then a
    per-batch combiner feeds the tiny event_type aggregate."""
    from ray.data.aggregate import Count, Sum

    def extract(batch: pa.Table) -> pa.Table:
        k = (
            pd.Series(batch["props"].to_pylist())
            .str.extract(r'"k":\s*(-?[0-9]+)', expand=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "k": pa.array(k.to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )


SQL_EVENTS_PROPS_STATS = (
    "SELECT event_type, CAST(SUM(CAST(regexp_extract(props, "
    "'\"k\":\\s*(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k, "
    "COUNT(*) AS n FROM events GROUP BY event_type"
)


def q_docs_rollup(sf_dir: str):
    """Multi-level rollup (GROUPING SETS) in one corpus read: the wide
    groupby runs at the finest grain only; coarser levels are derived
    from that aggregate-scale result (driver-side fold over ~|langs x
    sources| rows, never corpus rows), with 'ALL' as the rollup marker."""
    from ray.data.aggregate import Count, Sum

    fine = (
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="chars"))
        .to_pandas()  # aggregate-scale (|langs| x |sources|), not corpus
    )
    by_lang = (
        fine.groupby("lang", as_index=False)[["n", "chars"]].sum()
        .assign(source="ALL")
    )
    total = pd.DataFrame(
        {"lang": ["ALL"], "source": ["ALL"],
         "n": [fine["n"].sum()], "chars": [fine["chars"].sum()]}
    )
    out = pd.concat([fine, by_lang, total], ignore_index=True)
    return pa.table(
        {
            "lang": pa.array(out["lang"].astype(str), pa.string()),
            "source": pa.array(out["source"].astype(str), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            "chars": pa.array(out["chars"].to_numpy(np.int64), pa.int64()),
        }
    )


SQL_DOCS_ROLLUP = (
    "SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS "
    "source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars "
    "FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), ())"
)


def q_word_topk_approx(sf_dir: str):
    """Misra-Gries heavy-hitter top-10 words: shuffle bounded to
    `capacity` rows per batch regardless of vocabulary size (the exact
    path's per-(batch, distinct-word) rows are unbounded for open-ended
    keys).  At this corpus' vocabulary the per-batch threshold is 0, so
    the sketch is provably exact and the SQL top-k is a full oracle;
    the capacity-truncation path is test-pinned (tests/test_sketch.py)."""
    from kgray.ops.sketch import heavy_hitters

    def explode(batch: pa.Table) -> pa.Table:
        toks = [w for t in batch["text"].to_pylist() for w in t.split(" ")]
        return pa.table({"token": pa.array(toks, pa.string())})

    tokens = _read(sf_dir, "documents", ["text"]).map_batches(
        explode, batch_format="pyarrow"
    )
    top, _err = heavy_hitters(tokens, "token", k=10)
    return top


SQL_WORD_TOPK_APPROX = """
SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS est
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY est DESC, token LIMIT 10
"""


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir: str):
    """Pivot (long -> wide) aggregate: per-user event counts as one
    column per event type.  Per-batch pandas crosstab is the combiner —
    the shuffle moves one wide row per (batch, user) — and a Sum
    groupby folds the partials; the type set is a fixed schema contract
    (unknown types raise rather than silently drop)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "t": batch["event_type"].to_pylist(),
            }
        )
        unknown = set(df["t"]) - set(_PIVOT_TYPES)
        if unknown:
            raise ValueError(f"unexpected event types: {unknown}")
        ct = pd.crosstab(df["user_id"], df["t"]).reindex(
            columns=_PIVOT_TYPES, fill_value=0
        )
        out = {"user_id": pa.array(ct.index.to_numpy(np.int64), pa.int64())}
        for t in _PIVOT_TYPES:
            out[f"n_{t}"] = pa.array(ct[t].to_numpy(np.int64), pa.int64())
        return pa.table(out)

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}")
                     for t in _PIVOT_TYPES])
    )


SQL_EVENTS_PIVOT = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{t}"
        for t in _PIVOT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


def q_events_daily_users_approx(sf_dir: str):
    """Per-day approximate distinct users via per-group HLL: the
    shuffle carries (day, register) rows — bounded by groups x 2^p per
    batch — instead of the exact path's (day, distinct user) rows.
    Rows-only: accuracy (<=5%) and determinism are test-pinned
    (tests/test_sketch.py::test_hll_distinct_by_within_3pct)."""
    from kgray.ops.sketch import hll_distinct_by

    def day(batch: pa.Table) -> pa.Table:
        d = pc.strftime(batch["ts"], format="%Y-%m-%d")
        return pa.table({"day": d, "user_id": batch["user_id"]})

    ev = _read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        day, batch_format="pyarrow"
    )
    out = hll_distinct_by(ev, "day", "user_id", p=12)
    return out.rename_columns(["day", "est"])


def q_doclen_percent_rank(sf_dir: str):
    """PERCENT_RANK window per lang partition: one lang-keyed cogroup,
    vectorized sort + rank arithmetic per bucket ((rank-1)/(n-1) is an
    exact rational — float parity is structural, rounding is belt)."""
    from kgray.util import grouped_map, round_half_up

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "n_chars", "doc_id"], kind="mergesort")
        g = df.groupby("lang", sort=False)
        n = g["doc_id"].transform("size").to_numpy(np.float64)
        rank = g.cumcount().to_numpy(np.float64)  # 0-based
        pr = np.where(n > 1, rank / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "pr": round_half_up(pr, 4),
            }
        )

    return grouped_map(docs, "lang", per_bucket)


SQL_DOCLEN_PERCENT_RANK = """
SELECT doc_id,
       ROUND(PERCENT_RANK() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id), 4) AS pr
FROM documents
"""


def q_events_interarrival(sf_dir: str):
    """LAG-window aggregate: mean inter-event gap per user.  One
    user-keyed cogroup; per bucket the gaps are a vectorized shift-diff
    over the (user, ts, event_id)-sorted frame (exact integer
    microseconds), folded to a per-user mean."""
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = us[1:] == us[:-1]
        gaps = pd.DataFrame(
            {
                "user_id": us[1:][same],
                "gap_s": (ts[1:] - ts[:-1])[same] / 1e6,
            }
        )
        agg = gaps.groupby("user_id", as_index=False)["gap_s"].agg(
            ["sum", "size"]
        )
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy(np.int64),
                "avg_gap_s": round_half_up(
                    agg["sum"].to_numpy(np.float64)
                    / agg["size"].to_numpy(np.float64),
                    2,
                ),
                "n_gaps": agg["size"].to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_INTERARRIVAL = """
WITH d AS (
  SELECT user_id,
         epoch_us(ts - LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) / 1e6 AS gap_s
  FROM events)
SELECT user_id, ROUND(AVG(gap_s), 2) AS avg_gap_s,
       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps
FROM d WHERE gap_s IS NOT NULL GROUP BY user_id
"""


def q_embed_dim_stats(sf_dir: str):
    """Second-moment vector aggregate: per-dimension mean and
    population stddev of the embedding table in ONE pass (each batch
    folds d sums + d squared-sums + a count into a single partial row;
    the groupby fold is a fixed single-key reduce)."""
    from ray.data.aggregate import Sum

    from kgray.ops.similarity import _matrix
    from kgray.util import round_half_up

    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, "embedding")
        out = {"k": pa.array([0], pa.int64()),
               "n": pa.array([m.shape[0]], pa.int64())}
        s = m.sum(axis=0)
        ss = (m * m).sum(axis=0)
        for j in range(m.shape[1]):
            out[f"s{j}"] = pa.array([s[j]], pa.float64())
            out[f"q{j}"] = pa.array([ss[j]], pa.float64())
        return pa.table(out)

    probe = emb.limit(1).take_batch(1, batch_format="pyarrow")
    d = _matrix(probe, "embedding").shape[1]
    aggs = [Sum("n", alias_name="n")] + [
        Sum(c, alias_name=c) for j in range(d) for c in (f"s{j}", f"q{j}")
    ]
    tbl = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(*aggs)
        .to_pandas()  # one row
    )
    n = float(tbl["n"][0])
    means = np.array([tbl[f"s{j}"][0] for j in range(d)]) / n
    var = np.array([tbl[f"q{j}"][0] for j in range(d)]) / n - means * means
    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64), pa.int64()),
            "mean": pa.array(round_half_up(means, 4), pa.float64()),
            "std": pa.array(round_half_up(np.sqrt(np.maximum(var, 0)), 4),
                            pa.float64()),
        }
    )


SQL_EMBED_DIM_STATS = """
SELECT i AS dim, ROUND(AVG(embedding[i]), 4) AS mean,
       ROUND(STDDEV_POP(embedding[i]), 4) AS std
FROM embeddings, UNNEST(range(1, 65)) AS t(i)
GROUP BY i
"""


def q_dup_ngrams(sf_dir: str):
    """Intra-corpus duplicated-5-gram signal per doc (boilerplate cue):
    df fold over per-doc-distinct shingles, df>=2 set broadcast once,
    shuffle-free occurrence counting pass."""
    from kgray.ops.dedup import dup_ngram_stats

    return dup_ngram_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                           n=5)


SQL_DUP_NGRAMS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id,
             UNNEST(list_transform(range(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                    || toks[i+3] || ' ' || toks[i+4])) AS g
      FROM w WHERE len(toks) >= 5),
df AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1),
hits AS (SELECT t.doc_id,
           SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS n_dup,
           COUNT(*) AS n_total
         FROM g t JOIN df USING (g) GROUP BY 1)
SELECT doc_id, CAST(n_dup AS BIGINT) AS n_dup,
       CAST(n_total AS BIGINT) AS n_total,
       ROUND(CAST(n_dup AS DOUBLE) / n_total, 4) AS dup_frac
FROM hits
"""


def q_embed_centroids(sf_dir: str):
    """Vector aggregate: per-label embedding centroids (the SemDeDup /
    class-prototype fold) — one partial-sum row per (batch, label)
    moves through the shuffle, means computed on the label-scale
    aggregate, emitted long-form (label, dim, avg)."""
    from kgray.ops.similarity import label_centroids

    return label_centroids(_read(sf_dir, "embeddings",
                                 ["label", "embedding"]))


SQL_EMBED_CENTROIDS = """
SELECT label, i AS dim, ROUND(AVG(embedding[i]), 4) AS avg
FROM embeddings, UNNEST(range(1, 65)) AS t(i)
GROUP BY label, i
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-ES
    priority keys from hash-uniforms, weight = n_chars): stateless key
    map + per-batch top-k combiner + one tiny global sort — the
    mixture-building draw that stays stable under retries/resume."""
    from kgray.ops.sample import priority_sample

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return priority_sample(docs, "doc_id", "n_chars", k=50)


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         pow((CAST('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 13)
               AS BIGINT) + 0.5) / 4503599627370496.0,
             1.0 / n_chars) AS key
  FROM documents)
ORDER BY key DESC, doc_id LIMIT 50
"""


def q_events_funnel(sf_dir: str):
    """Ordered-funnel analysis (view -> click -> purchase): all events
    of a user land in one bucket via the user-keyed cogroup, so each
    stage's first-qualifying-timestamp chain is computed vectorized per
    bucket (three mask+groupby-min passes, no per-user python); bucket
    partials fold through a tiny stage groupby."""
    from ray.data.aggregate import Sum

    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        v = (
            df[df["event_type"] == "view"].groupby("user_id")["ts"].min()
            .rename("t_prev")
        )
        d = df.merge(v, left_on="user_id", right_index=True)
        c = (
            d[(d["event_type"] == "click") & (d["ts"] > d["t_prev"])]
            .groupby("user_id")["ts"].min().rename("t_prev")
        )
        d = df.merge(c, left_on="user_id", right_index=True)
        p = (
            d[(d["event_type"] == "purchase") & (d["ts"] > d["t_prev"])]
            .groupby("user_id")["ts"].min()
        )
        return pd.DataFrame(
            {
                "stage": ["view", "click", "purchase"],
                "n_users": np.array([len(v), len(c), len(p)], np.int64),
            }
        )

    return (
        grouped_map(ev, "user_id", per_bucket)
        .groupby("stage")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


SQL_EVENTS_FUNNEL = """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
SELECT stage, n_users FROM (
  SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
  UNION ALL SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM c
  UNION ALL SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM p)
"""


def q_collocations(sf_dir: str):
    """Collocation mining: top-20 adjacent-word pairs by PMI over one
    bigram-combiner fold (driver touches only the pruned bigram-vocab
    table; libm log for DuckDB ln bit-parity)."""
    from kgray.ops.text import collocation_pmi

    return collocation_pmi(_read(sf_dir, "documents", ["text"]),
                           k=20, min_count=5)


SQL_COLLOCATIONS = """
WITH w AS (SELECT string_split(text, ' ') AS toks FROM documents),
g AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT toks, UNNEST(range(1, len(toks))) AS i FROM w)),
bg AS (SELECT w1, w2, COUNT(*) AS c FROM g GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(SUM(c) AS DOUBLE) AS c1 FROM bg GROUP BY 1),
c2 AS (SELECT w2, CAST(SUM(c) AS DOUBLE) AS c2 FROM bg GROUP BY 1),
t AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM bg),
s AS (SELECT bg.w1, bg.w2,
        ln((CAST(bg.c AS DOUBLE) * (SELECT t FROM t)) / (c1.c1 * c2.c2))
          AS pmi
      FROM bg JOIN c1 USING (w1) JOIN c2 USING (w2)
      WHERE bg.c >= 5)
SELECT w1, w2, ROUND(pmi, 4) AS pmi FROM (
  SELECT w1, w2, pmi,
         ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS r FROM s)
WHERE r <= 20
"""


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape (local supplier volume): the classic 6-table plan
    with exactly ONE big-big shuffle.  lineitem and orders bucket-join on
    orderkey; supplier/customer nation keys and the nation->name /
    region gate attach via broadcast maps (dimension-sized: ship once,
    read per task); revenue folds through the combiner groupby."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, bucket_join

    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nat_reg = broadcast_join(nat, reg, on="n_regionkey",
                             right_on="r_regionkey", how="inner")
    asia = nat_reg.map_batches(
        lambda b: b.filter(pc.equal(b["r_name"], "ASIA")),
        batch_format="pyarrow",
    )

    orders = rd.read_parquet(  # prune at the read: 1995 row groups only
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pds.field("o_orderdate") >= datetime.datetime(1995, 1, 1))
        & (pds.field("o_orderdate") < datetime.datetime(1996, 1, 1)),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey", how="inner")

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                                      "l_extendedprice", "l_discount"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner")

    def add_rev(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "s_nationkey": batch["s_nationkey"],
                "rev": rev,
            }
        )

    line = line.map_batches(add_rev, batch_format="pyarrow")
    joined = bucket_join(
        line,
        orders.select_columns(["o_orderkey", "c_nationkey"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    ).map_batches(
        lambda b: b.filter(pc.equal(b["s_nationkey"], b["c_nationkey"])),
        batch_format="pyarrow",
    )
    named = broadcast_join(joined, asia.select_columns(
        ["n_nationkey", "n_name"]
    ), on="s_nationkey", right_on="n_nationkey", how="inner")
    ds = pre_aggregate(named, ["n_name"], {"revenue": ("rev", "sum")})
    return _round_col(ds, "revenue", 2)


SQL_TPCH_Q5 = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
GROUP BY n_name
"""


def q_doclen_trimmed(sf_dir: str):
    """Quantile-trim filter (the Gopher-style outlier cut): exact p05/p95
    of n_chars via the distinct-value-histogram fold, thresholds applied
    as a stateless Arrow filter (closure capture — two scalars, no
    re-shuffle), rolled up per lang."""
    from ray.data.aggregate import Count

    from kgray.ops.sample import rank_quantiles

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    qs = rank_quantiles(docs, "n_chars", [0.05, 0.95])
    lo, hi = (int(v) for v in qs["value"].to_pylist())

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["n_chars"], lo),
            pc.less_equal(batch["n_chars"], hi),
        )
        return batch.filter(m).select(["lang"])

    return (
        docs.map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


SQL_DOCLEN_TRIMMED = """
WITH b AS (
  SELECT percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
  FROM documents)
SELECT lang, COUNT(*) AS n FROM documents, b
WHERE n_chars BETWEEN lo AND hi GROUP BY lang
"""


def q_events_value_corr(sf_dir: str):
    """Per-group Pearson correlation in one pass: six sufficient
    statistics per (batch, event_type) move through the shuffle, the
    final r is computed on the folded aggregate (ops/agg.grouped_corr).
    x = value, y = the integer props field (vectorized regex extract)."""
    from kgray.ops.agg import grouped_corr

    def extract(batch: pa.Table) -> pa.Table:
        k = (
            pd.Series(batch["props"].to_pylist())
            .str.extract(r'"k":\s*(-?[0-9]+)', expand=False)
            .astype(np.float64)
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "value": batch["value"],
                "k": pa.array(k.to_numpy(np.float64), pa.float64()),
            }
        )

    ev = _read(sf_dir, "events", ["event_type", "value", "props"]).map_batches(
        extract, batch_format="pyarrow"
    )
    return grouped_corr(ev, "event_type", "value", "k")


SQL_EVENTS_VALUE_CORR = (
    "SELECT event_type, ROUND(corr(value, CAST(regexp_extract(props, "
    "'\"k\":\\s*(-?[0-9]+)', 1) AS DOUBLE)), 4) AS r "
    "FROM events GROUP BY event_type"
)


def q_value_quantiles_approx(sf_dir: str):
    """DDSketch-style relative-error quantiles of events.value: the
    shuffle moves log-bucket histogram rows (O(log(range)/alpha) per
    batch) instead of the exact path's distinct values.  Rows-only:
    the <=1% relative-error guarantee and mergeability/determinism are
    test-pinned (tests/test_sketch.py)."""
    from kgray.ops.sketch import dd_quantiles

    return dd_quantiles(
        _read(sf_dir, "events", ["value"]), "value", [0.5, 0.9, 0.99]
    )


def q_lm_score(sf_dir: str):
    """KenLM-style quality signal: per-doc mean add-one-smoothed bigram
    log-probability under a model fit on the corpus itself (one
    combiner-fold read to build gram counts, log table built on the
    driver with libm log for DuckDB ln bit-parity, broadcast once;
    scoring pass shuffle-free)."""
    from kgray.ops.text import bigram_lm_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bigram_lm_scores(docs)


SQL_LM_SCORE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks))) AS i FROM w)),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM g GROUP BY 1, 2),
cu AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS cu FROM g GROUP BY 1),
v AS (SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
      FROM (SELECT UNNEST(toks) AS t FROM w)),
lp AS (SELECT g.doc_id,
              ln((bg.c + 1.0) / (cu.cu + (SELECT v FROM v))) AS lp
       FROM g JOIN bg USING (w1, w2) JOIN cu USING (w1))
SELECT doc_id, ROUND(AVG(lp), 4) AS lm_score FROM lp GROUP BY doc_id
"""


def q_events_distinct_users_approx(sf_dir: str):
    """HyperLogLog distinct-user estimate: register-space shuffle
    (<= 2^14 rows per batch) instead of the exact path's distinct-key
    shuffle.  Oracle-checked: the estimate is a pure deterministic
    function of the distinct-value set (splitmix64 hash -> max-rho
    registers -> exact-integer harmonic sum -> libm ln), so the DuckDB
    oracle replays the identical recurrence with 32-bit-half HUGEINT
    arithmetic and matches bit-for-bit (same family as the
    pagerank_int unrolled-recurrence oracle).  Accuracy (~0.8% s.e.
    at p=14) stays test-pinned in tests/test_sketch.py."""
    from kgray.ops.sketch import hll_distinct

    return hll_distinct(_read(sf_dir, "events", ["user_id"]), "user_id")


# HLL twin: replays splitmix64 over DISTINCT user_id with 32-bit-half
# HUGEINT arithmetic (DuckDB BIGINT mul overflows are errors, so 64-bit
# wraparound is emulated as hi/lo halves; xor/bin operate on the
# BIGINT-sized halves).  rho = leading zeros via length(bin(x)) —
# exact integer logic, no float log.  The harmonic sum is an exact
# HUGEINT (2^(64-rho) per occupied register + zeros * 2^64), and the
# final float expression mirrors kgray.ops.sketch.hll_estimate
# token-for-token so both engines round identically.
_HLL_USERS_SQL = """
WITH u AS (SELECT DISTINCT user_id AS x FROM events),
a0 AS (SELECT CAST(x % 4294967296 + 2135587861 AS HUGEINT) AS lo0,
              CAST(x // 4294967296 + 2654435769 AS HUGEINT) AS hi0 FROM u),
a1 AS (SELECT lo0 % 4294967296 AS lo,
              (hi0 + lo0 // 4294967296) % 4294967296 AS hi FROM a0),
b1 AS (SELECT CAST(xor(CAST(lo AS BIGINT),
                CAST((hi % 1073741824) * 4 + lo // 1073741824 AS BIGINT))
               AS HUGEINT) AS lo,
              CAST(xor(CAST(hi AS BIGINT), CAST(hi // 1073741824 AS BIGINT))
               AS HUGEINT) AS hi FROM a1),
b2 AS (SELECT lo * 484763065 +
              ((lo * 3210233709 + hi * 484763065) % 4294967296) * 4294967296
              AS t FROM b1),
b3 AS (SELECT t % 4294967296 AS lo, (t // 4294967296) % 4294967296 AS hi
       FROM b2),
x1 AS (SELECT CAST(xor(CAST(lo AS BIGINT),
                CAST((hi % 134217728) * 32 + lo // 134217728 AS BIGINT))
               AS HUGEINT) AS lo,
              CAST(xor(CAST(hi AS BIGINT), CAST(hi // 134217728 AS BIGINT))
               AS HUGEINT) AS hi FROM b3),
x2 AS (SELECT lo * 321982955 +
              ((lo * 2496678331 + hi * 321982955) % 4294967296) * 4294967296
              AS t FROM x1),
x3 AS (SELECT t % 4294967296 AS lo, (t // 4294967296) % 4294967296 AS hi
       FROM x2),
z AS (SELECT CAST(xor(CAST(lo AS BIGINT),
               CAST((hi % 2147483648) * 2 + lo // 2147483648 AS BIGINT))
              AS BIGINT) AS lo,
             CAST(xor(CAST(hi AS BIGINT), CAST(hi // 2147483648 AS BIGINT))
              AS BIGINT) AS hi FROM x3),
rr AS (SELECT hi // 262144 AS idx,
              (hi * 16384 + lo // 262144) % 4294967296 AS shi,
              (lo % 262144) * 16384 + 16383 AS slo FROM z),
rho0 AS (SELECT idx,
        CASE WHEN shi != 0 THEN 33 - length(bin(CAST(shi AS BIGINT)))
             ELSE 65 - length(bin(CAST(slo AS BIGINT))) END AS rho FROM rr),
regs AS (SELECT idx, MAX(rho) AS rho FROM rho0 GROUP BY idx),
agg AS (SELECT SUM(CAST(1 AS HUGEINT) << (64 - rho)) AS s_occ,
               16384 - COUNT(*) AS zeros FROM regs),
est0 AS (SELECT (CAST(0.7213 AS DOUBLE)
                 / (CAST(1.0 AS DOUBLE)
                    + CAST(1.079 AS DOUBLE) / CAST(16384.0 AS DOUBLE)))
                * 16384.0 * 16384.0 * 18446744073709551616.0
                / CAST(s_occ + CAST(zeros AS HUGEINT) * 18446744073709551616
                       AS DOUBLE) AS e,
                zeros FROM agg)
SELECT CAST(FLOOR(CASE WHEN e <= 2.5 * 16384.0 AND zeros > 0
                       THEN 16384.0 * ln(16384.0 / CAST(zeros AS DOUBLE))
                       ELSE e END + 0.5) AS BIGINT) AS est
FROM est0
"""


# ---------------------------------------------------------------------------
# curation / analytics batch 3 (RAG chunking, retention, profiling,
# inverted index, cross-split contamination audit, outlier detection)
# ---------------------------------------------------------------------------

def q_doc_chunks(sf_dir: str, width: int = 120, stride: int = 90):
    """RAG-style fixed-window chunking with overlap: each doc yields
    char windows [k*stride, k*stride+width) clipped to n_chars.  Pure
    stateless vectorized map (np.repeat/arange fan-out) — zero shuffle,
    embarrassingly parallel at any scale."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = 1 + np.maximum(
            0, np.ceil((n - width) / float(stride)).astype(np.int64)
        )
        doc_rep = np.repeat(ids, k)
        n_rep = np.repeat(n, k)
        # within-doc chunk index: global arange minus each doc's base
        base = np.cumsum(k) - k
        idx = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(base, k)
        cstart = idx * stride
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "chunk_id": pa.array(idx, pa.int64()),
                "cstart": pa.array(cstart, pa.int64()),
                "cstop": pa.array(
                    np.minimum(cstart + width, n_rep), pa.int64()
                ),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow")


SQL_DOC_CHUNKS = """
SELECT doc_id, i AS chunk_id, i * 90 AS cstart,
       LEAST(i * 90 + 120, CAST(n_chars AS BIGINT)) AS cstop
FROM documents,
     UNNEST(range(0, 1 + GREATEST(0,
            CAST(CEIL((n_chars - 120) / 90.0) AS BIGINT)))) AS t(i)
"""


def q_lang_top_terms(sf_dir: str, k: int = 3):
    """Top-k terms per language by document frequency: per-batch
    (doc, term) dedup + (lang, term) partial counts (the shuffle moves
    one row per batch x lang x term, vocab-bounded), Sum fold, then a
    lang-keyed cogroup picks top-k with a deterministic (df DESC, term)
    tie-break."""
    from ray.data.aggregate import Sum

    from kgray.util import grouped_map

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        e = df[["doc_id", "lang"]].join(
            df["text"].str.split(" ").rename("term")
        ).explode("term")
        e = e[e["term"] != ""].drop_duplicates(["doc_id", "term"])
        g = e.groupby(["lang", "term"], sort=False).size().reset_index(
            name="df"
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("df", alias_name="df"))
    )

    def topk(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(
            ["lang", "df", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        d["rank"] = d.groupby("lang", sort=False).cumcount() + 1
        d = d[d["rank"] <= k]
        return pd.DataFrame(
            {
                "lang": d["lang"],
                "term": d["term"],
                "df": d["df"].to_numpy(np.int64),
                "rank": d["rank"].to_numpy(np.int64),
            }
        )

    return grouped_map(folded, "lang", topk)


SQL_LANG_TOP_TERMS = """
WITH p AS (SELECT DISTINCT lang, doc_id, t FROM (
             SELECT lang, doc_id, UNNEST(string_split(text, ' ')) AS t
             FROM documents) WHERE t <> ''),
df AS (SELECT lang, t AS term, CAST(COUNT(*) AS BIGINT) AS df
       FROM p GROUP BY 1, 2)
SELECT lang, term, df, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY df DESC, term) AS BIGINT) AS rank FROM df)
WHERE rank <= 3
"""


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-active day, then
    distinct active users per (cohort_day, day offset).  ONE user-keyed
    cogroup computes each user's cohort and dedups (cohort, offset,
    user) in-bucket — globally distinct because a user lives in exactly
    one bucket — so the final fold is a tiny Sum groupby over
    (cohort, offset) partial counts, never a distinct-user shuffle."""
    from ray.data.aggregate import Sum

    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.normalize()}
        ).drop_duplicates()
        cohort = d.groupby("user_id", sort=False)["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
                "offset_d": (d["day"] - cohort).dt.days.astype(np.int64),
                "user_id": d["user_id"],
            }
        ).drop_duplicates()
        return (
            out.groupby(["cohort_day", "offset_d"], sort=False)
            .size()
            .reset_index(name="n_users")
        )

    part = grouped_map(ev, "user_id", per_bucket)
    return part.groupby(["cohort_day", "offset_d"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


SQL_EVENTS_RETENTION = """
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
c AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY 1)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', c.cohort, e.day) AS BIGINT) AS offset_d,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN c USING (user_id) GROUP BY 1, 2
"""


_PROFILE_COLS = ["o_custkey", "o_totalprice", "o_orderpriority"]


def q_column_profile(sf_dir: str):
    """Dataset profiler: per-column null count, exact distinct count,
    min and max (as strings) in long format.  Null/min/max fold from
    one-row-per-batch partials (a single global aggregate); distinct
    counts dedupe per-batch unique (col, value) pairs — the shuffle
    moves distinct pairs, never rows — then a per-col count."""
    from ray.data.aggregate import Count, Max, Min, Sum

    orders = _read(sf_dir, "orders", _PROFILE_COLS)

    def prof_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        row: dict[str, list] = {}
        for c in _PROFILE_COLS:
            s = df[c]
            nn = s.dropna()
            row[f"{c}__null"] = [int(s.isna().sum())]
            row[f"{c}__min"] = [nn.min() if len(nn) else None]
            row[f"{c}__max"] = [nn.max() if len(nn) else None]
        return pa.table(row)

    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(Sum(f"{c}__null", alias_name=f"{c}__null"))
        aggs.append(Min(f"{c}__min", alias_name=f"{c}__min"))
        aggs.append(Max(f"{c}__max", alias_name=f"{c}__max"))
    stats = orders.map_batches(
        prof_partial, batch_format="pyarrow"
    ).aggregate(*aggs)

    def pairs(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in _PROFILE_COLS:
            u = pc.unique(pc.drop_null(batch[c]))
            names.extend([c] * len(u))
            vals.extend(pc.cast(u, pa.string()).to_pylist())
        return pa.table(
            {"col": pa.array(names, pa.string()),
             "v": pa.array(vals, pa.string())}
        )

    ndist = (
        orders.map_batches(pairs, batch_format="pyarrow")
        .groupby(["col", "v"])
        .aggregate(Count(alias_name="__c"))
        .groupby("col")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
        .set_index("col")["n_distinct"]
    )

    def fmt(v) -> str:
        if isinstance(v, float):
            return str(v)
        return str(v)

    return pa.table(
        {
            "col": pa.array(_PROFILE_COLS, pa.string()),
            "n_null": pa.array(
                [int(stats[f"{c}__null"]) for c in _PROFILE_COLS], pa.int64()
            ),
            "n_distinct": pa.array(
                [int(ndist[c]) for c in _PROFILE_COLS], pa.int64()
            ),
            "min_s": pa.array(
                [fmt(stats[f"{c}__min"]) for c in _PROFILE_COLS], pa.string()
            ),
            "max_s": pa.array(
                [fmt(stats[f"{c}__max"]) for c in _PROFILE_COLS], pa.string()
            ),
        }
    )


SQL_COLUMN_PROFILE = """
SELECT 'o_custkey' AS col,
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_s FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS VARCHAR),
       CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       CAST(MIN(o_orderpriority) AS VARCHAR),
       CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders
"""


def q_split_contamination(sf_dir: str, n: int = 5):
    """Cross-split contamination audit: how many distinct word-5-gram
    shingles occur in BOTH the train and test hash-splits (leakage a
    random split would hide).  Per-batch fold to (shingle, has_train,
    has_test) flags, Max-groupby merge — the shuffle moves one flag row
    per distinct shingle per batch — and a driver-side count of the
    aggregate-scale flag table."""
    from ray.data.aggregate import Max

    from kgray.ops.dedup import word_shingles
    from kgray.ops.sample import _md5_hex, split_thresholds

    (_, t_train), (_, t_val), _ = split_thresholds(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        hs = _md5_hex(batch["doc_id"].to_pylist())
        texts = batch["text"].to_pylist()
        sh, tr, te = [], [], []
        for h, t in zip(hs, texts):
            if t_train <= h < t_val:
                continue  # val split: not audited
            is_train = h < t_train
            for s in word_shingles(t, n):
                sh.append(s)
                tr.append(int(is_train))
                te.append(int(not is_train))
        df = pd.DataFrame({"s": sh, "has_train": tr, "has_test": te})
        g = df.groupby("s", sort=False, as_index=False).max()
        return pa.Table.from_pandas(g, preserve_index=False)

    flags = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(
            Max("has_train", alias_name="has_train"),
            Max("has_test", alias_name="has_test"),
        )
    )
    n_overlap = flags.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.and_(
                                    pc.equal(b["has_train"], 1),
                                    pc.equal(b["has_test"], 1),
                                )
                            ).as_py()
                            or 0
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).sum("n")
    return pa.table({"n_overlap": pa.array([int(n_overlap)], pa.int64())})


def _split_contamination_sql() -> str:
    from kgray.ops.sample import split_thresholds

    (_, t_train), (_, t_val), _ = split_thresholds(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, len(w) - 3),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
             || ' ' || w[i+4]))) AS s
      FROM toks WHERE len(w) >= 5),
sp AS (SELECT s,
         MAX(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{t_train}'
             THEN 1 ELSE 0 END) AS has_train,
         MAX(CASE WHEN md5(CAST(doc_id AS VARCHAR)) >= '{t_val}'
             THEN 1 ELSE 0 END) AS has_test
       FROM g GROUP BY s)
SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM sp WHERE has_train = 1 AND has_test = 1
"""


SQL_SPLIT_CONTAMINATION = _split_contamination_sql()


def q_term_postings(sf_dir: str, k: int = 5):
    """Inverted index (posting lists): per term, document frequency and
    the first-k sorted doc ids as a comma string.  Per-batch (term,
    doc_id) dedup, then ONE term-keyed cogroup builds each posting list
    vectorized (sort + head-k per term); capping at k bounds the output
    row width regardless of term popularity."""
    from kgray.util import grouped_map

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        e = df[["doc_id"]].join(
            df["text"].str.split(" ").rename("term")
        ).explode("term")
        e = e[e["term"] != ""].drop_duplicates(["term", "doc_id"])
        return pa.Table.from_pandas(
            e[["term", "doc_id"]], preserve_index=False
        )

    def postings(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates(["term", "doc_id"]).sort_values(
            ["term", "doc_id"], kind="mergesort"
        )
        df_counts = d.groupby("term", sort=False).size()
        ids = (
            d.groupby("term", sort=False)
            .head(k)
            .groupby("term", sort=False)["doc_id"]
            .agg(lambda s: ",".join(str(int(i)) for i in s))
        )
        return pd.DataFrame(
            {
                "term": df_counts.index,
                "df": df_counts.to_numpy(np.int64),
                "ids": ids.reindex(df_counts.index).to_numpy(),
            }
        )

    return grouped_map(
        docs.map_batches(pairs, batch_format="pyarrow"), "term", postings
    )


SQL_TERM_POSTINGS = """
WITH p AS (SELECT DISTINCT t AS term, doc_id FROM (
             SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
             FROM documents) WHERE t <> '')
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id))[1:5], ',') AS ids
FROM p GROUP BY term
"""


def q_events_zscore_outliers(sf_dir: str, z: float = 2.0):
    """Population z-score outlier counts per event type: pass 1 folds
    sufficient statistics (n, Σv, Σv²) per type via the combiner path
    (one row per batch x type); the tiny (type, mu, sd) table rides in
    the second pass's task closure, which counts |v - mu| > z·sd
    vectorized with zero additional shuffle."""
    from ray.data.aggregate import Sum

    from kgray.ops.agg import pre_aggregate

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def add_sq(batch: pa.Table) -> pa.Table:
        v = batch["value"]
        return batch.append_column("v2", pc.multiply(v, v))

    stats = pre_aggregate(
        ev.map_batches(add_sq, batch_format="pyarrow"),
        ["event_type"],
        {"n": (None, "count"), "sv": ("value", "sum"), "sq": ("v2", "sum")},
    ).to_pandas()
    mu = stats["sv"].to_numpy(np.float64) / stats["n"].to_numpy(np.float64)
    sd = np.sqrt(
        np.maximum(
            stats["sq"].to_numpy(np.float64)
            / stats["n"].to_numpy(np.float64)
            - mu * mu,
            0.0,
        )
    )
    bounds = {
        t: (m, s) for t, m, s in zip(stats["event_type"], mu, sd)
    }

    def count_outliers(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["event_type"].map(lambda t: bounds[t][0]).to_numpy(np.float64)
        s = df["event_type"].map(lambda t: bounds[t][1]).to_numpy(np.float64)
        v = df["value"].to_numpy(np.float64)
        hit = np.abs(v - m) > z * s
        g = (
            df.loc[hit]
            .groupby("event_type", sort=False)
            .size()
            .reset_index(name="n_outliers")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ev.map_batches(count_outliers, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_outliers", alias_name="n_outliers"))
    )


def q_events_value_trend(sf_dir: str):
    """Per-group OLS regression (value vs days-since-epoch-start) in ONE
    pass via sufficient statistics — five numbers per (batch, type) ride
    the shuffle; slope/intercept come from the folded aggregate with the
    textbook raw-moment formulas (algebraically equal to SQL
    regr_slope/regr_intercept; summation-order ulp drift absorbed by the
    4-digit round)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    base_us = pd.Timestamp("2024-01-01").value // 1000

    def add_xy(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        # whole seconds first (DuckDB date_diff('second') truncates)
        x = (ts - base_us) // 1_000_000 / 86400.0
        y = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
                "xx": pa.array(x * x, pa.float64()),
                "xy": pa.array(x * y, pa.float64()),
            }
        )

    stats = pre_aggregate(
        ev.map_batches(add_xy, batch_format="pyarrow"),
        ["event_type"],
        {
            "n": (None, "count"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxx": ("xx", "sum"),
            "sxy": ("xy", "sum"),
        },
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n"].to_numpy(np.float64)
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxx, sxy = df["sxx"].to_numpy(), df["sxy"].to_numpy()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        icept = (sy - slope * sx) / n
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], pa.string()),
                "slope": pa.array(round_half_up(slope, 4), pa.float64()),
                "icept": pa.array(round_half_up(icept, 4), pa.float64()),
            }
        )

    return stats.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_VALUE_TREND = """
SELECT event_type,
       ROUND(regr_slope(value,
         date_diff('second', TIMESTAMP '2024-01-01', ts) / 86400.0),
         4) AS slope,
       ROUND(regr_intercept(value,
         date_diff('second', TIMESTAMP '2024-01-01', ts) / 86400.0),
         4) AS icept
FROM events GROUP BY 1
"""


def q_events_interval_merge(sf_dir: str):
    """Merge overlapping intervals (gaps-and-islands): each event spans
    [ts, ts+30min); per user, overlapping spans coalesce into islands.
    ONE user-keyed cogroup; inside the bucket the island boundaries are
    a vectorized cummax-shift sweep (no row loop), and the output is the
    per-user island count + exact covered microseconds (integer — bit
    parity with the SQL window formulation is structural)."""
    from kgray.util import grouped_map

    span_us = 30 * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        d = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "s": s, "e": s + span_us}
        ).sort_values(["user_id", "s", "e"], kind="mergesort")
        cm = d.groupby("user_id", sort=False)["e"].cummax()
        prev = cm.groupby(d["user_id"], sort=False).shift(1)
        brk = (d["s"] > prev) | prev.isna()
        d["grp"] = brk.cumsum()  # island starts make grp unique per user
        isl = d.groupby(["user_id", "grp"], sort=False).agg(
            s=("s", "min"), e=("e", "max")
        ).reset_index()
        out = isl.assign(cov=isl["e"] - isl["s"]).groupby(
            "user_id", sort=False
        ).agg(n_islands=("grp", "size"), covered_us=("cov", "sum"))
        return out.reset_index().astype(
            {"n_islands": np.int64, "covered_us": np.int64}
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_INTERVAL_MERGE = """
WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
            FROM events),
o AS (SELECT user_id, s, e,
        CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        THEN 1 ELSE 0 END AS brk
      FROM iv),
g AS (SELECT user_id, s, e,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS grp
      FROM o),
m AS (SELECT user_id, grp, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(epoch_us(e - s)) AS BIGINT) AS covered_us
FROM m GROUP BY 1
"""


def q_events_rolling_active(sf_dir: str):
    """Rolling 24-hour distinct active users per hour.  SQL needs a
    lateral self-join (COUNT(DISTINCT) over RANGE windows isn't
    supported); the distributed form inverts it: dedup (hour, user)
    pairs per batch, fan each pair out to the 24 hours it keeps the
    user active in (bounded 24x expansion of an already-deduped
    pair table), then ONE hour-keyed cogroup nunique — no user-scale
    distinct shuffle, and the observed-hour filter is a broadcast of
    the aggregate-scale hour set."""
    import pandas as _pd

    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[h]"
        ).astype(np.int64)
        d = pd.DataFrame(
            {
                "h": ts,
                "user_id": batch["user_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        ).drop_duplicates()
        h = d["h"].to_numpy()
        u = d["user_id"].to_numpy()
        off = np.arange(24, dtype=np.int64)
        out = pd.DataFrame(
            {
                "h": (h[:, None] + off[None, :]).ravel(),
                "user_id": np.repeat(u, 24),
                # only rows whose window anchor is a REAL event hour
                # count; anchor-hour presence is re-checked after the
                # fold against the observed-hour set
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    def nunique(d: _pd.DataFrame) -> _pd.DataFrame:
        g = (
            d.drop_duplicates()
            .groupby("h", sort=False)["user_id"]
            .nunique()
            .reset_index(name="n_active")
        )
        return g

    counts = grouped_map(
        ev.map_batches(expand, batch_format="pyarrow"), "h", nunique
    )

    # observed hours are aggregate-scale (len = corpus span in hours)
    hours = set(
        _read(sf_dir, "events", ["ts"])
        .map_batches(
            lambda b: pa.table(
                {
                    "h": pc.unique(
                        pa.array(
                            b["ts"]
                            .to_numpy(zero_copy_only=False)
                            .astype("datetime64[h]")
                            .astype(np.int64)
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["h"]
        .unique()
        .tolist()
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["h"].isin(hours)]
        hts = df["h"].to_numpy(np.int64).astype("datetime64[h]")
        return pa.table(
            {
                "hour": pa.array(
                    pd.Series(hts).dt.strftime("%Y-%m-%d %H:00"),
                    pa.string(),
                ),
                "n_active": pa.array(
                    df["n_active"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ROLLING_ACTIVE = """
WITH ph AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
            FROM events),
hours AS (SELECT DISTINCT h FROM ph)
SELECT strftime(hours.h, '%Y-%m-%d %H:00') AS hour,
       CAST(COUNT(DISTINCT ph.user_id) AS BIGINT) AS n_active
FROM hours JOIN ph
  ON ph.h BETWEEN hours.h - INTERVAL 23 HOUR AND hours.h
GROUP BY 1
"""


def q_orders_large_baskets(sf_dir: str, threshold: float = 300.0):
    """TPC-H Q18 shape (large-volume customers): per-order quantity
    fold with HAVING; the surviving key set is rare by construction
    (that's the threshold's point), so it broadcasts into an inner join
    over the orders stream — zero shuffle on orders — with a broadcast
    customer-name map and a global sort+limit on the aggregate-scale
    result.  The lineitem side never shuffles rows — only per-batch
    partial sums."""
    from kgray.ops.joins import broadcast_join
    from kgray.util import grouped_map, round_half_up

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    # the key is near-unique per input block (each order has ~4 lines),
    # so a per-batch combiner cannot compress the shuffle — a coarse
    # bucket cogroup with the HAVING applied in-bucket is the cheaper
    # all-to-all here (measured ~3x vs groupby().aggregate at sf0.1)
    def fold(d: pd.DataFrame) -> pd.DataFrame:
        g = (
            d.groupby("l_orderkey", sort=False)["l_quantity"]
            .sum()
            .reset_index(name="sum_qty")
        )
        return g[g["sum_qty"] > threshold]

    sums = grouped_map(li, "l_orderkey", fold)

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    joined = broadcast_join(
        orders, sums, on="o_orderkey", right_on="l_orderkey", how="inner"
    )

    cust = dict(
        zip(
            *_read(sf_dir, "customer", ["c_custkey", "c_name"])
            .to_pandas()[["c_custkey", "c_name"]]
            .to_numpy()
            .T.tolist()
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "c_name": pa.array(
                    df["o_custkey"].map(cust), pa.string()
                ),
                "o_orderkey": pa.array(
                    df["o_orderkey"].to_numpy(np.int64), pa.int64()
                ),
                "o_orderdate": pa.array(
                    df["o_orderdate"].dt.strftime("%Y-%m-%d"), pa.string()
                ),
                "o_totalprice": pa.array(
                    df["o_totalprice"].to_numpy(np.float64), pa.float64()
                ),
                "sum_qty": pa.array(
                    round_half_up(
                        df["sum_qty"].to_numpy(np.float64), 2
                    ),
                    pa.float64(),
                ),
            }
        )

    return (
        joined.map_batches(finish, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


SQL_ORDERS_LARGE_BASKETS = """
WITH s AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
           FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300)
SELECT c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice, ROUND(s.sum_qty, 2) AS sum_qty
FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10
"""


def q_embed_quantize_error(sf_dir: str):
    """Int8 embedding quantization audit (the compression step a
    100-TB ANN index needs): pass 1 folds per-dimension max-abs scales
    (one row per batch); the 64-float scale vector rides the second
    pass's closure, which folds per-dim squared reconstruction error.
    Rounding uses the floor(x+0.5) formulation in BOTH engines so the
    quantize grid is pinned, not approximated."""
    from ray.data.aggregate import Max, Sum

    from kgray.ops.similarity import _matrix
    from kgray.util import round_half_up

    emb = _read(sf_dir, "embeddings", ["embedding"])
    probe = emb.limit(1).take_batch(1, batch_format="pyarrow")
    d = _matrix(probe, "embedding").shape[1]

    def maxabs(batch: pa.Table) -> pa.Table:
        m = np.abs(_matrix(batch, "embedding").astype(np.float64))
        mx = m.max(axis=0)
        return pa.table(
            {f"s{j}": pa.array([mx[j]], pa.float64()) for j in range(d)}
        )

    scales_row = emb.map_batches(maxabs, batch_format="pyarrow").aggregate(
        *[Max(f"s{j}", alias_name=f"s{j}") for j in range(d)]
    )
    scale = np.array([scales_row[f"s{j}"] for j in range(d)], np.float64)

    def err_partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, "embedding").astype(np.float64)
        q = np.floor(m / scale * 127.0 + 0.5)
        rec = q * scale / 127.0
        se = ((m - rec) ** 2).sum(axis=0)
        out = {"n": pa.array([m.shape[0]], pa.int64())}
        for j in range(d):
            out[f"e{j}"] = pa.array([se[j]], pa.float64())
        return pa.table(out)

    folded = emb.map_batches(err_partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        *[Sum(f"e{j}", alias_name=f"e{j}") for j in range(d)],
    )
    n = float(folded["n"])
    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64), pa.int64()),
            "scale": pa.array(round_half_up(scale, 4), pa.float64()),
            "mse": pa.array(
                round_half_up(
                    np.array(
                        [folded[f"e{j}"] for j in range(d)], np.float64
                    )
                    / n,
                    8,
                ),
                pa.float64(),
            ),
        }
    )


SQL_EMBED_QUANTIZE_ERROR = """
WITH v AS (SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS v
           FROM embeddings, UNNEST(range(1, 65)) AS t(i)),
s AS (SELECT dim, MAX(ABS(v)) AS scale FROM v GROUP BY dim)
SELECT v.dim, ROUND(s.scale, 4) AS scale,
       ROUND(AVG(POW(v.v - FLOOR(v.v / s.scale * 127.0 + 0.5)
                     * s.scale / 127.0, 2)), 8) AS mse
FROM v JOIN s ON v.dim = s.dim
GROUP BY v.dim, s.scale
"""


def q_events_user_ewma(sf_dir: str, alpha: float = 1.0 / 3.0):
    """Streaming per-user feature: the recursive EWMA
    y_t = (1-a) y_{t-1} + a x_t over each user's (ts, event_id)-ordered
    values, reporting the final state per user.  ONE user-keyed cogroup;
    the recursion runs at C speed via pandas ewm inside the bucket.
    Rows-only: the recursion is stateful-streaming, not SQL-expressible
    (a recursive CTE per user would be quadratic); the exact recurrence
    is pinned against a hand-rolled loop in tests."""
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        ew = (
            df.groupby("user_id", sort=False)["value"]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        )
        last = df.assign(ew=ew).groupby("user_id", sort=False).agg(
            ewma=("ew", "last"), n=("ew", "size")
        )
        return pd.DataFrame(
            {
                "user_id": last.index.to_numpy(np.int64),
                "ewma": round_half_up(
                    last["ewma"].to_numpy(np.float64), 4
                ),
                "n": last["n"].to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


def q_user_activity_gini(sf_dir: str):
    """Key-skew report (shuffle planning input): Gini coefficient and
    p99/p50 ratio of the events-per-user distribution.  The per-user
    count fold is the only corpus-scale pass; the Gini formula runs on
    the key-scale aggregate (at open-ended key cardinality the DDSketch
    quantile path replaces the exact sort — documented trade)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["user_id"])
    counts = (
        pre_aggregate(ev, ["user_id"], {"n": (None, "count")})
        .to_pandas()
        .sort_values(["n", "user_id"], kind="mergesort")
    )
    x = counts["n"].to_numpy(np.float64)
    k = float(len(x))
    rn = np.arange(1, len(x) + 1, dtype=np.float64)
    gini = 2.0 * (rn * x).sum() / (k * x.sum()) - (k + 1.0) / k

    def pdisc(v, p):
        return v[max(int(np.ceil(p * len(v))), 1) - 1]

    return pa.table(
        {
            "gini": pa.array([round_half_up(gini, 4)], pa.float64()),
            "p99_over_p50": pa.array(
                [round_half_up(pdisc(x, 0.99) / pdisc(x, 0.5), 4)],
                pa.float64(),
            ),
            "n_keys": pa.array([int(k)], pa.int64()),
        }
    )


SQL_USER_ACTIVITY_GINI = """
WITH c AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n
           FROM events GROUP BY 1),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS rn,
             COUNT(*) OVER () AS k, SUM(n) OVER () AS tot
      FROM c)
SELECT ROUND(2 * SUM(rn * n) / (MAX(k) * MAX(tot))
             - (MAX(k) + 1.0) / MAX(k), 4) AS gini,
       ROUND((SELECT percentile_disc(0.99) WITHIN GROUP (ORDER BY n)
              FROM c)
             / (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                FROM c), 4) AS p99_over_p50,
       CAST(MAX(k) AS BIGINT) AS n_keys
FROM r
"""


_BM25_TERMS = ["table", "value", "key"]


def q_bm25_topk(sf_dir: str, k1: float = 1.2, b: float = 0.75):
    """BM25 ranking for a fixed 3-term query (the search-scoring family
    on top of the inverted-index stats): pass 1 folds ONE row per batch
    of corpus constants (doc count, total length, per-term document
    frequencies); pass 2 scores stateless per batch — tf and dl are
    in-batch, idf comes precomputed with C-libm log in the closure —
    and a global sort+limit picks the top 20.  The corpus never
    shuffles."""
    import math

    from ray.data.aggregate import Sum

    from kgray.util import round_half_up

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].str.split(" ").map(
            lambda ws: [w for w in ws if w]
        )
        dl = toks.map(len).to_numpy(np.int64)
        out = {
            "n_docs": pa.array([len(df)], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for t in _BM25_TERMS:
            out[f"df_{t}"] = pa.array(
                [int(toks.map(lambda ws: t in ws).sum())], pa.int64()
            )
        return pa.table(out)

    aggs = [Sum("n_docs", alias_name="n_docs"),
            Sum("sum_dl", alias_name="sum_dl")]
    aggs += [Sum(f"df_{t}", alias_name=f"df_{t}") for t in _BM25_TERMS]
    row = docs.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        *aggs
    )
    n = float(row["n_docs"])
    avgdl = float(row["sum_dl"]) / n
    idf = {
        t: math.log((n - float(row[f"df_{t}"]) + 0.5)
                    / (float(row[f"df_{t}"]) + 0.5) + 1.0)
        for t in _BM25_TERMS
    }

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].str.split(" ").map(
            lambda ws: [w for w in ws if w]
        )
        dl = toks.map(len).to_numpy(np.float64)
        total = np.zeros(len(df))
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for t in _BM25_TERMS:
            tf = toks.map(lambda ws: ws.count(t)).to_numpy(np.float64)
            total += idf[t] * tf * (k1 + 1.0) / (tf + norm)
        hit = total > 0
        return pa.table(
            {
                "doc_id": pa.array(df.loc[hit, "doc_id"]),
                "score": pa.array(
                    round_half_up(total[hit], 4), pa.float64()
                ),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(20)
    )


SQL_BM25_TOPK = """
WITH toks AS (SELECT doc_id, t FROM (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                FROM documents) WHERE t <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
       FROM toks GROUP BY 1),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl
          FROM dl),
tf AS (SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
       WHERE t IN ('table', 'value', 'key') GROUP BY 1, 2),
df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM tf GROUP BY 1),
sc AS (SELECT tf.doc_id,
              SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                  * tf.tf * (1.2 + 1)
                  / (tf.tf + 1.2 * (1 - 0.75
                                    + 0.75 * dl.dl / stats.avgdl)))
              AS s
       FROM tf JOIN df USING (t) JOIN dl USING (doc_id), stats
       GROUP BY 1)
SELECT doc_id, ROUND(s, 4) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 20
"""


def q_events_mad_outliers(sf_dir: str):
    """Robust outlier detection (median/MAD, the z-score's
    breakdown-resistant sibling): exact per-type median via the
    rank-quantile cogroup, exact MAD via a second quantile fold over
    |v - med| (the deviation column rides a stateless map with the tiny
    median table in its closure), then a shuffle-free outlier count at
    1.5 x MAD.  Medians/MADs are exact data values — no rounding needed
    for bit parity with percentile_disc."""
    from ray.data.aggregate import Sum

    from kgray.ops.sample import grouped_rank_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    med = (
        grouped_rank_quantiles(ev, "event_type", "value", [0.5])
        .to_pandas()
        .set_index("event_type")["value"]
        .to_dict()
    )

    def dev(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["event_type"].map(med).to_numpy(np.float64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "dev": pa.array(
                    np.abs(df["value"].to_numpy(np.float64) - m),
                    pa.float64(),
                ),
            }
        )

    devs = ev.map_batches(dev, batch_format="pyarrow")
    mad = (
        grouped_rank_quantiles(devs, "event_type", "dev", [0.5])
        .to_pandas()
        .set_index("event_type")["value"]
        .to_dict()
    )

    def count(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["event_type"].map(med).to_numpy(np.float64)
        a = df["event_type"].map(mad).to_numpy(np.float64)
        hit = np.abs(df["value"].to_numpy(np.float64) - m) > 1.5 * a
        g = (
            df.loc[hit]
            .groupby("event_type", sort=False)
            .size()
            .reset_index(name="n_outliers")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (
        ev.map_batches(count, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_outliers", alias_name="n_outliers"))
        .to_pandas()
        .set_index("event_type")["n_outliers"]
    )
    types = sorted(med)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "med": pa.array([med[t] for t in types], pa.float64()),
            "mad": pa.array([mad[t] for t in types], pa.float64()),
            "n_outliers": pa.array(
                [int(folded.get(t, 0)) for t in types], pa.int64()
            ),
        }
    )


SQL_EVENTS_MAD_OUTLIERS = """
WITH m AS (SELECT event_type,
                  percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
                  AS med
           FROM events GROUP BY 1),
d AS (SELECT e.event_type, ABS(e.value - m.med) AS dev
      FROM events e JOIN m USING (event_type)),
a AS (SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
      FROM d GROUP BY 1)
SELECT m.event_type, m.med, a.mad,
       CAST(COUNT(*) FILTER (WHERE d.dev > 1.5 * a.mad) AS BIGINT)
       AS n_outliers
FROM d JOIN m USING (event_type) JOIN a USING (event_type)
GROUP BY m.event_type, m.med, a.mad
"""


def q_embed_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over the embedding table: per-cluster
    size + SSE after 5 rounds (each round = one streaming assignment
    pass + a cluster-scale groupby fold, no vector shuffle).  Rows-only:
    the fixpoint is iterative; recovery of planted blob structure and
    numpy-brute parity are test-pinned (tests/test_curation3.py)."""
    from kgray.ops.similarity import kmeans_lloyd
    from kgray.util import round_half_up

    emb = _read(sf_dir, "embeddings", ["embedding"])
    _, summary = kmeans_lloyd(emb, k=8, iters=5)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster": batch["cluster"],
                "n": batch["n"],
                "sse": pa.array(
                    round_half_up(
                        batch["sse"].to_numpy(zero_copy_only=False), 4
                    ),
                    pa.float64(),
                ),
            }
        )

    return summary.map_batches(finish, batch_format="pyarrow")


def _embed_cov(sf_dir: str):
    """One-pass covariance sufficient statistics: each batch folds the
    d x d Gram matrix + d sums + a count into ONE partial row (the
    shuffle moves d^2+d+1 numbers per batch, never vectors); the driver
    assembles cov = G/n - mu mu^T from the folded aggregate."""
    from ray.data.aggregate import Sum

    from kgray.ops.similarity import _matrix

    emb = _read(sf_dir, "embeddings", ["embedding"])
    probe = emb.limit(1).take_batch(1, batch_format="pyarrow")
    d = _matrix(probe, "embedding").shape[1]

    iu = np.triu_indices(d)

    def partial(batch: pa.Table) -> pa.Table:
        # long-format partial: (i, j, v) rows — upper-triangle Gram
        # entries, per-dim sums as (i, -1), the count as (-1, -1).
        # ~d^2/2 rows per batch fold in ONE small groupby (a few
        # thousand named aggregates would instead pay seconds of
        # aggregate-spec overhead per batch).
        m = _matrix(batch, "embedding").astype(np.float64)
        g = m.T @ m
        s = m.sum(axis=0)
        i_out = np.concatenate(
            [iu[0], np.arange(d), [-1]]
        ).astype(np.int64)
        j_out = np.concatenate(
            [iu[1], np.full(d, -1), [-1]]
        ).astype(np.int64)
        v_out = np.concatenate([g[iu], s, [float(m.shape[0])]])
        return pa.table(
            {
                "i": pa.array(i_out, pa.int64()),
                "j": pa.array(j_out, pa.int64()),
                "v": pa.array(v_out, pa.float64()),
            }
        )

    folded = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    key = folded.set_index(["i", "j"])["v"]
    n = float(key[(-1, -1)])
    s = np.array([key[(i, -1)] for i in range(d)], np.float64)
    g = np.zeros((d, d), np.float64)
    for i, j in zip(*iu):
        g[i, j] = g[j, i] = key[(i, j)]
    mu = s / n
    return g / n - np.outer(mu, mu), d


def q_embed_covariance(sf_dir: str):
    """Population covariance matrix of the embedding table in ONE pass
    (PCA's input), long format."""
    from kgray.util import round_half_up

    cov, d = _embed_cov(sf_dir)
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                         indexing="ij")
    return pa.table(
        {
            "i": pa.array(ii.ravel(), pa.int64()),
            "j": pa.array(jj.ravel(), pa.int64()),
            "cov": pa.array(
                round_half_up(cov.ravel(), 6), pa.float64()
            ),
        }
    )


SQL_EMBED_COVARIANCE = """
WITH v AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
           FROM embeddings, UNNEST(range(1, 65)) AS t(i)),
m AS (SELECT i, AVG(v) AS mu FROM v GROUP BY i)
SELECT a.i, b.i AS j,
       ROUND(AVG(a.v * b.v) - ma.mu * mb.mu, 6) AS cov
FROM v a JOIN v b USING (vec_id)
JOIN m ma ON ma.i = a.i JOIN m mb ON mb.i = b.i
GROUP BY a.i, b.i, ma.mu, mb.mu
"""


def q_embed_pca_variance(sf_dir: str):
    """PCA spectrum from the one-pass covariance fold: top-8
    eigenvalues + explained-variance ratios (driver eigendecomposition
    of the d x d aggregate — the distributed work is the covariance
    fold).  Rows-only: eigendecomposition is not SQL-expressible; the
    covariance input is the oracle-checked embed_covariance and the
    spectrum is test-pinned against numpy on synthetic data."""
    from kgray.util import round_half_up

    cov, d = _embed_cov(sf_dir)
    w = np.linalg.eigvalsh(cov)[::-1]
    total = w.sum()
    k = 8
    return pa.table(
        {
            "rank": pa.array(np.arange(1, k + 1, dtype=np.int64)),
            "eigenvalue": pa.array(
                round_half_up(w[:k], 6), pa.float64()
            ),
            "explained": pa.array(
                round_half_up(w[:k] / total, 4), pa.float64()
            ),
        }
    )


def q_events_chi2(sf_dir: str):
    """Chi-square independence statistic for (event_type, day-of-week):
    one combiner-fold pass builds the contingency table (one row per
    batch x cell, 35 cells), and the statistic is driver arithmetic over
    the aggregate — the same sufficient-statistic shape as corr/OLS.
    Expected counts use the textbook row x col / n formula in BOTH
    engines, so parity is algebraic (4-digit round absorbs sum-order
    ulps)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def add_dow(batch: pa.Table) -> pa.Table:
        # DuckDB dayofweek: 0=Sunday; pandas dayofweek: 0=Monday
        dow = (
            batch["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
            + 4
        ) % 7  # 1970-01-01 was a Thursday -> +4 makes 0=Sunday
        return pa.table(
            {
                "event_type": batch["event_type"],
                "dow": pa.array(dow, pa.int64()),
            }
        )

    cells = pre_aggregate(
        ev.map_batches(add_dow, batch_format="pyarrow"),
        ["event_type", "dow"],
        {"n": (None, "count")},
    ).to_pandas()
    piv = cells.pivot_table(
        index="event_type", columns="dow", values="n", fill_value=0,
        aggfunc="sum",
    ).to_numpy(np.float64)
    n = piv.sum()
    exp = piv.sum(axis=1, keepdims=True) * piv.sum(axis=0, keepdims=True) / n
    chi2 = ((piv - exp) ** 2 / exp).sum()
    return pa.table(
        {
            "chi2": pa.array([round_half_up(chi2, 4)], pa.float64()),
            "dof": pa.array(
                [int((piv.shape[0] - 1) * (piv.shape[1] - 1))], pa.int64()
            ),
        }
    )


SQL_EVENTS_CHI2 = """
WITH c AS (SELECT event_type, dayofweek(ts) AS dow,
                  CAST(COUNT(*) AS DOUBLE) AS o
           FROM events GROUP BY 1, 2),
f AS (SELECT t.event_type, d.dow, COALESCE(c.o, 0) AS o
      FROM (SELECT DISTINCT event_type FROM c) t
      CROSS JOIN (SELECT DISTINCT dow FROM c) d
      LEFT JOIN c USING (event_type, dow)),
t AS (SELECT SUM(o) AS n FROM f),
r AS (SELECT event_type, SUM(o) AS rc FROM f GROUP BY 1),
k AS (SELECT dow, SUM(o) AS cc FROM f GROUP BY 1)
SELECT ROUND(SUM(POW(f.o - r.rc * k.cc / t.n, 2)
             / (r.rc * k.cc / t.n)), 4) AS chi2,
       CAST((SELECT (COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT dow) - 1)
             FROM f) AS BIGINT) AS dof
FROM f JOIN r USING (event_type) JOIN k USING (dow), t
"""


def q_events_mktsegment_value(sf_dir: str):
    """Fact-to-dimension join under the salted path: events join
    customer on user key through ``salted_bucket_join`` (per-row salt on
    event_id spreads any hot user over 8 buckets; the dimension side
    replicates 8x — the skew-defusing trade for big-skewed-left joins),
    then per-segment partial sums fold in a tiny groupby."""
    from ray.data.aggregate import Sum

    from kgray.ops.joins import salted_bucket_join
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = salted_bucket_join(
        ev, cust, on="user_id", right_on="c_custkey",
        salt_col="event_id", salt=8, how="inner",
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("c_mktsegment", sort=False)["value"].agg(
            ["sum", "size"]
        ).reset_index()
        return pa.table(
            {
                "c_mktsegment": pa.array(g["c_mktsegment"], pa.string()),
                "sv": pa.array(g["sum"].to_numpy(np.float64),
                               pa.float64()),
                "n_events": pa.array(g["size"].to_numpy(np.int64),
                                     pa.int64()),
            }
        )

    folded = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("sv", alias_name="sv"),
            Sum("n_events", alias_name="n_events"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "total_value": pa.array(
                    round_half_up(
                        batch["sv"].to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
                "n_events": batch["n_events"],
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_MKTSEGMENT_VALUE = """
SELECT c_mktsegment, ROUND(SUM(value), 2) AS total_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


def q_doc_entropy(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution (a repetition/
    quality signal): vectorized explode + (doc, term) count, then
    -sum(p ln p) per doc.  ln is C-libm ``math.log`` memoized over the
    DISTINCT (count, total) pairs — a few hundred entries regardless of
    corpus size — for bit parity with DuckDB's ln (numpy's vectorized
    log drifts one ulp; see tfidf_topk)."""
    import math

    from kgray.util import round_half_up

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def entropy(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        e = df[["doc_id"]].join(
            df["text"].str.split(" ").rename("t")
        ).explode("t")
        e = e[e["t"] != ""]
        tc = e.groupby(["doc_id", "t"], sort=False).size().reset_index(
            name="c"
        )
        n = tc.groupby("doc_id", sort=False)["c"].transform("sum")
        cn = tc["c"].to_numpy(np.int64)
        nn = n.to_numpy(np.int64)
        logmemo: dict[tuple[int, int], float] = {}
        terms = np.empty(len(cn), np.float64)
        for i, (c, m) in enumerate(zip(cn.tolist(), nn.tolist())):
            v = logmemo.get((c, m))
            if v is None:
                p = c / m
                v = -p * math.log(p)
                logmemo[(c, m)] = v
            terms[i] = v
        ent = (
            pd.DataFrame({"doc_id": tc["doc_id"], "e": terms})
            .groupby("doc_id", sort=False)["e"]
            .sum()
            .reset_index(name="entropy")
        )
        return pa.table(
            {
                "doc_id": pa.array(ent["doc_id"]),
                "entropy": pa.array(
                    round_half_up(ent["entropy"].to_numpy(np.float64), 4),
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(entropy, batch_format="pyarrow")


SQL_DOC_ENTROPY = """
WITH tc AS (SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS c
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> '' GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(c) AS n FROM tc GROUP BY 1)
SELECT tc.doc_id, ROUND(SUM(-(c / n) * ln(c / n)), 4) AS entropy
FROM tc JOIN n ON tc.doc_id = n.doc_id GROUP BY tc.doc_id
"""


def q_events_transitions(sf_dir: str):
    """First-order event-type transition counts (sequence mining): ONE
    user-keyed cogroup pairs each event with its predecessor via the
    same shift trick as the inter-arrival window, folds (prev, next)
    partials in-bucket, and a tiny Sum groupby merges buckets."""
    from ray.data.aggregate import Sum

    from kgray.util import grouped_map

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

    part = grouped_map(ev, "user_id", per_bucket)
    return part.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n")
    )


SQL_EVENTS_TRANSITIONS = """
WITH s AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT prev AS prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
"""


def q_word_counts_cms(sf_dir: str):
    """Count-Min sketch word frequencies: the build shuffles nonzero
    grid cells (<= depth x width rows per batch) instead of tokens, the
    grids merge additively, and point estimates come off the driver
    grid.  Exactness at this vocab/width ratio is structural (no key
    collides with another in all depth rows — deterministic hashing
    makes the check stable), so the exact-count SQL is a true oracle;
    the general overestimate-only bound is test-pinned."""
    from kgray.ops.sketch import cms_value_counts

    docs = _read(sf_dir, "documents", ["text"])

    def toks(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().str.split(" ").explode()
        s = s[s != ""]
        return pa.table({"term": pa.array(s, pa.string())})

    return cms_value_counts(
        docs.map_batches(toks, batch_format="pyarrow"), "term"
    )


SQL_WORD_COUNTS_CMS = """
SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS est
FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
WHERE t <> '' GROUP BY t
"""


def q_orders_diff(sf_dir: str):
    """Snapshot reconciliation (CDC audit): diff two deterministic
    'snapshots' of orders — old = keys not divisible by 89, new = keys
    not divisible by 97 with totalprice bumped for custkey%10==0 — into
    added/removed/changed/unchanged counts.  Each side collapses to
    (key, row-fingerprint) before the ONE full-outer cogroup, so the
    shuffle never moves payload columns."""
    from kgray.ops.joins import table_diff

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]

    def _mod_ne0(col, m: int) -> pa.Array:
        k = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array(k % m != 0)

    def old_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(_mod_ne0(batch["o_orderkey"], 89))
        return t.select(["o_orderkey", "o_totalprice", "o_orderpriority"])

    def new_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(_mod_ne0(batch["o_orderkey"], 97))
        bump = pc.invert(_mod_ne0(t["o_custkey"], 10))
        price = pc.if_else(
            bump, pc.add(t["o_totalprice"], 1000.0), t["o_totalprice"]
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": price,
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    orders = _read(sf_dir, "orders", cols)
    left = orders.map_batches(old_side, batch_format="pyarrow")
    right = _read(sf_dir, "orders", cols).map_batches(
        new_side, batch_format="pyarrow"
    )
    return table_diff(
        left, right, on="o_orderkey",
        compare_cols=["o_totalprice", "o_orderpriority"],
    )


SQL_ORDERS_DIFF = """
WITH l AS (SELECT o_orderkey, o_totalprice, o_orderpriority
           FROM orders WHERE o_orderkey % 89 <> 0),
r AS (SELECT o_orderkey,
             CASE WHEN o_custkey % 10 = 0 THEN o_totalprice + 1000
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT CASE WHEN l.o_orderkey IS NULL THEN 'added'
              WHEN r.o_orderkey IS NULL THEN 'removed'
              WHEN l.o_totalprice = r.o_totalprice
                   AND l.o_orderpriority = r.o_orderpriority
                   THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
GROUP BY status
"""


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training over the corpus: ONE distributed
    word-frequency fold, then the classic merge loop on the vocab-scale
    driver table.  Rows-only: the merge loop is iterative (each round's
    pair counts depend on the previous merge), not SQL-expressible; the
    algorithm is pinned by tests/test_curation3.py against the
    hand-worked Sennrich example and a determinism check."""
    from kgray.ops.text import bpe_train

    docs = _read(sf_dir, "documents", ["text"])
    return bpe_train(docs, num_merges=20)


def q_events_outer_activity(sf_dir: str):
    """FULL OUTER join of two sparse per-(user, day) aggregates (click
    counts vs purchase counts) — the join family's outer path, exercised
    where BOTH null sides actually occur.  Each side pre-aggregates on
    the composite (user_id, day) key (combiner first), then ONE
    bucket-cogroup full-outer join on the key TUPLE (bucket_join's
    native multi-key path — no caller-side key concatenation), and a
    stateless 0-fill finish map."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def keyed(tp: str):
        def add_key(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], tp))
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pc.strftime(t["ts"], "%Y-%m-%d"),
                }
            )

        return ev.map_batches(add_key, batch_format="pyarrow")

    clicks = pre_aggregate(
        keyed("click"), ["user_id", "day"], {"n_click": (None, "count")}
    )
    purchases = pre_aggregate(
        keyed("purchase"), ["user_id", "day"],
        {"n_purchase": (None, "count")},
    )
    joined = bucket_join(
        clicks, purchases, on=["user_id", "day"], how="outer"
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "user_id": pa.array(
                    df["user_id"].astype(np.int64), pa.int64()
                ),
                "day": pa.array(df["day"], pa.string()),
                "n_click": pa.array(
                    df["n_click"].fillna(0).astype(np.int64), pa.int64()
                ),
                "n_purchase": pa.array(
                    df["n_purchase"].fillna(0).astype(np.int64), pa.int64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_OUTER_ACTIVITY = """
WITH c AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(COUNT(*) AS BIGINT) AS n_click
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
p AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(c.day, p.day) AS day,
       COALESCE(n_click, 0) AS n_click,
       COALESCE(n_purchase, 0) AS n_purchase
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id AND c.day = p.day
"""


SQL_EVENTS_ZSCORE_OUTLIERS = """
WITH s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                  SUM(value) AS sv, SUM(value * value) AS sq
           FROM events GROUP BY 1),
t AS (SELECT event_type, sv / n AS mu,
             sqrt(GREATEST(sq / n - (sv / n) * (sv / n), 0)) AS sd
      FROM s)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers
FROM events e JOIN t USING (event_type)
WHERE abs(e.value - t.mu) > 2 * t.sd
GROUP BY 1
"""


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 shape (order-priority check): EXISTS semi-join of a
    date-pruned orders slice against the big lineitem side.  The
    lineitem predicate filters at the read-adjacent map, the key set
    reduces to distinct orderkeys (semi_join's combiner), and the
    broadcast-vs-bloom-cogroup gate picks the shuffle-free path when
    the surviving key set is dimension-sized.  No commit/receipt dates
    in this corpus: the lineitem EXISTS predicate is l_quantity > 45."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import semi_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        filter=(pds.field("o_orderdate") >= datetime.datetime(1995, 7, 1))
        & (pds.field("o_orderdate") < datetime.datetime(1995, 10, 1)),
    )
    hot = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda b: b.filter(pc.greater(b["l_quantity"], 45.0)).select(
            ["l_orderkey"]
        ),
        batch_format="pyarrow",
    )
    kept = semi_join(orders, hot, on="o_orderkey", right_on="l_orderkey")
    return pre_aggregate(
        kept, ["o_orderpriority"], {"n_orders": (None, "count")}
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= DATE '1995-07-01' AND o_orderdate < DATE '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY 1
"""


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 shape (customer order-count distribution): orders fold
    to one row per custkey FIRST (combiner groupby — the shuffle moves
    counts, not orders), then ONE left bucket-cogroup against the
    customer keys preserves zero-order customers, and the distribution
    is a second tiny fold over at-most-|customer| rows."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    def order_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table(
            {
                "key": g["o_custkey"],
                "c": g["count_all"].cast(pa.int64()),
                "is_cust": pa.array(np.zeros(len(g), np.int8)),
            }
        )

    def cust_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["c_custkey"],
                "c": pa.array(np.zeros(len(batch), np.int64)),
                "is_cust": pa.array(np.ones(len(batch), np.int8)),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        order_partial, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        cust_partial, batch_format="pyarrow"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # sum order-count partials per key, left-attach onto the
        # customer marker rows (zero-order customers keep c_count 0),
        # and fold straight to distribution partials — the whole LEFT
        # JOIN + both GROUP BYs in one pass over the bucket
        oc = df[df["is_cust"] == 0]
        sums = oc.groupby("key", sort=False)["c"].sum()
        keys = df.loc[df["is_cust"] == 1, "key"]
        cc = keys.map(sums).fillna(0).astype(np.int64)
        dist = cc.value_counts()
        return pd.DataFrame(
            {"c_count": dist.index.to_numpy(np.int64),
             "custdist": dist.to_numpy(np.int64)}
        )

    partials = grouped_map(orders.union(cust), "key", per_bucket)
    return pre_aggregate(partials, ["c_count"],
                         {"custdist": ("custdist", "sum")})


SQL_TPCH_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1)
GROUP BY 1
"""


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 shape (promo revenue share): date-pruned lineitem read,
    part attaches via broadcast (dimension side ships once through the
    object store), and the two conditional revenue sums fold through
    per-batch partials — the driver touches exactly one row."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.joins import broadcast_join
    from kgray.util import round_half_up

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1995, 9, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1995, 10, 1)),
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = broadcast_join(line, part, on="l_partkey",
                            right_on="p_partkey", how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        promo = pc.if_else(
            pc.equal(batch["p_type"], "PROMO"), rev, pa.scalar(0.0)
        )
        return pa.table(
            {
                "promo_rev": pa.array([pc.sum(promo).as_py() or 0.0]),
                "total_rev": pa.array([pc.sum(rev).as_py() or 0.0]),
            }
        )

    sums = joined.map_batches(partial, batch_format="pyarrow")
    promo = sums.sum("promo_rev") or 0.0
    total = sums.sum("total_rev") or 1.0
    pct = float(round_half_up(np.float64(100.0 * promo / total), 4))
    return pa.table({"promo_revenue": pa.array([pct], pa.float64())})


SQL_TPCH_Q14 = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
"""


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 shape (global-customer dormancy): a scalar subquery
    (avg positive balance — two metadata-scale folds, broadcast by
    closure) gates the customer scan, then an ANTI semi-join drops
    customers holding any urgent order (bloom-prefiltered cogroup on
    the big-big path), and the survivors fold per nation.  The corpus
    has no order-free customers, so the NOT EXISTS probes the
    urgent-priority slice instead of all orders."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import semi_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    pos = cust.map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"], 0.0)).select(
            ["c_acctbal"]
        ),
        batch_format="pyarrow",
    )
    avg_bal = pos.sum("c_acctbal") / pos.count()

    rich = cust.map_batches(
        lambda b, t=avg_bal: b.filter(pc.greater(b["c_acctbal"], t)),
        batch_format="pyarrow",
    )
    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(
                pc.equal(b["o_orderpriority"], "1-URGENT")
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
    dormant = semi_join(rich, urgent, on="c_custkey", right_on="o_custkey",
                        anti=True)
    agg = pre_aggregate(
        dormant,
        ["c_nationkey"],
        {"numcust": (None, "count"), "totacctbal": ("c_acctbal", "sum")},
    )
    return _round_col(agg, "totacctbal", 2)


SQL_TPCH_Q22 = """
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT SUM(c_acctbal) / COUNT(*) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def q_events_conversion_lag(sf_dir: str):
    """First-view -> first-subsequent-purchase lag per user: every row
    of a user lands in one coarse bucket (ONE cogroup shuffle), then the
    two mask+groupby-min passes and the subtraction run vectorized per
    bucket.  Integer microsecond arithmetic end-to-end — bit-exact vs
    the SQL epoch_us oracle."""
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        fv = (
            df[df["event_type"] == "view"]
            .groupby("user_id")["ts"].min().rename("fv")
        )
        p = df[df["event_type"] == "purchase"].merge(
            fv, left_on="user_id", right_index=True
        )
        p = p[p["ts"] >= p["fv"]]
        fp = p.groupby("user_id")["ts"].min()
        lag = (
            fp.to_numpy("datetime64[us]").astype(np.int64)
            - fv.loc[fp.index].to_numpy("datetime64[us]").astype(np.int64)
        )
        return pd.DataFrame(
            {
                "user_id": fp.index.to_numpy(np.int64),
                "lag_us": lag,
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_CONVERSION_LAG = """
WITH f AS (SELECT user_id, MIN(ts) AS fv FROM events
           WHERE event_type = 'view' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS fp
      FROM events e JOIN f USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= f.fv GROUP BY 1)
SELECT p.user_id, CAST(epoch_us(fp) - epoch_us(fv) AS BIGINT) AS lag_us
FROM p JOIN f USING (user_id)
"""


def q_events_moving_avg(sf_dir: str):
    """Bounded-ROWS-frame window (AVG OVER ... ROWS 2 PRECEDING): user
    cogroup, per-bucket mergesort on (user, ts, event_id) — the tiebreak
    pins the frame deterministically — then the 3-row trailing mean via
    two in-user shifts.  Summed in FRAME ORDER (oldest first) so the
    float additions associate exactly like the window engine's running
    sum; round_half_up(4) on both sides."""
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        v = df["value"].to_numpy(np.float64)
        pos = df.groupby("user_id", sort=False).cumcount().to_numpy()
        v1 = np.empty_like(v)
        v2 = np.empty_like(v)
        v1[1:], v1[:1] = v[:-1], 0.0
        v2[2:], v2[:2] = v[:-2], 0.0
        v1[pos < 1] = 0.0
        v2[pos < 2] = 0.0
        n = np.minimum(pos + 1, 3).astype(np.float64)
        mov = ((v2 + v1) + v) / n
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "mov_avg": round_half_up(mov, 4),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_MOVING_AVG = """
SELECT event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             4) AS mov_avg
FROM events
"""


def q_bigram_diff(sf_dir: str):
    """Distributed set difference over n-grams: bigrams of the 'en'
    slice absent from the 'zh' slice, with occurrence counts.  Both
    sides explode vectorized (the shift-pair trick, no per-row python),
    the en side folds through the combiner groupby so the anti-join
    probes distinct grams (not occurrences), and semi_join's
    broadcast/bloom gate picks the shuffle-free path for the small
    distinct-gram set."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import semi_join
    from kgray.ops.text import _explode_bigrams

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def grams(lang: str):
        def apply(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["lang"], lang))
            _, _, g, _, _ = _explode_bigrams(t["text"].to_pylist())
            return pa.table({"bg": pa.array(g.tolist(), pa.string())})

        return docs.map_batches(apply, batch_format="pyarrow")

    en = pre_aggregate(grams("en"), ["bg"], {"n": (None, "count")})
    return semi_join(en, grams("zh"), on="bg", anti=True)


SQL_BIGRAM_DIFF = """
WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT lang, toks[i] || ' ' || toks[i + 1] AS bg
      FROM (SELECT lang, toks, UNNEST(range(1, len(toks))) AS i FROM t)),
zh AS (SELECT DISTINCT bg FROM g WHERE lang = 'zh')
SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM g
WHERE lang = 'en' AND bg NOT IN (SELECT bg FROM zh)
GROUP BY 1
"""


def q_quality_rules(sf_dir: str):
    """Composite Gopher-style quality gate: per-doc token count, mean
    word length and top-word fraction computed in ONE stateless pass
    (exploded-token pandas groupby per batch), each rule's fail count
    pre-summed per batch, folded by a 3-row groupby.  All three
    thresholds compare UNROUNDED integer-ratio doubles — division of
    the same integers is bit-identical in numpy and DuckDB, so the
    gate decisions match exactly."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tok_lists = [t.split(" ") for t in texts]
        n = np.fromiter(
            (len(t) for t in tok_lists), np.int64, len(tok_lists)
        )
        ch = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        flat = pd.DataFrame(
            {
                "i": np.repeat(np.arange(len(texts), dtype=np.int64), n),
                "tok": np.concatenate(
                    [np.asarray(t, object) for t in tok_lists]
                ) if tok_lists else np.array([], object),
            }
        )
        tf = flat.groupby(["i", "tok"], sort=False).size()
        maxc = (
            tf.groupby(level="i").max()
            .reindex(np.arange(len(texts)), fill_value=0)
            .to_numpy(np.int64)
        )
        mean_wl = (ch - (n - 1)) / n
        top = maxc / n
        fails = np.array(
            [
                int((n < 50).sum()),
                int(((mean_wl < 3.0) | (mean_wl > 10.0)).sum()),
                int((top > 0.2).sum()),
            ],
            np.int64,
        )
        return pa.table(
            {
                "rule": pa.array(
                    ["too_short", "word_len", "repetitive"], pa.string()
                ),
                "n_fail": pa.array(fails),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(Sum("n_fail", alias_name="n_fail"))
    )


SQL_QUALITY_RULES = """
WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
mx AS (SELECT doc_id, MAX(c) AS maxc, CAST(SUM(c) AS BIGINT) AS n
       FROM tf GROUP BY 1),
m AS (SELECT mx.n, len(d.text) AS ch, mx.maxc
      FROM documents d JOIN mx USING (doc_id))
SELECT 'too_short' AS rule,
       CAST(COUNT(*) FILTER (WHERE n < 50) AS BIGINT) AS n_fail FROM m
UNION ALL
SELECT 'word_len',
       CAST(COUNT(*) FILTER (
         WHERE (ch - (n - 1)) / CAST(n AS DOUBLE) < 3.0
            OR (ch - (n - 1)) / CAST(n AS DOUBLE) > 10.0) AS BIGINT) FROM m
UNION ALL
SELECT 'repetitive',
       CAST(COUNT(*) FILTER (
         WHERE CAST(maxc AS DOUBLE) / n > 0.2) AS BIGINT) FROM m
"""


def q_basket_pairs(sf_dir: str):
    """Market-basket pair mining (co-purchase support): all rows of an
    order land in one coarse bucket (ONE cogroup shuffle), the
    within-order pair expansion is a vectorized pandas self-merge per
    bucket (baskets average ~4 items, so the blowup is bounded by
    max-basket-size squared, not bucket size), pair partials fold
    through the combiner groupby, and the top-20 by support takes the
    global sort on the already-tiny distinct-pair table."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (
            m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size().rename("n").reset_index()
        )
        return out.rename(columns={"l_partkey_x": "p1",
                                   "l_partkey_y": "p2"})

    pairs = grouped_map(line, "l_orderkey", per_bucket)

    # pair keys are near-unique (most supports are 1), so a row-level
    # groupby.aggregate fold can't compress — the Q18 lesson.  Instead
    # cogroup on p1 (a pair lives entirely in one bucket), fold AND
    # take the local top-20 there, and globally sort only B x 20 rows.
    def fold_topk(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["p1", "p2"], sort=False)["n"].sum()
            .rename("n_orders").reset_index()
        )
        return c.sort_values(
            ["n_orders", "p1", "p2"], ascending=[False, True, True],
            kind="mergesort",
        ).head(20)

    top = grouped_map(pairs, "p1", fold_topk)
    return top.sort(
        ["n_orders", "p1", "p2"], descending=[True, False, False]
    ).limit(20)


SQL_BASKET_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
s AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM p GROUP BY 1, 2)
SELECT p1, p2, n_orders FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_orders DESC, p1, p2) AS r
  FROM s)
WHERE r <= 20
"""


def q_events_decay_sum(sf_dir: str):
    """Recency-weighted (exponential time-decay) per-user value sum —
    the freshness-scoring aggregate.  Day deltas are exact integers, the
    decay weight is memoized C-libm math.exp over the <=1000 distinct
    deltas (numpy's vectorized exp drifts one ulp off DuckDB's
    std::exp, same story as the tf-idf ln), and the weighted values
    fold through the combiner groupby."""
    import math

    from kgray.ops.agg import pre_aggregate

    anchor = np.datetime64("2024-03-01")
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def weight(batch: pa.Table) -> pa.Table:
        days = (
            anchor - batch["ts"].to_numpy().astype("datetime64[D]")
        ).astype(np.int64)
        uniq, inv = np.unique(days, return_inverse=True)
        w = np.array([math.exp(-d / 7.0) for d in uniq], np.float64)[inv]
        return pa.table(
            {
                "user_id": batch["user_id"],
                "wv": pa.array(
                    batch["value"].to_numpy() * w, pa.float64()
                ),
            }
        )

    ds = pre_aggregate(
        ev.map_batches(weight, batch_format="pyarrow"),
        ["user_id"],
        {"decay_sum": ("wv", "sum")},
    )
    return _round_col(ds, "decay_sum", 4)


SQL_EVENTS_DECAY_SUM = """
SELECT user_id,
       ROUND(SUM(value * exp(-CAST(date_diff('day', CAST(ts AS DATE),
                                   DATE '2024-03-01') AS DOUBLE) / 7.0)),
             4) AS decay_sum
FROM events GROUP BY 1
"""


def q_doclen_ntile(sf_dir: str):
    """Distributed NTILE(4) over a global (n_chars, doc_id) order — the
    equal-frequency binning window.  Global rank decomposes into a
    value-histogram base (combiner fold over distinct n_chars — a
    metadata-scale table broadcast by closure) plus an in-value tie
    rank from ONE n_chars-keyed cogroup; the NTILE uneven-bucket
    arithmetic is exact integer math on the rank."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    hist = (
        pre_aggregate(docs, ["n_chars"], {"c": (None, "count")})
        .to_pandas().sort_values("n_chars")
    )
    base = dict(
        zip(
            hist["n_chars"].to_numpy(),
            np.concatenate([[0], np.cumsum(hist["c"].to_numpy())[:-1]]),
        )
    )
    total = int(hist["c"].sum())
    k = 4
    q, rem = divmod(total, k)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"], kind="mergesort")
        tie = df.groupby("n_chars", sort=False).cumcount().to_numpy()
        r = df["n_chars"].map(base).to_numpy(np.int64) + tie
        cut = rem * (q + 1)
        tile = np.where(
            r < cut, r // max(q + 1, 1) + 1, rem + (r - cut) // max(q, 1) + 1
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "tile": tile.astype(np.int64),
            }
        )

    return grouped_map(docs, "n_chars", per_bucket)


SQL_DOCLEN_NTILE = """
SELECT doc_id,
       CAST(NTILE(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


def _copurchase_pairs(sf_dir: str):
    """Shared building block: user pairs purchasing in the same hour at
    least twice (see q_users_copurchase for the dataflow notes)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def hour_user(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], "purchase"))
        return pa.table(
            {
                "hr": pc.strftime(t["ts"], "%Y-%m-%d %H"),
                "user_id": t["user_id"],
            }
        )

    hu = pre_aggregate(
        ev.map_batches(hour_user, batch_format="pyarrow"),
        ["hr", "user_id"],
        {"c": (None, "count")},
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["hr", "user_id"]]
        m = d.merge(d, on="hr")
        m = m[m["user_id_x"] < m["user_id_y"]]
        out = (
            m.groupby(["user_id_x", "user_id_y"], sort=False)
            .size().rename("n").reset_index()
        )
        return out.rename(columns={"user_id_x": "u1", "user_id_y": "u2"})

    partial = grouped_map(hu, "hr", pairs)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["u1", "u2"], sort=False)["n"].sum()
            .rename("n_hours").reset_index()
        )
        return c[c["n_hours"] >= 2]

    return grouped_map(partial, "u1", fold)


def q_users_copurchase(sf_dir: str):
    """Co-occurrence similarity join: user pairs purchasing in the same
    hour at least twice.  Distinct (hour, user) pairs fold per batch
    first, the hour cogroup expands pairs with a vectorized self-merge
    (hour cohorts are bounded, so the quadratic stays local), and the
    near-unique pair keys fold inside a u1-keyed cogroup (the Q18
    lesson: a row-level groupby can't compress unique keys) with the
    support filter applied in-bucket."""
    return _copurchase_pairs(sf_dir)


SQL_USERS_COPURCHASE = """
WITH p AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS hr, user_id
           FROM events WHERE event_type = 'purchase')
SELECT a.user_id AS u1, b.user_id AS u2,
       CAST(COUNT(*) AS BIGINT) AS n_hours
FROM p a JOIN p b ON a.hr = b.hr AND a.user_id < b.user_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def q_orders_upsert(sf_dir: str):
    """SCD-1 upsert / compaction merge: a deterministic delta (updates
    for keys %10, inserts shifted by 1e6 for keys %17) unions with the
    base and latest-version-per-key wins inside ONE key cogroup — the
    lakehouse MERGE INTO shape.  No driver materialization: the delta
    derives per batch from the same pruned read."""
    from kgray.util import grouped_map, round_half_up

    base = _read(sf_dir, "orders",
                 ["o_orderkey", "o_totalprice", "o_orderstatus"])

    def tag_base(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "v", pa.array(np.zeros(len(batch), np.int64))
        )

    def make_delta(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy()
        price = batch["o_totalprice"].to_numpy()
        ins = k % 17 == 0
        upd = k % 10 == 0
        return pa.table(
            {
                "o_orderkey": np.concatenate([k[ins] + 1_000_000, k[upd]]),
                "o_totalprice": np.concatenate(
                    [price[ins], price[upd] + 100.0]
                ),
                "o_orderstatus": pa.array(
                    ["N"] * int(ins.sum()) + ["U"] * int(upd.sum()),
                    pa.string(),
                ),
                "v": np.ones(int(ins.sum()) + int(upd.sum()), np.int64),
            }
        )

    merged = base.map_batches(tag_base, batch_format="pyarrow").union(
        base.map_batches(make_delta, batch_format="pyarrow")
    )

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderkey", "v"], kind="mergesort")
        keep = df.groupby("o_orderkey", sort=False).tail(1)
        return pd.DataFrame(
            {
                "o_orderkey": keep["o_orderkey"].to_numpy(np.int64),
                "o_totalprice": round_half_up(
                    keep["o_totalprice"].to_numpy(np.float64), 2
                ),
                "o_orderstatus": keep["o_orderstatus"].to_numpy(),
            }
        )

    return grouped_map(merged, "o_orderkey", latest)


SQL_ORDERS_UPSERT = """
WITH delta AS (
  SELECT o_orderkey + 1000000 AS o_orderkey, o_totalprice,
         'N' AS o_orderstatus, 1 AS v
  FROM orders WHERE o_orderkey % 17 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 100, 'U', 1
  FROM orders WHERE o_orderkey % 10 = 0),
all_rows AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS v FROM orders
  UNION ALL SELECT * FROM delta)
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderstatus
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY v DESC) AS r
      FROM all_rows)
WHERE r = 1
"""


def q_events_out_of_order(sf_dir: str):
    """Late-data audit (streaming watermark health): per user, how many
    events arrived (in event_id order) with a timestamp behind the
    running max — a shifted cumulative-max window computed vectorized
    per user bucket on exact integer microseconds."""
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        g = df.assign(_ts=ts).groupby("user_id", sort=False)
        prev = g["_ts"].cummax().shift(1).to_numpy()
        first = g.cumcount().to_numpy() == 0
        late = ~first & (ts < np.where(first, ts, prev))
        out = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "l": late})
            .groupby("user_id", sort=False)["l"].sum()
        )
        return pd.DataFrame(
            {
                "user_id": out.index.to_numpy(np.int64),
                "n_late": out.to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_OUT_OF_ORDER = """
SELECT user_id, CAST(COUNT(*) FILTER (WHERE ts < mx) AS BIGINT) AS n_late
FROM (SELECT user_id, ts,
             MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS mx
      FROM events)
GROUP BY 1
"""


def q_top_supplier_per_nation(sf_dir: str):
    """Argmax-with-row-recovery (TPC-H Q2's core shape): per-group max
    folds through the combiner to a nation-sized table (broadcast by
    closure), the winning rows filter shuffle-free inside map_batches
    (float equality on UNTOUCHED values — no arithmetic, so bit-exact),
    and the min-suppkey tiebreak is a second metadata-scale fold."""
    from kgray.ops.agg import pre_aggregate

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    mx = pre_aggregate(
        sup, ["s_nationkey"], {"mx": ("s_acctbal", "max")}
    ).to_pandas()
    mx_of = dict(zip(mx["s_nationkey"].tolist(), mx["mx"].tolist()))

    def winners(batch: pa.Table) -> pa.Table:
        nat = batch["s_nationkey"].to_numpy()
        bal = batch["s_acctbal"].to_numpy()
        keep = bal == np.array([mx_of[n] for n in nat], np.float64)
        return batch.filter(pa.array(keep))

    won = sup.map_batches(winners, batch_format="pyarrow")
    tie = pre_aggregate(
        won, ["s_nationkey"], {"s_suppkey": ("s_suppkey", "min")}
    ).to_pandas()
    pick = set(tie["s_suppkey"].tolist())

    final = sup.map_batches(
        lambda b: b.filter(
            pc.is_in(b["s_suppkey"], value_set=pa.array(sorted(pick)))
        ),
        batch_format="pyarrow",
    )
    return _round_col(final, "s_acctbal", 2)


SQL_TOP_SUPPLIER_PER_NATION = """
SELECT s_suppkey, s_name, s_nationkey, ROUND(s_acctbal, 2) AS s_acctbal
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC, s_suppkey)
        AS r
      FROM supplier)
WHERE r = 1
"""


def q_user_type_profile(sf_dir: str):
    """Ordered STRING_AGG feature assembly: per user, event types joined
    by frequency rank (count desc, name asc).  Counts fold through the
    combiner on the composite key, then ONE user cogroup assembles the
    profile strings — the string join runs over the tiny per-user
    ranked lists, not the raw events."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = pre_aggregate(
        ev, ["user_id", "event_type"], {"c": (None, "count")}
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "c", "event_type"],
            ascending=[True, False, True], kind="mergesort",
        )
        prof = df.groupby("user_id", sort=False)["event_type"].agg(
            ",".join
        )
        return pd.DataFrame(
            {
                "user_id": prof.index.to_numpy(np.int64),
                "profile": prof.to_numpy(),
            }
        )

    return grouped_map(counts, "user_id", per_bucket)


SQL_USER_TYPE_PROFILE = """
WITH t AS (SELECT user_id, event_type, COUNT(*) AS c FROM events
           GROUP BY 1, 2)
SELECT user_id,
       STRING_AGG(event_type, ',' ORDER BY c DESC, event_type) AS profile
FROM t GROUP BY 1
"""


def q_events_distinct_bitmap(sf_dir: str):
    """Exact distinct count via BITMAP OR-fold (the roaring-bitmap
    mechanism): each batch packs its distinct (type, user-chunk) ids
    into 8 KB bit words, the shuffle moves only the nonzero chunks
    (bounded by id-domain/65536 per type, not by row count), the
    chunk cogroup ORs and popcounts, and a final metadata-scale fold
    sums per type.  The scale alternative to a raw COUNT DISTINCT
    shuffle when ids are dense integers."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    CHUNK_BITS = 16
    WORDS = (1 << CHUNK_BITS) >> 6

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "t": batch["event_type"].to_numpy(zero_copy_only=False),
                "u": batch["user_id"].to_numpy(),
            }
        ).drop_duplicates()
        df["chunk"] = df["u"].to_numpy() >> CHUNK_BITS
        tcs, types, bms = [], [], []
        for (t, ch), g in df.groupby(["t", "chunk"], sort=False):
            words = np.zeros(WORDS, np.uint64)
            off = (
                g["u"].to_numpy() & ((1 << CHUNK_BITS) - 1)
            ).astype(np.uint64)
            np.bitwise_or.at(
                words, (off >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (off & np.uint64(63)),
            )
            tcs.append(f"{t}:{ch}")
            types.append(t)
            bms.append(words.tobytes())
        return pa.table(
            {
                "tc": pa.array(tcs, pa.string()),
                "event_type": pa.array(types, pa.string()),
                "bm": pa.array(bms, pa.binary()),
            }
        )

    parts = ev.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out_t, out_n = [], []
        for tc, g in df.groupby("tc", sort=False):
            acc = np.zeros(WORDS, np.uint64)
            for b in g["bm"]:
                acc |= np.frombuffer(b, np.uint64)
            n = int(np.unpackbits(acc.view(np.uint8)).sum())
            out_t.append(g["event_type"].iloc[0])
            out_n.append(n)
        return pd.DataFrame(
            {
                "event_type": out_t,
                "n_users": np.array(out_n, np.int64),
            }
        )

    partial_counts = grouped_map(parts, "tc", fold)
    return pre_aggregate(
        partial_counts, ["event_type"], {"n_users": ("n_users", "sum")}
    )


SQL_EVENTS_DISTINCT_BITMAP = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


def _skyline2d(df: pd.DataFrame) -> pd.DataFrame:
    """2-D Pareto frontier (minimize p_retailprice, maximize p_size)
    with NOT-EXISTS strict-domination semantics: duplicates of a
    frontier cell all survive.  Sort by (price asc, size desc); a row
    survives iff its size equals its price-group max AND strictly
    exceeds the running max over cheaper prices."""
    if not len(df):
        return df
    df = df.sort_values(["p_retailprice", "p_size"],
                        ascending=[True, False], kind="mergesort")
    size = df["p_size"].to_numpy(np.int64)
    grp_max = df.groupby("p_retailprice", sort=False)["p_size"].transform(
        "max"
    ).to_numpy(np.int64)
    # best size among strictly-cheaper price groups: cummax of the
    # per-group maxima, shifted by one group
    gm = df.groupby("p_retailprice", sort=False)["p_size"].max()
    gcum = np.concatenate(
        [[np.iinfo(np.int64).min],
         np.maximum.accumulate(gm.to_numpy(np.int64))[:-1]]
    )
    prev_best = df["p_retailprice"].map(
        dict(zip(gm.index.to_numpy(), gcum))
    ).to_numpy(np.int64)
    keep = (size == grp_max) & (size > prev_best)
    return df[keep]


def q_pareto_parts(sf_dir: str):
    """Distributed Pareto skyline (cheapest-per-size frontier): each
    block computes its LOCAL skyline (any global frontier point is
    locally non-dominated, so local filtering is lossless), survivors
    are frontier-sized (O(log n) expected for independent dims), and
    the exact global skyline runs once over that tiny union."""
    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_retailprice", "p_size"])
    local = parts.map_batches(
        lambda b: pa.Table.from_pandas(
            _skyline2d(b.to_pandas()), preserve_index=False
        ),
        batch_format="pyarrow",
    )
    survivors = local.to_pandas()
    out = _skyline2d(survivors).sort_values("p_partkey")
    from kgray.util import round_half_up

    return pa.table(
        {
            "p_partkey": pa.array(out["p_partkey"].to_numpy(np.int64)),
            "p_retailprice": pa.array(
                round_half_up(out["p_retailprice"].to_numpy(np.float64), 2)
            ),
            "p_size": pa.array(out["p_size"].to_numpy(np.int32),
                               pa.int32()),
        }
    )


SQL_PARETO_PARTS = """
SELECT p_partkey, ROUND(p_retailprice, 2) AS p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


def q_events_adoption(sf_dir: str):
    """Expanding-distinct window (feature-adoption curve): per active
    (user, day), how many distinct event types the user has seen so
    far.  First-occurrence days and active days both reduce inside one
    user cogroup; the cumulative count attaches with a vectorized
    per-bucket merge_asof — no inequality join ships over the wire."""
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            d=df["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        )
        first = (
            df.groupby(["user_id", "event_type"], sort=False)["d"].min()
            .reset_index().sort_values(["user_id", "d"], kind="mergesort")
        )
        first["n_types"] = (
            first.groupby("user_id", sort=False).cumcount() + 1
        )
        # a user can adopt several types the same day: keep the day's max
        cum = (
            first.groupby(["user_id", "d"], sort=False)["n_types"].max()
            .reset_index()
        )
        days = (
            df[["user_id", "d"]].drop_duplicates()
            .sort_values("d", kind="mergesort")
        )
        merged = pd.merge_asof(
            days, cum.sort_values("d", kind="mergesort"),
            on="d", by="user_id", direction="backward",
        )
        return pd.DataFrame(
            {
                "user_id": merged["user_id"].to_numpy(np.int64),
                "day": merged["d"].dt.strftime("%Y-%m-%d").to_numpy(),
                "n_types": merged["n_types"].to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_ADOPTION = """
WITH f AS (SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS d
           FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT days.user_id, strftime(days.d, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_types
FROM days JOIN f ON f.user_id = days.user_id AND f.d <= days.d
GROUP BY 1, 2
"""


def q_events_attribution(sf_dir: str):
    """Last-touch attribution: each purchase credits the user's latest
    prior click WITHIN ONE DAY (the as-of cogroup + an exact integer-us
    tolerance filter), revenue then folds per attributed click hour.
    Hour-grain output is tie-insensitive: simultaneous clicks share the
    timestamp, so whichever the as-of picks, the credited hour and the
    summed value are identical."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import asof_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def side(event_type, cols):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], event_type))
            return pa.table({out: t[src] for src, out in cols})

        return ev.map_batches(f, batch_format="pyarrow")

    purchases = side("purchase", [("user_id", "user_id"), ("ts", "ts"),
                                  ("value", "value")])
    clicks = side("click", [("user_id", "user_id"), ("ts", "cts")])
    joined = asof_join(purchases, clicks, key="user_id", time_col="ts",
                       right_time_col="cts")

    def window(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["cts"].notna()]
        gap = (
            df["ts"].to_numpy("datetime64[us]").astype(np.int64)
            - df["cts"].to_numpy("datetime64[us]").astype(np.int64)
        )
        df = df[gap <= 86_400_000_000]
        return pa.table(
            {
                "hour": pa.array(
                    df["cts"].dt.strftime("%Y-%m-%d %H").to_numpy(),
                    pa.string(),
                ),
                "value": pa.array(df["value"].to_numpy(np.float64)),
            }
        )

    agg = pre_aggregate(
        joined.map_batches(window, batch_format="pyarrow"),
        ["hour"],
        {"n_purchases": (None, "count"),
         "attributed_value": ("value", "sum")},
    )
    return _round_col(agg, "attributed_value", 4)


SQL_EVENTS_ATTRIBUTION = """
WITH cl AS (SELECT user_id, ts AS cts FROM events
            WHERE event_type = 'click'),
pu AS (SELECT user_id, ts AS pts, value FROM events
       WHERE event_type = 'purchase'),
m AS (SELECT pu.value, cl.cts
      FROM pu ASOF JOIN cl
        ON pu.user_id = cl.user_id AND pu.pts >= cl.cts
      WHERE epoch_us(pu.pts) - epoch_us(cl.cts) <= 86400000000)
SELECT strftime(cts, '%Y-%m-%d %H') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(value), 4) AS attributed_value
FROM m GROUP BY 1
"""


def q_embed_drift(sf_dir: str):
    """Vector-window drift: cosine similarity of each embedding to its
    predecessor (vec_id - 1) — the sequence-drift monitor for embedding
    pipelines.  The predecessor attaches via ONE bucket cogroup on a
    shifted key (vec_id == prev + 1); the cosine is a float64 row-wise
    kernel over the two list columns, rounded 4 like the knn oracles."""
    from kgray.util import grouped_map, round_half_up

    W = 4096  # id-range block: a pair (i-1, i) always shares a block

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def tag(batch: pa.Table) -> pa.Table:
        # Arrow's in-bucket join rejects list payload columns, so the
        # predecessor meets its successor by RANGE-bucketing vec_id//W
        # and duplicating each block's first id (vid % W == 0) into the
        # previous block — every consecutive pair co-locates exactly once
        vid = batch["vec_id"].to_numpy()
        extra = np.nonzero(vid % W == 0)[0]
        idx = np.concatenate([np.arange(len(vid)), extra])
        out = batch.take(pa.array(idx, pa.int64()))
        blk = np.concatenate([vid // W, vid[extra] // W - 1])
        return out.append_column("blk", pa.array(blk, pa.int64()))

    tagged = emb.map_batches(tag, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["blk", "vec_id"], kind="mergesort")
        vid = df["vec_id"].to_numpy(np.int64)
        blk = df["blk"].to_numpy(np.int64)
        if not len(df):
            return pd.DataFrame({"vec_id": vid, "cos": np.array([])})
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        pair = np.zeros(len(df), bool)
        pair[1:] = (blk[1:] == blk[:-1]) & (vid[1:] == vid[:-1] + 1)
        a, b = m[pair], m[np.roll(pair, -1)]
        num = (a * b).sum(axis=1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        c = num / np.where(den == 0, 1, den)
        return pd.DataFrame(
            {"vec_id": vid[pair], "cos": round_half_up(c, 4)}
        )

    return grouped_map(tagged, "blk", per_bucket)


SQL_EMBED_DRIFT = """
SELECT a.vec_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])),
             4) AS cos
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id - 1
"""


def q_part_name_fuzzy_pairs(sf_dir: str):
    """Blocked fuzzy self-join (entity-resolution shape): the corpus
    first collapses to its DISTINCT name vocabulary (combiner fold —
    the scale step: candidate generation runs on names, never rows),
    blocks on the trailing token, and the in-block pair expansion is
    filtered by the VECTORIZED Levenshtein DP (ops/fuzzy.py) at
    distance <= 2.  The blocking key is part of the op's contract and
    appears in the oracle too."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.fuzzy import levenshtein_batch
    from kgray.util import grouped_map

    names = pre_aggregate(
        _read(sf_dir, "part", ["p_name"]), ["p_name"],
        {"c": (None, "count")},
    )

    def add_block(batch: pa.Table) -> pa.Table:
        nm = batch["p_name"].to_pylist()
        return pa.table(
            {
                "p_name": batch["p_name"],
                "blk": pa.array(
                    [s.rsplit(" ", 1)[-1] for s in nm], pa.string()
                ),
            }
        )

    blocked = names.map_batches(add_block, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["blk", "p_name"]]
        m = d.merge(d, on="blk")
        m = m[m["p_name_x"] < m["p_name_y"]]
        dist = levenshtein_batch(
            m["p_name_x"].tolist(), m["p_name_y"].tolist()
        )
        keep = dist <= 2
        return pd.DataFrame(
            {
                "name_a": m["p_name_x"].to_numpy()[keep],
                "name_b": m["p_name_y"].to_numpy()[keep],
                "dist": dist[keep],
            }
        )

    return grouped_map(blocked, "blk", pairs)


SQL_PART_NAME_FUZZY_PAIRS = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM n a JOIN n b
  ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


def q_orders_weekly_growth(sf_dir: str):
    """Aggregate-then-window: weekly revenue folds through the combiner
    (the only row-scale pass), then the week-over-week percent change
    runs as a LAG window on the metadata-scale weekly series."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def week(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "wk": pc.strftime(batch["o_orderdate"], "%Y-%W"),
                "o_totalprice": batch["o_totalprice"],
            }
        )

    weekly = pre_aggregate(
        orders.map_batches(week, batch_format="pyarrow"),
        ["wk"], {"revenue": ("o_totalprice", "sum")},
    ).to_pandas().sort_values("wk").reset_index(drop=True)
    rev = weekly["revenue"].to_numpy(np.float64)
    growth = np.full(len(rev), np.nan)
    if len(rev) > 1:
        growth[1:] = 100.0 * (rev[1:] - rev[:-1]) / rev[:-1]
    return pa.table(
        {
            "wk": pa.array(weekly["wk"].to_numpy(), pa.string()),
            "revenue": pa.array(round_half_up(rev, 2), pa.float64()),
            "growth_pct": pa.array(round_half_up(growth, 4),
                                   pa.float64()),
        }
    )


SQL_ORDERS_WEEKLY_GROWTH = """
WITH w AS (SELECT strftime(o_orderdate, '%Y-%W') AS wk,
                  SUM(o_totalprice) AS rev
           FROM orders GROUP BY 1)
SELECT wk, ROUND(rev, 2) AS revenue,
       ROUND(100.0 * (rev - LAG(rev) OVER (ORDER BY wk))
             / LAG(rev) OVER (ORDER BY wk), 4) AS growth_pct
FROM w
"""


def q_join_stats(sf_dir: str):
    """Join-cardinality audit (the optimizer-statistics op): distinct
    keys per side, actual join cardinality, and the independence
    estimate |L|*|R|/max(ndv) — all exact integers from combiner folds,
    the actual cardinality from per-key count partials multiplied in a
    tiny cogroup (orders x customer on custkey)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join

    o = pre_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]), ["o_custkey"],
        {"n_o": (None, "count")},
    )
    c = pre_aggregate(
        _read(sf_dir, "customer", ["c_custkey"]), ["c_custkey"],
        {"n_c": (None, "count")},
    )
    # ONE full-outer cogroup yields every statistic in a single pass:
    # per-key row counts multiply for the actual cardinality, null
    # sides mark keys private to one input, sums recover row counts
    j = bucket_join(o, c, on="o_custkey", right_on="c_custkey",
                    how="outer")

    def fold(batch: pa.Table) -> pa.Table:
        no = pc.fill_null(batch["n_o"], 0)
        nc = pc.fill_null(batch["n_c"], 0)

        def s(col):
            return pa.array([pc.sum(col).as_py() or 0], pa.int64())

        return pa.table(
            {
                "rows_actual": s(pc.multiply(no, nc)),
                "n_left": s(no),
                "n_right": s(nc),
                "ndv_left": pa.array(
                    [pc.sum(pc.cast(pc.greater(no, 0), pa.int64()))
                     .as_py() or 0], pa.int64()
                ),
                "ndv_right": pa.array(
                    [pc.sum(pc.cast(pc.greater(nc, 0), pa.int64()))
                     .as_py() or 0], pa.int64()
                ),
            }
        )

    parts = j.map_batches(fold, batch_format="pyarrow").to_pandas()
    rows_actual = int(parts["rows_actual"].sum())
    n_left = int(parts["n_left"].sum())
    n_right = int(parts["n_right"].sum())
    ndv_left = int(parts["ndv_left"].sum())
    ndv_right = int(parts["ndv_right"].sum())
    est = (n_left * n_right) // max(ndv_left, ndv_right)
    return pa.table(
        {
            "n_left": pa.array([n_left], pa.int64()),
            "n_right": pa.array([n_right], pa.int64()),
            "ndv_left": pa.array([ndv_left], pa.int64()),
            "ndv_right": pa.array([ndv_right], pa.int64()),
            "rows_actual": pa.array([rows_actual], pa.int64()),
            "rows_est": pa.array([est], pa.int64()),
        }
    )


SQL_JOIN_STATS = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_left,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_right,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
         AS ndv_left,
       (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer)
         AS ndv_right,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM orders JOIN customer ON o_custkey = c_custkey)
         AS rows_actual,
       CAST((SELECT COUNT(*) FROM orders)
            * (SELECT COUNT(*) FROM customer)
            // GREATEST(
                (SELECT COUNT(DISTINCT o_custkey) FROM orders),
                (SELECT COUNT(DISTINCT c_custkey) FROM customer))
         AS BIGINT) AS rows_est
"""


def q_hard_negatives(sf_dir: str):
    """Filtered ANN (hard-negative mining for contrastive training):
    for each query vector (vec_id < 5), the top-3 most-similar
    embeddings with a DIFFERENT label.  The 5-row query matrix ships
    once by closure; every batch computes float64 cosines against all
    queries, masks same-label rows, and emits its LOCAL top-3 per
    query; the global fold sorts only blocks x 15 candidate rows."""
    from kgray.ops.similarity import _matrix
    from kgray.util import grouped_map, round_half_up

    import pyarrow.dataset as pds
    import ray.data as rd

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qdf = rd.read_parquet(  # prune at the read: only the 5 query rows
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pds.field("vec_id") < 5,
    ).to_pandas().sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    qids = qdf["vec_id"].to_numpy(np.int64)
    qlabels = qdf["label"].to_numpy()

    def local_topk(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, "embedding")
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0, 1, norms)
        sims = m @ qm.T  # (n, 5)
        labels = batch["label"].to_numpy()
        vids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            mask = (labels != qlabels[j]) & (vids != qids[j])
            idx = np.nonzero(mask)[0]
            s = sims[idx, j]
            # deterministic top-3: sim desc, vec_id asc
            order = np.lexsort((vids[idx], -s))[:3]
            take = idx[order]
            out_q.append(np.full(len(take), qids[j], np.int64))
            out_v.append(vids[take])
            out_s.append(s[order])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "sim": np.concatenate(out_s),
            }
        )

    cand = emb.map_batches(local_topk, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "sim", "vec_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        top = df.groupby("query_id", sort=False).head(3)
        return pd.DataFrame(
            {
                "query_id": top["query_id"].to_numpy(np.int64),
                "vec_id": top["vec_id"].to_numpy(np.int64),
                "sim": round_half_up(top["sim"].to_numpy(np.float64), 4),
            }
        )

    return grouped_map(cand, "query_id", final)


SQL_HARD_NEGATIVES = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS sim
      FROM embeddings e JOIN q
        ON e.label <> q.ql AND e.vec_id <> q.query_id)
SELECT query_id, vec_id, ROUND(sim, 4) AS sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS r
      FROM s)
WHERE r <= 3
"""


def q_users_bfs(sf_dir: str):
    """Single-source shortest hops <= 3 over the co-purchase graph via
    the shared :func:`kgray.ops.graph.bfs_hops` kernel (frontier BFS
    distributed rounds + the in-process small-side gate; see
    graph_bfs_hops for the paths-agree pins).  The seed is the smallest
    node with an edge — u1 < u2 by pair construction, so min(u1) is the
    global min — deterministic on both engines."""
    from kgray.ops.graph import bfs_hops

    pairs = _copurchase_pairs(sf_dir).materialize()
    if pairs.count() == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    seed = int(pairs.min("u1"))
    return bfs_hops(pairs, seeds=[seed], max_hops=3,
                    u_col="u1", v_col="u2")


SQL_USERS_BFS = """
WITH RECURSIVE p AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS hr, user_id
           FROM events WHERE event_type = 'purchase'),
pr AS (SELECT a.user_id AS u1, b.user_id AS u2
       FROM p a JOIN p b ON a.hr = b.hr AND a.user_id < b.user_id
       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS (SELECT u1 AS a, u2 AS b FROM pr
      UNION ALL SELECT u2, u1 FROM pr),
seed AS (SELECT MIN(a) AS s FROM e),
bfs AS (
  SELECT s AS node, 0 AS d FROM seed
  UNION ALL
  SELECT e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.node
  WHERE bfs.d < 3
)
SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM bfs GROUP BY 1
"""


def q_events_drawdown(sf_dir: str):
    """Running-max drawdown per user (the monitoring/finance window):
    min(value - running max) over (ts, event_id) order.  One user
    cogroup; the running max is a per-user groupby cummax and the
    output is exact float subtraction + MIN — no arithmetic that could
    drift, so no rounding is needed for oracle parity."""
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        run = df.groupby("user_id", sort=False)["value"].cummax()
        dd = df["value"].to_numpy(np.float64) - run.to_numpy(np.float64)
        out = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "dd": dd})
            .groupby("user_id", sort=False)["dd"].min()
        )
        return pd.DataFrame(
            {
                "user_id": out.index.to_numpy(np.int64),
                "max_drawdown": out.to_numpy(np.float64),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_DRAWDOWN = """
SELECT user_id, MIN(value - run_max) AS max_drawdown
FROM (SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_max
      FROM events)
GROUP BY 1
"""


def q_events_trigrams(sf_dir: str):
    """Behavioral path mining: top-5 three-step event-type sequences
    (per-user (ts, event_id) order), ties broken lexicographically.
    The double shift-pairing runs vectorized inside ONE user cogroup,
    trigram partials fold through the combiner (the trigram alphabet is
    tiny — 125 keys — so groupby.aggregate compresses well here), and
    the top-5 sorts a vocabulary-sized table."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        if len(df) < 3:
            return pd.DataFrame({"path": np.array([], object),
                                 "n": np.array([], np.int64)})
        same = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        path = pd.Series(et[:-2][same]).str.cat(
            [pd.Series(et[1:-1][same]), pd.Series(et[2:][same])], sep=">"
        )
        out = path.value_counts()
        return pd.DataFrame(
            {"path": out.index.to_numpy(),
             "n": out.to_numpy(np.int64)}
        )

    partial = grouped_map(ev, "user_id", per_bucket)
    folded = pre_aggregate(partial, ["path"], {"n_paths": ("n", "sum")})
    return folded.sort(
        ["n_paths", "path"], descending=[True, False]
    ).limit(5)


SQL_EVENTS_TRIGRAMS = """
WITH s AS (SELECT user_id, event_type,
                  LAG(event_type, 1) OVER w AS p1,
                  LAG(event_type, 2) OVER w AS p2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT p2 || '>' || p1 || '>' || event_type AS path,
             CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM s WHERE p2 IS NOT NULL GROUP BY 1)
SELECT path, n_paths FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_paths DESC, path) AS r FROM t)
WHERE r <= 5
"""


def q_events_seasonal_anomaly(sf_dir: str):
    """Seasonal-baseline anomaly detection: per (date, hour-of-day)
    event counts compared against that hour-of-day's cross-date mean
    and std; emit cells beyond 2 sigma.  Counts fold through the
    combiner; the 24-row baseline attaches by closure (aggregate ->
    join-back-to-aggregate at a coarser grain, no second shuffle).
    The z math follows the zscore-outliers formula for bit parity."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["ts"])

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(batch["ts"], "%Y-%m-%d"),
                "hod": pc.strftime(batch["ts"], "%H"),
            }
        )

    cells = pre_aggregate(
        ev.map_batches(keyed, batch_format="pyarrow"),
        ["day", "hod"], {"n": (None, "count")},
    ).materialize()

    base = cells.to_pandas()  # (days x 24) rows: metadata-scale
    g = base.groupby("hod")["n"]
    stats = pd.DataFrame(
        {"k": g.size(), "sv": g.sum(), "sq": (base["n"] ** 2).groupby(
            base["hod"]).sum()}
    )
    mu = stats["sv"] / stats["k"]
    sd = np.sqrt(np.maximum(stats["sq"] / stats["k"] - mu * mu, 0.0))
    mu_of, sd_of = mu.to_dict(), sd.to_dict()

    def flag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["hod"].map(mu_of).to_numpy(np.float64)
        s = df["hod"].map(sd_of).to_numpy(np.float64)
        z = (df["n"].to_numpy(np.float64) - m) / np.where(s == 0, 1, s)
        keep = np.abs(z) > 2.0
        return pa.table(
            {
                "day": pa.array(df["day"].to_numpy()[keep], pa.string()),
                "hod": pa.array(df["hod"].to_numpy()[keep], pa.string()),
                "z": pa.array(round_half_up(z[keep], 4), pa.float64()),
            }
        )

    return cells.map_batches(flag, batch_format="pyarrow")


SQL_EVENTS_SEASONAL_ANOMALY = """
WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  strftime(ts, '%H') AS hod,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
b AS (SELECT hod, CAST(COUNT(*) AS DOUBLE) AS k,
             CAST(SUM(n) AS DOUBLE) AS sv,
             CAST(SUM(n * n) AS DOUBLE) AS sq
      FROM c GROUP BY 1),
t AS (SELECT hod, sv / k AS mu,
             sqrt(GREATEST(sq / k - (sv / k) * (sv / k), 0)) AS sd
      FROM b)
SELECT day, c.hod,
       ROUND((n - mu) / CASE WHEN sd = 0 THEN 1 ELSE sd END, 4) AS z
FROM c JOIN t ON c.hod = t.hod
WHERE abs((n - mu) / CASE WHEN sd = 0 THEN 1 ELSE sd END) > 2.0
"""


def q_events_rfm(sf_dir: str):
    """RFM customer segmentation (the classic marketing pipeline): ONE
    combiner fold to per-user (recency, frequency, monetary), three
    exact rank-quantile cuts over the user-scale table (distinct-value
    histogram folds — never row-scale on the driver), then a stateless
    quartile-code assignment and a tiny per-code fold.  Quartile digit
    = 1 + (> p25) + (> p50) + (> p75): deterministic under ties, same
    closed form in the oracle."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.sample import rank_quantiles

    anchor_day = np.datetime64("2024-03-01").astype("datetime64[D]")
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def keyed(batch: pa.Table) -> pa.Table:
        day = batch["ts"].to_numpy().astype("datetime64[D]")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "dayidx": pa.array(
                    day.astype(np.int64), pa.int64()
                ),
                "value": batch["value"],
            }
        )

    users = pre_aggregate(
        ev.map_batches(keyed, batch_format="pyarrow"),
        ["user_id"],
        {"last_day": ("dayidx", "max"), "freq": (None, "count"),
         "monetary": ("value", "sum")},
    ).map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "recency": pc.subtract(
                    pa.scalar(int(anchor_day.astype(np.int64))),
                    b["last_day"],
                ),
                "freq": b["freq"],
                "monetary": b["monetary"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    cuts = {
        dim: rank_quantiles(users, dim, [0.25, 0.50, 0.75])["value"]
        .to_pylist()
        for dim in ("recency", "freq", "monetary")
    }

    def code(batch: pa.Table) -> pa.Table:
        def digit(col, qs):
            v = batch[col].to_numpy(zero_copy_only=False)
            return (
                1 + (v > qs[0]).astype(np.int64)
                + (v > qs[1]).astype(np.int64)
                + (v > qs[2]).astype(np.int64)
            )

        rfm = (
            digit("recency", cuts["recency"]) * 100
            + digit("freq", cuts["freq"]) * 10
            + digit("monetary", cuts["monetary"])
        )
        return pa.table({"rfm_code": pa.array(rfm, pa.int64())})

    coded = users.map_batches(code, batch_format="pyarrow")
    return pre_aggregate(coded, ["rfm_code"],
                         {"n_users": (None, "count")})


SQL_EVENTS_RFM = """
WITH u AS (SELECT user_id,
             CAST(date_diff('day', MAX(CAST(ts AS DATE)),
                            DATE '2024-03-01') AS BIGINT) AS recency,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(value) AS monetary
           FROM events GROUP BY 1),
q AS (SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY recency) AS r25,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY recency) AS r50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY recency) AS r75,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY freq) AS f25,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY freq) AS f50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY freq) AS f75,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m25,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m75
      FROM u)
SELECT CAST((1 + (recency > r25)::INT + (recency > r50)::INT
               + (recency > r75)::INT) * 100
          + (1 + (freq > f25)::INT + (freq > f50)::INT
               + (freq > f75)::INT) * 10
          + (1 + (monetary > m25)::INT + (monetary > m50)::INT
               + (monetary > m75)::INT) AS BIGINT) AS rfm_code,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u, q GROUP BY 1
"""


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority top-10): both fact reads are
    date-pruned at the parquet scan, the BUILDING customer-key set
    gates orders via ``semi_join`` (auto broadcast/bloom), lineitem
    and the surviving orders bucket-join on orderkey, and — because
    the group key (orderkey) is near-unique, so a combiner cannot
    compress the shuffle (the Q18 lesson) — the revenue fold runs
    INSIDE the same coarse orderkey cogroup with an in-bucket top-10
    (lossless for a global top-10); the driver folds buckets x 10
    rows.  Ranking uses the ROUNDED revenue with orderkey tiebreak so
    both engines order identically under float-sum ulp drift."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.joins import bucket_join, semi_join
    from kgray.util import grouped_map, round_half_up

    cutoff = datetime.datetime(1997, 1, 1)
    building = _read(sf_dir, "customer",
                     ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pds.field("o_orderdate") < cutoff,
    )
    orders = semi_join(orders, building, on="o_custkey",
                       right_on="c_custkey")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_shipdate") > cutoff,
    )
    joined = bucket_join(
        line,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        d = d.assign(rev=d["l_extendedprice"] * (1 - d["l_discount"]))
        g = (
            d.groupby("l_orderkey", sort=False)
            .agg(revenue=("rev", "sum"), o_orderdate=("o_orderdate", "first"))
            .reset_index()
        )
        g["revenue"] = round_half_up(g["revenue"].to_numpy(np.float64), 2)
        g = g.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(10)
        g["o_orderdate"] = g["o_orderdate"].dt.strftime("%Y-%m-%d")
        return g[["l_orderkey", "revenue", "o_orderdate"]]

    cand = grouped_map(joined, "l_orderkey", fold).to_pandas()
    top = cand.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True], kind="mergesort",
    ).head(10)
    return pa.Table.from_pandas(top, preserve_index=False)


SQL_TPCH_Q3 = """
WITH g AS (
  SELECT l_orderkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
  FROM customer, orders, lineitem
  WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
    AND l_orderkey = o_orderkey
    AND o_orderdate < DATE '1997-01-01' AND l_shipdate > DATE '1997-01-01'
  GROUP BY 1, 3)
SELECT l_orderkey, revenue, o_orderdate FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY revenue DESC, o_orderdate, l_orderkey) AS r FROM g)
WHERE r <= 10
"""


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape (volume shipping between two nations): BOTH fact
    sides are nation-pre-filtered via broadcast dimension maps BEFORE
    the big-big orderkey shuffle, so the all-to-all moves only the two
    nations' rows (~2/|nations| of the data); the (supp, cust) pair
    gate and the year extraction are vectorized Arrow kernels, and the
    final (nation, nation, year) fold compresses through the combiner."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, bucket_join

    n1, n2 = 1, 2
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1995, 1, 1))
        & (pds.field("l_shipdate") <= datetime.datetime(1996, 12, 31)),
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            b["s_nationkey"], value_set=pa.array([n1, n2], pa.int32())
        )),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey", how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            b["c_nationkey"], value_set=pa.array([n1, n2], pa.int32())
        )),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        line,
        orders.select_columns(["o_orderkey", "c_nationkey"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].tolist(), nat["n_name"].tolist()))

    def shape(batch: pa.Table) -> pa.Table:
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((sn == n1) & (cn == n2)) | ((sn == n2) & (cn == n1))
        b = batch.filter(pa.array(keep))
        rev = pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"]),
        )
        sn, cn = sn[keep], cn[keep]
        return pa.table(
            {
                "supp_nation": pa.array(
                    [name_of[int(k)] for k in sn], pa.string()
                ),
                "cust_nation": pa.array(
                    [name_of[int(k)] for k in cn], pa.string()
                ),
                "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "rev": rev,
            }
        )

    shaped = joined.map_batches(shape, batch_format="pyarrow")
    ds = pre_aggregate(
        shaped, ["supp_nation", "cust_nation", "l_year"],
        {"revenue": ("rev", "sum")},
    )
    return _round_col(ds, "revenue", 2)


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_nationkey = 1 AND n2.n_nationkey = 2)
          OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
GROUP BY 1, 2, 3
"""


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 shape (returned-item top customers): the revenue fold
    runs BELOW the dimension joins — lineitem('R') bucket-joins the
    date-pruned orders on orderkey, folds to one row per custkey
    (combiner-compressed), and only that bounded aggregate joins the
    customer/nation dims (the tiny side broadcasts INTO the customer
    stream, so no row-scale data ever re-shuffles).  Top-20 ranks on
    the ROUNDED revenue with custkey tiebreak (ulp-safe, as Q3)."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, bucket_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pds.field("o_orderdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("o_orderdate") < datetime.datetime(1996, 4, 1)),
    )
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == "R",
    )
    joined = bucket_join(
        line, orders, on="l_orderkey", right_on="o_orderkey", how="inner"
    )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "rev": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    per_cust = pre_aggregate(
        joined.map_batches(rev, batch_format="pyarrow"),
        ["o_custkey"], {"revenue": ("rev", "sum")},
    )
    per_cust = _round_col(per_cust, "revenue", 2)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    named = broadcast_join(cust, per_cust, on="c_custkey",
                           right_on="o_custkey", how="inner")
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    named = broadcast_join(named, nat, on="c_nationkey",
                           right_on="n_nationkey", how="inner")
    named = _round_col(named, "c_acctbal", 2)
    return (
        named.select_columns(
            ["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]
        )
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
    )


SQL_TPCH_Q10 = """
WITH g AS (
  SELECT c_custkey, c_name,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         ROUND(c_acctbal, 2) AS c_acctbal, n_name
  FROM customer, orders, lineitem, nation
  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1996-04-01'
    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
  GROUP BY 1, 2, 4, 5)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS r
  FROM g)
WHERE r <= 20
"""


def q_tpch_q17(sf_dir: str, brand: str = "Brand#13"):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-part scalar subquery (0.2 * AVG(l_quantity) per partkey)
    collapses into ONE partkey cogroup — each bucket computes the avg
    and applies the gate in the same pass, so the brand-pruned slice
    shuffles exactly once and nothing is re-read.  l_quantity is
    integer-valued, so sum/count (hence the avg and the strict-less
    gate) are bit-exact in both engines."""
    from kgray.ops.joins import semi_join
    from kgray.util import grouped_map, round_half_up

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_brand"], brand)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]),
        part, on="l_partkey", right_on="p_partkey",
    )

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("l_partkey", sort=False)["l_quantity"]
        thr = 0.2 * g.transform("sum") / g.transform("size")
        kept = d.loc[d["l_quantity"] < thr, "l_extendedprice"]
        return pd.DataFrame({"s": [float(kept.sum())]})

    parts = grouped_map(line, "l_partkey", fold)
    total = parts.sum("s") or 0.0
    val = float(round_half_up(np.float64(total / 7.0), 2))
    return pa.table({"avg_yearly": pa.array([val], pa.float64())})


SQL_TPCH_Q17 = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 shape (disjunctive predicate join): the part dim is
    pre-pruned to the brands/sizes any disjunct can accept and ships
    once as a broadcast map; each lineitem batch evaluates the whole
    OR-of-ANDs as vectorized Arrow/numpy masks (no row loop, no
    per-disjunct re-join); revenue folds through per-batch partials to
    a single driver row."""
    from kgray.ops.joins import broadcast_join
    from kgray.util import round_half_up

    DISJUNCTS = [  # (brand, max_size, qty_lo, qty_hi)
        ("Brand#12", 10, 1.0, 11.0),
        ("Brand#23", 20, 10.0, 20.0),
        ("Brand#34", 30, 20.0, 30.0),
    ]
    brands = pa.array([d[0] for d in DISJUNCTS])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                 ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_in(b["p_brand"], value_set=brands),
                pc.and_(pc.greater_equal(b["p_size"], 1),
                        pc.less_equal(b["p_size"], 30)),
            )
        ),
        batch_format="pyarrow",
    )
    line = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(line, part, on="l_partkey",
                            right_on="p_partkey", how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        brand = batch["p_brand"].to_numpy(zero_copy_only=False)
        size = batch["p_size"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(brand), bool)
        for b, mx, lo, hi in DISJUNCTS:
            keep |= (brand == b) & (size <= mx) & (qty >= lo) & (qty <= hi)
        t = batch.filter(pa.array(keep))
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]),
        )
        return pa.table({"s": pa.array([pc.sum(rev).as_py() or 0.0])})

    total = joined.map_batches(partial, batch_format="pyarrow").sum("s") or 0.0
    val = float(round_half_up(np.float64(total), 2))
    return pa.table({"revenue": pa.array([val], pa.float64())})


SQL_TPCH_Q19 = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this corpus: a line is LATE when l_shipdate > o_orderdate + 90
    days (no commit/receipt dates here).  The EXISTS / NOT EXISTS pair
    of lineitem self-joins collapses into ONE orderkey cogroup — each
    bucket computes, per order, the distinct-supplier and
    late-supplier sets and keeps late lines of the sole late supplier
    in multi-supplier orders — so the self-join never materializes.
    Per-supplier counts partial-fold in-bucket; names attach via the
    broadcast supplier dim (cf. reference join staging,
    classification/data_prepare.py)."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, bucket_join
    from kgray.util import grouped_map

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        filter=pds.field("o_orderstatus") == "F",
    )
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = bucket_join(line, orders, on="l_orderkey",
                         right_on="o_orderkey", how="inner")

    lag = datetime.timedelta(days=90)

    def mark(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        odate = batch["o_orderdate"].to_numpy()
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "is_late": pa.array(ship > odate + np.timedelta64(lag)),
            }
        )

    marked = joined.map_batches(mark, batch_format="pyarrow")

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        nsupp = d.groupby("l_orderkey", sort=False)["l_suppkey"].nunique()
        late = d[d["is_late"]]
        lsupp = late.groupby("l_orderkey", sort=False)["l_suppkey"].nunique()
        sole = lsupp[lsupp == 1].index
        multi = nsupp[nsupp > 1].index
        ok = sole.intersection(multi)
        kept = late[late["l_orderkey"].isin(ok)]
        return (
            kept.groupby("l_suppkey", sort=False).size()
            .reset_index(name="w")
        )

    waits = grouped_map(marked, "l_orderkey", fold)
    per_supp = pre_aggregate(waits, ["l_suppkey"], {"numwait": ("w", "sum")})
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = broadcast_join(per_supp, sup, on="l_suppkey",
                           right_on="s_suppkey", how="inner")
    return named.select_columns(["s_name", "numwait"])


SQL_TPCH_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM late l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY 1
"""


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 shape (national market share): both fact sides are
    gated BEFORE the single big-big orderkey shuffle — lineitem by the
    PROMO-part semi-join plus the broadcast supplier-nation map,
    orders by the broadcast customer map and the ASIA nation-set
    filter — then the conditional (share vs total) volume sums fold
    per year through the combiner and the ratio is one driver-side
    vectorized divide."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, bucket_join, semi_join
    from kgray.util import round_half_up

    SHARE_NATION = 3

    promo = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_type"], "PROMO")).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"]),
        promo, on="l_partkey", right_on="p_partkey",
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner")

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_regs = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    asia_keys = pa.array(
        sorted(nat.loc[nat["n_regionkey"].isin(asia_regs),
                       "n_nationkey"].tolist())
    )
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey", how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            pc.cast(b["c_nationkey"], pa.int64()), value_set=asia_keys
        )),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        line.select_columns(["l_orderkey", "s_nationkey",
                             "l_extendedprice", "l_discount"]),
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey", right_on="o_orderkey", how="inner",
    )

    def shape(batch: pa.Table) -> pa.Table:
        vol = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        share = pc.if_else(
            pc.equal(pc.cast(batch["s_nationkey"], pa.int64()),
                     pa.scalar(SHARE_NATION, pa.int64())),
            vol, pa.scalar(0.0),
        )
        return pa.table(
            {
                "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
                "vol": vol,
                "share": share,
            }
        )

    sums = pre_aggregate(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["o_year"], {"share": ("share", "sum"), "vol": ("vol", "sum")},
    ).to_pandas()  # one row per year: metadata-scale
    return pa.table(
        {
            "o_year": pa.array(sums["o_year"].to_numpy(np.int64)),
            "mkt_share": pa.array(
                round_half_up(
                    sums["share"].to_numpy(np.float64)
                    / sums["vol"].to_numpy(np.float64),
                    4,
                ),
                pa.float64(),
            ),
        }
    )


SQL_TPCH_Q8 = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 3 THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             s_nationkey AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND p_type = 'PROMO')
GROUP BY 1
"""


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 shape (top supplier): quarter revenue folds per
    suppkey through the combiner, is ROUNDED before the max gate (so
    the scalar comparison is ulp-safe in both engines), the global max
    is a Dataset aggregate (no driver materialization of the fold),
    and only the winner row(s) join the broadcast supplier names."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join
    from kgray.util import rename_cols

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1996, 4, 1)),
    )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_suppkey": batch["l_suppkey"],
                "rev": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    per_supp = pre_aggregate(
        line.map_batches(rev, batch_format="pyarrow"),
        ["l_suppkey"], {"total_revenue": ("rev", "sum")},
    )
    per_supp = _round_col(per_supp, "total_revenue", 2).materialize()
    best = per_supp.max("total_revenue")
    winners = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b["total_revenue"], best)),
        batch_format="pyarrow",
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = broadcast_join(winners, sup, on="l_suppkey",
                           right_on="s_suppkey", how="inner")
    return rename_cols(
        named.select_columns(["l_suppkey", "s_name", "total_revenue"]),
        {"l_suppkey": "s_suppkey"},
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT l_suppkey AS s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_events_session_overlap(sf_dir: str, gap_s: int = 1800,
                             spike_factor: float = 1.2):
    """Interval-overlap join: per-user session intervals [min ts, max
    ts] (gap-based, built in one user cogroup) against global SPIKE
    hours (hourly counts > factor x the mean hourly count — a
    metadata-scale interval set by construction: <= hours-in-range
    rows at any data size).  The spike hour-starts broadcast as one
    sorted array and each session counts its overlaps with two
    searchsorted probes — no row loop, no second shuffle; per-user
    totals fold through the combiner."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    hours = pre_aggregate(
        ev.map_batches(
            lambda b: pa.table(
                {"h": pc.floor_temporal(b["ts"], unit="hour")}
            ),
            batch_format="pyarrow",
        ),
        ["h"], {"c": (None, "count")},
    ).to_pandas()
    thr = spike_factor * hours["c"].sum() / len(hours)
    spikes = np.sort(
        hours.loc[hours["c"] > thr, "h"].to_numpy().astype("datetime64[us]")
    )
    one_h = np.timedelta64(3600, "s")

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new = prev.isna() | ((df["ts"] - prev).dt.total_seconds() > gap_s)
        sid = new.cumsum()
        g = df.groupby([df["user_id"], sid], sort=False)["ts"]
        s0 = g.min().to_numpy().astype("datetime64[us]")
        s1 = g.max().to_numpy().astype("datetime64[us]")
        uid = g.min().index.get_level_values(0).to_numpy(np.int64)
        # window [h, h+1h) overlaps session [s0, s1] iff h <= s1 and
        # h > s0 - 1h: two searchsorted probes per session
        lo = np.searchsorted(spikes, s0 - one_h, side="right")
        hi = np.searchsorted(spikes, s1, side="right")
        n = (hi - lo).astype(np.int64)
        out = pd.DataFrame({"user_id": uid, "n": n})
        return out[out["n"] > 0]

    per_sess = grouped_map(ev, "user_id", sessions)
    return pre_aggregate(per_sess, ["user_id"],
                         {"n_overlaps": ("n", "sum")})


SQL_EVENTS_SESSION_OVERLAP = """
WITH g AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
s AS (SELECT user_id, sid, MIN(ts) AS s0, MAX(ts) AS s1
      FROM m GROUP BY 1, 2),
w AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1
      HAVING COUNT(*) > 1.2 * (SELECT COUNT(*) FROM events)
                             / (SELECT COUNT(DISTINCT date_trunc('hour', ts))
                                FROM events))
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps
FROM s JOIN w ON s.s1 >= w.h AND s.s0 < w.h + INTERVAL 1 HOUR
GROUP BY 1
"""


def q_lineitem_unpivot(sf_dir: str):
    """Wide -> long UNPIVOT reshape: each batch emits the three measure
    columns stacked into (measure, value) long format with one
    vectorized concat (no row loop, no three separate scans — the
    UNION ALL oracle reads the table three times; the Ray reshape
    reads it once), then per-measure stats fold through the combiner."""
    from kgray.ops.agg import pre_aggregate

    MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]
    line = _read(sf_dir, "lineitem", MEASURES)

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vals = np.concatenate(
            [batch[m].to_numpy(zero_copy_only=False) for m in MEASURES]
        )
        names = np.repeat(
            np.array([m[2:] for m in MEASURES], dtype=object), n
        )
        return pa.table(
            {
                "measure": pa.array(names, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    long = line.map_batches(melt, batch_format="pyarrow")
    stats = pre_aggregate(
        long, ["measure"],
        {"n": (None, "count"), "total": ("value", "sum")},
    )
    return _round_col(stats, "total", 2)


SQL_LINEITEM_UNPIVOT = """
SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total
FROM (SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem)
GROUP BY 1
"""


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shape (priority by line status; no shipmode column in
    this corpus, l_linestatus stands in): the 1996 shipdate slice prunes
    lineitem at the read, ONE big-big orderkey cogroup attaches the
    order priority, and the two conditional counts fold through the
    combiner — the shuffle moves one row per (batch, status)."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1997, 1, 1)),
    ).select_columns(["l_orderkey", "l_linestatus"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = bucket_join(line, orders, on="l_orderkey",
                         right_on="o_orderkey", how="inner")

    def shape(batch: pa.Table) -> pa.Table:
        hi = pc.cast(
            pc.is_in(batch["o_orderpriority"],
                     value_set=pa.array(["1-URGENT", "2-HIGH"])),
            pa.int64(),
        )
        return pa.table(
            {
                "l_linestatus": batch["l_linestatus"],
                "high": hi,
                "low": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )

    return pre_aggregate(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["l_linestatus"],
        {"high_line_count": ("high", "sum"),
         "low_line_count": ("low", "sum")},
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY 1
"""


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 shape (min-cost supplier per part; lineitem is the
    part-supplier association — this corpus has no partsupp): the
    correlated MIN subquery decorrelates into a per-part min fold
    (combiner groupby) joined back on (partkey, exact price equality —
    untouched doubles compare bit-exact).  Part and supplier gates
    prune the fact scan BEFORE the fold: the size/type part filter is
    a broadcast semi-join, the EUROPE supplier map ships once.  The
    final DISTINCT is a key-only pre_aggregate."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, semi_join

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_size", "p_type"]).map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["p_size"], 15),
                    pc.equal(b["p_type"], "LARGE"))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice"]),
        parts, on="l_partkey", right_on="p_partkey",
    )

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    eu_regs = set(reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"])
    eu_nat = nat[nat["n_regionkey"].isin(eu_regs)]
    name_of = dict(zip(eu_nat["n_nationkey"].astype(np.int64),
                       eu_nat["n_name"]))
    eu_keys = pa.array(sorted(name_of))

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner").map_batches(
        lambda b: b.filter(pc.is_in(
            pc.cast(b["s_nationkey"], pa.int64()), value_set=eu_keys
        )),
        batch_format="pyarrow",
    )
    mc = pre_aggregate(
        line.select_columns(["l_partkey", "l_extendedprice"]),
        ["l_partkey"], {"mincost": ("l_extendedprice", "min")},
    )
    from kgray.ops.joins import bucket_join

    joined = bucket_join(line, mc, on="l_partkey", how="inner")

    def shape(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.equal(batch["l_extendedprice"], batch["mincost"])
        )
        names = [name_of[k] for k in
                 pc.cast(keep["s_nationkey"], pa.int64()).to_pylist()]
        return pa.table(
            {
                "p_partkey": keep["l_partkey"],
                "s_name": keep["s_name"],
                "n_name": pa.array(names, pa.string()),
                "s_acctbal": keep["s_acctbal"],
                "cost": keep["l_extendedprice"],
            }
        )

    rows = joined.map_batches(shape, batch_format="pyarrow")
    distinct = pre_aggregate(
        rows, ["p_partkey", "s_name", "n_name", "s_acctbal", "cost"],
        {"nn": (None, "count")},
    )
    return distinct.map_batches(
        lambda b: b.drop_columns(["nn"]), batch_format="pyarrow"
    )


SQL_TPCH_Q2 = """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
l AS (
  SELECT l_partkey, l_extendedprice, s_name, s_acctbal, n_name
  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_size = 15 AND p_type = 'LARGE'),
mc AS (SELECT l_partkey, MIN(l_extendedprice) AS mincost
       FROM l GROUP BY 1)
SELECT DISTINCT l.l_partkey AS p_partkey, s_name, n_name, s_acctbal,
       l_extendedprice AS cost
FROM l JOIN mc ON l.l_partkey = mc.l_partkey
   AND l.l_extendedprice = mc.mincost
"""


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 shape (product-type profit by nation and year; retail
    price stands in for the missing ps_supplycost): the 'red%' part
    gate and the supplier->nation map attach by broadcast BEFORE the
    single big-big orderkey shuffle, so the all-to-all moves only
    matched, pruned rows; the (nation, year) profit sums fold through
    the combiner.  The cost coefficient is 1.0 (not TPC-H's fraction):
    retailprice has two decimals and quantity is integral, so every
    cost term is an exact 2-dp decimal — a fractional coefficient
    would park sums on half-cent boundaries where ROUND half-up and
    nearest-double disagree."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, bucket_join

    red = _read(sf_dir, "part",
                ["p_partkey", "p_name", "p_retailprice"]).map_batches(
        lambda b: b.filter(
            pc.starts_with(b["p_name"], "red")
        ).select(["p_partkey", "p_retailprice"]),
        batch_format="pyarrow",
    )
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                  "l_extendedprice", "l_discount"])
    line = broadcast_join(line, red, on="l_partkey", right_on="p_partkey",
                          how="inner")
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line = broadcast_join(line, sup, on="l_suppkey", right_on="s_suppkey",
                          how="inner")
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    line = broadcast_join(line, nation, on="s_nationkey",
                          right_on="n_nationkey", how="inner")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = bucket_join(
        line.select_columns(["l_orderkey", "n_name", "l_quantity",
                             "l_extendedprice", "l_discount",
                             "p_retailprice"]),
        orders, on="l_orderkey", right_on="o_orderkey", how="inner",
    )

    def shape(batch: pa.Table) -> pa.Table:
        amount = pc.subtract(
            pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"]),
            ),
            pc.multiply(batch["p_retailprice"], batch["l_quantity"]),
        )
        return pa.table(
            {
                "n_name": batch["n_name"],
                "o_year": pc.cast(pc.year(batch["o_orderdate"]),
                                  pa.int64()),
                "amount": amount,
            }
        )

    agg = pre_aggregate(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["n_name", "o_year"], {"sum_profit": ("amount", "sum")},
    )
    return _round_col(agg, "sum_profit", 2)


SQL_TPCH_Q9 = """
SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
"""


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 shape (important parts by traded value; lineitem
    value = price x qty stands in for partsupp stock value): the
    NATION_7 supplier gate is a broadcast semi-join, the per-part
    values fold through the combiner, and the scalar-subquery
    threshold (0.1% of the total) is ONE streaming sum over the
    already-folded per-part rows — no second scan of the fact table."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import semi_join

    sup7 = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: b.filter(
            pc.equal(pc.cast(b["s_nationkey"], pa.int64()), 7)
        ).select(["s_suppkey"]),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]),
        sup7, on="l_suppkey", right_on="s_suppkey",
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "val": pc.multiply(batch["l_extendedprice"],
                                   batch["l_quantity"]),
            }
        )

    per_part = pre_aggregate(
        line.map_batches(shape, batch_format="pyarrow"),
        ["l_partkey"], {"value": ("val", "sum")},
    ).materialize()  # folded: one row per distinct part — reused twice
    # scalar-subquery threshold at 2x the MEAN per-part value: TPC-H's
    # fixed 0.01% fraction empties the answer as part count grows with
    # SF (at sf0.1 EVERY share < 0.1% -> a correct-but-empty result,
    # which the driver can never column-match because empty Ray
    # datasets lose their schema) — the mean-relative form keeps the
    # same decorrelated shape and a non-empty answer at every SF
    n_parts = per_part.count()
    if n_parts == 0:
        # a typed empty Table: an empty Dataset loses its schema and
        # the driver compare then sees zero columns
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    threshold = 2.0 * (per_part.sum("value") or 0.0) / n_parts
    kept = per_part.map_batches(
        lambda b, t=threshold: b.filter(pc.greater(b["value"], t)),
        batch_format="pyarrow",
    )
    return _round_col(kept, "value", 2)


SQL_TPCH_Q11 = """
WITH v AS (
  SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7
  GROUP BY 1)
SELECT l_partkey, ROUND(value, 2) AS value FROM v
WHERE value > (SELECT 2.0 * SUM(value) / COUNT(*) FROM v)
"""


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 shape (supplier count per part attribute; negative
    account balance stands in for the complaints pattern): the NOT-IN
    supplier set drops via an ANTI semi-join (broadcast — the bad set
    is dimension-sized), the part gate attaches by broadcast, and
    COUNT(DISTINCT suppkey) decomposes into two combiner folds — the
    first collapses to one row per (brand, size, suppkey), the second
    counts them — so neither shuffle moves raw fact rows."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import broadcast_join, semi_join

    bad = _read(sf_dir, "supplier",
                ["s_suppkey", "s_acctbal"]).map_batches(
        lambda b: b.filter(pc.less(b["s_acctbal"], 0.0)).select(
            ["s_suppkey"]
        ),
        batch_format="pyarrow",
    )
    line = semi_join(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        bad, on="l_suppkey", right_on="s_suppkey", anti=True,
    )
    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.invert(pc.equal(b["p_type"], "PROMO")),
                pc.is_in(pc.cast(b["p_size"], pa.int64()),
                         value_set=pa.array([1, 5, 10, 15, 20, 25])),
            )
        ).select(["p_partkey", "p_brand", "p_size"]),
        batch_format="pyarrow",
    )
    joined = broadcast_join(line, parts, on="l_partkey",
                            right_on="p_partkey", how="inner")
    triple = pre_aggregate(
        joined, ["p_brand", "p_size", "l_suppkey"], {"nn": (None, "count")}
    )
    return pre_aggregate(
        triple, ["p_brand", "p_size"], {"supplier_cnt": (None, "count")}
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 shape (dominant suppliers of 'small%' parts; the >50%
    shipped-quantity share stands in for the availqty test): the 1996
    slice prunes at the read and the part gate semi-joins BEFORE the
    (part, supplier) quantity fold; the per-part total is a second fold
    over already-collapsed rows, rejoined on partkey.  l_quantity is
    integral, so the half-share compare is exact in both engines.  The
    surviving supplier set is dimension-sized and gates the supplier
    scan via a broadcast semi-join."""
    import datetime

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join, semi_join

    small = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda b: b.filter(pc.starts_with(b["p_name"], "small")).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime.datetime(1997, 1, 1)),
    ).select_columns(["l_partkey", "l_suppkey", "l_quantity"])
    line = semi_join(line, small, on="l_partkey", right_on="p_partkey")
    q = pre_aggregate(
        line, ["l_partkey", "l_suppkey"], {"qty": ("l_quantity", "sum")}
    )
    tot = pre_aggregate(q, ["l_partkey"], {"tq": ("qty", "sum")})
    joined = bucket_join(q, tot, on="l_partkey", how="inner")
    dom = joined.map_batches(
        lambda b: b.filter(
            pc.greater(b["qty"], pc.multiply(pa.scalar(0.5), b["tq"]))
        ).select(["l_suppkey"]),
        batch_format="pyarrow",
    )

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    name_of = dict(
        zip(nat.loc[nat["n_regionkey"].isin(asia), "n_nationkey"]
            .astype(np.int64),
            nat.loc[nat["n_regionkey"].isin(asia), "n_name"])
    )
    sup = semi_join(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]),
        dom, on="s_suppkey", right_on="l_suppkey",
    )

    def shape(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["s_nationkey"], pa.int64()).to_pylist()
        mask = pa.array([k in name_of for k in keys])
        keep = batch.filter(mask)
        names = [name_of[k] for k in
                 pc.cast(keep["s_nationkey"], pa.int64()).to_pylist()]
        return pa.table(
            {
                "s_name": keep["s_name"],
                "n_name": pa.array(names, pa.string()),
            }
        )

    return sup.map_batches(shape, batch_format="pyarrow")


SQL_TPCH_Q20 = """
WITH q AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'small%')
  GROUP BY 1, 2),
t AS (SELECT l_partkey, SUM(qty) AS tq FROM q GROUP BY 1),
dom AS (SELECT DISTINCT l_suppkey FROM q JOIN t USING (l_partkey)
        WHERE qty > 0.5 * tq)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN dom ON s_suppkey = dom.l_suppkey
WHERE n_regionkey IN (SELECT r_regionkey FROM region
                      WHERE r_name = 'ASIA')
"""


def q_pii_redact(sf_dir: str):
    """PII redaction (emails + phone-shaped digit runs -> placeholder
    tokens): the corpus text carries no PII, so a deterministic contact
    header derived from doc_id is prepended IN BOTH ENGINES and the
    redaction itself is the operator under test.  Patterns are compiled
    once at module import (kgray/ops/text.py) and shared by every task;
    ASCII-explicit classes pin Python-re == RE2 semantics."""
    from kgray.ops.text import redact_pii

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        head = [
            f"user{i}@mail{i % 7}.example.com tel 555-{1000 + i % 9000} "
            for i in ids
        ]
        raw = pc.binary_join_element_wise(
            pa.array(head, pa.string()),
            pc.cast(batch["text"], pa.string()), "",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": raw})

    red = docs.map_batches(attach, batch_format="pyarrow").map_batches(
        redact_pii, batch_format="pyarrow"
    )
    return red.select_columns(["doc_id", "red", "n_pii"])


SQL_PII_REDACT = """
WITH raw AS (
  SELECT doc_id,
         'user' || CAST(doc_id AS VARCHAR) || '@mail' ||
         CAST(doc_id % 7 AS VARCHAR) || '.example.com tel 555-' ||
         CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ' || text AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
         '[0-9]{3}-[0-9]{3,4}', '<PHONE>', 'g') AS red,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+'))
            + len(regexp_extract_all(
                regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+',
                               '<EMAIL>', 'g'),
                '[0-9]{3}-[0-9]{3,4}')) AS BIGINT) AS n_pii
FROM raw
"""


def q_user_value_median(sf_dir: str):
    """Per-group EXACT median (not a sketch): every row of a user lands
    in one coarse hash bucket (ONE cogroup shuffle), and the per-user
    median is pandas' C groupby inside the bucket.  pandas interpolates
    even-count medians linearly, exactly like DuckDB's MEDIAN
    (quantile_cont 0.5); round(4) on both sides absorbs ulp drift."""
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def med(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("user_id", sort=False)["value"].median()
        return pd.DataFrame(
            {
                "user_id": m.index.to_numpy(np.int64),
                "med": round_half_up(m.to_numpy(np.float64), 4),
            }
        )

    return grouped_map(ev, "user_id", med)


SQL_USER_VALUE_MEDIAN = """
SELECT user_id, ROUND(MEDIAN(value), 4) AS med FROM events GROUP BY 1
"""


def q_events_hourly_dedup(sf_dir: str):
    """Windowed deduplication: keep the FIRST event (min ts, event_id
    tiebreak) per (user, hour) — the idempotent-ingest primitive.  User
    cogroup, then one mergesort + drop_duplicates per bucket; the hour
    key is integer epoch arithmetic (unit-safe, no timestamp hashing)."""
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        hour = (
            df["ts"].to_numpy("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        out = df.assign(hour_bucket=hour).drop_duplicates(
            ["user_id", "hour_bucket"], keep="first"
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(np.int64),
                "hour_bucket": out["hour_bucket"].to_numpy(np.int64),
                "first_event_id": out["event_id"].to_numpy(np.int64),
            }
        )

    return grouped_map(ev, "user_id", dedup)


SQL_EVENTS_HOURLY_DEDUP = """
SELECT user_id, hour_bucket, event_id AS first_event_id FROM (
  SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
         event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, floor(epoch(ts)/3600)
                            ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn = 1
"""


def q_user_streaks(sf_dir: str):
    """Max consecutive-active-day streak per user (gaps-and-islands over
    integer day numbers): distinct (user, day) collapses inside each
    batch FIRST (combiner — the shuffle moves at most one row per
    (batch, user, day)), then the island id (day - rank) and the
    per-island counts are three vectorized passes per bucket."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

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
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

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
    import re
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
    from kgray.util import grouped_map, round_half_up

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
    from kgray.util import grouped_map

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
    from kgray.util import grouped_map

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
    from kgray.ops.joins import semi_join

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
    import re

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
    from ray.data.aggregate import Sum

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
    from kgray.ops.agg import pre_aggregate

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


def q_copurchase_triangles(sf_dir: str):
    """Triangle count over the co-purchase graph — the graph-clustering
    primitive (full SQL oracle for ops/graph.triangle_count, whose
    kg_link_triangles entry is rows-only).  Edges = part pairs sharing
    >= 2 distinct orders: the basket pair expansion is one
    order-keyed cogroup (vectorized self-merge per bucket), partial
    supports fold in a p1-keyed cogroup (every partial of a pair lands
    in one bucket) where the HAVING >= 2 filter runs on true totals.
    triangle_count then does the node-iterator wedge-check MR (or its
    test-pinned in-process twin under the small-side gate)."""
    from kgray.ops.graph import triangle_count
    from kgray.util import grouped_map

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

    edges = grouped_map(pairs, "u", fold_edges)
    return triangle_count(edges)


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
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

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
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

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
    from kgray.ops.agg import pre_aggregate

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
    from kgray.util import grouped_map

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
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.joins import bucket_join
    from kgray.util import grouped_map, round_half_up

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
    from kgray.util import grouped_map

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
    import math

    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

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
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

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
    from kgray.util import grouped_map

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
    from kgray.ops.agg import pre_aggregate

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
    from kgray.ops.joins import broadcast_join
    from kgray.util import grouped_map, round_half_up

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
    from kgray.util import grouped_map

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
    from kgray.ops.agg import pre_aggregate
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

    from ray.data.aggregate import Max, Min

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
    from kgray.ops.joins import broadcast_join
    from kgray.util import grouped_map, round_half_up

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
    from kgray.ops.agg import pre_aggregate
    from kgray.util import default_num_buckets, grouped_map

    ev = _read(sf_dir, "events", ["event_id", "value"]).materialize()
    n = ev.count()
    # rank -> [deciles]: on tiny inputs (n < 10) two deciles share
    # ceil(q*n/10); a plain rank->decile dict would collapse them and
    # emit fewer rows than the oracle's one-row-per-decile join
    targets: dict[int, list[int]] = {}
    for q in range(1, 10):
        targets.setdefault(((q * n) + 9) // 10, []).append(q)

    from ray.data.aggregate import Max, Min

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


def q_events_day_overlap(sf_dir: str):
    """Day-over-day user-set Jaccard (audience churn/overlap monitor):
    ONE user cogroup dedups each user's day set and — because
    consecutive calendar days are a sorted diff==1 check — emits both
    the per-day presence partial and the present-tomorrow-too partial
    in the same pass; a tiny day-level fold (≤366 rows) computes
    |A∩B| / (|A| + |B| - |A∩B|) as the pinned int-ratio division.
    Days with an empty intersection drop on both engines (the oracle's
    inner join)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_user(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.cast(
                    pc.floor_temporal(batch["ts"], unit="day"),
                    pa.date32(),
                ),
            }
        ).group_by(["user_id", "day"]).aggregate([])

    du = ev.map_batches(day_user, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        us = df["user_id"].to_numpy(np.int64)
        days = df["day"].to_numpy("datetime64[D]").astype(np.int64)
        nxt = np.zeros(len(df), np.int64)
        if len(df) > 1:
            nxt[:-1] = ((us[1:] == us[:-1])
                        & (days[1:] == days[:-1] + 1)).astype(np.int64)
        return pd.DataFrame({"day": days, "present": 1, "both": nxt})

    folded = (
        pre_aggregate(
            grouped_map(du, "user_id", per_user), ["day"],
            {"n": ("present", "sum"), "i": ("both", "sum")},
        )
        .to_pandas().sort_values("day")
    )
    sizes = dict(zip(folded["day"].to_numpy(np.int64).tolist(),
                     folded["n"].to_numpy(np.int64).tolist()))
    keep = folded[folded["i"] > 0]
    days = keep["day"].to_numpy(np.int64)
    i = keep["i"].to_numpy(np.int64)
    a = keep["n"].to_numpy(np.int64)
    b = np.array([sizes[d + 1] for d in days.tolist()], np.int64)
    jac = i / (a + b - i)
    day_str = np.array(
        [str(np.datetime64(int(d), "D")) for d in days.tolist()]
    )
    return pa.table(
        {
            "day": pa.array(day_str),
            "jaccard": pa.array(round_half_up(jac, 6), pa.float64()),
        }
    )


SQL_EVENTS_DAY_OVERLAP = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
inter AS (SELECT a.d, CAST(COUNT(*) AS BIGINT) AS i
          FROM du a JOIN du b
            ON a.user_id = b.user_id AND b.d = a.d + 1
          GROUP BY 1),
sz AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1)
SELECT strftime(i.d, '%Y-%m-%d') AS day,
       ROUND(CAST(i.i AS DOUBLE) / (a.n + b.n - i.i), 6) AS jaccard
FROM inter i JOIN sz a ON i.d = a.d JOIN sz b ON b.d = i.d + 1
"""


def q_events_cusum(sf_dir: str):
    """Per-user CUSUM change-point score: the running sum of deviations
    from the corpus mean, reported as max |cusum| per user — in EXACT
    integer arithmetic.  Values quantize to int64 cents (the testdata
    is 2-decimal; general inputs are cent-quantized by definition), and
    the deviation is scaled by n: dev·n = v_cents·n - Σcents, so the
    per-user running sum is an exact integer in ANY association order —
    float cusums proved unfixable here, landing exactly on ROUND-4 half
    boundaries (quantized inputs) where numpy's sequential cumsum and
    DuckDB's windowed-sum tree disagree by one ulp.  The single final
    division /(100·n) is pinned in both engines.  NB v_cents·n needs
    int128 beyond ~1e5-value · 1e13-row corpora — shard the mean or
    drop the n-scaling (accepting one rational division) there."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def gpartial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = round_half_up(v * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "s": pa.array([int(cents.sum())], pa.int64()),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    tot = (
        pre_aggregate(
            ev.map_batches(gpartial, batch_format="pyarrow"), ["g"],
            {"s": ("s", "sum"), "n": ("n", "sum")},
        )
        .to_pandas().iloc[0]
    )
    s_cents, n = int(tot["s"]), int(tot["n"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        cents = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        dev = cents * np.int64(n) - np.int64(s_cents)
        cs = (
            pd.Series(dev).groupby(pd.Series(us), sort=False).cumsum()
            .to_numpy(np.int64)
        )
        m = (
            pd.DataFrame({"u": us, "a": np.abs(cs)})
            .groupby("u", sort=False)["a"].max()
        )
        return pd.DataFrame(
            {
                "user_id": m.index.to_numpy(np.int64),
                "max_cusum": round_half_up(
                    m.to_numpy(np.float64) / (100.0 * n), 4
                ),
            }
        )

    return grouped_map(ev, "user_id", per_bucket)


SQL_EVENTS_CUSUM = """
WITH g AS (SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events),
c AS (SELECT user_id, g.n,
             SUM(CAST(round(value * 100) AS BIGINT) * g.n - g.s)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cs
      FROM events CROSS JOIN g)
SELECT user_id,
       ROUND(CAST(MAX(ABS(cs)) AS DOUBLE) / (100.0 * MAX(n)), 4)
         AS max_cusum
FROM c GROUP BY 1
"""


def q_events_lead_lag(sf_dir: str):
    """Lead-lag cross-correlation of the click and purchase daily count
    series (lags -3..+3) — does one stream anticipate the other?  The
    corpus-scale pass is one (day, x, y) count fold; the seven
    correlations run on the metadata-scale series with the
    grouped_corr sufficient-statistics formula (algebraically identical
    to SQL CORR, ulp drift absorbed by ROUND 4)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["ts", "event_type"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'"
    )

    def day_type(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.cast(
                    pc.floor_temporal(batch["ts"], unit="day"),
                    pa.date32(),
                ),
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
    piv = c.pivot_table(index="day", columns="event_type", values="n",
                        fill_value=0, aggfunc="sum").reset_index()
    for col in ("click", "purchase"):
        if col not in piv:
            piv[col] = 0
    days = pd.to_datetime(piv["day"]).to_numpy("datetime64[D]") \
        .astype(np.int64)
    x = piv["click"].to_numpy(np.float64)
    y = piv["purchase"].to_numpy(np.float64)
    by_day = dict(zip(days.tolist(), range(len(days))))
    out_lag, out_r = [], []
    for lag in range(-3, 4):
        xi, yi = [], []
        for d, i in by_day.items():
            j = by_day.get(d + lag)
            if j is not None:
                xi.append(x[i])
                yi.append(y[j])
        if not xi:
            continue  # empty shifted overlap: the SQL join emits no row
        xa, ya = np.array(xi), np.array(yi)
        n = float(len(xa))
        cov = n * float((xa * ya).sum()) - float(xa.sum()) * float(
            ya.sum())
        vx = n * float((xa * xa).sum()) - float(xa.sum()) ** 2
        vy = n * float((ya * ya).sum()) - float(ya.sum()) ** 2
        denom = (vx * vy) ** 0.5
        out_lag.append(lag)
        # constant series: CORR is NULL in SQL, not nan/inf
        out_r.append(
            float(round_half_up(np.array([cov / denom]), 4)[0])
            if denom > 0 else None
        )
    return pa.table(
        {
            "lag": pa.array(out_lag, pa.int64()),
            "r": pa.array(out_r, pa.float64()),
        }
    )


SQL_EVENTS_LEAD_LAG = """
WITH c AS (SELECT CAST(ts AS DATE) AS d,
                  CAST(COUNT(*) FILTER (event_type = 'click')
                       AS DOUBLE) AS x,
                  CAST(COUNT(*) FILTER (event_type = 'purchase')
                       AS DOUBLE) AS y
           FROM events
           WHERE event_type IN ('click', 'purchase') GROUP BY 1),
l AS (SELECT CAST(UNNEST(range(-3, 4)) AS INTEGER) AS lag)
SELECT CAST(l.lag AS BIGINT) AS lag, ROUND(corr(a.x, b.y), 4) AS r
FROM l JOIN c a ON TRUE JOIN c b ON b.d = a.d + l.lag
GROUP BY 1
"""


def q_user_value_interp(sf_dir: str):
    """Per-user daily-value series with interior gaps LINEARLY
    INTERPOLATED (timeseries repair; the zero-fill twin is
    user_daily_dense): observed days carry their daily value sum,
    missing days get vp + (vn - vp) * Δprev / Δspan on exact integer
    day deltas — the identical expression tree in numpy and SQL.  One
    user cogroup; the spine expands with the repeat/cumsum arithmetic
    and prev/next observed indices are searchsorted lookups, no
    per-day python."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.cast(
                    pc.cast(
                        pc.floor_temporal(batch["ts"], unit="day"),
                        pa.date32(),
                    ),
                    pa.int32(),
                ),
                "v": batch["value"],
            }
        )
        return t.group_by(["user_id", "day"]).aggregate([("v", "sum")]) \
            .rename_columns(["user_id", "day", "v"])

    daily = ev.map_batches(day_partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        obs = (
            df.groupby(["user_id", "day"], sort=False)["v"].sum()
            .reset_index().sort_values(["user_id", "day"],
                                       kind="mergesort")
        )
        us = obs["user_id"].to_numpy(np.int64)
        od = obs["day"].to_numpy(np.int64)
        ov = obs["v"].to_numpy(np.float64)
        first = np.ones(len(obs), bool)
        first[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(first)
        ends = np.concatenate([starts[1:], [len(obs)]])
        span = od[ends - 1] - od[starts] + 1
        # spine: for each user, days start..end via repeat/cumsum
        spine_user = np.repeat(us[starts], span)
        base = np.repeat(od[starts], span)
        step = np.arange(len(spine_user)) - np.repeat(
            np.concatenate([[0], np.cumsum(span)[:-1]]), span
        )
        spine_day = base + step
        # prev/next observed index per spine row (within the global
        # sorted (user, day) obs array — user blocks are contiguous and
        # spine days never leave their user's [min, max] range)
        prev_i = np.searchsorted(od + us * (10 ** 6), spine_day
                                 + spine_user * (10 ** 6), "right") - 1
        next_i = np.searchsorted(od + us * (10 ** 6), spine_day
                                 + spine_user * (10 ** 6), "left")
        vp, dp = ov[prev_i], od[prev_i]
        vn, dn = ov[next_i], od[next_i]
        observed = spine_day == dp
        ddp = (spine_day - dp).astype(np.float64)
        ddn = (dn - dp).astype(np.float64)
        filled = np.where(
            observed, vp,
            vp + (vn - vp) * ddp / np.where(ddn == 0, 1.0, ddn),
        )
        day_str = np.array(
            [str(np.datetime64(int(d), "D")) for d in spine_day.tolist()]
        )
        return pd.DataFrame(
            {
                "user_id": spine_user,
                "day": day_str,
                "v_filled": round_half_up(filled, 4),
                "interpolated": (~observed).astype(np.int64),
            }
        )

    return grouped_map(daily, "user_id", per_bucket)


SQL_USER_VALUE_INTERP = """
WITH o AS (SELECT user_id, CAST(ts AS DATE) AS d, SUM(value) AS v
           FROM events GROUP BY 1, 2),
span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM o GROUP BY 1),
spine AS (SELECT s.user_id,
                 CAST(UNNEST(generate_series(s.d0, s.d1,
                                             INTERVAL 1 DAY)) AS DATE)
                   AS d
          FROM span s),
j AS (SELECT sp.user_id, sp.d, o.v
      FROM spine sp LEFT JOIN o
        ON sp.user_id = o.user_id AND sp.d = o.d),
f AS (SELECT user_id, d, v,
             LAST_VALUE(v IGNORE NULLS) OVER w AS vp,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER w AS dp,
             FIRST_VALUE(v IGNORE NULLS) OVER wf AS vn,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER wf AS dn
      FROM j
      WINDOW w AS (PARTITION BY user_id ORDER BY d),
             wf AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
       ROUND(CASE WHEN v IS NOT NULL THEN v
             ELSE vp + (vn - vp)
                  * CAST(date_diff('day', dp, d) AS DOUBLE)
                  / CAST(date_diff('day', dp, dn) AS DOUBLE) END,
             4) AS v_filled,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS interpolated
FROM f
"""


def q_events_geomean(sf_dir: str):
    """Per-type geometric mean of events.value (exp of the mean log —
    the multiplicative-scale center): ln is C-libm ``math.log`` memoized
    over DISTINCT values (the tf-idf parity trick; a python loop over
    distinct floats is ms-scale because the memo, not the loop, does
    the work), partial (Σln, n) pairs fold through the combiner, and
    the final exp(Σ/n) is the identical two-op expression both
    engines.  Domain-restricted to value > 0 on BOTH sides (the
    geometric mean is undefined at zero; DuckDB ln(0) raises)."""
    import math

    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="value > 0"
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        memo: dict[float, float] = {}
        logs = np.empty(len(df), np.float64)
        for i, v in enumerate(df["value"].tolist()):
            lv = memo.get(v)
            if lv is None:
                lv = math.log(v)
                memo[v] = lv
            logs[i] = lv
        df = df.assign(__l=logs)
        g = df.groupby("event_type", sort=False)["__l"]
        return pa.Table.from_pandas(
            pd.DataFrame({"event_type": g.sum().index, "s": g.sum(),
                          "n": g.size()}),
            preserve_index=False,
        )

    folded = (
        pre_aggregate(
            ev.map_batches(partial, batch_format="pyarrow"),
            ["event_type"], {"s": ("s", "sum"), "n": ("n", "sum")},
        )
        .to_pandas()
    )
    gm = np.array(
        [math.exp(s / n) for s, n in zip(folded["s"], folded["n"])]
    )
    return pa.table(
        {
            "event_type": pa.array(folded["event_type"]),
            "geomean": pa.array(round_half_up(gm, 4), pa.float64()),
        }
    )


SQL_EVENTS_GEOMEAN = """
SELECT event_type, ROUND(exp(SUM(ln(value)) / COUNT(*)), 4) AS geomean
FROM events WHERE value > 0 GROUP BY 1
"""


def q_events_minmax_norm(sf_dir: str):
    """Per-type min-max feature scaling (x - min)/(max - min) — the
    classic normalization stage: a tiny (type, min, max) fold broadcast
    by closure, then a stateless row-scale pass with the pinned
    two-op expression (single-value types emit 0 by convention, both
    engines)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    mm = (
        pre_aggregate(
            ev.select_columns(["event_type", "value"]), ["event_type"],
            {"lo": ("value", "min"), "hi": ("value", "max")},
        )
        .to_pandas()
    )
    lo = dict(zip(mm["event_type"], mm["lo"]))
    hi = dict(zip(mm["event_type"], mm["hi"]))

    def scale(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        l = df["event_type"].map(lo).to_numpy(np.float64)
        h = df["event_type"].map(hi).to_numpy(np.float64)
        x = df["value"].to_numpy(np.float64)
        span = h - l
        scaled = np.where(span == 0, 0.0,
                          (x - l) / np.where(span == 0, 1.0, span))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "scaled": pa.array(round_half_up(scaled, 6),
                                   pa.float64()),
            }
        )

    return ev.map_batches(scale, batch_format="pyarrow")


SQL_EVENTS_MINMAX_NORM = """
WITH m AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
           FROM events GROUP BY 1)
SELECT e.event_id,
       ROUND(CASE WHEN m.hi - m.lo = 0 THEN 0.0
             ELSE (e.value - m.lo) / (m.hi - m.lo) END, 6) AS scaled
FROM events e JOIN m ON e.event_type = m.event_type
"""


def q_events_fano(sf_dir: str):
    """Fano factor (variance/mean of daily counts) per event type — the
    burstiness screen.  Counts are INTEGERS, so Σc and Σc² fold exactly
    and the (n·Σc² - (Σc)²) / (n·(n-1)) / (Σc/n) expression involves no
    order-sensitive float sums at all — the only float ops are the
    final pinned divisions.  n is the number of ACTIVE days (days with
    ≥1 event of the type), spelled out in both engines."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

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
            ["day", "event_type"], {"c": (None, "count")},
        )
        .to_pandas()
    )
    g = c.groupby("event_type", sort=True)
    n = g.size().to_numpy(np.int64)
    s = g["c"].sum().to_numpy(np.int64)
    ss = c.assign(cc=c["c"] * c["c"]).groupby("event_type",
                                              sort=True)["cc"].sum() \
        .to_numpy(np.int64)
    var = (n * ss - s * s).astype(np.float64) / (n * (n - 1)).astype(
        np.float64)
    mean = s.astype(np.float64) / n.astype(np.float64)
    fano = var / mean
    return pa.table(
        {
            "event_type": pa.array(g.size().index.to_numpy()),
            "fano": pa.array(round_half_up(fano, 6), pa.float64()),
        }
    )


SQL_EVENTS_FANO = """
WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT event_type,
       ROUND((CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
              / CAST(COUNT(*) * (COUNT(*) - 1) AS DOUBLE))
             / (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
             6) AS fano
FROM c GROUP BY 1
"""


def q_events_cuped(sf_dir: str):
    """CUPED variance-reduced A/B read-out (the experiment-analytics
    staple): units are users, the deterministic arm is user_id % 2, the
    pre-period covariate x is each user's value sum in the first half
    of the date range and the outcome y the second half.
    θ = cov(x, y)/var(x) over ALL units, y_cuped = y - θ·(x - x̄), and
    the output is one row per arm (n, mean_y, mean_y_cuped).  Fully
    distributed: ONE user cogroup folds per-unit (x, y) and emits
    per-arm moment partials (n, Σx, Σy, Σx², Σxy) — two rows per
    bucket — so no unit-scale table ever reaches the driver; θ/x̄ come
    from the summed-over-arms row and the per-arm adjusted mean is the
    linear identity (Σy - θ·(Σx - n·x̄))/n.  ROUND 4 absorbs the
    summation-order ulp (the corr/Welch precedent)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map, round_half_up

    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    b = _read(sf_dir, "events", ["ts"]).aggregate(Min("ts"), Max("ts"))
    t0 = pd.Timestamp(b["min(ts)"]).value // 1000
    t1 = pd.Timestamp(b["max(ts)"]).value // 1000
    mid = t0 + (t1 - t0) // 2

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        pre = ts < mid
        d = pd.DataFrame({"u": us, "x": np.where(pre, v, 0.0),
                          "y": np.where(pre, 0.0, v)})
        g = d.groupby("u", sort=False)[["x", "y"]].sum()
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        arm = (g.index.to_numpy(np.int64) % 2).astype(np.int64)
        p = pd.DataFrame(
            {"arm": arm, "n": 1, "sx": x, "sy": y, "sxx": x * x,
             "sxy": x * y}
        ).groupby("arm", sort=False).sum().reset_index()
        return p

    arms = (
        pre_aggregate(
            grouped_map(ev, "user_id", per_bucket), ["arm"],
            {"n": ("n", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
             "sxx": ("sxx", "sum"), "sxy": ("sxy", "sum")},
        )
        .to_pandas().sort_values("arm")
    )
    n = float(arms["n"].sum())
    sx, sy = float(arms["sx"].sum()), float(arms["sy"].sum())
    sxx, sxy = float(arms["sxx"].sum()), float(arms["sxy"].sum())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    na = arms["n"].to_numpy(np.float64)
    mean_y = arms["sy"].to_numpy(np.float64) / na
    mean_yc = (
        arms["sy"].to_numpy(np.float64)
        - theta * (arms["sx"].to_numpy(np.float64) - na * xbar)
    ) / na
    return pa.table(
        {
            "arm": pa.array(arms["arm"].to_numpy(np.int64)),
            "n": pa.array(arms["n"].to_numpy(np.int64)),
            "mean_y": pa.array(round_half_up(mean_y, 4), pa.float64()),
            "mean_y_cuped": pa.array(round_half_up(mean_yc, 4),
                                     pa.float64()),
        }
    )


SQL_EVENTS_CUPED = """
WITH b AS (SELECT epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1
           FROM events),
u AS (SELECT user_id,
             SUM(CASE WHEN epoch_us(ts) < b.t0 + (b.t1 - b.t0) // 2
                      THEN value ELSE 0.0 END) AS x,
             SUM(CASE WHEN epoch_us(ts) < b.t0 + (b.t1 - b.t0) // 2
                      THEN 0.0 ELSE value END) AS y
      FROM events CROSS JOIN b GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM u),
t AS (SELECT (m.n * m.sxy - m.sx * m.sy)
             / (m.n * m.sxx - m.sx * m.sx) AS theta,
             m.sx / m.n AS xbar
      FROM m)
SELECT CAST(u.user_id % 2 AS BIGINT) AS arm,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(y) / COUNT(*), 4) AS mean_y,
       ROUND(SUM(y - t.theta * (x - t.xbar)) / COUNT(*), 4)
         AS mean_y_cuped
FROM u CROSS JOIN t
GROUP BY 1
"""


def q_events_winsorized(sf_dir: str):
    """Per-type winsorized mean (clip at the exact p05/p95 order
    statistics; the clip twin of doclen_trimmed's drop) — EXACT: values
    quantize to cents, one (type, cents) histogram fold is the only
    corpus-scale pass, thresholds are integer-rank selections
    (rank = (n+19)//20 / (19n+19)//20 — never ceil(0.05·n), whose float
    product overshoots on exact multiples), and the winsorized mean
    folds from the histogram itself as Σ clipped-cents / (100·n)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "v": pa.array(c)})

    h = (
        pre_aggregate(
            ev.map_batches(cents, batch_format="pyarrow"),
            ["event_type", "v"], {"c": (None, "count")},
        )
        .to_pandas().sort_values(["event_type", "v"], kind="mergesort")
    )
    out = []
    for et, g in h.groupby("event_type", sort=True):
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = v[np.searchsorted(cum, (n + 19) // 20)]
        hi = v[np.searchsorted(cum, (19 * n + 19) // 20)]
        clipped = np.clip(v, lo, hi)
        total = int((clipped * c).sum())
        n_lo = int(c[v < lo].sum())
        n_hi = int(c[v > hi].sum())
        out.append((et, n_lo, n_hi, total / (100.0 * n)))
    df = pd.DataFrame(out, columns=["event_type", "n_lo", "n_hi",
                                    "mean_winsor"])
    return pa.table(
        {
            "event_type": pa.array(df["event_type"]),
            "n_lo": pa.array(df["n_lo"].to_numpy(np.int64)),
            "n_hi": pa.array(df["n_hi"].to_numpy(np.int64)),
            "mean_winsor": pa.array(
                round_half_up(df["mean_winsor"].to_numpy(np.float64), 4),
                pa.float64(),
            ),
        }
    )


SQL_EVENTS_WINSORIZED = """
WITH b AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS v
           FROM events),
h AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2),
w AS (SELECT event_type, v, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h),
lo AS (SELECT event_type, MIN(v) AS v FROM w
       WHERE cum >= (n + 19) // 20 GROUP BY 1),
hi AS (SELECT event_type, MIN(v) AS v FROM w
       WHERE cum >= (19 * n + 19) // 20 GROUP BY 1)
SELECT w.event_type,
       CAST(COALESCE(SUM(w.c) FILTER (w.v < lo.v), 0) AS BIGINT)
         AS n_lo,
       CAST(COALESCE(SUM(w.c) FILTER (w.v > hi.v), 0) AS BIGINT)
         AS n_hi,
       ROUND(CAST(SUM(CASE WHEN w.v < lo.v THEN lo.v
                           WHEN w.v > hi.v THEN hi.v
                           ELSE w.v END * w.c) AS DOUBLE)
             / (100.0 * MAX(w.n)), 4) AS mean_winsor
FROM w JOIN lo ON w.event_type = lo.event_type
JOIN hi ON w.event_type = hi.event_type
GROUP BY 1
"""


def q_events_mannwhitney(sf_dir: str):
    """Mann-Whitney U (rank-sum) comparing click vs purchase values —
    the nonparametric A/B test, computed EXACTLY from the shared
    (value, group) histogram: tie-averaged ranks are half-integers
    (cumBefore + (count+1)/2 — exact binary doubles), so R1 and U1 are
    association-order-proof; no row-scale ranking shuffle exists at
    all.  Metadata-scale driver fold over distinct cents values (the
    quantized-domain trade; a continuous domain would use the DDSketch
    histogram instead)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'click' or event_type == 'purchase'"
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        g = pc.cast(pc.equal(batch["event_type"], "click"), pa.int64())
        return pa.table({"v": pa.array(c), "g": g})

    h = (
        pre_aggregate(
            ev.map_batches(cents, batch_format="pyarrow"), ["v"],
            {"c": (None, "count"), "c1": ("g", "sum")},
        )
        .to_pandas().sort_values("v", kind="mergesort")
    )
    c = h["c"].to_numpy(np.int64)
    c1 = h["c1"].to_numpy(np.int64)
    cb = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.float64)
    avg_rank = cb + (c.astype(np.float64) + 1.0) / 2.0
    r1 = float((c1.astype(np.float64) * avg_rank).sum())
    n1 = int(c1.sum())
    n2 = int(c.sum()) - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "r1": pa.array(round_half_up(np.array([r1]), 1),
                           pa.float64()),
            "u1": pa.array(round_half_up(np.array([u1]), 1),
                           pa.float64()),
        }
    )


SQL_EVENTS_MANNWHITNEY = """
WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
           FROM events
           WHERE event_type IN ('click', 'purchase')),
h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(g) AS BIGINT) AS c1
      FROM b GROUP BY 1),
w AS (SELECT v, c, c1,
             CAST(COALESCE(SUM(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS DOUBLE) AS cb
      FROM h),
m AS (SELECT SUM(c1 * (cb + (CAST(c AS DOUBLE) + 1.0) / 2.0)) AS r1,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n2
      FROM w)
SELECT n1, n2, ROUND(r1, 1) AS r1,
       ROUND(r1 - n1 * (n1 + 1) / 2.0, 1) AS u1
FROM m
"""


def q_events_bounce_rate(sf_dir: str):
    """Per-day session bounce rate (sessions of exactly one event /
    sessions started that day; 30-min idle gap) — ONE user cogroup does
    the whole gaps-and-islands pass vectorized (shift-compare on exact
    integer microseconds), emits per-(day) session/bounce count
    partials, and a ≤366-row fold computes the pinned ratio."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_s = np.ones(len(df), bool)
        if len(df) > 1:
            new_s[1:] = (us[1:] != us[:-1]) | (
                ts[1:] - ts[:-1] > 1_800_000_000
            )
        sid = np.cumsum(new_s)
        g = pd.DataFrame({"sid": sid, "ts": ts}).groupby("sid",
                                                         sort=False)
        start = g["ts"].min().to_numpy(np.int64)
        size = g.size().to_numpy(np.int64)
        day = (start // 86_400_000_000).astype(np.int64)
        out = pd.DataFrame({"day": day, "n": 1,
                            "b": (size == 1).astype(np.int64)})
        return out.groupby("day", sort=False).sum().reset_index()

    folded = (
        pre_aggregate(
            grouped_map(ev, "user_id", per_bucket), ["day"],
            {"n_sessions": ("n", "sum"), "n_bounce": ("b", "sum")},
        )
        .to_pandas().sort_values("day")
    )
    day_str = np.array(
        [str(np.datetime64(int(d), "D"))
         for d in folded["day"].to_numpy(np.int64).tolist()]
    )
    ns = folded["n_sessions"].to_numpy(np.int64)
    nb = folded["n_bounce"].to_numpy(np.int64)
    return pa.table(
        {
            "day": pa.array(day_str),
            "n_sessions": pa.array(ns),
            "n_bounce": pa.array(nb),
            "bounce_rate": pa.array(
                round_half_up(nb / ns, 4), pa.float64()
            ),
        }
    )


SQL_EVENTS_BOUNCE_RATE = """
WITH s AS (SELECT user_id, ts, event_id,
                  CASE WHEN LAG(ts) OVER w IS NULL
                            OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                               > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS sid
      FROM s),
g AS (SELECT user_id, sid, MIN(ts) AS start_ts,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2)
SELECT strftime(start_ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS bounce_rate
FROM g GROUP BY 1
"""


def q_events_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix: users grouped by first-activity
    week, revenue (value, cents-exact) folded per (cohort_week,
    age_weeks) with the active-user count — the retention matrix's
    revenue twin.  ONE user cogroup computes each user's cohort week
    and per-age partials (one row per user per active week), so the
    (cohort, age) fold is exact integers end-to-end."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map, round_half_up

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wk = ts // 86_400_000_000 // 7
        cents = round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        d = pd.DataFrame({"u": us, "wk": wk, "cents": cents})
        cwk = d.groupby("u", sort=False)["wk"].transform("min")
        d = d.assign(cohort_wk=cwk, age_wk=d["wk"] - cwk)
        g = d.groupby(["cohort_wk", "age_wk", "u"], sort=False)["cents"] \
            .sum().reset_index()
        out = g.groupby(["cohort_wk", "age_wk"], sort=False).agg(
            n_users=("u", "size"), cents=("cents", "sum")
        ).reset_index()
        return out

    folded = pre_aggregate(
        grouped_map(ev, "user_id", per_bucket), ["cohort_wk", "age_wk"],
        {"n_users": ("n_users", "sum"), "cents": ("cents", "sum")},
    ).to_pandas()

    return pa.table(
        {
            "cohort_wk": pa.array(
                folded["cohort_wk"].to_numpy(np.int64)),
            "age_wk": pa.array(folded["age_wk"].to_numpy(np.int64)),
            "n_users": pa.array(folded["n_users"].to_numpy(np.int64)),
            "revenue": pa.array(
                round_half_up(
                    folded["cents"].to_numpy(np.float64) / 100.0, 2
                ),
                pa.float64(),
            ),
        }
    )


SQL_EVENTS_COHORT_LTV = """
WITH d AS (SELECT user_id,
                  epoch_us(ts) // 86400000000 // 7 AS wk,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
c AS (SELECT user_id, MIN(wk) AS cwk FROM d GROUP BY 1)
SELECT CAST(c.cwk AS BIGINT) AS cohort_wk,
       CAST(d.wk - c.cwk AS BIGINT) AS age_wk,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(d.cents) AS DOUBLE) / 100.0, 2) AS revenue
FROM d JOIN c ON d.user_id = c.user_id
GROUP BY 1, 2
"""


def q_doc_simpson(sf_dir: str):
    """Per-doc Simpson diversity index of the token distribution
    (Σc(c-1) / n(n-1)) — the ORACLE-EXACT twin of doc_entropy: no logs,
    all counts integral, the single final division pinned.  A doc is a
    row, so the whole computation is stateless per batch — no shuffle.
    Restricted to n >= 2 in both engines (the index is undefined on
    singleton docs)."""
    from kgray.util import round_half_up

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def simpson(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        e = df[["doc_id"]].join(
            df["text"].str.split(" ").rename("t")
        ).explode("t")
        e = e[e["t"] != ""]
        tc = e.groupby(["doc_id", "t"], sort=False).size().reset_index(
            name="c")
        c = tc["c"].to_numpy(np.int64)
        agg = pd.DataFrame(
            {"doc_id": tc["doc_id"], "s": c * (c - 1), "n": c}
        ).groupby("doc_id", sort=False).sum().reset_index()
        agg = agg[agg["n"] >= 2]
        n = agg["n"].to_numpy(np.int64)
        s = agg["s"].to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
                "simpson": pa.array(
                    round_half_up(
                        s.astype(np.float64)
                        / (n * (n - 1)).astype(np.float64), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(simpson, batch_format="pyarrow")


SQL_DOC_SIMPSON = """
WITH tc AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> '' GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(c) AS n, SUM(c * (c - 1)) AS s
      FROM tc GROUP BY 1)
SELECT doc_id,
       ROUND(CAST(s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6)
         AS simpson
FROM n WHERE n >= 2
"""


def q_parts_abc(sf_dir: str):
    """ABC (Pareto) classification of parts by revenue: class A covers
    the first 80% of cumulative revenue in descending order, B to 95%,
    C the tail — EXACT, via the Gini-style value-range decomposition
    run DESCENDING with per-range revenue-sum offsets (ints), so each
    range resolves its rows' cumulative totals without any global sort;
    the class compares are integer cross-products (cum·100 <= 80·total),
    never float shares.  Ties broken by (revenue desc, partkey)."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import default_num_buckets, grouped_map, round_half_up

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = round_half_up(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0, 0
        ).astype(np.int64)
        return pa.table({"p": batch["l_partkey"], "c": pa.array(c)})

    rev = pre_aggregate(
        line.map_batches(cents, batch_format="pyarrow"), ["p"],
        {"c": ("c", "sum")},
    ).materialize()

    from ray.data.aggregate import Max, Min

    bounds = rev.aggregate(Min("c"), Max("c"))
    lo, hi = int(bounds["min(c)"]), int(bounds["max(c)"])
    n_ranges = default_num_buckets()
    width = max((hi - lo) // n_ranges + 1, 1)

    def rng_of(c: np.ndarray) -> np.ndarray:
        # descending: range 0 holds the LARGEST revenues
        return (n_ranges - 1
                - np.minimum((c - lo) // width, n_ranges - 1)).astype(
                    np.int64)

    def range_sums(batch: pa.Table) -> pa.Table:
        r = rng_of(batch["c"].to_numpy())
        s = np.bincount(r, weights=batch["c"].to_numpy(),
                        minlength=n_ranges).astype(np.int64)
        nz = np.nonzero(s)[0]
        return pa.table({"rng": pa.array(nz, pa.int64()),
                         "s": pa.array(s[nz])})

    hist = (
        pre_aggregate(
            rev.map_batches(range_sums, batch_format="pyarrow"),
            ["rng"], {"s": ("s", "sum")},
        )
        .to_pandas().sort_values("rng")
    )
    offsets = np.zeros(n_ranges, np.int64)
    idx = hist["rng"].to_numpy(np.int64)
    csum = np.concatenate([[0],
                           np.cumsum(hist["s"].to_numpy(np.int64))[:-1]])
    offsets[idx] = csum
    total = int(hist["s"].sum())

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rng", pa.array(rng_of(batch["c"].to_numpy()))
        )

    tagged = rev.map_batches(tag, batch_format="pyarrow")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r, grp in df.groupby("rng", sort=False):
            g = grp.sort_values(["c", "p"], ascending=[False, True],
                                kind="mergesort")
            cum = offsets[int(r)] + np.cumsum(g["c"].to_numpy(np.int64))
            abc = np.where(
                cum * 100 <= 80 * total, "A",
                np.where(cum * 100 <= 95 * total, "B", "C"),
            )
            out.append(pd.DataFrame(
                {"p_partkey": g["p"].to_numpy(np.int64), "abc": abc}
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"p_partkey": [], "abc": []})

    return grouped_map(tagged, "rng", classify)


SQL_PARTS_ABC = """
WITH r AS (SELECT l_partkey AS p,
                  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM lineitem GROUP BY 1),
w AS (SELECT p, c,
             SUM(c) OVER (ORDER BY c DESC, p) AS cum,
             SUM(c) OVER () AS tot
      FROM r)
SELECT p AS p_partkey,
       CASE WHEN cum * 100 <= 80 * tot THEN 'A'
            WHEN cum * 100 <= 95 * tot THEN 'B'
            ELSE 'C' END AS abc
FROM w
"""


def q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix (predicted vs labeled lang, counts)
    — the eval composition over the langid heuristic: the predictor is
    the SAME add_langid kernel langid uses, the label is the documents
    table's lang column, and the matrix folds through the combiner
    (|langs|² keys).  The oracle embeds langid's own SQL as a
    subquery — query composition, not a new rule."""
    from kgray.ops.agg import pre_aggregate
    from kgray.ops.text import add_langid

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def pred(batch: pa.Table) -> pa.Table:
        t = add_langid(batch)
        return pa.table({"lang": batch["lang"],
                         "lang_pred": t["lang_pred"]})

    return pre_aggregate(
        docs.map_batches(pred, batch_format="pyarrow"),
        ["lang", "lang_pred"], {"n": (None, "count")},
    )


SQL_LANGID_CONFUSION = """
SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN (""" + SQL_LANGID + """) p ON d.doc_id = p.doc_id
GROUP BY 1, 2
"""


def q_events_churn_labels(sf_dir: str):
    """Training-label generation for churn prediction: one row per
    (user, active day) labeled 1 iff the user has NO activity in the
    next 7 calendar days — the canonical supervised-dataset builder.
    ONE user cogroup: distinct sorted day ints, next-day shift, exact
    integer compare (the last active day is churned by definition)."""
    from kgray.util import grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_user(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.cast(
                    pc.cast(
                        pc.floor_temporal(batch["ts"], unit="day"),
                        pa.date32(),
                    ),
                    pa.int32(),
                ),
            }
        ).group_by(["user_id", "day"]).aggregate([])

    du = ev.map_batches(day_user, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        us = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        churned = np.ones(len(df), np.int64)
        if len(df) > 1:
            returned = (us[1:] == us[:-1]) & (d[1:] - d[:-1] <= 7)
            churned[:-1] = (~returned).astype(np.int64)
        day_str = np.array(
            [str(np.datetime64(int(x), "D")) for x in d.tolist()]
        )
        return pd.DataFrame(
            {"user_id": us, "day": day_str, "churned": churned}
        )

    return grouped_map(du, "user_id", per_bucket)


SQL_EVENTS_CHURN_LABELS = """
WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT a.user_id, strftime(a.d, '%Y-%m-%d') AS day,
       CAST(CASE WHEN EXISTS (
              SELECT 1 FROM du b
              WHERE b.user_id = a.user_id
                AND b.d > a.d AND b.d <= a.d + 7)
            THEN 0 ELSE 1 END AS BIGINT) AS churned
FROM du a
"""


def q_part_sorted_neighbor_pairs(sf_dir: str):
    """Sorted-neighborhood blocking (the classic entity-resolution
    candidate generator the LSH/token-block family lacks): candidate
    pairs are rows within window 2 of each other in the GLOBAL
    (p_name, p_partkey) sort order — without a global sort: the
    distinct-name histogram (metadata-scale: the name vocabulary, not
    the part count) gives every name its rank offset, a name cogroup
    emits in-name window pairs from tie ranks, and only each name's
    head-2/tail-2 rows (≤ 4·|names|) return to the driver to close the
    cross-name boundary pairs.  Exactly equals the oracle's ROW_NUMBER
    self-join."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import grouped_map

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    hist = (
        pre_aggregate(part.select_columns(["p_name"]), ["p_name"],
                      {"c": (None, "count")})
        .to_pandas().sort_values("p_name")
    )
    names = hist["p_name"].to_numpy()
    counts = hist["c"].to_numpy(np.int64)
    offsets = dict(
        zip(names.tolist(),
            np.concatenate([[0], np.cumsum(counts)[:-1]]).tolist())
    )
    cnt_of = dict(zip(names.tolist(), counts.tolist()))

    def per_name(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for name, grp in df.groupby("p_name", sort=False):
            g = grp.sort_values("p_partkey", kind="mergesort")
            keys = g["p_partkey"].to_numpy(np.int64)
            base = offsets[name]
            n = len(g)
            for w in (1, 2):
                if n > w:
                    out.append(pd.DataFrame(
                        {"k1": keys[:-w], "k2": keys[w:],
                         "is_pair": 1, "rank": -1, "name": ""}
                    ))
            # boundary rows: global head-2 / tail-2 of this name block
            sel = np.zeros(n, bool)
            sel[:2] = True
            sel[max(n - 2, 0):] = True
            ranks = base + np.flatnonzero(sel) + 1
            out.append(pd.DataFrame(
                {"k1": keys[sel], "k2": -1, "is_pair": 0,
                 "rank": ranks, "name": name}
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"k1": [], "k2": [], "is_pair": [], "rank": [], "name": []}
        )

    rows = grouped_map(part, "p_name", per_name).to_pandas()
    pairs = rows[rows["is_pair"] == 1][["k1", "k2"]]
    b = rows[rows["is_pair"] == 0].sort_values("rank")
    br = b["rank"].to_numpy(np.int64)
    bk = b["k1"].to_numpy(np.int64)
    bn = b["name"].to_numpy()
    cross = []
    for w in (1, 2):
        if len(b) > w:
            close = (br[w:] - br[:-w] <= 2) & (bn[w:] != bn[:-w])
            cross.append(pd.DataFrame(
                {"k1": bk[:-w][close], "k2": bk[w:][close]}
            ))
    allp = pd.concat([pairs] + cross, ignore_index=True)
    return pa.table(
        {
            "k1": pa.array(allp["k1"].to_numpy(np.int64)),
            "k2": pa.array(allp["k2"].to_numpy(np.int64)),
        }
    )


SQL_PART_SORTED_NEIGHBOR_PAIRS = """
WITH r AS (SELECT p_partkey, p_name,
                  ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rn
           FROM part)
SELECT a.p_partkey AS k1, b.p_partkey AS k2
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2
"""


def q_part_name_clusters(sf_dir: str):
    """Entity-resolution END-TO-END with a full SQL oracle: the blocked
    fuzzy pair graph (q_part_name_fuzzy_pairs — distinct-name
    vocabulary, trailing-token blocking, vectorized Levenshtein <= 2)
    feeds :func:`canonical.connected_components` (min-label closure,
    driver union-find under the gate / MapReduce-CC above it) and every
    name maps to its cluster representative (isolated names map to
    themselves).  The oracle runs the identical edge SQL through a
    recursive-CTE closure — the dedup_purge pattern applied to the ER
    chain, proving candidate-generation + clustering + canonical-pick
    as ONE checked unit."""
    from kgray.ops.canonical import connected_components

    edges = q_part_name_fuzzy_pairs(sf_dir).map_batches(
        lambda b: pa.table({"u": b["name_a"], "v": b["name_b"]}),
        batch_format="pyarrow",
    )
    comp = connected_components(edges)
    comp_df = (
        comp.to_pandas() if hasattr(comp, "to_pandas")
        else comp
    )
    rep_of = dict(zip(comp_df["node"], comp_df["component"]))

    from kgray.ops.agg import pre_aggregate

    names = pre_aggregate(
        _read(sf_dir, "part", ["p_name"]), ["p_name"],
        {"c": (None, "count")},
    )

    def attach(batch: pa.Table) -> pa.Table:
        nm = batch["p_name"].to_pylist()
        return pa.table(
            {
                "p_name": batch["p_name"],
                "cluster_rep": pa.array(
                    [rep_of.get(n, n) for n in nm], pa.string()
                ),
            }
        )

    return names.map_batches(attach, batch_format="pyarrow")


SQL_PART_NAME_CLUSTERS = """
WITH RECURSIVE
n AS (SELECT DISTINCT p_name FROM part),
p AS (SELECT a.p_name AS u, b.p_name AS v
      FROM n a JOIN n b
        ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
       AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2),
sym AS (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
cc AS (SELECT src AS node, src AS label FROM sym
       UNION
       SELECT s.dst AS node, cc.label FROM cc JOIN sym s
         ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)
SELECT n.p_name, COALESCE(comp.component, n.p_name) AS cluster_rep
FROM n LEFT JOIN comp ON n.p_name = comp.node
"""


def q_events_weekday_adjusted(sf_dir: str):
    """Seasonal (weekday-effect) adjustment of the daily event series:
    residual = day count − that weekday's cross-corpus mean — the
    classic decomposition step before anomaly detection.  Counts fold
    through the combiner (integers), the 7-row weekday baseline is
    exact-rational (Σ/n of ints) with the identical expression both
    engines, and only the final subtraction is float (ROUND 4).
    Weekday convention pinned to ISO (Mon=1..Sun=7) in both engines."""
    from kgray.ops.agg import pre_aggregate
    from kgray.util import round_half_up

    ev = _read(sf_dir, "events", ["ts"])

    def day(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                            pa.date32())}
        )

    daily = (
        pre_aggregate(
            ev.map_batches(day, batch_format="pyarrow"), ["day"],
            {"n": (None, "count")},
        )
        .to_pandas().sort_values("day")
    )
    days = daily["day"].to_numpy("datetime64[D]").astype(np.int64)
    # 1970-01-01 was a Thursday: ISO weekday = ((epoch_days + 3) % 7) + 1
    wd = ((days + 3) % 7 + 1).astype(np.int64)
    n = daily["n"].to_numpy(np.int64)
    base = pd.DataFrame({"wd": wd, "n": n}).groupby("wd")["n"]
    mean_of = (base.sum() / base.count()).to_dict()
    resid = n - np.array([mean_of[w] for w in wd.tolist()])
    day_str = np.array([str(np.datetime64(int(d), "D"))
                        for d in days.tolist()])
    return pa.table(
        {
            "day": pa.array(day_str),
            "n": pa.array(n),
            "resid": pa.array(round_half_up(resid, 4), pa.float64()),
        }
    )


SQL_EVENTS_WEEKDAY_ADJUSTED = """
WITH c AS (SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
b AS (SELECT isodow(d) AS wd,
             CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
      FROM c GROUP BY 1)
SELECT strftime(c.d, '%Y-%m-%d') AS day, c.n,
       ROUND(c.n - b.m, 4) AS resid
FROM c JOIN b ON isodow(c.d) = b.wd
"""


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

CATALOG: dict[str, tuple] = {
    # name -> (ray_fn, sql or None)
    "lang_counts": (q_lang_counts, SQL_LANG_COUNTS),
    "max_doc_length": (q_max_doc_length, SQL_MAX_DOC_LENGTH),
    "doclen_hist": (q_doclen_hist, SQL_DOCLEN_HIST),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "contains_filter": (q_contains_filter, SQL_CONTAINS_FILTER),
    "avg_token_len": (q_avg_token_len, SQL_AVG_TOKEN_LEN),
    "stopword_ratio": (q_stopword_ratio, SQL_STOPWORD_RATIO),
    "langid": (q_langid, SQL_LANGID),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "ngram_dup_pairs": (q_ngram_dup_pairs, SQL_NGRAM_DUP_PAIRS),
    "embed_knn": (q_embed_knn, SQL_EMBED_KNN),
    "embed_dup_pairs": (q_embed_dup_pairs, SQL_EMBED_DUP_PAIRS),
    "embed_label_counts": (q_embed_label_counts, SQL_EMBED_LABEL_COUNTS),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "mktsegment_revenue": (q_mktsegment_revenue, SQL_MKTSEGMENT_REVENUE),
    "supplier_balance_by_region": (
        q_supplier_balance_by_region, SQL_SUPPLIER_BALANCE_BY_REGION
    ),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "part_type_stats": (q_part_type_stats, SQL_PART_TYPE_STATS),
    "orders_monthly": (q_orders_monthly, SQL_ORDERS_MONTHLY),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_user_topk": (q_events_user_topk, SQL_EVENTS_USER_TOPK),
    "events_sessions": (q_events_sessions, SQL_EVENTS_SESSIONS),
    "event_type_counts": (q_event_type_counts, SQL_EVENT_TYPE_COUNTS),
    "events_distinct_users": (q_events_distinct_users, SQL_EVENTS_DISTINCT_USERS),
    "events_top_per_user": (q_events_top_per_user, SQL_EVENTS_TOP_PER_USER),
    "orders_priority_revenue": (
        q_orders_priority_revenue, SQL_ORDERS_PRIORITY_REVENUE
    ),
    "word_topk": (q_word_topk, SQL_WORD_TOPK),
    "orders_1995": (q_orders_1995, SQL_ORDERS_1995),
    "wordpiece_stats": (q_wordpiece_stats, SQL_WORDPIECE_STATS),
    "customers_no_orders": (q_customers_no_orders, SQL_CUSTOMERS_NO_ORDERS),
    "parts_in_lineitem": (q_parts_in_lineitem, SQL_PARTS_IN_LINEITEM),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "events_daily_users": (q_events_daily_users, SQL_EVENTS_DAILY_USERS),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "orders_price_bands": (q_orders_price_bands, SQL_ORDERS_PRICE_BANDS),
    "token_stats_bpe": (q_token_stats_bpe, SQL_TOKEN_STATS_BPE),
    "hash_split_counts": (q_hash_split_counts, SQL_HASH_SPLIT_COUNTS),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "doclen_quantiles": (q_doclen_quantiles, SQL_DOCLEN_QUANTILES),
    "doclen_quantiles_by_lang": (
        q_doclen_quantiles_by_lang, SQL_DOCLEN_QUANTILES_BY_LANG
    ),
    "contamination": (q_contamination, SQL_CONTAMINATION),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "source_mixture": (q_source_mixture, SQL_SOURCE_MIXTURE),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "pack_offsets": (q_pack_offsets, SQL_PACK_OFFSETS),
    "dedup_purge": (q_dedup_purge, SQL_DEDUP_PURGE),
    "skew_chaos": (q_skew_chaos, None),
    "events_distinct_users_approx": (
        q_events_distinct_users_approx, _HLL_USERS_SQL,
    ),
    "lm_score": (q_lm_score, SQL_LM_SCORE),
    "events_user_cumsum": (q_events_user_cumsum, SQL_EVENTS_USER_CUMSUM),
    "events_props_stats": (q_events_props_stats, SQL_EVENTS_PROPS_STATS),
    "docs_rollup": (q_docs_rollup, SQL_DOCS_ROLLUP),
    "word_topk_approx": (q_word_topk_approx, SQL_WORD_TOPK_APPROX),
    "events_value_corr": (q_events_value_corr, SQL_EVENTS_VALUE_CORR),
    "doclen_trimmed": (q_doclen_trimmed, SQL_DOCLEN_TRIMMED),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "collocations": (q_collocations, SQL_COLLOCATIONS),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "embed_centroids": (q_embed_centroids, SQL_EMBED_CENTROIDS),
    "dup_ngrams": (q_dup_ngrams, SQL_DUP_NGRAMS),
    "doclen_percent_rank": (q_doclen_percent_rank, SQL_DOCLEN_PERCENT_RANK),
    "events_daily_users_approx": (q_events_daily_users_approx, None),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "embed_dim_stats": (q_embed_dim_stats, SQL_EMBED_DIM_STATS),
    "events_interarrival": (q_events_interarrival, SQL_EVENTS_INTERARRIVAL),
    "value_quantiles_approx": (q_value_quantiles_approx, None),
    "doc_chunks": (q_doc_chunks, SQL_DOC_CHUNKS),
    "lang_top_terms": (q_lang_top_terms, SQL_LANG_TOP_TERMS),
    "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
    "column_profile": (q_column_profile, SQL_COLUMN_PROFILE),
    "split_contamination": (q_split_contamination, SQL_SPLIT_CONTAMINATION),
    "term_postings": (q_term_postings, SQL_TERM_POSTINGS),
    "events_zscore_outliers": (
        q_events_zscore_outliers, SQL_EVENTS_ZSCORE_OUTLIERS
    ),
    "events_outer_activity": (
        q_events_outer_activity, SQL_EVENTS_OUTER_ACTIVITY
    ),
    "bpe_merges": (q_bpe_merges, None),
    "events_value_trend": (q_events_value_trend, SQL_EVENTS_VALUE_TREND),
    "events_interval_merge": (
        q_events_interval_merge, SQL_EVENTS_INTERVAL_MERGE
    ),
    "events_rolling_active": (
        q_events_rolling_active, SQL_EVENTS_ROLLING_ACTIVE
    ),
    "word_counts_cms": (q_word_counts_cms, SQL_WORD_COUNTS_CMS),
    "orders_diff": (q_orders_diff, SQL_ORDERS_DIFF),
    "doc_entropy": (q_doc_entropy, SQL_DOC_ENTROPY),
    "events_transitions": (q_events_transitions, SQL_EVENTS_TRANSITIONS),
    "events_mktsegment_value": (
        q_events_mktsegment_value, SQL_EVENTS_MKTSEGMENT_VALUE
    ),
    "events_chi2": (q_events_chi2, SQL_EVENTS_CHI2),
    "embed_covariance": (q_embed_covariance, SQL_EMBED_COVARIANCE),
    "embed_pca_variance": (q_embed_pca_variance, None),
    "embed_kmeans": (q_embed_kmeans, None),
    "events_mad_outliers": (
        q_events_mad_outliers, SQL_EVENTS_MAD_OUTLIERS
    ),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "user_activity_gini": (q_user_activity_gini, SQL_USER_ACTIVITY_GINI),
    "events_user_ewma": (q_events_user_ewma, None),
    "orders_large_baskets": (
        q_orders_large_baskets, SQL_ORDERS_LARGE_BASKETS
    ),
    "embed_quantize_error": (
        q_embed_quantize_error, SQL_EMBED_QUANTIZE_ERROR
    ),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
    "events_conversion_lag": (
        q_events_conversion_lag, SQL_EVENTS_CONVERSION_LAG
    ),
    "events_moving_avg": (q_events_moving_avg, SQL_EVENTS_MOVING_AVG),
    "bigram_diff": (q_bigram_diff, SQL_BIGRAM_DIFF),
    "quality_rules": (q_quality_rules, SQL_QUALITY_RULES),
    "basket_pairs": (q_basket_pairs, SQL_BASKET_PAIRS),
    "events_decay_sum": (q_events_decay_sum, SQL_EVENTS_DECAY_SUM),
    "doclen_ntile": (q_doclen_ntile, SQL_DOCLEN_NTILE),
    "users_copurchase": (q_users_copurchase, SQL_USERS_COPURCHASE),
    "orders_upsert": (q_orders_upsert, SQL_ORDERS_UPSERT),
    "events_out_of_order": (
        q_events_out_of_order, SQL_EVENTS_OUT_OF_ORDER
    ),
    "top_supplier_per_nation": (
        q_top_supplier_per_nation, SQL_TOP_SUPPLIER_PER_NATION
    ),
    "user_type_profile": (q_user_type_profile, SQL_USER_TYPE_PROFILE),
    "events_distinct_bitmap": (
        q_events_distinct_bitmap, SQL_EVENTS_DISTINCT_BITMAP
    ),
    "pareto_parts": (q_pareto_parts, SQL_PARETO_PARTS),
    "events_adoption": (q_events_adoption, SQL_EVENTS_ADOPTION),
    "events_attribution": (q_events_attribution, SQL_EVENTS_ATTRIBUTION),
    "embed_drift": (q_embed_drift, SQL_EMBED_DRIFT),
    "part_name_fuzzy_pairs": (
        q_part_name_fuzzy_pairs, SQL_PART_NAME_FUZZY_PAIRS
    ),
    "orders_weekly_growth": (
        q_orders_weekly_growth, SQL_ORDERS_WEEKLY_GROWTH
    ),
    "join_stats": (q_join_stats, SQL_JOIN_STATS),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "users_bfs": (q_users_bfs, SQL_USERS_BFS),
    "events_drawdown": (q_events_drawdown, SQL_EVENTS_DRAWDOWN),
    "events_trigrams": (q_events_trigrams, SQL_EVENTS_TRIGRAMS),
    "events_seasonal_anomaly": (
        q_events_seasonal_anomaly, SQL_EVENTS_SEASONAL_ANOMALY
    ),
    "events_rfm": (q_events_rfm, SQL_EVENTS_RFM),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "user_value_median": (q_user_value_median, SQL_USER_VALUE_MEDIAN),
    "events_hourly_dedup": (q_events_hourly_dedup, SQL_EVENTS_HOURLY_DEDUP),
    "user_streaks": (q_user_streaks, SQL_USER_STREAKS),
    "user_daily_dense": (q_user_daily_dense, SQL_USER_DAILY_DENSE),
    "dup_span_stats": (q_dup_span_stats, SQL_DUP_SPAN_STATS),
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "embed_label_diversity": (
        q_embed_label_diversity, SQL_EMBED_LABEL_DIVERSITY
    ),
    "user_value_mad": (q_user_value_mad, SQL_USER_VALUE_MAD),
    "events_session_ids": (q_events_session_ids, SQL_EVENTS_SESSION_IDS),
    "events_window_join": (q_events_window_join, SQL_EVENTS_WINDOW_JOIN),
    "fk_integrity_audit": (q_fk_integrity_audit, SQL_FK_INTEGRITY_AUDIT),
    "contact_extract": (q_contact_extract, SQL_CONTACT_EXTRACT),
    "docs_cube": (q_docs_cube, SQL_DOCS_CUBE),
    "dup_span_purge": (q_dup_span_purge, SQL_DUP_SPAN_PURGE),
    "customers_all_priorities": (
        q_customers_all_priorities, SQL_CUSTOMERS_ALL_PRIORITIES
    ),
    "events_session_overlap": (
        q_events_session_overlap, SQL_EVENTS_SESSION_OVERLAP
    ),
    "lineitem_unpivot": (q_lineitem_unpivot, SQL_LINEITEM_UNPIVOT),
    "copurchase_triangles": (
        q_copurchase_triangles, SQL_COPURCHASE_TRIANGLES
    ),
    "orders_benford": (q_orders_benford, SQL_ORDERS_BENFORD),
    "events_user_mode": (q_events_user_mode, SQL_EVENTS_USER_MODE),
    "word_window_pairs": (q_word_window_pairs, SQL_WORD_WINDOW_PAIRS),
    "events_runs": (q_events_runs, SQL_EVENTS_RUNS),
    "doc_rrf": (q_doc_rrf, SQL_DOC_RRF),
    "part_supplier_pagerank": (
        q_part_supplier_pagerank, SQL_PART_SUPPLIER_PAGERANK
    ),
    "graph_bfs_hops": (q_graph_bfs_hops, SQL_GRAPH_BFS_HOPS),
    "events_kl_daily": (q_events_kl_daily, SQL_EVENTS_KL_DAILY),
    "events_welch_t": (q_events_welch_t, SQL_EVENTS_WELCH_T),
    "user_scd2": (q_user_scd2, SQL_USER_SCD2),
    "doc_dense_rank": (q_doc_dense_rank, SQL_DOC_DENSE_RANK),
    "brand_weighted_median": (
        q_brand_weighted_median, SQL_BRAND_WEIGHTED_MEDIAN
    ),
    "users_click_and_purchase": (
        q_users_click_and_purchase, SQL_USERS_CLICK_AND_PURCHASE
    ),
    "revenue_gini": (q_revenue_gini, SQL_REVENUE_GINI),
    "top_suppliers_with_ties": (
        q_top_suppliers_with_ties, SQL_TOP_SUPPLIERS_WITH_TIES
    ),
    "events_value_deciles": (
        q_events_value_deciles, SQL_EVENTS_VALUE_DECILES
    ),
    "events_day_overlap": (q_events_day_overlap, SQL_EVENTS_DAY_OVERLAP),
    "events_cusum": (q_events_cusum, SQL_EVENTS_CUSUM),
    "events_lead_lag": (q_events_lead_lag, SQL_EVENTS_LEAD_LAG),
    "user_value_interp": (q_user_value_interp, SQL_USER_VALUE_INTERP),
    "events_geomean": (q_events_geomean, SQL_EVENTS_GEOMEAN),
    "events_minmax_norm": (q_events_minmax_norm, SQL_EVENTS_MINMAX_NORM),
    "events_fano": (q_events_fano, SQL_EVENTS_FANO),
    "events_cuped": (q_events_cuped, SQL_EVENTS_CUPED),
    "events_winsorized": (q_events_winsorized, SQL_EVENTS_WINSORIZED),
    "events_mannwhitney": (
        q_events_mannwhitney, SQL_EVENTS_MANNWHITNEY
    ),
    "events_bounce_rate": (q_events_bounce_rate, SQL_EVENTS_BOUNCE_RATE),
    "events_cohort_ltv": (q_events_cohort_ltv, SQL_EVENTS_COHORT_LTV),
    "doc_simpson": (q_doc_simpson, SQL_DOC_SIMPSON),
    "parts_abc": (q_parts_abc, SQL_PARTS_ABC),
    "langid_confusion": (q_langid_confusion, SQL_LANGID_CONFUSION),
    "events_churn_labels": (
        q_events_churn_labels, SQL_EVENTS_CHURN_LABELS
    ),
    "part_sorted_neighbor_pairs": (
        q_part_sorted_neighbor_pairs, SQL_PART_SORTED_NEIGHBOR_PAIRS
    ),
    "part_name_clusters": (q_part_name_clusters, SQL_PART_NAME_CLUSTERS),
    "events_weekday_adjusted": (
        q_events_weekday_adjusted, SQL_EVENTS_WEEKDAY_ADJUSTED
    ),
}
