"""kgray.queries.events — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)
from kgray.io import read_parquet_clean as _rpqc



# ---------------------------------------------------------------------------
# events: tumbling window, top-k, session windows
# ---------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type (streaming-shaped aggregate)."""

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



    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    ds = _rpqc(
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


    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    big = _rpqc(
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


    ds = _rpqc(
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
