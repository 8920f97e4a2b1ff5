"""kgray.queries.analytics1 — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)



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
    Rows-only: FLOAT ewma is summation-shape-sensitive across engines
    (pandas ewm vs any SQL reformulation drift in ulps); the exact
    recurrence is pinned against a hand-rolled loop in tests.  The
    INTEGER fixed-point twin (analytics7.q_events_int_ewma) IS
    oracle-checked via a ROW_NUMBER-indexed recursive CTE — the
    engine-exactness, not the recursion, was the blocker."""

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
