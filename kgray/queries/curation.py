"""kgray.queries.curation — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)
from kgray.io import read_parquet_clean as _rpqc



# ---------------------------------------------------------------------------
# curation: deterministic splits / samples / quantiles / decontamination
# (ops/sample.py, ops/dedup.py::ngram_contamination — engine additions for
# training-data curation; quantile semantics pinned to rank(p) = ceil(p*N))
# ---------------------------------------------------------------------------

def q_hash_split_counts(sf_dir: str):
    """Deterministic md5 train/val/test split (stateless map, no shuffle,
    no RNG) rolled up to per-split counts."""

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

    from kgray.corpus import adversarial_docs
    from kgray.ops.dedup import minhash_dup_pairs

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
_NEARDUP_CC_SQL = """WITH RECURSIVE
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM documents
  WHERE len(string_split(text,' ')) >= 3),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
         FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
p AS (
  SELECT c.u, c.v
  FROM cand c JOIN sh a ON c.u = a.doc_id JOIN sh b ON c.v = b.doc_id
  WHERE CAST(c.common AS DOUBLE) /
        (len(a.shingles) + len(b.shingles) - c.common) >= 0.7),
sym AS (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
cc AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)"""

SQL_DEDUP_PURGE = _NEARDUP_CC_SQL + """,
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



    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nat_reg = broadcast_join(nat, reg, on="n_regionkey",
                             right_on="r_regionkey", how="inner")
    asia = nat_reg.map_batches(
        lambda b: b.filter(pc.equal(b["r_name"], "ASIA")),
        batch_format="pyarrow",
    )

    orders = _rpqc(  # prune at the read: 1995 row groups only
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
SQL_EVENTS_DISTINCT_USERS_APPROX = """
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
