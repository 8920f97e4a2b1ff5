"""kgray.queries.docs — split from the flat catalog; see _common."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.queries._common import *  # shared prelude (np/pa/pc, joins, aggs, _read)



# ---------------------------------------------------------------------------
# documents analytics (reference G1-G4/G8/M16-M17 analogues, SURVEY.md §2.5)
# ---------------------------------------------------------------------------

def q_lang_counts(sf_dir: str):
    """G8-style distinct-count: docs per lang."""

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
  WHERE len(string_split(text,' ')) >= 3),
-- shared-shingle blocking is LOSSLESS for J >= tau (zero-common pairs
-- cannot reach any positive threshold); the inverted-index count equals
-- len(list_intersect) on the distinct shingle lists.  The all-pairs
-- formulation took >10 min at sf0.1; this runs in seconds.
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
         FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT c.u, c.v,
       ROUND(CAST(c.common AS DOUBLE) /
             (len(a.shingles) + len(b.shingles) - c.common), 4) AS jac
FROM cand c JOIN sh a ON c.u = a.doc_id JOIN sh b ON c.v = b.doc_id
WHERE CAST(c.common AS DOUBLE) /
      (len(a.shingles) + len(b.shingles) - c.common) >= 0.8
"""
