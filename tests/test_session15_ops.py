"""Session-15: Markov stationary distribution (dangling states),
degree assortativity (constant-degree NULL case), gazetteer phrase
counts (overlap-free repeat semantics), source JS divergence
(disjoint-vocab pair hits the closed-form ln 2)."""

import datetime

import duckdb
import numpy as np
import pandas as pd

from kgray.queries import CATALOG


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet", index=False)


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _run(qname, tmp_path):
    fn, sql = CATALOG[qname]
    res = fn(str(tmp_path))
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    return got, sql


def _cmp(got, exp, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        g, e = got[c].tolist(), exp[c].tolist()
        assert g == e or all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(g, e)
        ), (c, g, e)


def _events(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = df["value"].astype(np.float64)
    return df


def test_markov_dangling_state(ray_session, tmp_path):
    # user 1: a -> b -> a -> c ; 'c' never transitions out (dangling:
    # keeps its mass as a self-loop); user 2: single event type 'd'
    # (state with NO transitions at all -> pure self-loop forever).
    t0 = pd.Timestamp("2025-07-01")
    rows = [
        (0, t0, 1, "a", 1.0),
        (1, t0 + pd.Timedelta(minutes=1), 1, "b", 1.0),
        (2, t0 + pd.Timedelta(minutes=2), 1, "a", 1.0),
        (3, t0 + pd.Timedelta(minutes=3), 1, "c", 1.0),
        (4, t0, 2, "d", 1.0),
    ]
    _write(tmp_path, "events", _events(rows))
    got, sql = _run("events_markov_stationary", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_type"])
    # mass conservation up to per-state floor loss, and 'd' untouched
    d = dict(zip(got["event_type"], got["pi"]))
    assert d["d"] == 10**12 // 4
    assert sum(d.values()) <= 10**12


def test_assortativity_constant_degree_null(ray_session, tmp_path):
    # two disjoint co-purchase edges -> every endpoint degree 1 ->
    # zero variance -> NULL coefficient in BOTH engines
    t0 = pd.Timestamp("2025-07-01 09:30:00")
    rows = []
    for hr in range(2):
        for rep in range(2):  # >=2 shared hours per pair
            for u in (10 + hr, 20 + hr):
                rows.append(
                    (len(rows),
                     t0 + pd.Timedelta(days=rep, hours=hr,
                                       minutes=len(rows)),
                     u, "purchase", 1.0)
                )
    _write(tmp_path, "events", _events(rows))
    got, sql = _run("graph_assortativity", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    assert int(got["n_ends"][0]) == 4
    _cmp(got, exp, ["n_ends"])
    assert pd.isna(got["assortativity"][0])


def test_gazetteer_repeats_and_absent(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "row scan row scan fast table",   # 2x + 1x
                "nothing here",                    # 0
                "fast table fast table fast table",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": np.array([1, 1, 1], np.int64),
        }
    )
    _write(tmp_path, "documents", df)
    got, sql = _run("gazetteer_counts", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["phrase"])
    d = dict(zip(got["phrase"], got["n_occ"]))
    assert d["row scan"] == 2 and d["fast table"] == 4
    nd = dict(zip(got["phrase"], got["n_docs"]))
    assert nd["fast table"] == 2 and nd["hash join"] == 0


def test_semdedup_planted_clusters(ray_session, tmp_path):
    # two planted near-dup clusters + isolated vectors; components keep
    # the min vec_id and singletons don't appear
    rng = np.random.default_rng(7)
    base1 = rng.normal(size=8)
    base2 = rng.normal(size=8)
    vecs = [
        base1, base1 + 0.01, base1 - 0.01,          # cluster kept=0
        base2, base2 + 0.01,                        # cluster kept=3
        rng.normal(size=8), rng.normal(size=8),     # isolated
    ]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, np.float32) for v in vecs],
            "label": np.zeros(len(vecs), np.int32),
        }
    )
    _write(tmp_path, "embeddings", df)
    got, sql = _run("embed_semdedup", tmp_path)
    exp = _oracle(tmp_path, sql, ["embeddings"])
    _cmp(got, exp, ["kept"])
    d = dict(zip(got["kept"], got["n_members"]))
    assert d[0] == 3 and d[3] == 2


def test_vocab_growth_sparse_doc_ids(ray_session, tmp_path):
    # non-dense doc_ids: checkpoints derive from max(doc_id)+1, not
    # count; words recur so first-occurrence matters
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 5, 19], np.int64),
            "text": ["a b a", "b c", "c d e"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": np.array([1, 1, 1], np.int64),
        }
    )
    _write(tmp_path, "documents", df)
    got, sql = _run("vocab_growth", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["q"])
    last = got.sort_values("q").iloc[-1]
    assert last["n_tokens"] == 8 and last["n_vocab"] == 5
    assert got["n_vocab"].is_monotonic_increasing


def test_join_cardinality_no_overlap(ray_session, tmp_path):
    t0 = pd.Timestamp("2025-07-01")
    ev = _events([(0, t0, 1, "x", 1.0), (1, t0, 1, "x", 1.0),
                  (2, t0, 2, "x", 1.0)])
    _write(tmp_path, "events", ev)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.array([1, 1, 99], np.int64),
            "o_totalprice": np.ones(3),
            "o_orderstatus": ["F"] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
            "o_orderdate": [datetime.date(2025, 7, 1)] * 3,
        }
    )
    _write(tmp_path, "orders", orders)
    got, sql = _run("join_cardinality", tmp_path)
    exp = _oracle(tmp_path, sql, ["events", "orders"])
    _cmp(got, exp, ["n_pairs"])
    # user 1 (2 events x 2 orders) = 4; users 2/99 unmatched
    assert got["n_pairs"][0] == 4 and got["n_match_keys"][0] == 1


def test_zlib_ratio_pins_zlib(ray_session, tmp_path):
    import zlib

    texts = ["abc " * 50, "the quick brown fox", "zz", ""]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    _write(tmp_path, "documents", df)
    got, _ = _run("doc_zlib_ratio", tmp_path)
    got = got.sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        assert got["n_bytes"][i] == len(t.encode())
        assert got["z_bytes"][i] == len(zlib.compress(t.encode(), 6))
    # the repetitive doc compresses below half; the empty doc doesn't
    assert got["z_bytes"][0] < got["n_bytes"][0] / 10


def test_js_divergence_disjoint_vocab(ray_session, tmp_path):
    # disjoint unigram supports -> JS = ln 2 exactly (max divergence)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": ["aa aa bb", "cc dd dd"],
            "lang": ["en"] * 2,
            "source": ["s1", "s2"],
            "n_chars": np.array([1, 1], np.int64),
        }
    )
    _write(tmp_path, "documents", df)
    got, sql = _run("source_js_divergence", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["s1", "s2"])
    assert abs(got["js"][0] - round(np.log(2), 4)) < 1e-9
