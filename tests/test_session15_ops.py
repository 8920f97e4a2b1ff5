"""Session-15: Markov stationary distribution (dangling states),
degree assortativity (constant-degree NULL case), gazetteer phrase
counts (overlap-free repeat semantics), source JS divergence
(disjoint-vocab pair hits the closed-form ln 2)."""

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
