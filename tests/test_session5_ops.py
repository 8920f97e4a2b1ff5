"""Session-5 operator batch (co-purchase triangles, Benford digits,
per-user mode, skip-gram window pairs, event-type run-length encoding,
reciprocal-rank fusion) — each pinned against the same DuckDB SQL the
driver oracle runs, over fixtures that force the edge cases: a known
2-triangle graph with a count-1 edge that must NOT close a wedge and a
duplicate (order, part) row that DISTINCT must collapse; mode ties
(lexicographic tie-break); runs interrupted and resumed (A A B A A A);
single-token, two-token and EMPTY documents for the distance-2 skip
gram; and heavy n_chars/token-count ties plus >100 docs so the RRF
LIMIT binds."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from kgray.queries import CATALOG


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet", index=False)


def _lineitem(tmp_path):
    rows = []
    # two orders with {1,2,3} -> triangle; two with {1,2,6} -> triangle
    for o, parts in [(100, [1, 2, 3]), (101, [1, 2, 3]),
                     (102, [1, 2, 6]), (103, [1, 2, 6]),
                     (104, [3, 6]),            # count-1 edge: excluded
                     (105, [4, 5]),            # count-1 edge: excluded
                     (106, [1]), (107, [2, 7])]:
        for p in parts:
            rows.append((o, p))
    rows.append((100, 1))  # duplicate (order, part): DISTINCT must collapse
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_orderkey"] = df["l_orderkey"].astype(np.int64)
    df["l_partkey"] = df["l_partkey"].astype(np.int64)
    _write(tmp_path, "lineitem", df)
    return df


def _orders(tmp_path):
    # cents-exact doubles across every leading digit incl. 1-cent and
    # a price whose *100 double product is a hair under the integer
    prices = [0.01, 1.0, 123.45, 2000.99, 34.50, 4567.89, 555.55,
              60000.00, 7.77, 88888.88, 950000.50, 19.99, 123.45]
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(prices), dtype=np.int64),
            "o_totalprice": np.array(prices, np.float64),
        }
    )
    _write(tmp_path, "orders", df)
    return df


def _events(tmp_path):
    rows = []
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    # user 1: 3 click + 3 view interleaved -> mode tie, 'click' wins
    seq1 = ["view", "click", "view", "click", "view", "click"]
    # user 2: runs A A | B | A A A  (run resumes after interruption)
    seq2 = ["A", "A", "B", "A", "A", "A"]
    # user 3: single event
    seq3 = ["solo"]
    eid = 0
    for uid, seq in [(1, seq1), (2, seq2), (3, seq3)]:
        for i, et in enumerate(seq):
            rows.append((eid, t0 + pd.Timedelta(minutes=i), uid, et))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)
    return df


def _documents(tmp_path, n_extra=120):
    texts = ["alpha", "alpha beta", "alpha beta gamma", "", "x y z w",
             "beta beta beta"]
    rng = np.random.default_rng(7)
    vocab = ["red", "blue", "green", "key", "hash"]
    for i in range(n_extra):
        # heavy tie mass: many docs share token counts and char lengths
        k = int(rng.integers(1, 5))
        texts.append(" ".join(rng.choice(vocab, k)))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    _write(tmp_path, "documents", df)
    return df


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
        assert got[c].tolist() == exp[c].tolist(), c


def test_copurchase_triangles(ray_session, tmp_path):
    _lineitem(tmp_path)
    got, sql = _run("copurchase_triangles", tmp_path)
    exp = _oracle(tmp_path, sql, ["lineitem"])
    # fixture ground truth: exactly {1,2,3} and {1,2,6}
    assert exp["n_triangles"].iloc[0] == 2
    _cmp(got, exp, ["n_triangles"])


def test_orders_benford(ray_session, tmp_path):
    _orders(tmp_path)
    got, sql = _run("orders_benford", tmp_path)
    exp = _oracle(tmp_path, sql, ["orders"])
    assert set(exp["digit"]) >= {"1", "9"}  # 0.01 -> '1', 950000.50 -> '9'
    _cmp(got, exp, ["digit"])


def test_events_user_mode_tie_break(ray_session, tmp_path):
    _events(tmp_path)
    got, sql = _run("events_user_mode", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["user_id"])
    g = got.set_index("user_id")
    assert g.loc[1, "mode_type"] == "click"  # 3-3 tie -> lexicographic
    assert g.loc[3, "n"] == 1


def test_events_runs(ray_session, tmp_path):
    _events(tmp_path)
    got, sql = _run("events_runs", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["user_id", "run_start"])
    u2 = got[got["user_id"] == 2].sort_values("run_start")
    assert u2["event_type"].tolist() == ["A", "B", "A"]
    assert u2["run_len"].tolist() == [2, 1, 3]
    assert u2["run_start"].tolist() == [1, 3, 4]


def test_word_window_pairs(ray_session, tmp_path):
    _documents(tmp_path, n_extra=0)
    got, sql = _run("word_window_pairs", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["w1", "w2", "dist"])
    key = got.set_index(["w1", "w2", "dist"])["n"]
    assert key.loc[("alpha", "beta", 1)] == 2     # docs 1 and 2
    assert key.loc[("alpha", "gamma", 2)] == 1    # doc 2 only
    assert key.loc[("beta", "beta", 1)] == 2      # within-doc repeats


def test_doc_rrf(ray_session, tmp_path):
    _documents(tmp_path)
    got, sql = _run("doc_rrf", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    assert len(exp) == 100  # the LIMIT binds (126 docs in the fixture)
    _cmp(got, exp, ["doc_id"])


def test_doc_rrf_rank_decomposition(ray_session, tmp_path):
    """The histogram-base + tie-rank global row_number must equal a
    straight pandas rank over the same DESC, doc_id-ASC order."""
    docs = _documents(tmp_path)
    got, _ = _run("doc_rrf", tmp_path)
    m = docs.assign(n_tokens=docs["text"].str.count(" ") + 1)
    ra = m.sort_values(["n_chars", "doc_id"],
                       ascending=[False, True]).reset_index(drop=True)
    ra["r"] = np.arange(1, len(ra) + 1)
    exp_r = ra.set_index("doc_id")["r"]
    sub = got.set_index("doc_id")["r_chars"]
    assert (sub == exp_r.loc[sub.index]).all()
