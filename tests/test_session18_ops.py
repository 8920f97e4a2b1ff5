"""Session-18 operators: Kendall tau-b (hand-counted concordances,
tie handling), readability (hand-counted vowel groups), containment
pairs (planted sub/superset, direction asymmetry), personalized
PageRank (hand-unrolled recurrence + paths-agree + absent seeds), and
the FD audit (planted violations) — each also compared against its
DuckDB oracle on the synthetic fixture."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

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
        assert got[c].tolist() == exp[c].tolist(), c


def _events(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = df["value"].astype(np.float64)
    df["props"] = "{}"
    return df


def test_kendall_hand_computed(ray_session, tmp_path):
    # user 1: y = [10,20,15,5] over increasing ts ->
    #   C=2 (1<2, 1<3 pairs), D=4, no ties: tau = -2/6 = -0.333333
    # user 2: y = [10,10,20,20] -> C=4, D=0, ty=2:
    #   tau = 4/sqrt(6*4) = 0.816497
    # user 3: single event -> dropped; user 4: constant y -> dropped
    rows = []
    for i, y in enumerate([0.10, 0.20, 0.15, 0.05]):
        rows.append((i, f"2024-01-0{i+1}", 1, "a", y))
    for i, y in enumerate([0.10, 0.10, 0.20, 0.20]):
        rows.append((10 + i, f"2024-01-0{i+1}", 2, "a", y))
    rows.append((20, "2024-01-01", 3, "a", 1.0))
    rows.append((30, "2024-01-01", 4, "a", 1.0))
    rows.append((31, "2024-01-02", 4, "a", 1.0))
    _write(tmp_path, "events", _events(rows))
    got, sql = _run("events_kendall", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["user_id"])
    by_user = got.set_index("user_id")
    assert sorted(by_user.index) == [1, 2]
    assert by_user.loc[1, "conc"] == 2 and by_user.loc[1, "disc"] == 4
    assert by_user.loc[1, "tau_b"] == -0.333333
    assert by_user.loc[2, "tau_b"] == 0.816497


def test_readability_hand_computed(ray_session, tmp_path):
    # "aa bb cc" -> W=3, vowel groups: 'aa' only -> Syl=1
    # "ie ie"    -> W=2, Syl=2
    # per lang en: S=2, W=5, Syl=3:
    #   FK = 0.39*2.5 + 11.8*0.6 - 15.59 = 0.975 + 7.08 - 15.59 = -7.535
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "en"],
            "text": ["aa bb cc", "ie ie"],
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("lang_readability", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["lang"])
    row = got.iloc[0]
    assert row["n_docs"] == 2 and row["n_words"] == 5
    assert row["n_syllables"] == 3
    assert row["fk_grade"] == -7.535


def test_containment_planted_subset(ray_session, tmp_path):
    # doc 1's 5 words sit verbatim inside doc 2 (12 words): all 3 of
    # doc 1's shingles occur in doc 2 -> cont(1 in 2) = 1.0, while
    # cont(2 in 1) = 3/10 < tau and jaccard = 3/10 < tau.
    # doc 3 shares nothing.
    base = "alpha beta gamma delta epsilon"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                base,
                base + " zeta eta theta iota kappa lam mu",
                "one two three four five six",
            ],
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("doc_containment_pairs", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["u", "v"])
    assert got[["u", "v"]].values.tolist() == [[1, 2]]
    assert got["cont"].tolist() == [1.0]


def test_ppr_hand_unrolled_and_paths_agree(ray_session, monkeypatch):
    from kgray.ops.graph import ppr_int

    # path graph 1-2-3, seed {1}, 1 iter, scale 100:
    # deg = [1,2,1]; r0 = [100,0,0]
    # contrib: node2 <- r(1)//1 + r(3)//1 = 100; node1 <- r(2)//2 = 0
    # r1 = [15 + 0, 0 + 85*100//100, 0] = [15, 85, 0]
    edges = rd.from_pandas(pd.DataFrame({"u": [1, 2], "v": [2, 3]}))
    t = ppr_int(edges, [1], iters=1, scale=100)
    got = dict(zip(t["node"].to_pylist(), t["r"].to_pylist()))
    assert got == {1: 15, 2: 85, 3: 0}

    # absent seeds are ignored; all-absent -> empty
    t2 = ppr_int(edges, [1, 999], iters=1, scale=100)
    got2 = dict(zip(t2["node"].to_pylist(), t2["r"].to_pylist()))
    assert got2 == got
    t3 = ppr_int(edges, [999], iters=1, scale=100)
    assert t3.num_rows == 0

    # paths agree: forced-distributed == in-process on a random graph
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"u": rng.integers(0, 40, 200), "v": rng.integers(40, 80, 200)}
    )
    seeds = [0, 1, 2, 3]
    small = ppr_int(rd.from_pandas(df), seeds, iters=3)
    monkeypatch.setenv("KGRAY_FORCE_DISTRIBUTED", "1")
    big = ppr_int(rd.from_pandas(df), seeds, iters=3)
    sm = dict(zip(small["node"].to_pylist(), small["r"].to_pylist()))
    bg = big if isinstance(big, pa.Table) else \
        pa.Table.from_pandas(big.to_pandas())
    bgd = dict(zip(bg["node"].to_pylist(), bg["r"].to_pylist()))
    assert sm == bgd


def test_fd_planted_violations(ray_session, tmp_path):
    # part: brand B1 maps to 2 types (violating), B2 to 1
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(4, dtype=np.int64),
            "p_brand": ["B1", "B1", "B1", "B2"],
            "p_type": ["t1", "t2", "t1", "t3"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.int64([1, 1, 2]),
            "o_orderpriority": ["HIGH", "LOW", "HIGH"],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.int64([1, 2]),
            "c_nationkey": np.int64([0, 0]),
            "c_mktsegment": ["AUTO", "AUTO"],
        }
    )
    docs = pd.DataFrame(
        {"doc_id": [1], "source": ["web"], "lang": ["en"], "text": ["x"]}
    )
    for n, d in [("part", part), ("orders", orders),
                 ("customer", customer), ("documents", docs)]:
        _write(tmp_path, n, d)
    got, sql = _run("fd_violations", tmp_path)
    exp = _oracle(tmp_path, sql,
                  ["part", "orders", "customer", "documents"])
    _cmp(got, exp, ["fd"])
    by_fd = got.set_index("fd")
    assert by_fd.loc["part.p_brand->p_type", "n_violating"] == 1
    assert by_fd.loc["part.p_brand->p_type", "max_dep"] == 2
    assert by_fd.loc["orders.o_custkey->o_orderpriority",
                     "n_violating"] == 1
    assert by_fd.loc["customer.c_nationkey->c_mktsegment",
                     "n_violating"] == 0


def _scalar_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[len(b)]


def test_lev_kernel_matches_scalar_dp():
    from kgray.queries.analytics9 import _lev_pairs_block

    rng = np.random.default_rng(11)
    words = ["", "a", "ab", "kitten", "sitting", "flaw", "lawn",
             "abcdefgh", "abcdxfgh", "zzzz"]
    us, vs = [], []
    for _ in range(200):
        us.append(words[rng.integers(len(words))])
        vs.append(words[rng.integers(len(words))])
    got = _lev_pairs_block(np.array(us, object), np.array(vs, object))
    exp = [_scalar_lev(a, b) for a, b in zip(us, vs)]
    assert got.tolist() == exp


def test_fuzzy_pairs_blocked(ray_session, tmp_path):
    cust = pd.DataFrame(
        {
            "c_custkey": np.int64([1, 2, 3, 4, 5]),
            "c_name": ["abcdef", "abcdeg", "zzzzzz", "abcdef", "abcxxx"],
            "c_nationkey": np.int64([0, 0, 0, 1, 0]),
            "c_acctbal": 0.0,
            "c_mktsegment": ["AUTO"] * 5,
        }
    )
    _write(tmp_path, "customer", cust)
    got, sql = _run("customer_fuzzy_pairs", tmp_path)
    exp = _oracle(tmp_path, sql, ["customer"])
    _cmp(got, exp, ["u", "v"])
    # key 4 is in another block: no (1,4) pair despite identical names
    pairs = set(map(tuple, got[["u", "v"]].values.tolist()))
    assert (1, 2) in pairs and (1, 4) not in pairs
    assert got.set_index(["u", "v"]).loc[(1, 2), "dist"] == 1


def test_km_survival_hand_computed(ray_session, tmp_path):
    # user 1 events at hours 0,2,3 -> gaps [2,1], censored 7 (gmax=10)
    # user 2 events at hours 0,10 -> gap [10], censored 0
    # at-risk suffix: d0:5 d1:4 d2:3 d7:2 d10:1; kept rows: dur 1, 2
    # (dur 10 has at_risk == d -> terminal, excluded)
    # steps: floor(1e6*ln(3/4)+.5) = -287682,
    #        floor(1e6*ln(2/3)+.5) = -405465 -> cumsum -693147
    rows = []
    for i, h in enumerate([0, 2, 3]):
        rows.append((i, pd.Timestamp("2024-01-01") +
                     pd.Timedelta(hours=h), 1, "a", 1.0))
    for i, h in enumerate([0, 10]):
        rows.append((10 + i, pd.Timestamp("2024-01-01") +
                     pd.Timedelta(hours=h), 2, "a", 1.0))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    ev["event_id"] = ev["event_id"].astype(np.int64)
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["props"] = "{}"
    _write(tmp_path, "events", ev)
    got, sql = _run("events_km_survival", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["dur"])
    got = got.sort_values("dur").reset_index(drop=True)
    assert got["dur"].tolist() == [1, 2]
    assert got["at_risk"].tolist() == [4, 3]
    assert got["n_events"].tolist() == [1, 1]
    assert got["log_surv_micro"].tolist() == [-287682, -693147]


def test_viterbi_hand_computed(ray_session, tmp_path):
    from kgray.queries.analytics9 import _VIT_E, _VIT_PI, _VIT_T

    # user 1: ["click", "error"]
    #  v_1 = (pi0+e0(click), pi1+e1(click))
    #  v_2 = (e0(err) + max(v0+t00, v1+t10),
    #         e1(err) + max(v0+t01, v1+t11))
    t00, t01, t10, t11 = _VIT_T
    pi0, pi1 = _VIT_PI
    v0 = pi0 + _VIT_E["click"][0]
    v1 = pi1 + _VIT_E["click"][1]
    w0 = _VIT_E["error"][0] + max(v0 + t00, v1 + t10)
    w1 = _VIT_E["error"][1] + max(v0 + t01, v1 + t11)
    ev = _events([
        (1, "2024-01-01", 1, "click", 1.0),
        (2, "2024-01-02", 1, "error", 1.0),
        (3, "2024-01-01", 2, "purchase", 1.0),
    ])
    _write(tmp_path, "events", ev)
    got, sql = _run("events_viterbi", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["user_id"])
    r1 = got[got["user_id"] == 1].iloc[0]
    assert r1["best_score"] == max(w0, w1)
    assert r1["best_state"] == (1 if w1 > w0 else 0)
    r2 = got[got["user_id"] == 2].iloc[0]
    assert r2["n_events"] == 1


def test_viterbi_burst_detection(ray_session, tmp_path):
    # a run of errors should decode to the "trouble" state, a run of
    # clicks to "browse"
    rows = [(i, f"2024-01-{i+1:02d}", 1, "error", 1.0) for i in range(5)]
    rows += [(10 + i, f"2024-01-{i+1:02d}", 2, "click", 1.0)
             for i in range(5)]
    _write(tmp_path, "events", _events(rows))
    got, _ = _run("events_viterbi", tmp_path)
    by_user = got.set_index("user_id")
    assert by_user.loc[1, "best_state"] == 1
    assert by_user.loc[2, "best_state"] == 0


def test_spearman_hand_computed_with_ties(ray_session, tmp_path):
    # one event type over 4 days: counts [1,2,2,3] (tie -> avg ranks
    # [1, 2.5, 2.5, 4]), means [10, 20, 30, 40] (ranks [1,2,3,4]).
    # sxy = 1 + 5 + 7.5 + 16 = 29.5, sxx = 29.5, syy = 30:
    # rho = (4*29.5-100)/sqrt((4*29.5-100)*(4*30-100)) = 18/sqrt(360)
    #     = 0.948683
    rows = []
    eid = 0
    day_counts = [1, 2, 2, 3]
    day_means = [0.10, 0.20, 0.30, 0.40]
    for d, (c, m) in enumerate(zip(day_counts, day_means)):
        for _ in range(c):
            rows.append((eid, f"2024-01-0{d+1}", 1, "click", m))
            eid += 1
    _write(tmp_path, "events", _events(rows))
    got, sql = _run("events_daily_spearman", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_type"])
    row = got.iloc[0]
    assert row["n_days"] == 4
    assert row["rho"] == 0.948683


def test_basket_rules_hand_computed(ray_session, tmp_path):
    # 3 orders: {1,2}, {1,2}, {1,3} -> N=3, n(1)=3, n(2)=2, n(3)=1
    # pair (1,2): n12=2 >= minsup; (1,3): n12=1 dropped
    # rule 1->2: conf 2/3, lift 2*3/(3*2)=1.0
    # rule 2->1: conf 2/2=1.0, lift 1.0
    line = pd.DataFrame(
        {
            "l_orderkey": np.int64([10, 10, 20, 20, 30, 30, 30]),
            "l_partkey": np.int64([1, 2, 1, 2, 1, 3, 3]),
        }
    )
    _write(tmp_path, "lineitem", line)
    got, sql = _run("basket_rules", tmp_path)
    exp = _oracle(tmp_path, sql, ["lineitem"])
    _cmp(got, exp, ["ante", "cons"])
    got = got.set_index(["ante", "cons"])
    assert len(got) == 2
    assert got.loc[(1, 2), "conf"] == 0.666667
    assert got.loc[(2, 1), "conf"] == 1.0
    assert got.loc[(1, 2), "lift"] == 1.0


def test_bpe_apply_sennrich_and_roundtrip(ray_session):
    import ray.data as rd2

    from kgray.ops.text import bpe_apply_word, bpe_encode_stats, bpe_train

    # Sennrich et al. toy corpus: after enough merges the most frequent
    # word encodes as a single symbol
    docs = pd.DataFrame(
        {
            "lang": ["en"] * 4,
            "text": [
                " ".join(["low"] * 5),
                " ".join(["lower"] * 2),
                " ".join(["newest"] * 6),
                " ".join(["widest"] * 3),
            ],
        }
    )
    ds = rd2.from_pandas(docs)
    merges = bpe_train(ds, num_merges=30)
    rank_of = {
        (l, r): i
        for i, (l, r) in enumerate(zip(merges["left"].to_pylist(),
                                       merges["right"].to_pylist()))
    }
    assert bpe_apply_word("newest", rank_of) == ["newest</w>"]
    # round-trip: concatenated tokens minus the marker == the word
    for w in ["low", "lower", "newest", "widest", "lowest", "zzz"]:
        toks = bpe_apply_word(w, rank_of)
        assert "".join(toks).replace("</w>", "") == w
        assert 1 <= len(toks) <= len(w) + 1
    # encode stats: 16 words total; fully-merged corpus -> 16 tokens
    stats = bpe_encode_stats(ds, merges).to_pandas()
    assert stats["n_words"].tolist() == [16]
    assert stats["n_tokens"].tolist() == [16]


def test_subsample_ci_brackets_mean_and_matches_oracle(ray_session,
                                                       tmp_path):
    rng = np.random.default_rng(5)
    n = 400
    ev = _events([
        (i, "2024-01-01", 1, "click", float(round(v, 2)))
        for i, v in enumerate(rng.uniform(1, 9, n))
    ])
    _write(tmp_path, "events", ev)
    got, sql = _run("events_subsample_ci", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["event_type"])
    row = got.iloc[0]
    assert row["n_events"] == n
    # half-sample rep means bracket the full mean; width is O(2*sigma/sqrt(n/2))
    assert row["ci_lo"] <= row["mean_cents"] <= row["ci_hi"]
    sigma = 800 / np.sqrt(12)  # uniform(100, 900) cents
    assert row["ci_hi"] - row["ci_lo"] < 6 * sigma / np.sqrt(n / 2)
    assert row["ci_hi"] - row["ci_lo"] > 0
