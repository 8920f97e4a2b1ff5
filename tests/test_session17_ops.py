"""Session-17 operators: golden-record fusion (forced multi-record
cluster), LPA modularity (hand-computed two-community graph),
Theil-Sen lower-median slope (hand-worked pair table), Naive-Bayes
train+predict (disjoint-vocab perfect diagonal), and the Zipf fit
(planted power law) — each also compared against its DuckDB oracle on
the synthetic fixture."""

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
        assert got[c].tolist() == exp[c].tolist(), c


def _customers(rows):
    df = pd.DataFrame(
        rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    df["c_custkey"] = df["c_custkey"].astype(np.int64)
    df["c_nationkey"] = df["c_nationkey"].astype(np.int64)
    df["c_acctbal"] = df["c_acctbal"].astype(np.float64)
    return df


def test_golden_record_multi_cluster(ray_session, tmp_path):
    # k=11 and k=9011 share name AND phone (phone = 555-(1000+k%9000)),
    # same block, neither k%3==0 nor k%5==0, so all four a<->b pairs
    # match -> ONE 4-record cluster.  k=7 is a normal self-match pair.
    cust = _customers([
        (11, "dup name", 1, 100.0, "AUTO"),
        (9011, "dup name", 1, 900.0, "AUTO"),
        (7, "solo", 2, 50.0, "BLDG"),
        (15, "perturbed both", 1, 10.0, "AUTO"),  # %3 and %5: no match
    ])
    _write(tmp_path, "customer", cust)
    got, sql = _run("customer_golden_record", tmp_path)
    exp = _oracle(tmp_path, sql, ["customer"])
    _cmp(got, exp, ["cluster"])
    by_cluster = dict(zip(got["cluster"], got["n_records"]))
    assert by_cluster[11] == 4       # the forced 4-record cluster
    assert by_cluster[7] == 2        # the routine self pair
    assert 15 not in by_cluster and 1000015 not in by_cluster
    # survivorship: name from the lowest-key member
    row = got[got["cluster"] == 11].iloc[0]
    assert row["canonical_name"] == "dup name"


def test_modularity_two_even_communities(ray_session, tmp_path):
    # co-purchase edges need >= 2 shared orders: orders o1/o2 share
    # parts (1,2); o3/o4 share (3,4).  Two disjoint one-edge
    # communities: m=2, each e_in=1, deg_sum=2 ->
    # q_num = 4*2*1 - 4 = 4, q_part = 4/16 = 0.25.
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2),
            (3, 3), (3, 4), (4, 3), (4, 4)]
    line = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]) \
        .astype(np.int64)
    _write(tmp_path, "lineitem", line)
    got, sql = _run("copurchase_modularity", tmp_path)
    exp = _oracle(tmp_path, sql, ["lineitem"])
    _cmp(got, exp, ["lbl"])
    got = got.sort_values("lbl").reset_index(drop=True)
    assert got["lbl"].tolist() == [1, 3]
    assert got["e_in"].tolist() == [1, 1]
    assert got["deg_sum"].tolist() == [2, 2]
    assert got["q_num"].tolist() == [4, 4]
    assert got["q_part"].tolist() == [0.25, 0.25]


def test_theilsen_hand_computed(ray_session, tmp_path):
    # one segment, four consecutive weeks of cents [1000,2000,4000,3000]
    # -> sorted pair slopes [-1000, 500, 2000/3, 1000, 1500, 2000],
    # lower median (rank (6+1)//2 = 3) = 2000/3 -> 666.666667
    cust = _customers([(1, "c1", 0, 0.0, "AUTO")])
    dates = pd.to_datetime(
        ["2024-01-04", "2024-01-11", "2024-01-18", "2024-01-25"]
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 5, dtype=np.int64),
            "o_custkey": np.int64(1),
            "o_totalprice": [10.0, 20.0, 40.0, 30.0],
            "o_orderdate": dates,
        }
    )
    _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    got, sql = _run("mktsegment_theilsen", tmp_path)
    exp = _oracle(tmp_path, sql, ["customer", "orders"])
    _cmp(got, exp, ["seg"])
    row = got.iloc[0]
    assert row["n_weeks"] == 4 and row["n_pairs"] == 6
    assert row["ts_slope"] == 666.666667


def test_nb_disjoint_vocab_diagonal(ray_session, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "lang": ["en", "en", "en", "fr", "fr", "fr"],
            "text": ["the cat sat", "the dog ran", "cat and dog",
                     "le chat noir", "le chien", "chat et chien"],
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("docs_nb_confusion", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["lang", "pred_lang"])
    # disjoint vocabularies -> perfect self-classification
    diag = got[got["lang"] == got["pred_lang"]]["n_docs"].sum()
    assert diag == 6 and got["n_docs"].sum() == 6


def test_nb_shared_vocab_oracle_parity(ray_session, tmp_path):
    # overlapping vocab + class imbalance exercises priors, the unseen
    # weight, and the MIN-lang tie-break
    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(5)],
            "lang": ["en", "en", "en", "fr", "fr"],
            "text": ["a b c", "a b", "a x y", "a b c", "z z a"],
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("docs_nb_confusion", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["lang", "pred_lang"])


def test_zipf_planted_power_law(ray_session, tmp_path):
    # token r repeated round(120/r) times -> slope ~ -1
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * (120 // r)
    docs = pd.DataFrame(
        {
            "doc_id": ["d0"],
            "lang": ["en"],
            "text": [" ".join(words)],
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("lang_zipf_slope", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["lang"])
    row = got.iloc[0]
    assert row["n_terms"] == 20
    assert -1.1 < row["zipf_slope"] < -0.9
