"""Session-13: Simpson diversity (integer-exact entropy twin), ABC
Pareto classification (integer cross-product thresholds, descending
range decomposition), and the langid confusion-matrix composition."""

import duckdb
import numpy as np
import pandas as pd
import pytest

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


def test_doc_simpson(ray_session, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "a a a a",        # all same: index exactly 1
                "a b c d",        # all distinct: index exactly 0
                "a a b b",        # 2+2 of 4: 4/12 = 1/3
                "solo",           # n=1: EXCLUDED
                "",               # empty: EXCLUDED
            ],
            "lang": ["en"] * 5,
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("doc_simpson", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["doc_id"])
    s = got.set_index("doc_id")["simpson"]
    assert s.loc[0] == 1.0 and s.loc[1] == 0.0
    assert s.loc[2] == pytest.approx(1 / 3, abs=1e-6)
    assert 3 not in s.index and 4 not in s.index


def test_parts_abc(ray_session, tmp_path):
    # revenues 80, 10, 6, 4 (total 100): cum 80 (A, ==80% boundary),
    # 90 (B), 96 (C — crosses 95), 100 (C)
    line = pd.DataFrame(
        {
            "l_partkey": np.array([1, 2, 3, 4], np.int64),
            "l_extendedprice": [80.0, 10.0, 6.0, 4.0],
        }
    )
    _write(tmp_path, "lineitem", line)
    got, sql = _run("parts_abc", tmp_path)
    exp = _oracle(tmp_path, sql, ["lineitem"])
    _cmp(got, exp, ["p_partkey"])
    g = got.set_index("p_partkey")["abc"]
    assert g.loc[1] == "A" and g.loc[2] == "B"
    assert g.loc[3] == "C" and g.loc[4] == "C"


def test_langid_confusion(ray_session, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["the cat and the dog of it",    # en markers
                     "der hund und die sch",          # de markers
                     "xxxx yyyy zzzz"],               # no markers -> und
            "lang": ["en", "en", "de"],               # planted mislabels
        }
    )
    _write(tmp_path, "documents", docs)
    got, sql = _run("langid_confusion", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["lang", "lang_pred"])
    key = got.set_index(["lang", "lang_pred"])["n"]
    assert key.loc[("en", "en")] == 1
    assert key.loc[("en", "de")] == 1   # the planted confusion cell
    assert key.loc[("de", "und")] == 1
