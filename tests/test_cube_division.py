"""CUBE lattice identities and relational-division membership on
crafted tables."""

import numpy as np
import pandas as pd


def test_docs_cube_lattice_identities(ray_session, tmp_path):
    from kgray.queries import q_docs_cube

    df = pd.DataFrame(
        {
            "doc_id": np.arange(7, dtype=np.int64),
            "text": "t",
            "lang": ["en", "en", "de", "de", "de", "fr", "fr"],
            "source": ["a", "b", "a", "a", "b", "a", "a"],
            "n_chars": 1,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    got = q_docs_cube(str(tmp_path)).to_pandas()
    g = got.set_index(["lang", "source"])["n"]
    assert g[("ALL", "ALL")] == 7
    assert g[("de", "ALL")] == 3
    assert g[("ALL", "a")] == 5
    assert g[("fr", "a")] == 2
    # lattice closure: every (lang, source) cell sums to its marginals
    cells = got[(got["lang"] != "ALL") & (got["source"] != "ALL")]
    assert cells["n"].sum() == 7
    assert len(got) == (3 * 2 - 1) + 3 + 2 + 1  # (de,b) absent: 5+3+2+1


def test_relational_division_excludes_partial_coverage(
    ray_session, tmp_path
):
    from kgray.queries import q_customers_all_priorities

    rows = []
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    k = 0
    for p in pris:  # customer 1 covers all three (one twice)
        rows.append((k, 1, p)); k += 1
    rows.append((k, 1, "1-URGENT")); k += 1
    for p in pris[:2]:  # customer 2 misses 3-MEDIUM
        rows.append((k, 2, p)); k += 1
    orders = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )
    orders["o_orderstatus"] = "F"
    orders["o_totalprice"] = 1.0
    orders["o_orderdate"] = pd.Timestamp("1995-01-01")
    orders = orders.astype({"o_orderkey": np.int64, "o_custkey": np.int64})
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    got = q_customers_all_priorities(str(tmp_path)).to_pandas()
    assert got["c_custkey"].tolist() == [1]
    assert got["n_pri"].tolist() == [3]
