"""ER end-to-end clustering: the fuzzy-pair graph must close
transitively (a~b, b~c => one cluster even when lev(a,c) > 2), isolated
names map to themselves, and blocking bounds the clusters (same-distance
names in DIFFERENT blocks must not merge)."""

import duckdb
import numpy as np
import pandas as pd

from kgray.queries import CATALOG


def test_part_name_clusters(ray_session, tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(7, dtype=np.int64),
            "p_name": [
                "red widget",    # a: lev(a,b)=1
                "rad widget",    # b: lev(b,c)=2, lev(a,c)=3 -> chain
                "rodd widget",   # c: joins via b (transitive closure)
                "blue widget",   # lev to 'red widget' = 3: separate
                "red gadget",    # same lev-1 tail but DIFFERENT block
                "lone gizmo",    # isolated
                "red widget",    # duplicate row: vocabulary dedup
            ],
        }
    )
    part.to_parquet(tmp_path / "part.parquet", index=False)
    fn, sql = CATALOG["part_name_clusters"]
    got = fn(str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{tmp_path}/part.parquet')"
    )
    exp = con.execute(sql).df()
    g = got.sort_values("p_name").reset_index(drop=True)
    e = exp.sort_values("p_name").reset_index(drop=True)
    assert g["p_name"].tolist() == e["p_name"].tolist()
    assert g["cluster_rep"].tolist() == e["cluster_rep"].tolist()
    rep = got.set_index("p_name")["cluster_rep"]
    # transitive chain merges all three into the lexicographic min
    assert rep.loc["red widget"] == rep.loc["rad widget"] == \
        rep.loc["rodd widget"] == "rad widget"
    assert rep.loc["blue widget"] == "blue widget"
    assert rep.loc["red gadget"] == "red gadget"   # blocked apart
    assert rep.loc["lone gizmo"] == "lone gizmo"   # isolated self-map
