"""Windowed stream-self-join boundary semantics ((t, t+10min] — open
left, closed right) and the FK audit with REAL orphans (the sf corpus
is referentially clean, so zero-counts alone would prove nothing)."""

import numpy as np
import pandas as pd


def _events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], format="ISO8601")
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)


def test_window_join_boundaries(ray_session, tmp_path):
    from kgray.queries import q_events_window_join

    _events(
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "view", 0.0),
            (2, "2024-01-01 10:00:00", 1, "click", 0.0),  # == t: excluded
            (3, "2024-01-01 10:05:00", 1, "click", 0.0),  # in
            (4, "2024-01-01 10:10:00", 1, "click", 0.0),  # == t+W: in
            (5, "2024-01-01 10:10:00.000001", 1, "click", 0.0),  # out
            (6, "2024-01-01 10:01:00", 2, "click", 0.0),  # other user
            (7, "2024-01-01 12:00:00", 2, "view", 0.0),  # no clicks: 0
        ],
    )
    got = (
        q_events_window_join(str(tmp_path)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert got["event_id"].tolist() == [1, 7]
    assert got["n_follow"].tolist() == [2, 0]


def test_window_join_duplicate_click_timestamps(ray_session, tmp_path):
    from kgray.queries import q_events_window_join

    _events(
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "view", 0.0),
            (2, "2024-01-01 10:03:00", 1, "click", 0.0),
            (3, "2024-01-01 10:03:00", 1, "click", 0.0),  # same ts: both
            (4, "2024-01-01 10:03:00", 1, "click", 0.0),
        ],
    )
    got = q_events_window_join(str(tmp_path)).to_pandas()
    assert got["n_follow"].tolist() == [3]


def test_fk_audit_counts_orphans(ray_session, tmp_path):
    from kgray.queries import q_fk_integrity_audit

    pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 99, 98], np.int64),  # 2 orphans
            "l_partkey": np.array([0, 1, 0, 7], np.int64),  # 7 orphan
            "l_suppkey": np.array([0, 0, 0, 0], np.int64),
            "l_quantity": 1.0, "l_extendedprice": 1.0,
            "l_discount": 0.0, "l_tax": 0.0,
            "l_linenumber": np.array([1, 2, 3, 4], np.int32),
            "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1995-01-01"),
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    pd.DataFrame(
        {
            "o_orderkey": np.array([1], np.int64),
            "o_custkey": np.array([5], np.int64),  # orphan custkey
            "o_orderstatus": "F", "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("1995-01-01"),
            "o_orderpriority": "1-URGENT",
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "p_partkey": np.array([0, 1], np.int64),
            "p_name": ["a", "b"], "p_brand": "B", "p_type": "T",
            "p_size": np.array([1, 2], np.int32), "p_retailprice": 1.0,
        }
    ).to_parquet(tmp_path / "part.parquet", index=False)
    pd.DataFrame(
        {
            "s_suppkey": np.array([0], np.int64),
            "s_name": ["s"], "s_nationkey": np.array([0], np.int32),
            "s_acctbal": 1.0,
        }
    ).to_parquet(tmp_path / "supplier.parquet", index=False)
    pd.DataFrame(
        {
            "c_custkey": np.array([0], np.int64),
            "c_name": ["c"], "c_nationkey": np.array([0], np.int32),
            "c_acctbal": 1.0, "c_mktsegment": "M",
        }
    ).to_parquet(tmp_path / "customer.parquet", index=False)

    got = (
        q_fk_integrity_audit(str(tmp_path)).to_pandas()
        .set_index("edge")["n_orphans"]
    )
    assert got["lineitem->orders"] == 2
    assert got["lineitem->part"] == 1
    assert got["lineitem->supplier"] == 0
    assert got["orders->customer"] == 1
