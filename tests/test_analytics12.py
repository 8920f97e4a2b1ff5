"""Hand fixtures for the session-21 batch: OHLC open/close picked by
the strict (ts, event_id) order including timestamp ties, peak
concurrency over overlapping/touching sessions (closed-interval tie
rule), TWAP with known microsecond weights plus the den=0 drop,
integer Bollinger flags on a constant-then-spike series, Adamic-Adar
on a hand graph, and NDCG@5 under perfect vs inverted rankings."""

import math

import numpy as np
import pandas as pd


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


def test_events_ohlc_tie_order(ray_session, tmp_path):
    from kgray.queries import q_events_ohlc

    _write_events(tmp_path, [
        # ts tie at open: event_id 1 < 2 -> open is value 3.00
        (2, "2024-01-01 00:00:00", 1, "a", 5.00),
        (1, "2024-01-01 00:00:00", 1, "a", 3.00),
        (3, "2024-01-01 12:00:00", 1, "a", 9.00),
        (4, "2024-01-01 23:00:00", 1, "a", 1.00),  # close + low
        (5, "2024-01-02 01:00:00", 1, "a", 7.00),  # next day bar
    ])
    out = q_events_ohlc(str(tmp_path)).to_pandas().set_index("day")
    r = out.loc["2024-01-01"]
    assert (r["open_c"], r["high_c"], r["low_c"], r["close_c"]) == \
        (300, 900, 100, 100)
    assert (r["n"], r["sum_c"]) == (4, 1800)
    assert out.loc["2024-01-02"]["open_c"] == 700


def test_events_peak_concurrency_hand(ray_session, tmp_path):
    from kgray.queries import q_events_peak_concurrency

    # user 1: session 00:00-00:10; user 2: 00:05-00:15; user 3 single
    # event exactly at 00:10 (zero-length closed interval) -> at 00:10
    # the +1 applies before user 1's -1: peak 3 at 00:10.
    _write_events(tmp_path, [
        (1, "2024-01-01 00:00:00", 1, "a", 1.0),
        (2, "2024-01-01 00:10:00", 1, "a", 1.0),
        (3, "2024-01-01 00:05:00", 2, "a", 1.0),
        (4, "2024-01-01 00:15:00", 2, "a", 1.0),
        (5, "2024-01-01 00:10:00", 3, "a", 1.0),
    ])
    out = q_events_peak_concurrency(str(tmp_path)).to_pandas()
    assert int(out["peak"][0]) == 3
    assert int(out["at_us"][0]) == int(
        pd.Timestamp("2024-01-01 00:10:00").value // 1000)


def test_events_twap_weights_and_degenerate(ray_session, tmp_path):
    from kgray.queries import q_events_twap

    _write_events(tmp_path, [
        # user 1: value 10 held 30s, value 20 held 10s, last event open
        (1, "2024-01-01 00:00:00", 1, "a", 10.0),
        (2, "2024-01-01 00:00:30", 1, "a", 20.0),
        (3, "2024-01-01 00:00:40", 1, "a", 99.0),
        # user 2: both events same instant -> den 0 -> dropped
        (4, "2024-01-01 00:00:00", 2, "a", 5.0),
        (5, "2024-01-01 00:00:00", 2, "a", 6.0),
        # user 3: single event -> no interval -> dropped
        (6, "2024-01-01 00:00:00", 3, "a", 7.0),
    ])
    out = q_events_twap(str(tmp_path)).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert int(out["n_iv"][0]) == 2
    assert abs(out["twap"][0] - (10.0 * 30 + 20.0 * 10) / 40.0) < 1e-9


def test_events_bollinger_spike(ray_session, tmp_path):
    from kgray.queries import q_events_bollinger

    rows = []
    eid = 0
    for d in range(8):
        v = 100.0 if d < 7 else 500.0  # spike on day 8
        rows.append((eid, f"2024-02-{d + 1:02d} 12:00:00", 1, "a", v))
        eid += 1
    _write_events(tmp_path, rows)
    out = q_events_bollinger(str(tmp_path)).to_pandas().set_index("day")
    # first full frame: day 7, constant series -> sigma 0, x == mean -> 0
    assert int(out.loc["2024-02-07"]["breakout"]) == 0
    # day 8: x far above the (still near-constant) frame -> +1
    assert int(out.loc["2024-02-08"]["breakout"]) == 1
    assert len(out) == 2  # days 1-6 lack a full frame


def test_supplier_adamic_adar_hand(ray_session, tmp_path):
    from kgray.queries import q_supplier_adamic_adar

    # part 1 shared by suppliers {1,2,3} (deg 3), part 2 by {1,2}
    # (deg 2), part 3 only by {3} (deg 1 -> excluded).
    li = pd.DataFrame({
        "l_partkey": [1, 1, 1, 2, 2, 3, 1],  # duplicate (1,1) edge
        "l_suppkey": [1, 2, 3, 1, 2, 3, 1],
    })
    for c in ["l_orderkey", "l_linenumber"]:
        li[c] = np.arange(len(li), dtype=np.int64)
    li["l_quantity"] = 1.0
    li["l_extendedprice"] = 1.0
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = q_supplier_adamic_adar(str(tmp_path)).to_pandas()
    out = out.set_index(["s1", "s2"])
    aa_12 = 1.0 / math.log(3.0) + 1.0 / math.log(2.0)
    assert abs(out.loc[(1, 2)]["aa"] - round(aa_12, 6)) < 1e-9
    assert int(out.loc[(1, 2)]["n_common"]) == 2
    assert abs(out.loc[(1, 3)]["aa"] - round(1.0 / math.log(3.0), 6)) < 1e-9
    # ordering: strongest pair first
    assert out.index[0] == (1, 2)


def test_events_ndcg_perfect_and_inverted(ray_session, tmp_path):
    from kgray.queries import q_events_ndcg

    rows = []
    eid = 0
    # user 1: frequency order == relevance order -> ndcg 1.0
    for _ in range(3):
        rows.append((eid, "2024-01-01", 1, "big", 10.0)); eid += 1
    rows.append((eid, "2024-01-01", 1, "small", 1.0)); eid += 1
    # user 2: frequency order INVERTS relevance -> ndcg < 1
    for _ in range(3):
        rows.append((eid, "2024-01-01", 2, "cheap", 1.0)); eid += 1
    rows.append((eid, "2024-01-01", 2, "rich", 50.0)); eid += 1
    _write_events(tmp_path, rows)
    out = q_events_ndcg(str(tmp_path)).to_pandas().set_index("user_id")
    assert abs(out.loc[1]["ndcg5"] - 1.0) < 1e-12
    d2 = math.log(3) / math.log(2)
    got = (3.0 / 1.0 + 50.0 / d2) / (50.0 / 1.0 + 3.0 / d2)
    assert abs(out.loc[2]["ndcg5"] - round(got * 100 / 100, 6)) < 1e-6
    assert out.loc[2]["ndcg5"] < 1.0
