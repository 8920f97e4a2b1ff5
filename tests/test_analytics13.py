"""Hand fixtures for the session-21b batch: RANGE-frame sums including
current-timestamp peers and the exactly-1h boundary, 3-itemset support
with the basket-size cap, MRR under perfect/offset rankings, and hapax
ratios on a known vocabulary."""

import numpy as np
import pandas as pd


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], format="mixed") \
        .astype("datetime64[us]")
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)


def test_events_range_sum_boundaries(ray_session, tmp_path):
    from kgray.queries import q_events_range_sum

    _write_events(tmp_path, [
        (1, "2024-01-01 00:00:00", 1, "a", 1.00),
        # exactly 1h later: the frame is CLOSED at ts-1h -> includes e1
        (2, "2024-01-01 01:00:00", 1, "a", 2.00),
        # peer at the same timestamp: RANGE includes BOTH peers
        (3, "2024-01-01 01:00:00", 1, "a", 4.00),
        # 1h+1us after e1: e1 falls out
        (4, "2024-01-01 02:00:00.000001", 1, "a", 8.00),
        (5, "2024-01-01 00:30:00", 2, "a", 16.00),  # other user isolated
    ])
    out = q_events_range_sum(str(tmp_path)).to_pandas() \
        .set_index("event_id")["range_sum_c"]
    assert out.loc[1] == 100
    assert out.loc[2] == 700  # e1 + both peers
    assert out.loc[3] == 700
    # frame starts at 01:00:00.000001 -> the 01:00:00 peers fall out too
    assert out.loc[4] == 800
    assert out.loc[5] == 1600


def test_basket_triples_cap_and_support(ray_session, tmp_path):
    from kgray.queries import q_basket_triples

    rows = []
    # two orders sharing the triple (1,2,3); one order with only 2 items
    # (below cap); one 16-item order (above cap) containing (1,2,3) too
    for o, parts in [(1, [1, 2, 3]), (2, [1, 2, 3, 9]), (3, [1, 2]),
                     (4, list(range(1, 17)))]:
        for p in parts:
            rows.append((o, p))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    li["l_suppkey"] = 1
    li["l_quantity"] = 1.0
    li["l_extendedprice"] = 1.0
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = q_basket_triples(str(tmp_path)).to_pandas()
    top = out.iloc[0]
    assert (top["p1"], top["p2"], top["p3"], top["support"]) == (1, 2, 3, 2)
    # the 16-item basket contributed nothing
    assert int(out["support"].sum()) == 2 + (4 - 1)  # (1,2,3)x2 + C(4,3)-1


def test_events_mrr_ranks(ray_session, tmp_path):
    from kgray.queries import q_events_mrr

    rows = []
    eid = 0
    # user 1: most-valuable type is also most frequent -> rank 1
    for _ in range(3):
        rows.append((eid, "2024-01-01", 1, "hot", 10.0)); eid += 1
    rows.append((eid, "2024-01-01", 1, "cold", 1.0)); eid += 1
    # user 2: most-valuable type is the SECOND most frequent -> rank 2
    for _ in range(3):
        rows.append((eid, "2024-01-01", 2, "often", 1.0)); eid += 1
    rows.append((eid, "2024-01-01", 2, "rare", 50.0)); eid += 1
    _write_events(tmp_path, rows)
    out = q_events_mrr(str(tmp_path)).to_pandas()
    assert int(out["n_users"][0]) == 2
    assert abs(out["mrr"][0] - round((1.0 + 0.5) / 2, 6)) < 1e-12


def test_source_hapax_known_vocab(ray_session, tmp_path):
    from kgray.queries import q_source_hapax

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b b", "b c", "x x"],
        "source": ["s1", "s1", "s2"],
    })
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = q_source_hapax(str(tmp_path)).to_pandas().set_index("source")
    # s1 vocab {a:1, b:3, c:1} -> 3 vocab, 2 hapax
    assert (out.loc["s1"]["n_vocab"], out.loc["s1"]["n_hapax"]) == (3, 2)
    assert abs(out.loc["s1"]["hapax_ratio"] - round(2 / 3, 6)) < 1e-12
    # s2 vocab {x:2} -> 1 vocab, 0 hapax
    assert (out.loc["s2"]["n_vocab"], out.loc["s2"]["n_hapax"]) == (1, 0)
