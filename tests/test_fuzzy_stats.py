"""Vectorized Levenshtein kernel + fuzzy join, weekly growth, join
stats — the kernel is property-tested against a brute python DP, the
queries against pandas references."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[la][lb]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("abcde ", max_size=12),
                  st.text("abcde ", max_size=12)),
        min_size=0, max_size=20,
    )
)
def test_levenshtein_batch_matches_python_dp(pairs):
    from kgray.ops.fuzzy import levenshtein_batch

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_batch(a, b)
    assert got.tolist() == [_lev_ref(x, y) for x, y in pairs]


def test_fuzzy_pairs_blocked_join(ray_session, tmp_path):
    from kgray.queries import q_part_name_fuzzy_pairs

    names = ["red bolt", "bed bolt", "blue bolt", "red gear",
             "rod gear", "green widget"]
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(24, dtype=np.int64),
            "p_name": names * 4,  # duplicates: distinct-fold must dedup
            "p_brand": "B",
            "p_type": "STANDARD",
            "p_size": np.int32(1),
            "p_retailprice": 1.0,
        }
    )
    df.to_parquet(tmp_path / "part.parquet", index=False)
    got = (
        q_part_name_fuzzy_pairs(str(tmp_path)).to_pandas()
        .sort_values(["name_a", "name_b"]).reset_index(drop=True)
    )
    uniq = sorted(set(names))
    exp = []
    for i, a in enumerate(uniq):
        for b in uniq[i + 1:]:
            if a.rsplit(" ", 1)[-1] != b.rsplit(" ", 1)[-1]:
                continue
            d = _lev_ref(a, b)
            if d <= 2:
                exp.append((a, b, d))
    exp.sort()
    assert [tuple(r) for r in got.to_numpy()] == exp
    assert ("bed bolt", "red bolt", 1) in exp  # lev-1 within block kept


def test_orders_weekly_growth_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_orders_weekly_growth

    rng = np.random.default_rng(91)
    n = 200
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": "F",
            "o_totalprice": np.round(rng.uniform(10, 100, n), 2),
            "o_orderdate": pd.Timestamp("1995-01-02")
            + pd.to_timedelta(rng.integers(0, 70, n), unit="D"),
            "o_orderpriority": "3-MEDIUM",
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    got = q_orders_weekly_growth(str(tmp_path)).to_pandas()
    wk = df["o_orderdate"].dt.strftime("%Y-%W")
    weekly = df.groupby(wk)["o_totalprice"].sum().sort_index()
    assert got["wk"].tolist() == weekly.index.tolist()
    np.testing.assert_allclose(
        got["revenue"].to_numpy(), weekly.round(2).to_numpy(), atol=0.006
    )
    g = 100.0 * weekly.pct_change().to_numpy()
    np.testing.assert_allclose(
        got["growth_pct"].to_numpy()[1:], g[1:], atol=1e-3
    )
    assert np.isnan(got["growth_pct"].iloc[0])


def test_join_stats_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_join_stats

    rng = np.random.default_rng(93)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(300, dtype=np.int64),
            # keys 40-49 appear in orders but have NO customer row
            "o_custkey": rng.integers(0, 50, 300).astype(np.int64),
            "o_orderstatus": "F",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("1995-01-01"),
            "o_orderpriority": "3-MEDIUM",
        }
    )
    cust = pd.DataFrame(
        {
            # keys 0-39 plus 100-104 (customers with no orders)
            "c_custkey": np.concatenate(
                [np.arange(40), np.arange(100, 105)]
            ).astype(np.int64),
            "c_name": "c",
            "c_nationkey": np.int32(0),
            "c_acctbal": 0.0,
            "c_mktsegment": "A",
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    cust.to_parquet(tmp_path / "customer.parquet", index=False)
    got = q_join_stats(str(tmp_path)).to_pandas().iloc[0]
    merged = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    assert got["n_left"] == 300
    assert got["n_right"] == 45
    assert got["ndv_left"] == orders["o_custkey"].nunique()
    assert got["ndv_right"] == 45
    assert got["rows_actual"] == len(merged)
    assert got["rows_est"] == (300 * 45) // max(
        orders["o_custkey"].nunique(), 45
    )
