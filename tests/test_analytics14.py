"""Session-22 operators: interval_join semantics (overlapping left
intervals exercise the running-max candidate range; touching counts as
overlap-0; empty sides), rolling-median frame convention, and the
eventually-follows relation on a hand log."""

import numpy as np
import pandas as pd


def _pairs_df(ds):
    df = ds.to_pandas()
    return df.sort_values(["l_id", "r_id"], ignore_index=True)


def test_interval_join_overlapping_left(ray_session):
    import ray.data as rd

    from kgray.ops.joins import interval_join

    # left intervals OVERLAP each other (ends not monotone in start
    # order) -> the cummax candidate range is a superset; the exact
    # mask must trim interval 2 ([10,11]) for right [13,14]
    left = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 1], "sid": [1, 2, 3],
        "s": [0, 10, 12], "e": [20, 11, 13],
    }))
    right = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 2], "sid": [7, 8, 9],
        "s": [13, 11, 0], "e": [14, 11, 5],
    }))
    got = _pairs_df(interval_join(left, right, "k",
                                  l_id="sid", r_id="sid"))
    # right (13,14): overlaps left1 [0,20] (ov 1) and left3 [12,13]
    # (ov 0, touching); NOT left2 [10,11].  right (11,11): left1 (ov 0)
    # and left2 (ov 0, touching at 11).  right in key 2: no left.
    want = pd.DataFrame({
        "k": [1, 1, 1, 1], "l_id": [1, 1, 2, 3],
        "r_id": [7, 8, 8, 7], "ov": [1, 0, 0, 0],
    }).sort_values(["l_id", "r_id"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["k", "l_id", "r_id", "ov"]], want, check_dtype=False)


def test_interval_join_empty_side(ray_session):
    import ray.data as rd

    from kgray.ops.joins import interval_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1], "sid": [1], "s": [0], "e": [5]}))
    right = rd.from_pandas(pd.DataFrame(
        {"k": [2], "sid": [1], "s": [0], "e": [5]}))
    assert interval_join(left, right, "k",
                         l_id="sid", r_id="sid").count() == 0


def test_rolling_median_lower_median_convention(ray_session, tmp_path):
    """Window n=2 must pick the SMALLER element ((n-1)//2), n=7 the
    4th-smallest — DuckDB quantile_disc(0.5) semantics."""
    import pyarrow.parquet as pq

    from kgray.queries import q_events_rolling_median

    n = 9
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, np.int64),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            np.arange(n), unit="h"),
        "value": [9.0, 1.0, 5.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0],
    })
    d = tmp_path / "sf"
    d.mkdir()
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    got = q_events_rolling_median(str(d)).to_pandas() \
        .sort_values("event_id")["roll_med_c"].tolist()
    # windows (cents): [900],[900,100],[900,100,500],... lower medians
    want = [900, 100, 500, 300, 500, 300, 500, 400, 500]
    assert got == want


def test_landmark_distances_paths_agree(ray_session, monkeypatch):
    """In-process and forced-distributed landmark BFS must emit the
    identical (node, lm, dist) set; landmarks absent from the graph
    contribute nothing on either path."""
    import ray.data as rd

    from kgray.ops.graph import landmark_distances

    edges = pd.DataFrame({"u": [1, 2, 3, 10], "v": [2, 3, 4, 11]})

    def run():
        out = landmark_distances(
            rd.from_pandas(edges), landmarks=[1, 10, 99], max_hops=3
        ).to_pandas()
        return out.sort_values(["lm", "node"], ignore_index=True)

    a = run()
    monkeypatch.setenv("KGRAY_FORCE_DISTRIBUTED", "1")
    b = run()
    monkeypatch.delenv("KGRAY_FORCE_DISTRIBUTED")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    got = {(r.lm, r.node): r.dist for r in a.itertuples()}
    assert got == {(1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3,
                   (10, 10): 0, (10, 11): 1}


def test_source_shapley_efficiency_axiom(ray_session, tmp_path):
    """Sum of the P!-scaled Shapley numerators must equal
    P! * v(grand coalition) = P! * |total vocabulary| (efficiency),
    and a source contributing only shared words must get LESS than one
    holding unique words (symmetry/marginality sanity)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.queries import q_source_shapley

    df = pd.DataFrame({
        "source": ["a", "a", "b", "c"],
        "text": ["x y", "x z", "x y", "x q r"],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "documents.parquet")
    out = q_source_shapley(str(d)).to_pandas().set_index("source")
    P = 3
    vocab = 5  # x y z q r
    assert out["shap_num"].sum() == math.factorial(P) * vocab
    # c uniquely holds {q, r}; b holds nothing unique
    assert out.loc["c", "shap_num"] > out.loc["b", "shap_num"]


def test_interval_schedule_picks_optimal_subset(ray_session, tmp_path):
    """Three overlapping 30-min windows (0m, 10m, 20m) worth 5/9/5:
    greedy-by-value takes 9, but the optimal non-overlapping subset is
    {first, third} = 10 — the DP must find it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.queries import q_user_interval_schedule

    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [1, 1, 1],
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            [0, 10, 30], unit="m"),
        "value": [0.05, 0.09, 0.05],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    out = q_user_interval_schedule(str(d)).to_pandas()
    assert out["best_cents"].tolist() == [10]


def test_isotonic_fit_is_monotone_and_pools(ray_session, tmp_path):
    """The minimax fit must be non-decreasing and pool adjacent
    violators into their weighted mean; W1 of identical distributions
    must be exactly 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.queries import q_events_isotonic, q_events_wasserstein

    # bands 0,1,2 with raw rates 0.5, 0.0, 1.0 -> bands 0,1 violate and
    # pool to 1/4; band 2 stays 1.0
    rows = []
    eid = 0

    def add(band_val, typ, k):
        nonlocal eid
        for _ in range(k):
            rows.append((eid, pd.Timestamp("2024-01-01"), 1, typ,
                         band_val))
            eid += 1

    add(1.0, "error", 1)
    add(1.0, "view", 1)
    add(6.0, "view", 2)
    add(11.0, "error", 2)
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    out = q_events_isotonic(str(d)).to_pandas().sort_values("band")
    assert out["rate_iso"].tolist() == [0.25, 0.25, 1.0]
    assert (np.diff(out["rate_iso"]) >= 0).all()

    # W1(identical click/purchase samples) == 0
    df2 = pd.DataFrame({
        "event_id": range(4),
        "ts": [pd.Timestamp("2024-01-01")] * 4,
        "user_id": [1] * 4,
        "event_type": ["click", "purchase", "click", "purchase"],
        "value": [1.0, 1.0, 7.0, 7.0],
    })
    d2 = tmp_path / "sf2"
    d2.mkdir()
    pq.write_table(pa.Table.from_pandas(df2), d2 / "events.parquet")
    w = q_events_wasserstein(str(d2)).to_pandas()
    assert w["w1_scaled"][0] == 0


def test_eventually_follows_hand_log(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.queries import q_events_eventually_follows

    # user 1: a@0, b@10 -> (a,b) yes, (b,a) no, diagonals no (single
    # occurrences).  user 2: a@0, a@5 -> (a,a) yes.
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [1, 1, 2, 2],
        "event_type": ["a", "b", "a", "a"],
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            [0, 10, 0, 5], unit="s"),
        "value": [0.0] * 4,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    got = q_events_eventually_follows(str(d)).to_pandas()
    got = {(r.a, r.b): r.n_users for r in got.itertuples()}
    assert got == {("a", "b"): 1, ("a", "a"): 1}
