"""pre_aggregate == pandas/SQL semantics on randomized frames, including
null handling in mean (ADVICE round-1: AVG divides by the non-null
count), plus edge cases for the round-2 join operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _random_frame(seed: int, with_nulls: bool) -> pd.DataFrame:
    rs = np.random.RandomState(seed)
    n = rs.randint(20, 200)
    df = pd.DataFrame(
        {
            "k": rs.randint(0, 8, size=n),
            "x": rs.normal(size=n),
            "y": rs.randint(0, 100, size=n).astype("float64"),
        }
    )
    if with_nulls:
        df.loc[rs.rand(n) < 0.3, "x"] = np.nan
        df.loc[rs.rand(n) < 0.2, "y"] = np.nan
    return df


@pytest.mark.parametrize("seed,with_nulls", [(1, False), (2, True), (3, True)])
def test_pre_aggregate_matches_pandas(ray_session, seed, with_nulls):
    from kgray.ops.agg import pre_aggregate

    df = _random_frame(seed, with_nulls)
    got = (
        pre_aggregate(
            rd.from_pandas(df),
            ["k"],
            {
                "n": (None, "count"),
                "sum_x": ("x", "sum"),
                "min_y": ("y", "min"),
                "max_y": ("y", "max"),
                "avg_x": ("x", "mean"),
                "avg_y": ("y", "mean"),
            },
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    g = df.groupby("k")
    want = pd.DataFrame(
        {
            "k": sorted(df["k"].unique()),
            "n": g.size().values,
            "sum_x": g["x"].sum().values,
            "min_y": g["y"].min().values,
            "max_y": g["y"].max().values,
            # pandas mean == SQL AVG: divides by the NON-NULL count
            "avg_x": g["x"].mean().values,
            "avg_y": g["y"].mean().values,
        }
    )
    for c in ["n", "sum_x", "min_y", "max_y", "avg_x", "avg_y"]:
        np.testing.assert_allclose(
            got[c].to_numpy(np.float64), want[c].to_numpy(np.float64),
            rtol=1e-9, err_msg=c,
        )


def test_semi_join_empty_right(ray_session):
    from kgray.ops.joins import semi_join

    left = rd.from_items([{"k": i} for i in range(5)])
    empty = rd.from_items([{"rk": 1}]).filter(lambda r: False)
    assert semi_join(left, empty, on="k", right_on="rk").count() == 0
    anti = semi_join(left, empty, on="k", right_on="rk", anti=True)
    assert anti.count() == 5


def test_asof_join_empty_right(ray_session):
    from kgray.ops.joins import asof_join

    left = rd.from_items([{"k": 1, "t": 10}, {"k": 2, "t": 5}])
    empty = rd.from_items([{"k": 1, "t": 1, "rv": "x"}]).filter(lambda r: False)
    # a schema-less empty right passes left through (no nameable columns)
    out = asof_join(left, empty, key="k", time_col="t").to_pandas()
    assert len(out) == 2 and set(out.columns) == {"k", "t"}

    # an empty-but-typed right yields null matches
    typed_empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "t": pa.array([], pa.int64()),
                  "rv": pa.array([], pa.string())})
    )
    out2 = asof_join(left, typed_empty, key="k", time_col="t").to_pandas()
    assert len(out2) == 2
    assert out2["rv"].isna().all()


def test_wordpiece_empty_text():
    from kgray.ops.wordpiece import WordPieceTokenizer

    tok = WordPieceTokenizer(max_seq_length=8)
    ids, mask, segs = tok.features("")
    assert sum(mask) == 2  # just CLS + SEP
    assert tok.tokenize("") == []


def test_range_join_broadcast_band_edges(ray_session):
    from kgray.ops.joins import range_join_broadcast

    ds = rd.from_items(
        [{"v": x} for x in [-1.0, 0.0, 9.9, 10.0, 19.99, 20.0, 35.0]]
    )
    out = (
        range_join_broadcast(ds, [0.0, 10.0, 20.0, 30.0], "v")
        .to_pandas().sort_values("v", ignore_index=True)
    )
    # [0,10) -> 0, [10,20) -> 1, [20,30) -> 2, outside -> -1
    assert out["band"].tolist() == [-1, 0, 0, 1, 1, 2, -1]


def test_pre_aggregate_defuses_hot_key_skew(ray_session):
    """Salting-equivalence demonstration: with a 95%-hot key, the
    combiner's partial stage emits one row per (block, key) — the
    all-to-all moves O(blocks x keys) rows, not O(rows) — which is
    exactly what salted two-phase aggregation achieves, without picking
    a salt fan-out."""
    import pyarrow as pa

    from kgray.ops.agg import pre_aggregate

    n = 50_000
    rs = np.random.RandomState(0)
    keys = np.where(rs.rand(n) < 0.95, 0, rs.randint(1, 5, size=n))
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "x": pa.array(rs.rand(n))})
    ).repartition(16)

    agg = pre_aggregate(ds, ["k"], {"n": (None, "count"), "s": ("x", "sum")})
    out = agg.to_pandas().sort_values("k", ignore_index=True)
    # correctness under skew
    want = (
        pd.DataFrame({"k": keys, "x": None})
        .groupby("k").size().reset_index(name="n")
    )
    assert out["n"].tolist() == want["n"].tolist()
    assert out["n"].iloc[0] > 0.9 * n  # the hot key really was hot

    # the combiner bound: partials are at most blocks x distinct keys
    tagged = ds.map_batches(
        lambda b: pa.table({"k": pa.compute.unique(b["k"])}),
        batch_format="pyarrow",
    )
    assert tagged.count() <= 16 * 5


def test_grouped_map_autoskip_matches_coalesced(ray_session):
    """grouped_map skips its coalesce repartition when the input is
    materialized with <= num_buckets blocks; the result must equal the
    forced-coalesce path (same buckets, same per-key rows)."""
    from kgray.util import grouped_map

    df = _random_frame(11, False)

    def per_key_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["y"].sum().reset_index()

    small = rd.from_pandas(df).repartition(4).materialize()
    assert small.num_blocks() <= 8
    auto = (
        grouped_map(small, "k", per_key_sum, num_buckets=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    forced = (
        grouped_map(rd.from_pandas(df), "k", per_key_sum, num_buckets=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(auto, forced)
    expect = df.groupby("k", sort=False)["y"].sum().reset_index().sort_values(
        "k").reset_index(drop=True)
    pd.testing.assert_frame_equal(auto, expect)


@pytest.mark.parametrize("seed", [5, 6])
def test_asof_join_matches_global_merge_asof(ray_session, seed):
    """Distributed asof_join == one global pandas merge_asof on random
    frames (catches bucket-boundary and per-key colocation bugs).  Right
    (k, t) pairs are unique so tie order cannot differ between engines."""
    from kgray.ops.joins import asof_join

    rs = np.random.RandomState(seed)
    nl, nr = rs.randint(50, 150), rs.randint(30, 100)
    left = pd.DataFrame(
        {
            "k": rs.randint(0, 12, nl),
            "t": rs.randint(0, 1000, nl).astype("int64"),
            "lid": np.arange(nl, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rs.randint(0, 12, nr),
            "t": rs.randint(0, 1000, nr).astype("int64"),
            "rv": rs.randint(0, 10**6, nr).astype("int64"),
        }
    ).drop_duplicates(["k", "t"], ignore_index=True)

    got = (
        asof_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            key="k", time_col="t",
        )
        .to_pandas().sort_values("lid", ignore_index=True)
    )
    expect = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t", by="k", direction="backward", allow_exact_matches=True,
        suffixes=("", "_r"),
    ).sort_values("lid", ignore_index=True)
    assert list(got["lid"]) == list(expect["lid"])
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), expect["rv"].astype("float64"),
        check_names=False,
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_bucket_and_broadcast_join_match_pandas(ray_session, how):
    """bucket_join (big-big cogroup) and broadcast_join (small right)
    == one global pandas merge on random frames with duplicate keys."""
    from kgray.ops.joins import broadcast_join, bucket_join

    rs = np.random.RandomState(17)
    left = pd.DataFrame(
        {
            "k": rs.randint(0, 15, 120),
            "lv": rs.randint(0, 10**6, 120).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rs.randint(0, 20, 60),
            "rv": rs.randint(0, 10**6, 60).astype("int64"),
        }
    )
    expect = (
        left.merge(right, on="k", how=how)
        .sort_values(["k", "lv", "rv"], ignore_index=True)
    )
    for join in (bucket_join, broadcast_join):
        kwargs = {"num_buckets": 7} if join is bucket_join else {}
        got = (
            join(rd.from_pandas(left).repartition(5),
                 rd.from_pandas(right).repartition(3),
                 on="k", how=how, **kwargs)
            .to_pandas()
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        )
        assert list(got["k"]) == list(expect["k"]), join.__name__
        pd.testing.assert_series_equal(
            got["rv"].astype("float64"), expect["rv"].astype("float64"),
            check_names=False,
        )


def test_grouped_corr_matches_numpy(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgray.ops.agg import grouped_corr

    rng = np.random.default_rng(17)
    n = 4000
    g = rng.choice(["a", "b", "c"], n)
    x = rng.normal(0, 3, n)
    y = 0.6 * x + rng.normal(0, 1, n)  # correlated
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    got = (
        grouped_corr(rd.from_pandas(df, override_num_blocks=7), "g", "x", "y")
        .to_pandas()
        .set_index("g")["r"]
    )
    for key, sub in df.groupby("g"):
        want = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(got[key] - round(want, 4)) <= 1e-4, key


def test_grouped_corr_constant_column_is_nan(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgray.ops.agg import grouped_corr

    df = pd.DataFrame({"g": ["a"] * 10, "x": [2.0] * 10,
                       "y": np.arange(10.0)})
    out = grouped_corr(rd.from_pandas(df), "g", "x", "y").to_pandas()
    assert np.isnan(out["r"][0])
