"""Composite-key bucket_join (kgray/ops/joins.py) — inner/left/full
outer parity against pandas merge, including mixed int/string keys,
differing key names, and int32-vs-int64 key width drift."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _sides(seed=7, n_left=80, n_right=60):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "uid": rng.integers(0, 12, n_left).astype(np.int64),
            "day": rng.choice(["d1", "d2", "d3"], n_left),
            "lval": np.arange(n_left, dtype=np.int64),
        }
    ).drop_duplicates(["uid", "day"])
    right = pd.DataFrame(
        {
            "uid": rng.integers(5, 18, n_right).astype(np.int64),
            "day": rng.choice(["d2", "d3", "d4"], n_right),
            "rval": np.arange(n_right, dtype=np.int64) * 10,
        }
    ).drop_duplicates(["uid", "day"])
    return left, right


def _run(left, right, how, right_on=None, **kw):
    import ray.data as rd

    from kgray.ops.joins import bucket_join

    out = bucket_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on=["uid", "day"],
        right_on=right_on,
        how=how,
        num_buckets=4,
        **kw,
    ).to_pandas()
    return out


def test_multikey_inner_matches_pandas(ray_session):
    left, right = _sides()
    got = (
        _run(left, right, "inner")
        .sort_values(["uid", "day"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on=["uid", "day"], how="inner")
        .sort_values(["uid", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_multikey_outer_matches_pandas(ray_session):
    left, right = _sides(seed=11)
    got = (
        _run(left, right, "outer")
        .sort_values(["uid", "day", "lval", "rval"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on=["uid", "day"], how="outer")
        .sort_values(["uid", "day", "lval", "rval"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["uid", "day"]:
        assert got[c].tolist() == want[c].tolist()
    for c in ["lval", "rval"]:
        assert (
            got[c].fillna(-1).astype(np.int64).tolist()
            == want[c].fillna(-1).astype(np.int64).tolist()
        )
    # both null sides must be present for the test to mean anything
    assert got["lval"].isna().any() and got["rval"].isna().any()


def test_multikey_differing_names_and_width(ray_session):
    left, right = _sides(seed=13)
    right = right.rename(columns={"uid": "r_uid", "day": "r_day"})
    right["r_uid"] = right["r_uid"].astype(np.int32)  # width drift
    got = (
        _run(left, right, "left", right_on=["r_uid", "r_day"])
        .sort_values(["uid", "day", "lval"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(
            right,
            left_on=["uid", "day"],
            right_on=["r_uid", "r_day"],
            how="left",
        )
        .drop(columns=["r_uid", "r_day"])
        .sort_values(["uid", "day", "lval"])
        .reset_index(drop=True)
    )
    assert got.columns.tolist() == ["uid", "day", "lval", "rval"]
    assert got["lval"].tolist() == want["lval"].tolist()
    assert (
        got["rval"].fillna(-1).astype(np.int64).tolist()
        == want["rval"].fillna(-1).astype(np.int64).tolist()
    )


def test_single_key_path_unchanged(ray_session):
    left, right = _sides(seed=17)
    import ray.data as rd

    from kgray.ops.joins import bucket_join

    got = (
        bucket_join(
            rd.from_pandas(left[["uid", "lval"]].drop_duplicates("uid")),
            rd.from_pandas(right[["uid", "rval"]].drop_duplicates("uid")),
            on="uid",
            how="inner",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    want = (
        left[["uid", "lval"]]
        .drop_duplicates("uid")
        .merge(right[["uid", "rval"]].drop_duplicates("uid"), on="uid")
        .sort_values("uid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_salted_join_equals_unsalted_under_skew(ray_session):
    """One hot key carries half the left side; the salted join must
    return exactly the plain join's rows (including left-unmatched
    null fills)."""
    import ray.data as rd

    from kgray.ops.joins import bucket_join, salted_bucket_join

    rng = np.random.default_rng(19)
    n = 2000
    keys = np.where(
        rng.random(n) < 0.5, 7, rng.integers(0, 50, n)
    ).astype(np.int64)
    left = pd.DataFrame(
        {
            "k": keys,
            "row_id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.arange(0, 40, dtype=np.int64),  # keys 40..49 unmatched
            "y": np.arange(0, 400, 10, dtype=np.int64),
        }
    )
    for how in ("inner", "left"):
        plain = (
            bucket_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="k", how=how, num_buckets=4,
            )
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        salted = (
            salted_bucket_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="k", salt_col="row_id", salt=8, how=how, num_buckets=4,
            )
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        assert salted.columns.tolist() == plain.columns.tolist()
        pd.testing.assert_frame_equal(salted, plain[salted.columns])
    # left how actually exercised null fills
    assert left["k"].max() >= 40


def test_salted_join_spreads_the_hot_key(ray_session):
    """The mechanism itself: the hot key's rows land in more than one
    bucket once salted (bucket = hash(key tuple) % buckets)."""
    import pyarrow as pa

    from kgray.util import bucket_of, bucket_of_multi

    hot = pa.table(
        {
            "k": pa.array(np.full(64, 7, np.int64)),
            "_salt": pa.array(np.arange(64, dtype=np.int64) % 8),
        }
    )
    unsalted = set(bucket_of(hot["k"].combine_chunks(), 8).tolist())
    salted = set(bucket_of_multi(hot, ["k", "_salt"], 8).tolist())
    assert len(unsalted) == 1
    assert len(salted) > 1
