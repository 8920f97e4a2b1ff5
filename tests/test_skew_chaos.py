"""Skew chaos fixture (VERDICT r3 item 5): an adversarial corpus — Zipf
vocab, hot head entity, one degenerate LSH clique — must NOT blow up any
reducer.  Pins that (a) the fixture really is skewed, (b) the
``max_block`` caps bound per-bucket pair emission, (c) the salted join
spreads the hot key and still equals the unsalted join bit-for-bit, and
(d) the end-to-end minhash pipeline survives and still finds planted
duplicate pairs outside the degenerate bucket."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

MAX_BLOCK = 128  # dedup.minhash_dup_pairs in-bucket cap


def _band_table(texts, ids, num_hashes=64, bands=32):
    from kgray.ops.dedup import band_keys, batch_signatures, word_shingles
    from kgray.ops.linking import _hash_params

    sigs = batch_signatures([word_shingles(t) for t in texts],
                            _hash_params(num_hashes))
    keys = band_keys(sigs, bands)
    return pd.DataFrame(
        {"band_key": keys, "doc": np.repeat(np.asarray(ids, np.int64),
                                            bands)}
    )


def test_fixture_is_skewed_and_pair_caps_hold():
    from kgray.corpus import adversarial_docs
    from kgray.util import pairs_within_groups

    t = adversarial_docs(2000)
    df = _band_table(t["text"].to_pylist(), t["doc_id"].to_pylist())

    sizes = df.drop_duplicates().groupby("band_key", sort=False)["doc"] \
        .size().sort_values()
    # the clique collapses ~300 docs into single band buckets: the top
    # bucket is >= 10x the median (the adversarial condition)
    assert sizes.iloc[-1] >= 10 * sizes.median()
    assert sizes.iloc[-1] > MAX_BLOCK  # the cap is actually exercised

    pairs = pairs_within_groups(df, "band_key", "doc", MAX_BLOCK)
    # accounting identity: emission is exactly C(s,2) per bucket with
    # 2 <= s <= cap, and ZERO for every oversized (degenerate) bucket —
    # so per-bucket reducer output is bounded by C(cap, 2) by
    # construction, and the identity proves the cap really dropped the
    # clique buckets
    s = sizes.to_numpy()
    expected = int((s[(s >= 2) & (s <= MAX_BLOCK)] *
                    (s[(s >= 2) & (s <= MAX_BLOCK)] - 1) // 2).sum())
    assert len(pairs) == expected
    # and far below the uncapped clique quadratic
    clique_n = int(2000 * 0.15)
    assert len(pairs) < clique_n * (clique_n - 1) // 2


def test_salted_join_bounds_hot_bucket_and_matches_unsalted(ray_session):
    import ray.data as rd

    from kgray.ops.joins import bucket_join, salted_bucket_join
    from kgray.util import bucket_of

    rng = np.random.default_rng(7)
    n = 20_000
    # 30% of left rows carry the hot key (one reducer's worth unsalted)
    keys = np.where(rng.random(n) < 0.3, 0,
                    rng.integers(1, 500, n)).astype(np.int64)
    left = pa.table({"k": pa.array(keys), "x": pa.array(
        rng.integers(0, 1000, n).astype(np.int64))})
    right = pa.table({"k": pa.array(np.arange(500, dtype=np.int64)),
                      "y": pa.array(np.arange(500, dtype=np.int64) * 10)})

    num_buckets, salt = 32, 8
    unsalted_hist = np.bincount(bucket_of(left["k"], num_buckets),
                                minlength=num_buckets)
    salts = bucket_of(left["x"], salt)  # exactly salted_bucket_join's rule
    # composite (k, salt) occupancy: the hot key now spreads over `salt`
    # buckets; worst bucket drops by >= 4x (salt=8, slack 2x)
    comp = pd.DataFrame({"k": keys, "s": salts})
    comp_hist = comp.groupby(["k", "s"]).size()
    assert comp_hist.max() <= unsalted_hist.max() / 4

    a = salted_bucket_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        salt_col="x", salt=salt, how="left",
    ).to_pandas().sort_values(["k", "x", "y"], ignore_index=True)
    b = bucket_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k", how="left",
    ).to_pandas().sort_values(["k", "x", "y"], ignore_index=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_minhash_survives_adversarial_corpus(ray_session):
    import ray.data as rd

    from kgray.corpus import adversarial_docs
    from kgray.ops.dedup import minhash_dup_pairs

    t = adversarial_docs(1200)
    # plant 3 exact-dup pairs OUTSIDE the clique (unique random texts)
    df = t.to_pandas()
    for i, (a, b) in enumerate([(1000, 1001), (1050, 1051), (1100, 1101)]):
        df.loc[b, "text"] = df.loc[a, "text"]
    ds = rd.from_pandas(df[["doc_id", "text"]])

    pairs = minhash_dup_pairs(ds, tau=0.9).to_pandas()
    got = set(map(tuple, pairs[["u", "v"]].to_numpy()))
    for want in [(1000, 1001), (1050, 1051), (1100, 1101)]:
        assert want in got
