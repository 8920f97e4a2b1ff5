"""HyperLogLog distinct sketch (ops/sketch.py): accuracy vs exact counts
and determinism of the register pipeline."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_registers_match_bit_twiddling():
    """rho from the log2 formulation == a per-value python bit scan."""
    from kgray.ops.sketch import _registers

    rs = np.random.RandomState(0)
    h = rs.randint(0, 2**63, 2000, dtype=np.int64).astype(np.uint64)
    h[:8] = [0, 1, 2**63, 2**64 - 1, 12345, 2**32, 2**32 - 1, 2**53]
    p = 14
    idx, rho = _registers(h, p)
    for i in range(len(h)):
        hv = int(h[i])
        assert idx[i] == hv >> (64 - p)
        tail = ((hv << p) | ((1 << p) - 1)) & (2**64 - 1)
        want = 64 - tail.bit_length() + 1
        assert rho[i] == want, (i, hex(hv))


def test_hll_within_2pct_int_keys(ray_session):
    from kgray.ops.sketch import hll_distinct

    n = 100_000
    vals = np.repeat(np.arange(n, dtype=np.int64), 2)  # each value twice
    est = hll_distinct(
        rd.from_arrow(pa.table({"v": vals})), "v", p=14
    )["est"][0].as_py()
    assert abs(est - n) / n < 0.02


def test_hll_small_range_exactish_and_strings(ray_session):
    from kgray.ops.sketch import hll_distinct

    # linear-counting regime: tiny cardinality is near-exact
    est = hll_distinct(
        rd.from_arrow(pa.table({"v": pa.array(list(range(50)) * 3,
                                              pa.int64())})), "v"
    )["est"][0].as_py()
    assert est == 50
    strs = [f"user-{i % 400}" for i in range(4000)]
    est_s = hll_distinct(
        rd.from_arrow(pa.table({"v": pa.array(strs, pa.string())})), "v"
    )["est"][0].as_py()
    assert abs(est_s - 400) <= 8


def test_hll_deterministic_across_block_layouts(ray_session):
    from kgray.ops.sketch import hll_distinct

    vals = np.arange(10_000, dtype=np.int64)
    a = hll_distinct(rd.from_arrow(pa.table({"v": vals})), "v")["est"][0]
    b = hll_distinct(
        rd.from_arrow(pa.table({"v": vals[::-1].copy()}))
        .repartition(17), "v"
    )["est"][0]
    assert a == b


# ---------------------------------------------------------------------------
# heavy hitters (Misra-Gries)
# ---------------------------------------------------------------------------

def _zipf_tokens(n=30_000, vocab=800, seed=13):
    import pandas as pd

    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    ranks = ranks[ranks <= vocab]
    return pd.DataFrame({"token": [f"w{r:04d}" for r in ranks]})


def test_heavy_hitters_exact_when_under_capacity(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgray.ops.sketch import heavy_hitters

    df = _zipf_tokens()
    ds = rd.from_pandas(df, override_num_blocks=8)
    top, err = heavy_hitters(ds, "token", k=10, capacity=4096)
    assert err == 0
    got = top.to_pandas()
    vc = df["token"].value_counts()
    want = (
        pd.DataFrame({"token": vc.index, "est": vc.to_numpy()})
        .sort_values(["est", "token"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got["token"].tolist() == want["token"].tolist()
    assert got["est"].tolist() == want["est"].tolist()


def test_heavy_hitters_truncated_bound_holds(ray_session):
    import ray.data as rd

    from kgray.ops.sketch import heavy_hitters

    df = _zipf_tokens(n=40_000, vocab=3000, seed=29)
    ds = rd.from_pandas(df, override_num_blocks=10)
    cap = 64  # far below vocab: every batch truncates
    top, err = heavy_hitters(ds, "token", k=10, capacity=cap)
    n = len(df)
    assert 0 < err <= n // (cap + 1)
    got = top.to_pandas().set_index("token")["est"]
    true = df["token"].value_counts()
    # estimates are lower bounds within err of the truth
    for tok, est in got.items():
        assert est <= true[tok] <= est + err, tok
    # any key whose true count clears the error bound by a margin over
    # the k-th estimate must surface in the top-k
    kth = got.min()
    for tok, cnt in true.items():
        if cnt > kth + err:
            assert tok in got.index, (tok, cnt, kth, err)


# ---------------------------------------------------------------------------
# DDSketch quantiles
# ---------------------------------------------------------------------------

def test_dd_quantiles_relative_error_bound(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgray.ops.sketch import dd_quantiles

    rng = np.random.default_rng(41)
    vals = rng.lognormal(3.0, 1.5, size=50_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals}), override_num_blocks=9)
    ps = [0.1, 0.5, 0.9, 0.99]
    got = dd_quantiles(ds, "v", ps, alpha=0.01).to_pandas()
    srt = np.sort(vals)
    for p, est in zip(got["p"], got["est"]):
        true = srt[max(1, int(np.ceil(p * len(srt)))) - 1]
        assert abs(est - true) / true <= 0.0101, (p, est, true)


def test_dd_quantiles_zero_bucket_and_layout_determinism(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgray.ops.sketch import dd_quantiles

    vals = np.concatenate([np.zeros(80), np.full(20, 7.5)])
    df = pd.DataFrame({"v": vals})
    a = dd_quantiles(rd.from_pandas(df, override_num_blocks=1),
                     "v", [0.5, 0.95]).to_pandas()
    b = dd_quantiles(rd.from_pandas(df.sample(frac=1, random_state=0),
                                    override_num_blocks=13),
                     "v", [0.5, 0.95]).to_pandas()
    assert a["est"][0] == 0.0  # median sits in the zero bucket
    assert abs(a["est"][1] - 7.5) / 7.5 <= 0.01
    assert a["est"].tolist() == b["est"].tolist()  # layout-independent


def test_hll_distinct_by_within_3pct(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgray.ops.sketch import hll_distinct_by

    rng = np.random.default_rng(59)
    n = 60_000
    day = rng.integers(0, 4, n)
    # distinct pools of very different sizes per day
    user = np.where(day == 0, rng.integers(0, 100, n),
                    rng.integers(0, 20_000, n))
    df = pd.DataFrame({"day": day.astype(np.int64),
                       "user": user.astype(np.int64)})
    out = hll_distinct_by(
        rd.from_pandas(df, override_num_blocks=8), "day", "user", p=12
    ).to_pandas().set_index("key")["est"]
    for d, g in df.groupby("day"):
        true = g["user"].nunique()
        # 1.6% s.e. at p=12; 5% ~ 3 sigma (linear-counting small range
        # has its own variance: measured 97 vs 100 on the small group)
        assert abs(out[d] - true) / true < 0.05, (d, out[d], true)
