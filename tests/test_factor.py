"""Rank-1 integer ALS (ops/factor.py): hand-derived fixed point on a
single-user matrix, determinism, and broadcast-vs-bucket-join
paths-agree under KGRAY_FORCE_DISTRIBUTED."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _r_ds(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["u", "i", "r"])
    return rd.from_arrow(pa.table({
        "u": pa.array(df["u"].to_numpy(np.int64)),
        "i": pa.array(df["i"].to_numpy(np.int64)),
        "r": pa.array(df["r"].to_numpy(np.int64)),
    }))


def test_single_user_hand_fixed_point(ray_session):
    """One user, ratings (2, 4, 6), S = 10^4: u1 = S*mean(r) = 4S
    exactly (mean divides), v1_i = S*r_i/mean = (5000, 10000, 15000),
    and the second round reproduces the same factors — a genuine fixed
    point of the integer recurrence."""
    from kgray.ops.factor import als1

    u, v = als1(_r_ds([(1, 10, 2), (1, 20, 4), (1, 30, 6)]), "u", "i", "r",
                iters=2)
    udf = u.to_pandas()
    vdf = v.to_pandas().sort_values("i")
    assert udf["f"].tolist() == [40_000]
    assert vdf["f"].tolist() == [5_000, 10_000, 15_000]


def test_als_deterministic_reruns(ray_session):
    from kgray.ops.factor import als1

    rows = [(u, i, (u * 7 + i * 3) % 11 + 1)
            for u in range(1, 12) for i in range(1, 9) if (u + i) % 3]
    out1 = als1(_r_ds(rows), "u", "i", "r", iters=2)[1].to_pandas()
    out2 = als1(_r_ds(rows), "u", "i", "r", iters=2)[1].to_pandas()
    a = dict(zip(out1["i"], out1["f"]))
    b = dict(zip(out2["i"], out2["f"]))
    assert a == b


def test_paths_agree_forced_distributed(ray_session, monkeypatch):
    """The bucket-join fallback (what 100 TB runs) must emit the exact
    factors the broadcast shortcut does."""
    from kgray.ops.factor import als1

    rows = [(u, i, (u * 5 + i) % 9 + 1)
            for u in range(1, 20) for i in range(1, 15) if (u * i) % 4]
    ds = _r_ds(rows)
    broad = als1(ds, "u", "i", "r", iters=2)[1].to_pandas()
    monkeypatch.setenv("KGRAY_FORCE_DISTRIBUTED", "1")
    forced = als1(ds, "u", "i", "r", iters=2)[1].to_pandas()
    assert dict(zip(broad["i"], broad["f"])) == \
        dict(zip(forced["i"], forced["f"]))
