"""Z-order clustered writes (io.write_zordered): the Morton interleave
of two columns gives every listed column tight per-partition zones, so
zone_filter prunes partitions for predicates on EITHER column — where a
hash layout prunes nothing.  Reads stay exact (pruning is a superset
filter), deletes target via zone maps instead of crc32."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgray import io


def _uv_ds(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 1024, n).astype(np.int64),
            "v": rng.integers(0, 1024, n).astype(np.int64),
        }
    )
    return rd.from_pandas(df), df


def test_zorder_prunes_on_both_columns(ray_session, tmp_path):
    ds, df = _uv_ds()
    out = str(tmp_path / "z")
    m = io.write_zordered(ds, out, ["u", "v"], num_partitions=16)
    assert m["partitioning"] == "zorder"
    nparts = len(m["partitions"])

    # roundtrip: nothing lost or duplicated
    got = io.read_table(out).to_pandas()
    assert sorted(map(tuple, got[["u", "v"]].values.tolist())) == \
        sorted(map(tuple, df[["u", "v"]].values.tolist()))

    # predicates on EITHER column prune at least half the partitions
    for col in ("u", "v"):
        keep = io.zone_partitions(out, {col: (0, 200)})
        assert keep is not None and 0 < len(keep) <= nparts // 2, col
        sub = io.read_table(out, zone_filter={col: (0, 200)}).to_pandas()
        want = df[df[col] <= 200]
        assert (sub[col] <= 200).sum() == len(want)


def test_hash_layout_prunes_nothing_on_scattered_column(ray_session,
                                                        tmp_path):
    ds, _ = _uv_ds()
    out = str(tmp_path / "h")
    io.write_partitioned(ds, out, key_col="u", num_partitions=16,
                         stats_cols=["u", "v"])
    # crc32 scatters u uniformly: every partition's u-zone spans ~the
    # full range, so the same predicate keeps everything
    keep = io.zone_partitions(out, {"u": (0, 200)})
    assert keep is not None and len(keep) == 16


def test_zorder_delete_targets_by_zones(ray_session, tmp_path):
    ds, df = _uv_ds()
    out = str(tmp_path / "z")
    io.write_zordered(ds, out, ["u", "v"], num_partitions=16)
    doomed = [int(df["u"].iloc[0]), int(df["u"].iloc[1])]
    m = io.delete_rows(out, doomed, key_col="u")
    assert m["partitioning"] == "zorder"
    got = io.read_table(out).to_pandas()
    assert not got["u"].isin(doomed).any()
    want = df[~df["u"].isin(doomed)]
    assert len(got) == len(want)
    # a second delete still finds its keys (zone targeting, not crc32)
    doomed2 = [int(want["u"].iloc[0])]
    io.delete_rows(out, doomed2, key_col="u")
    got2 = io.read_table(out).to_pandas()
    assert not got2["u"].isin(doomed2).any()
    assert len(got2) == len(want[~want["u"].isin(doomed2)])


def test_zorder_temporal_column(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    n = 1000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 1024, n).astype(np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 24, n), unit="h"),
        }
    )
    out = str(tmp_path / "zt")
    io.write_zordered(rd.from_pandas(df), out, ["u", "ts"],
                      num_partitions=16)
    # temporal zones are epoch integers in the column's own unit
    # (timestamp[ns] via from_pandas -> nanoseconds)
    lo = int(pd.Timestamp("2024-01-01").value)
    hi = int(pd.Timestamp("2024-01-08").value)
    keep = io.zone_partitions(out, {"ts": (lo, hi)})
    assert keep is not None and 0 < len(keep) < 16
    got = io.read_table(out, zone_filter={"ts": (lo, hi)}).to_pandas()
    want = df[(df["ts"] >= "2024-01-01") & (df["ts"] <= "2024-01-08")]
    assert (got["ts"] <= "2024-01-08").sum() >= len(want)
