"""Zone maps: per-partition min/max column stats folded into the
manifest by the SAME write tasks, and manifest-level partition pruning
on filtered reads — file skipping must be observable (fewer attested
files read), exact (no row lost at interval boundaries), and NEVER
silent (absent stats -> read everything)."""

import os

import numpy as np
import pandas as pd
import pytest


def _clustered_ds(n_keys=8, rows_per_key=50):
    import ray.data as rd

    # key k carries d in [k*100, k*100+99]: hash partitions then have
    # tight, non-overlapping d-zones per key
    rows = []
    for k in range(n_keys):
        for i in range(rows_per_key):
            rows.append((f"k{k}", k * 100 + (i % 100), float(i)))
    df = pd.DataFrame(rows, columns=["key", "d", "v"])
    return rd.from_pandas(df), df


def test_zone_maps_written_and_pruned(ray_session, tmp_path):
    from kgray.io import read_manifest, read_table, write_partitioned, \
        zone_partitions

    ds, df = _clustered_ds()
    out = str(tmp_path / "t")
    m = write_partitioned(ds, out, key_col="key", num_partitions=4,
                          stats_cols=["d"])
    # every partition entry carries a zones range covering its rows
    for meta in m["partitions"].values():
        lo, hi = meta["zones"]["d"]
        assert lo is not None and lo <= hi

    # a narrow interval hits exactly the partitions containing k3's range
    keep = zone_partitions(out, {"d": (300, 399)})
    assert keep is not None and 0 < len(keep) < 4

    got = read_table(out, zone_filter={"d": (300, 399)})
    gdf = got.to_pandas()
    # pruning is a superset filter: every matching row present exactly once
    want = df[(df["d"] >= 300) & (df["d"] <= 399)]
    sub = gdf[(gdf["d"] >= 300) & (gdf["d"] <= 399)]
    assert len(sub) == len(want)
    # and the read really skipped attested files
    all_files = sum(len(meta["files"]) for meta in m["partitions"].values())
    kept_files = sum(len(m["partitions"][p]["files"]) for p in keep)
    assert kept_files < all_files


def test_zone_boundary_rows_survive(ray_session, tmp_path):
    from kgray.io import read_table, write_partitioned

    ds, df = _clustered_ds()
    out = str(tmp_path / "t")
    write_partitioned(ds, out, key_col="key", num_partitions=4,
                      stats_cols=["d"])
    # closed-interval ends exactly on zone mins/maxes
    got = read_table(out, zone_filter={"d": (100, 100)}).to_pandas()
    assert (got["d"] == 100).sum() == (df["d"] == 100).sum()


def test_zone_filter_all_pruned_is_empty(ray_session, tmp_path):
    from kgray.io import read_table, write_partitioned

    ds, _ = _clustered_ds()
    out = str(tmp_path / "t")
    write_partitioned(ds, out, key_col="key", num_partitions=4,
                      stats_cols=["d"])
    assert read_table(out, zone_filter={"d": (10_000, 20_000)}) is None


def test_zone_filter_absent_stats_reads_everything(ray_session, tmp_path):
    from kgray.io import read_table, write_partitioned, zone_partitions

    ds, df = _clustered_ds()
    out = str(tmp_path / "t")
    write_partitioned(ds, out, key_col="key", num_partitions=4)  # no stats
    assert zone_partitions(out, {"d": (0, 1)}) is None
    got = read_table(out, zone_filter={"d": (0, 1)}).to_pandas()
    assert len(got) == len(df)  # never silently prune without stats


def test_zone_maps_survive_resume(ray_session, tmp_path):
    from kgray.io import read_manifest, write_partitioned

    ds, _ = _clustered_ds()
    out = str(tmp_path / "t")
    m1 = write_partitioned(ds, out, key_col="key", num_partitions=4,
                           stats_cols=["d"])
    keep = {int(p) for p in list(m1["partitions"])[:2]}
    m2 = write_partitioned(ds, out, key_col="key", num_partitions=4,
                           stats_cols=["d"], keep_partitions=keep)
    for pstr, meta in m2["partitions"].items():
        assert meta["zones"]["d"] == m1["partitions"][pstr]["zones"]["d"]


def test_zone_maps_temporal_encoded_as_epoch_ints(ray_session, tmp_path):
    """Timestamp stats_cols are zone-mapped as epoch integers (JSON-safe)
    and prune with integer bounds in the column's own unit."""
    import ray.data as rd

    from kgray.io import read_table, write_partitioned, zone_partitions

    # key k carries one distinct day: partitions get tight ts zones
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.repeat(np.arange(8), 25), unit="D"
    )
    df = pd.DataFrame({"key": [f"k{k}" for k in np.repeat(np.arange(8), 25)],
                       "ts": ts})
    out = str(tmp_path / "t")
    m = write_partitioned(rd.from_pandas(df), out, key_col="key",
                          num_partitions=4, stats_cols=["ts"])
    for meta in m["partitions"].values():
        lo, hi = meta["zones"]["ts"]
        assert isinstance(lo, int) and isinstance(hi, int) and lo <= hi

    day3 = int(pd.Timestamp("2024-01-04").value)  # epoch ns (ts is [ns])
    keep = zone_partitions(out, {"ts": (day3, day3)})
    assert keep is not None and 0 < len(keep) < 4
    got = read_table(out, zone_filter={"ts": (day3, day3)}).to_pandas()
    assert (got["ts"] == pd.Timestamp("2024-01-04")).sum() == 25


def test_zone_maps_unsupported_type_raises(ray_session, tmp_path):
    """Binary stats_cols raise a clear TypeError instead of an opaque
    json.dumps failure inside the write task."""
    import ray.data as rd

    from kgray.io import write_partitioned

    df = pd.DataFrame({"key": ["a", "b"] * 10,
                       "blob": [b"\x00\x01"] * 20})
    with pytest.raises(Exception) as ei:
        write_partitioned(rd.from_pandas(df), str(tmp_path / "t"),
                          key_col="key", num_partitions=2,
                          stats_cols=["blob"])
    assert "zone-map" in str(ei.value) or "TypeError" in str(ei.value)
