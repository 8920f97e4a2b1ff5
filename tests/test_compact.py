"""Compaction of manifest-attested partitioned writes: file counts drop,
contents and manifests' content-hashes survive, zone pruning still works,
and a crash between swap and delete leaves a readable dataset."""

import os

import pandas as pd
import pytest


def _many_file_write(tmp_path, n_rows=400, num_partitions=4):
    import ray.data as rd

    from kgray.io import write_partitioned

    df = pd.DataFrame(
        {
            "key": [f"k{i % 37}" for i in range(n_rows)],
            "d": list(range(n_rows)),
            "v": [float(i) * 0.5 for i in range(n_rows)],
        }
    )
    # many small blocks -> many files per partition
    ds = rd.from_pandas(df).repartition(16)
    out = str(tmp_path / "t")
    m = write_partitioned(ds, out, key_col="key",
                          num_partitions=num_partitions, stats_cols=["d"])
    return out, df, m


def test_compact_reduces_files_preserves_content(ray_session, tmp_path):
    from kgray.io import (compact_partitioned, manifest_content_hash,
                          read_manifest, read_table)

    out, df, m0 = _many_file_write(tmp_path)
    files_before = sum(len(p["files"]) for p in m0["partitions"].values())
    assert files_before > len(m0["partitions"])  # genuinely fragmented

    m1 = compact_partitioned(out)
    files_after = sum(len(p["files"]) for p in m1["partitions"].values())
    assert files_after == len(m1["partitions"])  # one file per partition

    # content identical, manifest content-hash (stage-skip key) unchanged
    assert manifest_content_hash(m0) == manifest_content_hash(m1)
    got = read_table(out).to_pandas().sort_values(["key", "d"])
    want = df.sort_values(["key", "d"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_like=True)

    # pre-compaction bytes stay on disk while their snapshot lives
    # (time travel); expire-and-vacuum reclaims them, after which the
    # on-disk state matches the manifest exactly
    from kgray.io import expire_versions

    expire_versions(out, keep_last=1)
    m2 = read_manifest(out)
    disk = set()
    data = os.path.join(out, "data")
    for root, _dirs, fnames in os.walk(data):
        for f in fnames:
            disk.add(os.path.relpath(os.path.join(root, f), data))
    attested = {f for p in m2["partitions"].values() for f in p["files"]}
    assert disk == attested

    # zone pruning still functional after compaction
    got = read_table(out, zone_filter={"d": (0, 50)}).to_pandas()
    assert set(got["d"]) >= set(range(51)) & set(df["d"])


def test_compact_refuses_row_mismatch(ray_session, tmp_path):
    from kgray.io import compact_partitioned, read_manifest

    out, _df, m0 = _many_file_write(tmp_path)
    # corrupt: delete one attested file -> rows on disk < attested
    victim = next(
        f for p in m0["partitions"].values() for f in p["files"]
    )
    os.remove(os.path.join(out, "data", victim))
    with pytest.raises(Exception):
        compact_partitioned(out)
    # manifest untouched by the failed attempt
    assert read_manifest(out) == m0


def test_compact_splits_to_target_bytes(ray_session, tmp_path):
    from kgray.io import compact_partitioned, read_table

    out, df, _m0 = _many_file_write(tmp_path, n_rows=2000)
    m1 = compact_partitioned(out, target_bytes=4 << 10)  # force multi-file
    for p in m1["partitions"].values():
        assert len(p["files"]) >= 1
    got = read_table(out).to_pandas()
    assert len(got) == len(df)
