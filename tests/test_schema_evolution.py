"""Schema evolution (io.py): appended batches may ADD columns; the
manifest carries the unified Arrow schema, read_table scans with it so
pre-evolution files null-fill the new columns (instead of the scan
silently adopting the first file's schema), mixed-schema partitions
compact, and snapshot reads keep each version's own schema."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from kgray import io


def _ds(ks, extra=None):
    cols = {"k": pa.array(ks, pa.int64()),
            "x": pa.array([v * 10 for v in ks], pa.int64())}
    if extra is not None:
        cols["score"] = pa.array(extra, pa.float64())
    return rd.from_arrow(pa.table(cols))


def _append(path, ds):
    m = io.read_manifest(path)
    keep = {int(p) for p in m["partitions"]}
    return io.write_partitioned(
        ds, path, "k", num_partitions=m["num_partitions"],
        keep_partitions=keep,
    )


def test_appended_column_null_fills_old_files(ray_session, tmp_path):
    path = str(tmp_path / "t")
    io.write_partitioned(_ds([1, 2, 3, 4]), path, "k", num_partitions=2)
    _append(path, _ds([5, 6], extra=[0.5, 0.6]))
    df = io.read_table(path).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert df["k"].tolist() == [1, 2, 3, 4, 5, 6]
    assert "score" in df.columns
    assert df["score"].isna().tolist() == [True] * 4 + [False] * 2
    assert df.loc[4, "score"] == 0.5
    # projecting the evolved column alone also null-fills
    s = io.read_table(path, columns=["score"]).to_pandas()
    assert s["score"].notna().sum() == 2
    # unknown columns fail loudly, not with a scan error later
    with pytest.raises(KeyError):
        io.read_table(path, columns=["nope"])


def test_snapshot_keeps_its_own_schema(ray_session, tmp_path):
    path = str(tmp_path / "t")
    io.write_partitioned(_ds([1, 2]), path, "k", num_partitions=2)
    _append(path, _ds([3], extra=[0.3]))
    v1 = io.read_table(path, version=1).to_pandas()
    assert "score" not in v1.columns
    v2 = io.read_table(path, version=2).to_pandas()
    assert "score" in v2.columns


def test_mixed_schema_partition_compacts(ray_session, tmp_path):
    path = str(tmp_path / "t")
    # num_partitions=1 forces both writes into ONE partition -> the
    # compaction concat sees two files with different schemas
    io.write_partitioned(_ds([1, 2]), path, "k", num_partitions=1)
    _append(path, _ds([3, 4], extra=[0.3, 0.4]))
    io.compact_partitioned(path)
    m = io.read_manifest(path)
    assert all(len(meta["files"]) == 1
               for meta in m["partitions"].values())
    df = io.read_table(path).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert df["k"].tolist() == [1, 2, 3, 4]
    assert df["score"].isna().tolist() == [True, True, False, False]
    # compaction heals the evolution: one schema left, file-level
    # column projection safe again
    assert len(m.get("schemas", [])) == 1
    s = io.read_table(path, columns=["k", "score"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert s["score"].notna().tolist() == [False, False, True, True]


def test_type_conflict_raises_at_write_time(ray_session, tmp_path):
    path = str(tmp_path / "t")
    io.write_partitioned(_ds([1, 2]), path, "k", num_partitions=2)
    bad = rd.from_arrow(pa.table({
        "k": pa.array([3], pa.int64()),
        "x": pa.array(["oops"], pa.string()),   # x was int64
    }))
    with pytest.raises(pa.ArrowTypeError):
        _append(path, bad)


def test_delete_rows_preserves_evolved_schema(ray_session, tmp_path):
    path = str(tmp_path / "t")
    io.write_partitioned(_ds([1, 2, 3, 4]), path, "k", num_partitions=2)
    _append(path, _ds([5, 6], extra=[0.5, 0.6]))
    io.delete_rows(path, [5], key_col="k")
    df = io.read_table(path).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert df["k"].tolist() == [1, 2, 3, 4, 6]
    assert "score" in df.columns and df.loc[4, "score"] == 0.6
