"""Multi-table transactions (io.py): one atomic commit point pins a
CONSISTENT set of table versions; uncommitted table advances are
invisible through the txn view; expire_versions(protect=) keeps
txn-pinned snapshots alive; kg_construct stamps one txn per run."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from kgray import io


def _ds(vals):
    return rd.from_arrow(
        pa.table({"k": pa.array(list(range(len(vals))), pa.int64()),
                  "x": pa.array(vals, pa.int64())})
    )


def test_txn_view_is_consistent_across_uncommitted_writes(
        ray_session, tmp_path):
    root = str(tmp_path)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    io.write_partitioned(_ds([1, 2]), a, "k", num_partitions=2)
    io.write_partitioned(_ds([10]), b, "k", num_partitions=2)
    rec = io.commit_txn(root, {"a": a, "b": b}, note="r1")
    assert rec["txn"] == 1

    # a "crashed second run": table a advanced, b (and the txn) did not
    io.write_partitioned(_ds([7, 8, 9]), a, "k", num_partitions=2)
    assert sorted(io.read_table(a).to_pandas()["x"]) == [7, 8, 9]
    assert sorted(io.read_txn_table(root, "a").to_pandas()["x"]) == [1, 2]
    assert sorted(io.read_txn_table(root, "b").to_pandas()["x"]) == [10]

    # the completed second run commits: the view flips atomically
    io.write_partitioned(_ds([20, 30]), b, "k", num_partitions=2)
    io.commit_txn(root, {"a": a, "b": b}, note="r2")
    assert sorted(io.read_txn_table(root, "a").to_pandas()["x"]) \
        == [7, 8, 9]
    assert sorted(io.read_txn_table(root, "b").to_pandas()["x"]) \
        == [20, 30]
    # time travel to the first txn stays intact
    assert sorted(io.read_txn_table(root, "a", txn=1)
                  .to_pandas()["x"]) == [1, 2]
    assert [t["txn"] for t in io.list_txns(root)] == [1, 2]


def test_txn_errors(ray_session, tmp_path):
    root = str(tmp_path)
    with pytest.raises(FileNotFoundError):
        io.read_txn_table(root, "a")
    a = str(tmp_path / "a")
    io.write_partitioned(_ds([1]), a, "k", num_partitions=1)
    io.commit_txn(root, {"a": a})
    with pytest.raises(KeyError):
        io.read_txn_table(root, "missing")
    with pytest.raises(FileNotFoundError):
        io.read_txn_table(root, "a", txn=99)
    with pytest.raises(FileNotFoundError):
        io.commit_txn(root, {"x": str(tmp_path / "nope")})


def test_expire_protect_keeps_txn_pinned_versions(ray_session, tmp_path):
    root = str(tmp_path)
    a = str(tmp_path / "a")
    io.write_partitioned(_ds([1, 2]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    io.write_partitioned(_ds([3]), a, "k", num_partitions=2)
    io.write_partitioned(_ds([4]), a, "k", num_partitions=2)
    pinned = io.txn_pinned_versions(root, a)
    assert pinned == {1}
    dropped = io.expire_versions(a, keep_last=1, protect=pinned)
    # v2 dropped, v1 (pinned) + v3 (current) survive
    assert dropped == 1
    assert sorted(io.read_txn_table(root, "a").to_pandas()["x"]) == [1, 2]


def test_kg_construct_commits_a_txn(ray_session, tmp_path):
    from kgray.corpus import interleaved_dataset
    from kgray.pipeline import kg_construct

    out = str(tmp_path / "out")
    kg_construct(interleaved_dataset(n_docs=60, seed=3), out,
                 num_partitions=2)
    rec = io.latest_txn(out)
    assert rec is not None and rec["note"] == "kg_construct"
    assert set(rec["tables"]) == {"triples", "entities",
                                  "triples_canonical"}
    tri = io.read_txn_table(out, "triples_canonical")
    assert tri.count() > 0


def test_commit_txn_exclusive_create_skips_taken_id(ray_session, tmp_path):
    """A txn file created out-of-band at the next tid must NOT be
    silently overwritten — the committer retries with the next id."""
    import json
    import os

    root = str(tmp_path)
    a = str(tmp_path / "a")
    io.write_partitioned(_ds([1]), a, "k", num_partitions=1)
    rec1 = io.commit_txn(root, {"a": a})
    # squat on tid 2 (what a concurrent committer would have won)
    squat = os.path.join(root, "_txns", "t000002.json")
    with open(squat, "w") as f:
        json.dump({"txn": 2, "note": "squatter", "tables": {}}, f)
    rec2 = io.commit_txn(root, {"a": a})
    assert rec1["txn"] == 1 and rec2["txn"] == 3
    with open(squat) as f:
        assert json.load(f)["note"] == "squatter"  # untouched


def test_hard_forget_marks_destroyed_txn_pins(ray_session, tmp_path):
    """prune_txn_pins: a txn pinning a version destroyed by hard
    expiry is marked destroyed and read_txn_table raises clearly."""
    root = str(tmp_path)
    a = str(tmp_path / "a")
    io.write_partitioned(_ds([1, 2]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    io.write_partitioned(_ds([7, 8]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    # destroy the older snapshot WITHOUT protection (hard-forget path)
    io.expire_versions(a, keep_last=1)
    marked = io.prune_txn_pins(root)
    assert marked == 1
    with pytest.raises(FileNotFoundError) as ei:
        io.read_txn_table(root, "a", txn=1)
    assert "destroyed" in str(ei.value)
    # latest txn still reads fine; idempotent second prune marks nothing
    assert sorted(io.read_txn_table(root, "a").to_pandas()["x"]) == [7, 8]
    assert io.prune_txn_pins(root) == 0


def test_expire_with_txn_protect_keeps_pinned_readable(
        ray_session, tmp_path):
    """The CLI default: protect=txn_pinned_versions keeps every
    committed txn readable through an expiry sweep."""
    root = str(tmp_path)
    a = str(tmp_path / "a")
    io.write_partitioned(_ds([1, 2]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    io.write_partitioned(_ds([7, 8]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    io.expire_versions(a, keep_last=1,
                       protect=io.txn_pinned_versions(root, a))
    assert sorted(io.read_txn_table(root, "a", txn=1)
                  .to_pandas()["x"]) == [1, 2]
    assert io.prune_txn_pins(root) == 0


def test_cli_txn_prune_flag(ray_session, tmp_path, capsys):
    """python -m kgray txn ROOT --prune marks destroyed pins."""
    from kgray.__main__ import main

    root = str(tmp_path)
    a = str(tmp_path / "a")
    io.write_partitioned(_ds([1, 2]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    io.write_partitioned(_ds([7, 8]), a, "k", num_partitions=2)
    io.commit_txn(root, {"a": a})
    io.expire_versions(a, keep_last=1)  # destroy the pinned snapshot
    rc = main(["txn", root, "--prune"])
    out = capsys.readouterr().out
    assert rc == 0 and "pruned 1 destroyed pin(s)" in out
    with pytest.raises(FileNotFoundError):
        io.read_txn_table(root, "a", txn=1)
