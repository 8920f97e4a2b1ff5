"""Per-partition Bloom indexes: point-lookup file skipping for columns
the hash-partitioning key does NOT determine.  Pruning must be
observable (partitions skipped for a rare key), exact (never loses a
matching row — bloom false positives only widen the read), and never
silent (absent blooms -> read everything).  Appends OR-merge; appends
that stop covering a bloomed column drop the stale bloom; delete_rows
narrows its rewrite set with the bloom and re-blooms rewritten
partitions."""

import numpy as np
import pandas as pd
import pytest


def _ds(n=800, n_ent=100, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # entity is NOT the partition key: hash partitioning scatters it
        "entity": [f"ent{int(e)}" for e in rng.integers(0, n_ent, n)],
        "v": rng.random(n),
    })
    return rd.from_pandas(df), df


def test_bloom_prunes_and_never_loses_rows(ray_session, tmp_path):
    from kgray.io import bloom_partitions, read_table, write_partitioned

    ds, df = _ds()
    out = str(tmp_path / "t")
    m = write_partitioned(ds, out, key_col="doc_id", num_partitions=16,
                          bloom_cols=["entity"])
    for meta in m["partitions"].values():
        e = meta["blooms"]["entity"]
        assert e["bits"] > 0 and e["k"] > 0 and e["z"]

    # a value planted in ONE row lives in one partition; the bloom must
    # prune at least half the partitions (FP rate at this load is ~0)
    rare = df["entity"].iloc[0]
    keep = bloom_partitions(out, {"entity": [rare]})
    assert keep is not None and 1 <= len(keep) <= 8

    got = read_table(out, point_filter={"entity": [rare]}).to_pandas()
    want = df[df["entity"] == rare]
    sub = got[got["entity"] == rare]
    assert len(sub) == len(want)  # superset read: no matching row lost

    # probing a value that was never written prunes everything or nearly
    ghost = bloom_partitions(out, {"entity": ["never-written-entity"]})
    assert ghost is not None and len(ghost) <= 2  # FPs only


def test_absent_bloom_never_prunes(ray_session, tmp_path):
    from kgray.io import bloom_partitions, read_table, write_partitioned

    ds, df = _ds(n=200)
    out = str(tmp_path / "t")
    write_partitioned(ds, out, key_col="doc_id", num_partitions=4)
    assert bloom_partitions(out, {"entity": ["ent1"]}) is None
    got = read_table(out, point_filter={"entity": ["ent1"]}).to_pandas()
    assert len(got) == len(df)  # read everything


def test_append_or_merges_blooms(ray_session, tmp_path):
    import ray.data as rd

    from kgray.io import bloom_partitions, read_table, write_partitioned

    ds, df = _ds(n=400)
    out = str(tmp_path / "t")
    m1 = write_partitioned(ds, out, key_col="doc_id", num_partitions=4,
                           bloom_cols=["entity"])
    new = pd.DataFrame({
        "doc_id": np.arange(400, 450, dtype=np.int64),
        "entity": ["brand-new-ent"] * 50,
        "v": np.zeros(50),
    })
    write_partitioned(rd.from_pandas(new), out, key_col="doc_id",
                      num_partitions=4,
                      keep_partitions={int(p) for p in m1["partitions"]},
                      bloom_cols=["entity"])
    # old and new keys both findable after the merge
    for probe in [df["entity"].iloc[0], "brand-new-ent"]:
        keep = bloom_partitions(out, {"entity": [probe]})
        assert keep is not None
        got = read_table(out, point_filter={"entity": [probe]}).to_pandas()
        assert (got["entity"] == probe).sum() > 0


def test_append_without_bloom_cols_drops_stale_bloom(ray_session, tmp_path):
    import ray.data as rd

    from kgray.io import bloom_partitions, read_manifest, write_partitioned

    ds, df = _ds(n=400)
    out = str(tmp_path / "t")
    m1 = write_partitioned(ds, out, key_col="doc_id", num_partitions=4,
                           bloom_cols=["entity"])
    new = pd.DataFrame({
        "doc_id": np.arange(400, 450, dtype=np.int64),
        "entity": ["uncovered-ent"] * 50,
        "v": np.zeros(50),
    })
    write_partitioned(rd.from_pandas(new), out, key_col="doc_id",
                      num_partitions=4,
                      keep_partitions={int(p) for p in m1["partitions"]})
    m2 = read_manifest(out)
    # partitions that received new rows must have dropped the stale bloom
    touched = [p for p, meta in m2["partitions"].items()
               if meta["rows"] > m1["partitions"].get(p, {}).get("rows", 0)]
    assert touched
    for p in touched:
        assert "entity" not in (m2["partitions"][p].get("blooms") or {})
    # and the table-level probe therefore refuses to prune
    assert bloom_partitions(out, {"entity": ["uncovered-ent"]}) is None


def test_delete_rows_bloom_narrowing_and_rebloom(ray_session, tmp_path):
    from kgray.io import (bloom_partitions, delete_rows, read_manifest,
                          read_table, write_partitioned)

    ds, df = _ds(n=600)
    out = str(tmp_path / "t")
    write_partitioned(ds, out, key_col="doc_id", num_partitions=8,
                      bloom_cols=["entity"])
    doomed = [5, 6, 7]
    m2 = delete_rows(out, doomed, key_col="doc_id")
    got = read_table(out).to_pandas()
    assert not set(doomed) & set(got["doc_id"])
    assert len(got) == len(df) - 3
    # rewritten partitions carry fresh blooms (bloom_cols preserved)
    for meta in m2["partitions"].values():
        assert "entity" in (meta.get("blooms") or {})
    # blooms still answer probes after the rewrite
    probe = df.loc[~df["doc_id"].isin(doomed), "entity"].iloc[0]
    assert bloom_partitions(out, {"entity": [probe]}) is not None


def test_bloom_key_col_narrows_delete_targets(ray_session, tmp_path):
    """delete_rows with a bloom on the KEY column must skip rewriting
    hash-targeted partitions whose bloom excludes every doomed key."""
    from kgray.io import delete_rows, read_manifest, write_partitioned

    ds, df = _ds(n=600)
    out = str(tmp_path / "t")
    write_partitioned(ds, out, key_col="doc_id", num_partitions=8,
                      bloom_cols=["doc_id", "entity"])
    m1 = read_manifest(out)
    files_before = {p: set(meta["files"])
                    for p, meta in m1["partitions"].items()}
    # a key that was never written: hash targeting alone would rewrite
    # its partition; the bloom rules it out so NO partition is touched
    m2 = delete_rows(out, [999_999], key_col="doc_id")
    files_after = {p: set(meta["files"])
                   for p, meta in m2["partitions"].items()}
    assert files_after == files_before


def test_kg_construct_tables_carry_blooms(ray_session, tmp_path):
    """kg_construct writes doc_id blooms on triples and doc_id +
    subject_canonical blooms on the canonical table, so entity point
    lookups and forget_docs targeting can prune partitions."""
    from kgray.__main__ import main

    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "construct", "--synthetic", "80", "--seed", "11",
            "--output", str(tmp_path / "out"), "--partitions", "4",
        ])
    assert rc == 0
    from kgray.io import bloom_partitions, read_manifest, read_table

    tri = read_manifest(str(tmp_path / "out" / "triples"))
    assert all("doc_id" in (meta.get("blooms") or {})
               for meta in tri["partitions"].values())
    canon_path = str(tmp_path / "out" / "triples_canonical")
    canon = read_manifest(canon_path)
    assert all("subject_canonical" in (meta.get("blooms") or {})
               for meta in canon["partitions"].values())
    # a real canonical subject is findable through the pruned read
    full = read_table(canon_path).to_pandas()
    subj = full["subject_canonical"].iloc[0]
    keep = bloom_partitions(canon_path, {"subject_canonical": [subj]})
    assert keep is not None and len(keep) >= 1
    got = read_table(canon_path,
                     point_filter={"subject_canonical": [subj]}).to_pandas()
    assert (got["subject_canonical"] == subj).sum() == \
        (full["subject_canonical"] == subj).sum()
