"""Append-mode kg_construct (VERDICT r3 item 3): a second run over +N
docs must touch only new-batch work — old triple files byte-untouched,
dedup/link state persisted and unioned (mentions/ edges/), final tables
oracle-equal to a from-scratch build over the full corpus, and the same
batch re-applied is a no-op (idempotence under driver retries)."""

import json
import os

import pandas as pd
import pytest


def _file_stats(table_dir: str) -> dict:
    out = {}
    data = os.path.join(table_dir, "data")
    for root, _, files in os.walk(data):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, table_dir)] = (st.st_size, st.st_mtime_ns)
    return out


def _canon_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_append_touches_only_new_work_and_matches_scratch(ray_session,
                                                          tmp_path):
    from kgray import io
    from kgray.corpus import interleaved_dataset
    from kgray.pipeline import PipelineConfig, kg_construct

    cfg = PipelineConfig()
    base = str(tmp_path / "base")
    kg_construct(interleaved_dataset(600, seed=42), base, cfg,
                 num_partitions=8, input_fingerprint="base-600")
    tr_dir = os.path.join(base, "triples")
    before = _file_stats(tr_dir)
    canon_before = _file_stats(os.path.join(base, "triples_canonical"))

    batch = interleaved_dataset(200, seed=42, start=600)
    m = kg_construct(batch, base, cfg, num_partitions=8,
                     input_fingerprint="batch-200", append=True)
    assert set(m) == {"triples", "mentions", "edges", "entities",
                      "triples_canonical"}

    # every pre-existing triples file is byte-untouched (append = only
    # new-partition work at corpus scale); new files were added
    after = _file_stats(tr_dir)
    for k, v in before.items():
        assert after[k] == v, f"old file rewritten: {k}"
    assert len(after) > len(before)
    # canonical table appended too (no old component changed)
    canon_after = _file_stats(os.path.join(base, "triples_canonical"))
    for k, v in canon_before.items():
        assert canon_after[k] == v, f"old canonical file rewritten: {k}"

    # final tables equal a from-scratch construct over all 800 docs
    scratch = str(tmp_path / "scratch")
    kg_construct(interleaved_dataset(800, seed=42), scratch, cfg,
                 num_partitions=8, input_fingerprint="scratch-800")
    for table in ("triples", "entities", "triples_canonical"):
        a = _canon_df(io.read_table(os.path.join(base, table)))
        b = _canon_df(io.read_table(os.path.join(scratch, table)))
        pd.testing.assert_frame_equal(a, b), table

    # idempotence: re-applying the same batch fingerprint is a no-op
    manifest_p = os.path.join(tr_dir, "manifest.json")
    with open(manifest_p) as f:
        m1 = json.load(f)
    kg_construct(batch, base, cfg, num_partitions=8,
                 input_fingerprint="batch-200", append=True)
    with open(manifest_p) as f:
        m2 = json.load(f)
    assert m1 == m2
    assert _file_stats(tr_dir) == after


def test_append_requires_existing_output(ray_session, tmp_path):
    from kgray.corpus import interleaved_dataset
    from kgray.pipeline import kg_construct

    with pytest.raises(ValueError):
        kg_construct(interleaved_dataset(50, seed=42),
                     str(tmp_path / "missing"), append=True,
                     input_fingerprint="x")


def test_link_from_mentions_incremental_equals_full_minus_old(ray_session):
    """Paths-agree: full link over M1+N == stored(M1) union
    incremental(new_keys=N) — on a mention table with genuine new keys
    that bridge old ones."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.ops.linking import _SEP, link_from_mentions

    old_keys = [f"人物{_SEP}张三丰{i}" for i in range(20)]
    new_keys = [f"人物{_SEP}张三丰1x", f"人物{_SEP}李四新"]

    def tbl(keys):
        return rd.from_arrow(pa.table(
            {"mention_key": pa.array(keys, pa.string()),
             "n": pa.array([1] * len(keys), pa.int64())}
        ))

    full = link_from_mentions(tbl(old_keys + new_keys), tau=0.5) \
        .to_pandas().sort_values(["u", "v"], ignore_index=True)
    old = link_from_mentions(tbl(old_keys), tau=0.5).to_pandas()
    inc = link_from_mentions(tbl(old_keys + new_keys),
                             new_keys=frozenset(new_keys), tau=0.5) \
        .to_pandas()
    # incremental edges all touch a new key
    nk = set(new_keys)
    assert ((inc["u"].isin(nk)) | (inc["v"].isin(nk))).all()
    merged = pd.concat([old, inc], ignore_index=True) \
        .drop_duplicates(["u", "v"]) \
        .sort_values(["u", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(full, merged)


def test_entities_changed_detection(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgray.pipeline import _entities_changed

    old = rd.from_arrow(pa.table(
        {"node": pa.array(["b", "c"]), "component": pa.array(["b", "c"])}
    ))
    same = rd.from_arrow(pa.table(
        {"node": pa.array(["b", "c", "d"]),
         "component": pa.array(["b", "c", "b"])}
    ))
    merged = rd.from_arrow(pa.table(
        {"node": pa.array(["a", "b", "c"]),
         "component": pa.array(["a", "a", "c"])}
    ))
    assert not _entities_changed(old, same)   # new node joined, old kept
    assert _entities_changed(old, merged)     # old b relabeled to a
