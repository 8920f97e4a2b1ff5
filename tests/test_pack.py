"""Concat-and-chunk packing (ops/pack.py): distributed exclusive prefix
sums checked against a single-process cumsum over the same rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _brute(df, chunk):
    d = df.sort_values("doc_id", ignore_index=True)
    start = np.zeros(len(d), np.int64)
    np.cumsum(d["n_tokens"].to_numpy(np.int64)[:-1], out=start[1:])
    return d.assign(start=start, bin=start // chunk)


def _check(df, chunk=64, **kw):
    from kgray.ops.pack import stream_offsets

    got = (
        stream_offsets(rd.from_arrow(pa.Table.from_pandas(df)),
                       key="doc_id", len_col="n_tokens", chunk=chunk, **kw)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    want = _brute(df, chunk)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_tokens", "start", "bin"]].astype(np.int64),
        want[["doc_id", "n_tokens", "start", "bin"]].astype(np.int64),
    )


def test_stream_offsets_matches_brute(ray_session):
    rs = np.random.RandomState(11)
    # non-contiguous, shuffled ids: ranges are equal-width over the value
    # domain, so gaps and ordering must not matter
    ids = rs.permutation(np.arange(500, dtype=np.int64) * 7 + 3)
    df = pd.DataFrame({"doc_id": ids,
                       "n_tokens": rs.randint(1, 40, 500).astype(np.int64)})
    _check(df)


def test_stream_offsets_many_ranges_per_bucket(ray_session):
    """More ranges than grouped_map buckets: the per-bucket reset logic
    (several ranges sorted into one bucket) must not bleed sums across
    range boundaries."""
    rs = np.random.RandomState(5)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "n_tokens": rs.randint(1, 20, 300).astype(np.int64),
    })
    _check(df, n_ranges=97)


def test_stream_offsets_single_row_and_skew(ray_session):
    df = pd.DataFrame({"doc_id": np.array([42], np.int64),
                       "n_tokens": np.array([7], np.int64)})
    _check(df)
    # all ids in one range (heavy skew): still exact, just serial
    df2 = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "n_tokens": np.full(50, 3, np.int64),
    })
    _check(df2, n_ranges=4)
