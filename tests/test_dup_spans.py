"""Substring-level duplicate-span stats: crafted cross-doc spans with
known window arithmetic, the hash path pinned equal to the string path
(the 100-TB shuffle format must not change the answer), and the
text-normalize NFC/whitespace contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)


def test_dup_span_stats_window_arithmetic(ray_session, tmp_path):
    from kgray.ops.dedup import dup_span_stats
    import ray.data as rd

    shared = "S" * 25 + "0123456789ABCDE"  # exactly 40 chars
    a = shared + "x" * 10  # 50 chars -> 11 windows, 1 shared
    b = "y" * 10 + shared  # 50 chars -> 11 windows, 1 shared
    c = "z" * 39  # under the window: no rows
    d = "w" * 80  # self-repetitive but UNIQUE to d: 0 dup
    _docs(tmp_path, [a, b, c, d])
    got = (
        dup_span_stats(rd.read_parquet(f"{tmp_path}/documents.parquet"),
                       window=40)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 3]  # doc 2 too short
    assert got["n_windows"].tolist() == [11, 11, 1]  # d: 41 dedup to 1
    assert got["n_dup"].tolist() == [1, 1, 0]
    np.testing.assert_allclose(
        got["dup_frac"].to_numpy(), [round(1 / 11, 4), round(1 / 11, 4), 0.0]
    )


def test_dup_span_hash_path_matches_string_path(ray_session, tmp_path):
    from kgray.ops.dedup import dup_span_stats
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("abcdefg "), 300))
    texts = []
    for i in range(30):
        t = "".join(rng.choice(list("abcdefg "), 120))
        if i % 3 == 0:
            t = t[:40] + base[50:130] + t[40:]  # inject an 80-char dup span
        texts.append(t)
    texts.append(base)
    _docs(tmp_path, texts)
    ds = rd.read_parquet(f"{tmp_path}/documents.parquet")
    s = dup_span_stats(ds, window=40).to_pandas().sort_values("doc_id")
    h = dup_span_stats(ds, window=40, use_hash=True).to_pandas() \
        .sort_values("doc_id")
    assert s["doc_id"].tolist() == h["doc_id"].tolist()
    assert s["n_windows"].tolist() == h["n_windows"].tolist()
    assert s["n_dup"].tolist() == h["n_dup"].tolist()
    assert s["n_dup"].sum() > 0  # the injected spans were found


def test_window_hashes_match_bruteforce():
    from kgray.ops.dedup import _window_hashes, _SPAN_HASH_BASE

    t = "hello world, hello world!"
    w = 5
    got = _window_hashes(t, w)
    assert len(got) == len(t) - w + 1
    for i in range(len(got)):
        acc = np.uint64(0)
        for ch in t[i:i + w]:
            acc = acc * _SPAN_HASH_BASE + np.uint64(ord(ch))
        assert got[i] == acc
    # identical windows hash identically (positions 0 and 13)
    assert got[0] == got[13]


def test_text_normalize_nfc_and_whitespace(ray_session, tmp_path):
    from kgray.queries import q_text_normalize

    _docs(tmp_path, ["A  B\tC", ""])
    got = (
        q_text_normalize(str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # e+COMBINING ACUTE recombines to single-char é, whitespace collapses
    assert got["norm"].tolist() == ["é a b c", "é"]
    assert got["n_chars_norm"].tolist() == [7, 1]


def test_dup_span_purge_cuts_only_shared_cover(ray_session, tmp_path):
    from kgray.ops.dedup import dup_span_purge
    import ray.data as rd

    shared = "S" * 25 + "0123456789ABCDE"  # 40 chars
    a = "aaa" + shared + "bbb"  # covered chars: exactly the shared span
    b = shared  # fully covered
    c = "c" * 60  # unique: untouched
    d = "dd"  # under window: untouched
    _docs(tmp_path, [a, b, c, d])
    got = (
        dup_span_purge(rd.read_parquet(f"{tmp_path}/documents.parquet"),
                       window=40)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 2, 3]
    assert got["clean_text"].tolist() == ["aaabbb", "", c, d]
    assert got["n_removed"].tolist() == [40, 40, 0, 0]


def test_dup_span_purge_merges_overlapping_windows(ray_session, tmp_path):
    from kgray.ops.dedup import dup_span_purge
    import ray.data as rd

    # two docs share a 45-char run -> 6 overlapping dup windows each;
    # the coverage mask must merge them into ONE 45-char cut
    run = "R" * 20 + "0123456789" + "Q" * 15  # 45 chars
    a = "xx" + run + "yy"
    b = run + "zzzz"
    _docs(tmp_path, [a, b])
    got = (
        dup_span_purge(rd.read_parquet(f"{tmp_path}/documents.parquet"),
                       window=40)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["clean_text"].tolist() == ["xxyy", "zzzz"]
    assert got["n_removed"].tolist() == [45, 45]
