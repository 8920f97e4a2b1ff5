"""Distributed NTILE and co-occurrence join — pinned against brute
python references; NTILE forces uneven buckets (N % k != 0) and heavy
value ties so both the histogram base and the tie rank matter."""

import itertools

import numpy as np
import pandas as pd


def test_doclen_ntile_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_doclen_ntile

    rng = np.random.default_rng(41)
    n = 103  # 103 % 4 = 3: three tiles get 26 rows, one gets 25
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "text": "x",
            "lang": "en",
            "source": "syn",
            "n_chars": rng.integers(10, 18, n).astype(np.int64),  # ties
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    got = (
        q_doclen_ntile(str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    s = df.sort_values(["n_chars", "doc_id"], kind="mergesort")
    k, (q, rem) = 4, divmod(n, 4)
    tiles = np.concatenate(
        [np.full(q + (i < rem), i + 1, np.int64) for i in range(k)]
    )
    exp = pd.DataFrame(
        {"doc_id": s["doc_id"].to_numpy(), "tile": tiles}
    ).sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["tile"].tolist() == exp["tile"].tolist()
    sizes = got["tile"].value_counts().sort_index().tolist()
    assert sizes == [26, 26, 26, 25]


def test_users_copurchase_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_users_copurchase

    rng = np.random.default_rng(43)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-02-01")
            + pd.to_timedelta(rng.integers(0, 20 * 3600, n), unit="s"),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": rng.choice(["purchase", "view"], n),
            "value": 1.0,
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        q_users_copurchase(str(tmp_path)).to_pandas()
        .sort_values(["u1", "u2"]).reset_index(drop=True)
    )
    p = df[df["event_type"] == "purchase"].copy()
    p["hr"] = p["ts"].dt.strftime("%Y-%m-%d %H")
    support = {}
    for _, g in p.groupby("hr"):
        for a, b in itertools.combinations(sorted(set(g["user_id"])), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    exp = {k: v for k, v in support.items() if v >= 2}
    assert len(exp) > 0
    assert [tuple(r) for r in got[["u1", "u2"]].to_numpy()] == sorted(exp)
    assert got["n_hours"].tolist() == [exp[k] for k in sorted(exp)]
