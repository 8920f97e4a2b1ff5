"""Running-total window aggregate + JSON props extraction + rollup
(kgray/queries.py) — semantics pinned against pandas brute force."""

import numpy as np
import pandas as pd

import duckdb


def _events(n=300, users=7, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.uniform(0, 20, n), 2),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(-5, 99, n)],
        }
    )


def test_user_cumsum_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_events_user_cumsum

    df = _events()
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        q_events_user_cumsum(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want = want.assign(cum=want.groupby("user_id")["value"].cumsum())
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert np.allclose(got["cum_value"], np.round(want["cum"], 2), atol=1e-9)


def test_user_cumsum_tiebreak_on_event_id(ray_session, tmp_path):
    from kgray.queries import q_events_user_cumsum

    ts = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.array([2, 0, 1], np.int64),
            "ts": [ts, ts, ts],  # all tied: order must follow event_id
            "user_id": np.array([1, 1, 1], np.int64),
            "value": [1.0, 10.0, 100.0],
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = q_events_user_cumsum(str(tmp_path)).to_pandas()
    got = got.set_index("event_id")["cum_value"]
    assert got[0] == 10.0 and got[1] == 110.0 and got[2] == 111.0


def test_props_stats_matches_duckdb(ray_session, tmp_path):
    from kgray.queries import (SQL_EVENTS_PROPS_STATS, q_events_props_stats)

    df = _events(n=200)
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        q_events_props_stats(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = (
        con.sql(SQL_EVENTS_PROPS_STATS)
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got["sum_k"].tolist() == want["sum_k"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_docs_rollup_levels_consistent(ray_session, tmp_path):
    from kgray.queries import q_docs_rollup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "lang": ["en", "en", "de", "de", "de", "fr"],
            "source": ["s1", "s2", "s1", "s1", "s2", "s1"],
            "n_chars": np.array([10, 20, 30, 40, 50, 60], np.int64),
            "text": [""] * 6,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = q_docs_rollup(str(tmp_path)).to_pandas()
    total = out[(out["lang"] == "ALL") & (out["source"] == "ALL")]
    assert total["n"].iloc[0] == 6 and total["chars"].iloc[0] == 210
    de = out[(out["lang"] == "de") & (out["source"] == "ALL")]
    assert de["n"].iloc[0] == 3 and de["chars"].iloc[0] == 120
    fine = out[(out["source"] != "ALL") & (out["lang"] != "ALL")]
    assert fine["n"].sum() == 6 and fine["chars"].sum() == 210
