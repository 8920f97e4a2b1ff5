"""Session-19 eval/feature-engineering operators: exact AUC, calibration
bins + Brier, PMI term-language affinity, smoothed target encoding, and
the hashing-trick collision audit — hand-computed fixtures plus DuckDB
oracle parity on tiny synthetic tables."""

import duckdb
import numpy as np
import pandas as pd

from kgray.queries import CATALOG


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet", index=False)


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _run(qname, tmp_path):
    fn, sql = CATALOG[qname]
    res = fn(str(tmp_path))
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    return got, sql


def _cmp(got, exp, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def _events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_type", "value"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["user_id"] = np.int64(1)
    df["ts"] = pd.Timestamp("2024-01-01")
    df["ts"] = df["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", df)


def test_auc_perfect_separation_and_ties(ray_session, tmp_path):
    # purchases strictly above everything else -> AUC 1.0; for 'view'
    # one-vs-rest the negatives are {8, 9} (lose) plus the identical
    # click values {1, 2} (1 win, 2 ties) -> U = 2 of 8 pairs = 0.25
    rows = [("purchase", 9.0), ("purchase", 8.0),
            ("view", 1.0), ("view", 2.0),
            ("click", 1.0), ("click", 2.0)]
    _events(tmp_path, rows)
    got, sql = _run("events_auc", tmp_path)
    auc = dict(zip(got["event_type"], got["auc"]))
    assert auc["purchase"] == 1.0
    assert auc["view"] == 0.25 and auc["click"] == 0.25
    _cmp(got, _oracle(tmp_path, sql, ["events"]), ["event_type"])


def test_auc_all_tied_is_half(ray_session, tmp_path):
    _events(tmp_path, [("purchase", 3.0), ("view", 3.0), ("click", 3.0)])
    got, sql = _run("events_auc", tmp_path)
    assert set(got["auc"]) == {0.5}
    _cmp(got, _oracle(tmp_path, sql, ["events"]), ["event_type"])


def test_calibration_bins_oracle(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0.01, 50.0, 400), 2)
    types = np.where(vals + rng.normal(0, 10, 400) > 25, "purchase", "view")
    _events(tmp_path, list(zip(types.tolist(), vals.tolist())))
    got, sql = _run("events_calibration", tmp_path)
    exp = _oracle(tmp_path, sql, ["events"])
    _cmp(got, exp, ["bin"])
    # bins partition all rows; monotone-ish check: top bin pos_rate >= bottom
    assert got["n"].sum() == 400
    assert got.iloc[-1]["pos_rate"] >= got.iloc[0]["pos_rate"]


def _docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    _write(tmp_path, "documents", df)


def test_term_lang_pmi_sign_and_oracle(ray_session, tmp_path):
    # "nur" appears only in de docs -> pmi(nur, de) = ln(N / n_de) > 0;
    # "the" appears everywhere -> pmi(the, *) == 0 exactly (a == n_lang)
    rows = []
    for i in range(4):
        rows.append((i, "the nur gut", "de"))
    for i in range(4, 12):
        rows.append((i, "the cat sat", "en"))
    _docs(tmp_path, rows)
    got, sql = _run("term_lang_pmi", tmp_path)
    exp = _oracle(tmp_path, sql, ["documents"])
    _cmp(got, exp, ["word", "lang"])
    byk = {(w, l): p for w, l, p in
           zip(got["word"], got["lang"], got["pmi"])}
    assert byk[("the", "de")] == 0.0 and byk[("the", "en")] == 0.0
    assert byk[("nur", "de")] > 0.0
    assert ("nur", "en") not in byk  # zero cell emits no row


def test_brand_target_encoding_oracle_and_smoothing(ray_session, tmp_path):
    # brand A: many rows at qty 10 -> enc near 10; brand B: one row at 40
    # -> enc pulled hard toward the global mean
    li = pd.DataFrame({
        "l_partkey": np.array([1] * 100 + [2], np.int64),
        "l_quantity": np.array([10.0] * 100 + [40.0]),
    })
    part = pd.DataFrame({
        "p_partkey": np.array([1, 2], np.int64),
        "p_brand": ["Brand#A", "Brand#B"],
    })
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "part", part)
    got, sql = _run("brand_target_encoding", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["lineitem", "part"]), ["p_brand"])
    enc = dict(zip(got["p_brand"], got["enc"]))
    mu = (100 * 10 + 40) / 101
    assert abs(enc["Brand#A"] - 10) < abs(enc["Brand#B"] - 40)
    assert abs(enc["Brand#B"] - (40 + 20 * mu) / 21) < 1e-6


def test_feature_hash_audit_oracle_and_mass(ray_session, tmp_path):
    words = [f"tok{i}" for i in range(3000)]
    rows = [(i, " ".join(words[i * 30:(i + 1) * 30]), "en")
            for i in range(100)]
    _docs(tmp_path, rows)
    got, sql = _run("feature_hash_audit", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["documents"]), ["load"])
    # load histogram accounts for every distinct term exactly once
    assert int((got["load"] * got["n_buckets"]).sum()) == 3000
    # 3000 terms into 1024 buckets must collide somewhere
    assert got["load"].max() >= 2


def test_value_split_gain_perfect_separation(ray_session, tmp_path):
    """Purchases all above 10.0, views all below: the best split is the
    top of the lower group, and its gain equals the parent entropy
    (children pure).  Oracle parity on the same fixture."""
    import math

    rows = [("view", v) for v in (1.0, 2.0, 3.0)] + \
           [("purchase", v) for v in (11.0, 12.0, 13.0)]
    _events(tmp_path, rows)
    got, sql = _run("value_split_gain", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["events"]), ["split_cents"])
    best = got.sort_values("gain", ascending=False).iloc[0]
    assert best["split_cents"] == 300  # last value of the pure left side
    parent = math.log(6) - (3 * math.log(3) + 3 * math.log(3)) / 6
    assert abs(best["gain"] - parent) < 1e-6


def test_orders_cdc_apply_delete_and_resurrect(ray_session, tmp_path):
    """Key semantics hand-checked: k=12 (U then D, no later op) dies;
    k=20 and k=60 (D at seq 2 but U at seq 3) resurrect with +500;
    k=7 (no ops) keeps its base price.  Oracle parity on the fixture."""
    df = pd.DataFrame({
        "o_orderkey": np.array([7, 12, 20, 60], np.int64),
        "o_totalprice": [10.0, 20.0, 30.0, 40.0],
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    df["o_custkey"] = np.int64(1)
    df["o_orderstatus"] = "O"
    df["o_orderdate"] = pd.Timestamp("2024-01-01")
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    _write(tmp_path, "orders", df)
    got, sql = _run("orders_cdc_apply", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["orders"]), ["o_orderpriority"])
    row = got.iloc[0]
    assert row["n"] == 3  # k=12 deleted
    # 7 -> 1000; 20 -> 3000+500; 60 -> 4000+500
    assert row["sum_cents"] == 1000 + 3500 + 4500


def _skew_tables():
    import ray.data as rd
    import pyarrow as pa

    rng = np.random.default_rng(11)
    n = 4000
    keys = rng.integers(1, 200, n)
    keys[: n // 3] = 42  # one hot key carries a third of the left
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys.astype(np.int64)),
        "x": pa.array(np.arange(n, dtype=np.int64)),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(1, 150, dtype=np.int64)),  # 150+ unmatched
        "seg": pa.array([f"s{i % 5}" for i in range(1, 150)], pa.string()),
    }))
    return left, right


def _canon_join(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_skew_join_equals_plain_bucket_join(ray_session):
    from kgray.ops.joins import bucket_join, skew_join

    left, right = _skew_tables()
    for how in ("inner", "left"):
        a = _canon_join(skew_join(left, right, on="k", how=how,
                                  hot_share=0.05))
        b = _canon_join(bucket_join(left, right, on="k", how=how))
        b = b[a.columns]
        pd.testing.assert_frame_equal(a, b)


def test_skew_join_no_hot_keys_falls_through(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from kgray.ops.joins import bucket_join, skew_join

    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(1000, dtype=np.int64) % 100),
        "x": pa.array(np.arange(1000, dtype=np.int64)),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "seg": pa.array([f"s{i}" for i in range(100)], pa.string()),
    }))
    a = _canon_join(skew_join(left, right, on="k", hot_share=0.05))
    b = _canon_join(bucket_join(left, right, on="k", how="inner"))
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_orders_holt_constant_series(ray_session, tmp_path):
    """A constant daily series is a fixed point: level == the constant,
    trend == 0, forecasts equal the level.  Oracle parity included."""
    days = pd.date_range("2024-01-01", periods=12, freq="D")
    df = pd.DataFrame({
        "o_orderkey": np.arange(12, dtype=np.int64),
        "o_custkey": np.int64(1),
        "o_orderstatus": "O",
        "o_totalprice": 50.0,
        "o_orderdate": days.astype("datetime64[us]"),
        "o_orderpriority": "1-URGENT",
    })
    _write(tmp_path, "orders", df)
    got, sql = _run("orders_holt_forecast", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["orders"]), ["o_orderpriority"])
    r = got.iloc[0]
    assert r["level"] == 5000 and r["trend"] == 0
    assert r["forecast_1"] == 5000 and r["forecast_7"] == 5000


def test_orders_holt_negative_trend_floor_parity(ray_session, tmp_path):
    """A steeply DECREASING series drives the trend negative — the
    branch where DuckDB's truncating // would diverge from numpy's
    floor without the offset form.  Parity must hold bit-for-bit."""
    days = pd.date_range("2024-01-01", periods=10, freq="D")
    df = pd.DataFrame({
        "o_orderkey": np.arange(10, dtype=np.int64),
        "o_custkey": np.int64(1),
        "o_orderstatus": "O",
        "o_totalprice": np.linspace(1000.0, 10.0, 10),
        "o_orderdate": days.astype("datetime64[us]"),
        "o_orderpriority": "1-URGENT",
    })
    _write(tmp_path, "orders", df)
    got, sql = _run("orders_holt_forecast", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["orders"]), ["o_orderpriority"])
    assert got.iloc[0]["trend"] < 0


def test_woe_bands_sign_and_oracle(ray_session, tmp_path):
    """High-value rows mostly purchases, low-value mostly views: the
    top band's WoE must be positive, the bottom's negative."""
    rng = np.random.default_rng(3)
    vals = np.round(rng.uniform(0.01, 100.0, 600), 2)
    types = np.where(vals + rng.normal(0, 15, 600) > 50,
                     "purchase", "view")
    _events(tmp_path, list(zip(types.tolist(), vals.tolist())))
    got, sql = _run("events_woe_bands", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["events"]), ["band"])
    assert got.iloc[-1]["woe"] > 0 > got.iloc[0]["woe"]


def test_padding_waste_hand_case(ray_session, tmp_path):
    """3 tokens -> bucket 64 (waste 61); 70 tokens -> bucket 128
    (waste 58); 2000 tokens -> capped at 1024 (waste 0)."""
    rows = [(0, " ".join(["w"] * 3), "en"),
            (1, " ".join(["w"] * 70), "en"),
            (2, " ".join(["w"] * 2000), "en")]
    _docs(tmp_path, rows)
    got, sql = _run("doclen_padding_waste", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["documents"]), ["bucket"])
    by = {b: (t, w) for b, t, w in
          zip(got["bucket"], got["sum_tokens"], got["sum_waste"])}
    assert by[64] == (3, 61) and by[128] == (70, 58)
    assert by[1024] == (1024, 0)


def test_chunk_dup_rate_planted_duplicates(ray_session, tmp_path):
    """Two docs sharing identical 120+ char text produce identical
    chunk sets; a third unique doc keeps the rate below 1."""
    boiler = "x" * 300  # 3 chunks each, all duplicated across docs 0/1
    rows = [(0, boiler, "en"), (1, boiler, "en"),
            (2, "".join(chr(97 + i % 26) for i in range(300)), "en")]
    _docs(tmp_path, rows)
    got, sql = _run("chunk_dup_rate", tmp_path)
    _cmp(got, _oracle(tmp_path, sql, ["documents"]), ["source"])
    r = got.iloc[0]
    # doc0/doc1: 3 windows each but all three hash identically within
    # a doc too ("xxx..." windows are equal strings) -> distinct adds 1
    assert r["n_chunks"] == 9 and r["n_distinct"] == 4


def test_cli_query_subcommand(ray_session, tmp_path, capsys):
    """python -m kgray query NAME --sf DIR prints one JSON line and
    honors --out; --list enumerates the catalog."""
    import json

    from kgray.__main__ import main

    _events(tmp_path, [("purchase", 5.0), ("view", 1.0)] * 20)
    out = str(tmp_path / "res.parquet")
    rc = main(["query", "events_auc", "--sf", str(tmp_path),
               "--out", out])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["query"] == "events_auc" and d["rows"] == 2 and d["oracle"]
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == 2
    assert main(["query", "--list"]) == 0
    assert main(["query", "nope"]) == 2


def test_auc_matches_bruteforce_pairs(ray_session, tmp_path):
    """The histogram rank-sum must equal the O(n^2) pair definition:
    AUC = (wins + 0.5*ties) / (n_pos * n_neg), checked per type on a
    random quantized fixture."""
    rng = np.random.default_rng(17)
    vals = np.round(rng.uniform(0.01, 8.0, 60), 2)  # dense ties
    types = rng.choice(["purchase", "view", "click"], 60)
    _events(tmp_path, list(zip(types.tolist(), vals.tolist())))
    got, _ = _run("events_auc", tmp_path)
    for ty, _np, _nn, auc in got.itertuples(index=False):
        pos = vals[types == ty]
        neg = vals[types != ty]
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        brute = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert abs(auc - brute) < 1e-6, ty


def test_holt_fdiv_offset_is_floor_division():
    """fdiv(x, 4) = (x + OFF*4)//4 - OFF equals floor(x/4) for every
    sign — the lemma the Holt trend recurrence's engine parity rests
    on (DuckDB truncates negative //, numpy floors)."""
    from kgray.queries.analytics10 import _HOLT_OFF

    rng = np.random.default_rng(5)
    xs = np.concatenate([
        rng.integers(-10**12, 10**12, 2000),
        np.array([-1, -2, -3, -4, -5, 0, 1, 2, 3, 4, 5]),
    ])
    for x in xs.tolist():
        assert (x + _HOLT_OFF * 4) // 4 - _HOLT_OFF == x // 4
