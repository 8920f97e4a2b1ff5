"""Hand fixtures for the session-20 batch: vocabulary-overlap Jaccard on
a known 2-source corpus, MASE on a constant series (zero numerator) and
a strictly seasonal series (perfect seasonal forecast), contribution
capping that actually drops rows, OLS recovering an exactly-linear
signal, lift under perfect separation, and fold/AUC range sanity."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return df


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(tmp_path / "documents.parquet", index=False)


def test_source_vocab_overlap_hand(ray_session, tmp_path):
    from kgray.queries import q_source_vocab_overlap

    _write_docs(
        tmp_path,
        [
            (0, "a b c", "s1"),
            (1, "c d", "s1"),  # s1 vocab: {a,b,c,d}
            (2, "c d e", "s2"),  # s2 vocab: {c,d,e}
            (3, "x", "s3"),  # disjoint from both
        ],
    )
    out = q_source_vocab_overlap(str(tmp_path)).to_pandas()
    out = out.set_index(["s1", "s2"])
    r = out.loc[("s1", "s2")]
    assert (r["n1"], r["n2"], r["inter"]) == (4, 3, 2)
    assert abs(r["jaccard"] - 2.0 / 5.0) < 1e-12
    assert out.loc[("s1", "s3")]["inter"] == 0
    assert out.loc[("s2", "s3")]["jaccard"] == 0.0


def test_events_mase_constant_and_seasonal(ray_session, tmp_path):
    # type 'flat': constant daily sum -> num = den = 0 -> dropped.
    # type 'seas': period-7 pattern -> lag-7 forecast perfect, num = 0,
    # lag-1 errors nonzero -> mase == 0.
    rows = []
    eid = 0
    for d in range(15):
        day = f"2024-03-{d + 1:02d} 12:00:00"
        rows.append((eid, day, 1, "flat", 10.0)); eid += 1
        rows.append((eid, day, 2, "seas", float(d % 7) + 1.0)); eid += 1
    _write_events(tmp_path, rows)

    from kgray.queries import q_events_mase

    out = q_events_mase(str(tmp_path)).to_pandas().set_index("event_type")
    assert "flat" not in out.index  # den == 0 rows are dropped
    assert out.loc["seas"]["num"] == 0
    assert out.loc["seas"]["mase"] == 0.0
    assert out.loc["seas"]["n_eval"] == 8  # days 8..15


def test_dp_user_capped_counts_caps_at_three(ray_session, tmp_path):
    rows = [(i, f"2024-03-01 0{i}:00:00", 1, "view", 0.0) for i in range(5)]
    rows += [(10, "2024-03-01 09:00:00", 2, "view", 0.0)]
    rows += [(11, "2024-03-02 09:00:00", 1, "view", 0.0)]
    _write_events(tmp_path, rows)

    from kgray.queries import q_dp_user_capped_counts

    out = q_dp_user_capped_counts(str(tmp_path)).to_pandas().set_index("day")
    assert out.loc["2024-03-01"]["n"] == 4  # user1 capped 5 -> 3, +user2
    assert out.loc["2024-03-02"]["n"] == 1
    # noise is deterministic: same day string -> same noisy_n on rerun
    again = q_dp_user_capped_counts(str(tmp_path)).to_pandas().set_index(
        "day")
    assert (again["noisy_n"] == out["noisy_n"]).all()


def test_events_ols2_recovers_exact_linear_signal(ray_session, tmp_path):
    # value = 1.00 + 0.10*hour + 0.05*dow dollars -> cents exactly
    # 100 + 10*hour + 5*dow: OLS must recover the coefficients exactly.
    rows = []
    eid = 0
    for d in range(14):
        for h in [0, 5, 13, 22]:
            dow = (pd.Timestamp(f"2024-03-{d + 1:02d}").dayofweek + 1) % 7
            v = (100 + 10 * h + 5 * dow) / 100.0
            rows.append((eid, f"2024-03-{d + 1:02d} {h:02d}:30:00", 1,
                         "buy", v))
            eid += 1
    _write_events(tmp_path, rows)

    from kgray.queries import q_events_ols2

    out = q_events_ols2(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["beta0"] == 100.0
    assert r["beta_hour"] == 10.0
    assert r["beta_dow"] == 5.0


def test_events_lift_at_perfect_separation(ray_session, tmp_path):
    # purchases all score 9.99, the rest 1.00: every threshold above
    # 1.00 isolates purchases -> lift = n_tot / pos_tot there.
    rows = [(i, "2024-03-01 10:00:00", 1, "purchase", 9.99)
            for i in range(10)]
    rows += [(100 + i, "2024-03-01 11:00:00", 2, "view", 1.00)
             for i in range(90)]
    _write_events(tmp_path, rows)

    from kgray.queries import q_events_lift_at

    out = q_events_lift_at(str(tmp_path)).to_pandas().set_index("q")
    assert out.loc[0.95]["threshold"] == 999
    assert out.loc[0.95]["pos_at"] == 10 and out.loc[0.95]["n_at"] == 10
    assert out.loc[0.95]["lift"] == 10.0  # (10/10)/(10/100)
    assert out.loc[0.5]["lift"] == 1.0  # threshold 100 covers everyone


def test_events_cv_auc_folds_cover_and_bound(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        ty = "purchase" if rng.random() < 0.3 else "view"
        v = rng.uniform(50, 100) if ty == "purchase" else rng.uniform(0, 60)
        rows.append((i, "2024-03-01 10:00:00", int(i % 9), ty,
                     round(v, 2)))
    _write_events(tmp_path, rows)

    from kgray.queries import q_events_cv_auc

    out = q_events_cv_auc(str(tmp_path)).to_pandas()
    assert set(out["fold"]) == {0, 1, 2, 3, 4}
    assert ((out["auc"] > 0.5) & (out["auc"] <= 1.0)).all()  # separable
    assert (out["n_pos"] + out["n_neg"]).sum() == 300


def test_orders_ab_srm_balanced_split(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(2000, dtype=np.int64),
            "o_custkey": np.ones(2000, dtype=np.int64),
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1-URGENT",
        }
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "orders.parquet", index=False)

    from kgray.queries import q_orders_ab_srm

    out = q_orders_ab_srm(str(tmp_path)).to_pandas().iloc[0]
    assert out["n0"] + out["n1"] == 2000
    # md5 coin on 2000 keys: no SRM at any sane threshold
    assert out["chi2"] < 10.83  # p=0.001 critical value, 1 dof


def test_jaro_winkler_kernel_duckdb_parity():
    import duckdb

    from kgray.ops.fuzzy import jaro_winkler_batch

    rng = np.random.default_rng(3)
    alpha = list("abcdef ")
    words = ["".join(rng.choice(alpha, int(rng.integers(0, 12))))
             for _ in range(200)]
    a = [words[int(i)] for i in rng.integers(0, 200, 1500)]
    b = [words[int(i)] for i in rng.integers(0, 200, 1500)]
    got = jaro_winkler_batch(a, b)
    con = duckdb.connect()
    for x, y, g in zip(a, b, got):
        exp = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [x, y]
        ).fetchone()[0]
        assert g == exp, (x, y, g, exp)  # BIT equality, not approx
    # the canonical textbook case + DuckDB's empty-string quirk
    assert jaro_winkler_batch(["martha"], ["marhta"])[0] == \
        0.9611111111111111
    assert jaro_winkler_batch([""], [""])[0] == 0.0


def test_source_ks_identical_vs_shifted(ray_session, tmp_path):
    # s1 and s2 share one length distribution; s3 is disjointly longer.
    rows = []
    did = 0
    for src, lens in [("s1", [5, 10, 15] * 10), ("s2", [5, 10, 15] * 10),
                      ("s3", [100] * 30)]:
        for ln in lens:
            rows.append((did, "x" * ln, src))
            did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    from kgray.queries import q_source_ks

    out = q_source_ks(str(tmp_path)).to_pandas().set_index("source")
    # s3 vs rest separates perfectly: D = 1
    assert out.loc["s3"]["ks"] == 1.0
    # s1 vs rest(=s2+s3): CDF gap at any v<100 is |F1 - (F2+F3)/2|
    # = F1(v)/2 -> max at v=15: 0.5
    assert out.loc["s1"]["ks"] == 0.5
    assert out.loc["s1"]["n_s"] == 30


def test_events_pit_join_partitions_every_event_once(ray_session,
                                                     tmp_path):
    rng = np.random.default_rng(5)
    n = 400
    rows = []
    for i in range(n):
        d = int(rng.integers(0, 60))
        rows.append((i, f"2024-01-01 00:00:00", int(rng.integers(1, 9)),
                     "view", round(float(rng.uniform(0, 50)), 2)))
        rows[-1] = (i, (pd.Timestamp("2024-01-01")
                        + pd.Timedelta(days=d)).strftime(
                            "%Y-%m-%d %H:%M:%S"),
                    rows[-1][2], "view", rows[-1][4])
    df = _write_events(tmp_path, rows)

    from kgray.queries import q_events_pit_join

    out = q_events_pit_join(str(tmp_path)).to_pandas()
    # the version intervals tile [min_day, max_day]: every event joins
    # EXACTLY one version, so counts and cents are conserved
    assert out["n"].sum() == n
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    assert out["cents"].sum() == cents.sum()
    assert set(out["tier"]) <= {"T0", "T1", "T2", "T3"}
    again = q_events_pit_join(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("tier", ignore_index=True),
        again.sort_values("tier", ignore_index=True))
