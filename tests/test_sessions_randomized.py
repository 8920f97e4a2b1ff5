"""Randomized differential tests for the session-5..9 operator family:
seeded random tables (duplicates, ties, singleton users, empty docs,
skewed days baked into the generators) run through the SAME DuckDB
oracles the driver uses — hand fixtures pin known answers, this pins
behavior over inputs nobody hand-picked."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from kgray.queries import CATALOG


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _cmp(qname, got, exp):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    cols = sorted(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), (qname, len(got), len(exp))
    for c in cols:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            assert np.allclose(g.to_numpy(np.float64),
                               e.to_numpy(np.float64),
                               rtol=0, atol=1e-9, equal_nan=True), (
                qname, c)
        else:
            assert g.tolist() == e.tolist(), (qname, c)


def _gen(tmp_path, seed):
    rng = np.random.default_rng(seed)

    # events: ~400 rows, 12 users (some with 1 event), 4 types, 10 days,
    # duplicate timestamps allowed
    n = 400
    ts0 = pd.Timestamp("2025-04-01")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": (ts0 + pd.to_timedelta(
                rng.integers(0, 10 * 86400, n), unit="s"
            )).astype("datetime64[us]"),
            "user_id": rng.choice(
                np.concatenate([np.arange(1, 11),
                                np.array([97, 98])]), n
            ).astype(np.int64),
            "event_type": rng.choice(
                ["click", "purchase", "view", "error"], n,
                p=[0.4, 0.2, 0.3, 0.1]
            ),
            # 2-decimal quantized like the driver testdata — the hard
            # case: CUSUM terms land EXACTLY on ROUND-4 half boundaries,
            # so parity holds only because the global mean is
            # decimal-pinned on both engines (queries.q_events_cusum)
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    # singleton users at the end
    ev.loc[n - 1, "user_id"] = np.int64(99)
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    # documents: short/empty/duplicated-token texts
    vocab = ["query", "window", "scan", "merge", "key", "sort", "a"]
    texts = [""]
    for _ in range(120):
        k = int(rng.integers(1, 12))
        texts.append(" ".join(rng.choice(vocab, k)))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], np.int64),
            "lang": rng.choice(["en", "de", "fr"], len(texts)),
            "source": rng.choice(["web", "book", "c4"], len(texts)),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    # lineitem/part/orders/supplier/nation: small TPC-H-ish slices
    m = 300
    line = pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, 60, m).astype(np.int64),
            "l_partkey": rng.integers(1, 25, m).astype(np.int64),
            "l_suppkey": rng.integers(1, 9, m).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(1, 5000, m), 2),
            "l_quantity": rng.integers(1, 50, m).astype(np.float64),
        }
    )
    line.to_parquet(tmp_path / "lineitem.parquet", index=False)
    adjectives = ["red", "rad", "blue", "small", "smoll", "hot"]
    nouns = ["widget", "gear", "bolt"]
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(1, 25, dtype=np.int64),
            "p_brand": rng.choice(["B1", "B2", "B3"], 24),
            # fuzzy-adjacent name vocabulary (lev<=2 neighbors within
            # a shared trailing-token block) for the ER chain
            "p_name": [f"{a} {n}" for a, n in zip(
                rng.choice(adjectives, 24), rng.choice(nouns, 24))],
        }
    )
    part.to_parquet(tmp_path / "part.parquet", index=False)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(200, dtype=np.int64),
            "o_custkey": rng.integers(1, 40, 200).astype(np.int64),
            "o_orderstatus": rng.choice(["O", "F", "P"], 200),
            "o_totalprice": np.round(rng.uniform(0.01, 99999, 200), 2),
            # dates/priorities for the forecasting + CDC sweeps
            "o_orderdate": (ts0 + pd.to_timedelta(
                rng.integers(0, 30, 200), unit="D"
            )).astype("datetime64[us]"),
            "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"],
                                          200),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(4, dtype=np.int64),
         "n_name": ["N0", "N1", "N2", "N3"]}
    )
    nation.to_parquet(tmp_path / "nation.parquet", index=False)
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(1, 31, dtype=np.int64),
            "s_nationkey": rng.integers(0, 4, 30).astype(np.int64),
            "s_name": [f"s{i}" for i in range(30)],
            # quantized balances force rank ties
            "s_acctbal": np.round(rng.integers(0, 8, 30) * 12.5, 2),
        }
    )
    supp.to_parquet(tmp_path / "supplier.parquet", index=False)

    # customer: negative balances exercise the linkage band shift
    nc = 60
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(1, nc + 1, dtype=np.int64),
            "c_name": [f"Customer#{i:05d}" for i in range(1, nc + 1)],
            "c_nationkey": rng.integers(0, 4, nc).astype(np.int64),
            "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
            "c_mktsegment": rng.choice(["AUTO", "HOUSE"], nc),
        }
    )
    cust.to_parquet(tmp_path / "customer.parquet", index=False)

    # embeddings: float32 64-dim vectors (kmeans_int quantization path)
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    ne = 80
    vecs = rng.normal(0, 0.2, (ne, 64)).astype(np.float32)
    _pq.write_table(
        _pa.table(
            {
                "vec_id": _pa.array(np.arange(ne, dtype=np.int64)),
                "embedding": _pa.array(list(vecs),
                                       _pa.list_(_pa.float32())),
                "label": _pa.array(rng.integers(0, 3, ne).astype(np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )


QUERIES = {
    "orders_benford": ["orders"],
    "events_user_mode": ["events"],
    "word_window_pairs": ["documents"],
    "events_runs": ["events"],
    "doc_rrf": ["documents"],
    "copurchase_triangles": ["lineitem"],
    "part_supplier_pagerank": ["lineitem"],
    "graph_bfs_hops": ["lineitem"],
    "events_kl_daily": ["events"],
    "events_welch_t": ["events"],
    "user_scd2": ["events"],
    "doc_dense_rank": ["documents"],
    "brand_weighted_median": ["lineitem", "part"],
    "users_click_and_purchase": ["events"],
    "revenue_gini": ["orders"],
    "top_suppliers_with_ties": ["nation", "supplier"],
    "events_value_deciles": ["events"],
    "events_day_overlap": ["events"],
    "events_cusum": ["events"],
    "events_lead_lag": ["events"],
    "user_value_interp": ["events"],
    "events_geomean": ["events"],
    "events_minmax_norm": ["events"],
    "events_fano": ["events"],
    "events_cuped": ["events"],
    "events_winsorized": ["events"],
    "events_mannwhitney": ["events"],
    "events_bounce_rate": ["events"],
    "events_cohort_ltv": ["events"],
    "doc_simpson": ["documents"],
    "parts_abc": ["lineitem"],
    "events_churn_labels": ["events"],
    "langid_confusion": ["documents"],
    "part_name_clusters": ["part"],
    "part_sorted_neighbor_pairs": ["part"],
    "events_weekday_adjusted": ["events"],
    # session 16
    "events_int_ewma": ["events"],
    "events_cep_pattern": ["events"],
    "copurchase_clustering": ["lineitem"],
    "copurchase_communities": ["lineitem"],
    "supplier_part_hits": ["lineitem"],
    "supplier_part_shortest": ["lineitem"],
    "ldiv_audit": ["documents"],
    "customer_linkage_scores": ["customer"],
    "value_range_partition": ["events"],
    "embed_kmeans_int": ["embeddings"],
    # session 19
    "events_auc": ["events"],
    "events_calibration": ["events"],
    "events_woe_bands": ["events"],
    "value_split_gain": ["events"],
    "dp_event_counts": ["events"],
    "term_lang_pmi": ["documents"],
    "feature_hash_audit": ["documents"],
    "brand_target_encoding": ["lineitem", "part"],
    "part_als_factors": ["lineitem", "orders"],
    "orders_cdc_apply": ["orders"],
    "orders_holt_forecast": ["orders"],
    "orders_skew_join": ["orders", "customer"],
    # session 20
    "source_vocab_overlap": ["documents"],
    "events_mase": ["events"],
    "dp_user_capped_counts": ["events"],
    "events_lift_at": ["events"],
    "events_cv_auc": ["events"],
    "events_ols2": ["events"],
    "orders_ab_srm": ["orders"],
    "source_ks": ["documents"],
    "events_pit_join": ["events"],
    "part_name_jaro_pairs": ["part"],
    # session 21
    "events_ohlc": ["events"],
    "events_peak_concurrency": ["events"],
    "events_twap": ["events"],
    "events_bollinger": ["events"],
    "supplier_adamic_adar": ["lineitem"],
    "events_ndcg": ["events"],
    "events_range_sum": ["events"],
    "basket_triples": ["lineitem"],
    "events_mrr": ["events"],
    "source_hapax": ["documents"],
    # session 22
    "events_rolling_median": ["events"],
    "source_ablation": ["documents"],
    "events_eventually_follows": ["events"],
    "events_session_join": ["events"],
    "events_conformal": ["events"],
    "blocking_eval": ["documents"],
    "events_incr_rollup": ["events"],
    "part_subtree_agg": ["lineitem"],
    "source_shapley": ["documents"],
    "events_did": ["events"],
    "lang_temperature_mixture": ["documents"],
    "supplier_landmark_dists": ["lineitem"],
    "events_wasserstein": ["events"],
    "events_isotonic": ["events"],
    "schema_match": ["customer", "supplier"],
    "term_doc_spectral": ["documents"],
    "docs_greedy_cover": ["documents"],
    "supplier_matching": ["lineitem"],
    "user_interval_schedule": ["events"],
    "events_psm_att": ["events"],
    "events_qini": ["events"],
    "curation_e2e": ["documents"],
    "orders_hw_forecast": ["orders"],
    "orders_fd_discovery": ["orders"],
    "customer_linkage_em": ["customer"],
    "events_cvm": ["events"],
    "events_markov_acc": ["events"],
    "events_bradley_terry": ["events"],
    "orders_price_twins": ["orders"],
    "embed_mmr": ["embeddings"],
    "embed_facility_loc": ["embeddings"],
    "events_sinkhorn": ["events"],
    "events_ar1": ["events"],
    "events_weekly_power": ["events"],
    "events_burstiness": ["events"],
    "events_rdd": ["events"],
    # round 5
    "events_km_lifetime": ["events"],
    "embed_semdedup_blocked": ["embeddings"],
    "doc_textrank_terms": ["documents"],
    "doremi_weights": ["documents"],
    "train_word2vec": ["documents"],
    "supplier_ppr": ["lineitem"],
    "word_mis": ["documents"],
    "events_changepoint": ["events"],
    "langid_kappa": ["documents"],
    "source_lang_tcloseness": ["documents"],
    "quality_rule_attrition": ["documents"],
    "embed_cluster_pair_quality": ["embeddings"],
    "events_seq_pairs": ["events"],
    "source_zipf_slope": ["documents"],
    "orders_key_skew_census": ["orders"],
    "events_nelson_aalen": ["events"],
    "orders_seasonality_strength": ["orders"],
    "docs_nb_label_rank": ["documents"],
    "events_entropy_rate": ["events"],
    "supplier_assortativity": ["lineitem"],
    "events_runs_test": ["events"],
    "orders_gini_by_segment": ["orders", "customer"],
    "source_js_matrix": ["documents"],
    "events_autocorr": ["events"],
    "brand_supplier_hhi": ["lineitem", "part"],
    "doc_rake_phrases": ["documents"],
    "supplier_rich_club": ["lineitem"],
    "orders_trend_sign_audit": ["orders", "customer"],
    "docs_heaps_law": ["documents"],
    "events_granger_lite": ["events"],
    "word_burstiness": ["documents"],
    "events_dow_anova": ["events"],
    "events_mann_kendall": ["events"],
    "events_lorenz_points": ["events"],
    "supplier_degree_alpha": ["lineitem"],
    "events_theil_index": ["events"],
    "customer_decile_migration": ["orders"],
    "events_odds_ratio": ["events"],
    "events_cramers_v": ["events"],
}


@pytest.mark.parametrize("seed", [101, 202])
def test_randomized_differential(ray_session, tmp_path, seed):
    _gen(tmp_path, seed)
    failures = []
    for qname, tables in QUERIES.items():
        fn, sql = CATALOG[qname]
        try:
            got = fn(str(tmp_path))
            exp = _oracle(tmp_path, sql, tables)
            _cmp(qname, got, exp)
        except AssertionError as e:
            failures.append((qname, str(e)[:200]))
    assert not failures, failures
