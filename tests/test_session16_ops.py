"""Session-16 query invariants (analytics7): Fellegi-Sunter linkage,
range-partitioner audit, CEP pattern, l-diversity, dup-cluster sizes,
clustering coefficient, LPA communities.  Oracle equality is pinned by
scripts/check_correctness.py; these tests pin the SEMANTIC invariants
on the sf0.001 tier."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_linkage_true_pairs_score_highest(ray_session):
    from kgray.queries.analytics7 import (_FS_MATCH,
                                          q_customer_linkage_scores)

    out = q_customer_linkage_scores(SF).to_pandas()
    assert len(out)
    # every emitted matched pair above the match threshold with v == u +
    # 1e6 is the planted true identity; unperturbed true pairs agree on
    # all three fields and must carry the maximum possible score
    true = out[out["v"] == out["u"] + 1_000_000]
    assert len(true) > 0
    assert (true["score"] >= _FS_MATCH).any()
    top = out["score"].max()
    assert (out[out["score"] == top]["v"]
            == out[out["score"] == top]["u"] + 1_000_000).all()


def test_linkage_fully_perturbed_keys_absent(ray_session):
    from kgray.queries.analytics7 import q_customer_linkage_scores

    out = q_customer_linkage_scores(SF).to_pandas()
    # key % 30 == 0 perturbs name+phone+band: all three disagree, the
    # score is negative and the pair must fall below the review cutoff
    true = out[out["v"] == out["u"] + 1_000_000]
    assert not (true["u"] % 30 == 0).any()


def test_range_partition_buckets_cover_and_order(ray_session):
    from kgray.queries.analytics7 import q_value_range_partition

    out = q_value_range_partition(SF).to_pandas().sort_values("bucket")
    assert set(out["bucket"]) <= set(range(8))
    assert int(out["n_rows"].sum()) == 1000  # sf0.001 events row count
    # bucket value ranges must be disjoint and ordered
    mx = out["max_cents"].to_numpy()
    mn = out["min_cents"].to_numpy()
    assert (mn <= mx).all()
    assert (mx[:-1] <= mn[1:]).all()


def test_cep_matched_consistent_with_counts(ray_session):
    from kgray.queries.analytics7 import q_events_cep_pattern

    out = q_events_cep_pattern(SF).to_pandas()
    assert (out["matched"] == (out["n_matches"] > 0).astype(int)).all()
    assert out["n_events"].sum() == 1000
    # a 'v...p' match needs at least one view and one purchase
    assert (out[out["n_matches"] > 0]["n_events"] >= 2).all()


def test_ldiv_lower_bound_and_risk_flag(ray_session):
    from kgray.queries.analytics7 import q_ldiv_audit

    out = q_ldiv_audit(SF).to_pandas()
    assert (out["l"] >= 1).all()
    assert (out["at_risk"] == (out["l"] < 3).astype(np.int32)).all()


def test_dup_cluster_sizes_all_at_least_two(ray_session):
    from kgray.queries.analytics7 import q_dup_cluster_sizes

    out = q_dup_cluster_sizes(SF).to_pandas()
    # a connected component of a pair graph has >= 2 members
    assert (out["size"] >= 2).all()


def test_clustering_coeff_in_unit_interval(ray_session):
    from kgray.queries.analytics7 import q_copurchase_clustering

    out = q_copurchase_clustering(SF).to_pandas()
    assert len(out)
    assert (out["degree"] >= 2).all()
    assert ((out["coeff"] >= 0) & (out["coeff"] <= 1)).all()
    # coeff is exactly the integer ratio
    want = 2.0 * out["tri"].to_numpy() / (
        out["degree"].to_numpy() * (out["degree"].to_numpy() - 1)
    )
    assert np.allclose(out["coeff"], np.round(want, 6), atol=1e-9)


def test_lpa_labels_are_member_nodes(ray_session):
    from kgray.queries.analytics7 import q_copurchase_communities

    out = q_copurchase_communities(SF).to_pandas()
    assert len(out)
    # every propagated label is itself a graph node
    assert set(out["lbl"]) <= set(out["node"])


def test_int_ewma_matches_scalar_recurrence(ray_session):
    from kgray.queries.analytics7 import q_events_int_ewma
    import pandas as pd
    from kgray.util import round_half_up

    out = q_events_int_ewma(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(
        SF + "/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in list(ev.groupby("user_id"))[:5]:
        cents = round_half_up(g["value"].to_numpy() * 100.0, 0).astype(int)
        l = int(cents[0])
        for x in cents[1:]:
            l = (int(x) + 3 * l) // 4
        assert out.loc[uid, "ewma_cents"] == l
        assert out.loc[uid, "n"] == len(g)


def test_kmeans_int_assignment_invariants(ray_session):
    import numpy as np
    from kgray.queries.analytics7 import (_KM_K, q_embed_kmeans_int)

    out = q_embed_kmeans_int(SF).to_pandas()
    assert len(out) == 500  # sf0.001 embeddings row count
    assert set(out["cluster"]) <= set(range(_KM_K))
    assert out["cluster"].nunique() > 1  # clusters are non-degenerate
    # deterministic: a second run is identical
    again = q_embed_kmeans_int(SF).to_pandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = again.sort_values("vec_id").reset_index(drop=True)
    assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()
