"""Behavioral invariants for the session-3 operators — properties the
oracle comparison can't express (the oracle would share a systematic
bug; these pin the MATH): bounded statistics, conservation laws,
monotonicity.
"""

from __future__ import annotations

import math

import pytest

from sparkifydb_datawarehouse_spark import registry

from conftest import SF_SMOKE

registry.load_all_modules()


def _rows(spark, qid):
    return registry.QUERIES[qid](spark, SF_SMOKE).collect()


def test_gini_bounded(spark):
    r = _rows(spark, "q_gini_concentration")[0]
    assert 0.0 <= r.gini <= 1.0
    # top decile must hold at least its population share of revenue
    assert 0.1 <= r.top_decile_share <= 1.0


def test_ks_bounded(spark):
    r = _rows(spark, "q_ks_two_sample")[0]
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.n_a > 0 and r.n_b > 0


def test_benford_shares_sum_to_one(spark):
    rows = _rows(spark, "q_benford_digits")
    assert {r.digit for r in rows} == set(range(1, 10))
    assert math.isclose(sum(r.share for r in rows), 1.0, abs_tol=1e-5)
    assert math.isclose(
        sum(r.benford_expected for r in rows), 1.0, abs_tol=1e-5
    )  # Benford masses themselves sum to 1


def test_mannwhitney_u_range(spark):
    r = _rows(spark, "q_mannwhitney_u")[0]
    assert 0 <= r.u_stat <= r.n1 * r.n2  # U ∈ [0, n1·n2] by definition


def test_allocation_conservation(spark):
    rows = _rows(spark, "q_greedy_allocation")
    for r in rows:
        assert r.allocated_units <= r.requested_units
        assert 0.0 < r.fill_rate <= 1.0


def test_geo_nearest_within_radius(spark):
    rows = _rows(spark, "q_geo_nearest")
    assert rows, "some customer must have a supplier within radius"
    assert all(0.0 <= r.dist_km <= 300.0 for r in rows)
    # one nearest per customer
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys))


def test_rfm_scores_are_quintiles(spark):
    rows = _rows(spark, "q_rfm_segments")
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5


def test_abc_partition_of_revenue(spark):
    rows = _rows(spark, "q_abc_classification")
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    assert math.isclose(sum(r.revenue_share for r in rows), 1.0, abs_tol=1e-5)
    by = {r.abc_class: r for r in rows}
    # A must carry more revenue per part than C (Pareto ordering)
    if "A" in by and "C" in by:
        assert by["A"].revenue / by["A"].n_parts > by["C"].revenue / by["C"].n_parts


def test_open_orders_nonnegative_and_closes(spark):
    rows = _rows(spark, "q_open_orders_daily")
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0  # every order eventually ships


def test_forecast_metrics_positive(spark):
    rows = _rows(spark, "q_forecast_eval")
    for r in rows:
        assert r.mae >= 0 and r.mape >= 0 and r.mase > 0


def test_k_anonymity_consistency(spark):
    r = _rows(spark, "q_k_anonymity")[0]
    assert r.k_achieved >= 1
    assert 0 <= r.n_rows_suppressed <= r.n_rows
    assert r.n_unsafe_classes <= r.n_classes


def test_bfs_source_distance_zero(spark):
    rows = _rows(spark, "q_graph_shortest_path")
    dists = {r.supp_key: r.dist for r in rows}
    assert min(dists.values()) == 0  # the source itself
    assert max(dists.values()) <= 20
    # BFS levels are contiguous: every non-source level d>0 has a
    # vertex at level d-1 somewhere
    levels = sorted(set(dists.values()))
    assert levels == list(range(len(levels)))


def test_funnel_latency_percentile_order(spark):
    r = _rows(spark, "q_funnel_latency")[0]
    assert 0.0 <= r.conversion_rate <= 1.0
    assert r.p90_latency_s >= r.median_latency_s >= 0.0


def test_cuped_preserves_population(spark):
    rows = _rows(spark, "q_ab_cuped")
    assert {r.variant for r in rows} == {"A", "B"}
    # CUPED adjustment is mean-preserving over the WHOLE population:
    # weighted adjusted means must equal weighted raw means
    n = sum(r.n_users for r in rows)
    raw = sum(r.mean_metric * r.n_users for r in rows) / n
    adj = sum(r.mean_adjusted * r.n_users for r in rows) / n
    assert math.isclose(raw, adj, rel_tol=1e-3)


def test_kfold_partitions_all_points(spark):
    rows = _rows(spark, "q_kfold_metrics")
    assert sorted(r.fold for r in rows) == [0, 1, 2, 3, 4]
    assert all(r.rmse_test > 0 for r in rows)


def test_welch_consistent_with_mean_diff(spark):
    r = _rows(spark, "q_welch_ttest")[0]
    # t and the mean difference must share a sign
    assert (r.t_stat >= 0) == (r.mean_diff >= 0)


def test_golden_record_majority_is_member_label(spark):
    rows = _rows(spark, "q_golden_record")
    for r in rows:
        members = [int(x) for x in r.member_ids.split(",")]
        assert r.n_members == len(members)
        assert r.representative_id == min(members)
        assert r.cluster_id == min(members)  # CC labels by smallest member


def test_kaplan_meier_monotone_nonincreasing(spark):
    rows = _rows(spark, "q_kaplan_meier")
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # KM never rises
    # risk set shrinks as duration grows
    risks = [r.n_risk for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_pvm_effects_reconstruct_delta(spark):
    rows = _rows(spark, "q_price_volume_mix")
    for r in rows:
        # the two floors each lose < $0.01
        assert abs((r.price_effect + r.volume_effect) - r.delta) <= 0.02
