"""Revisit scheduling: hand-computed Cho & Garcia-Molina estimates on a
tiny visit log, clamping, and the more-changes → shorter-interval
monotonicity that makes the policy useful."""

from __future__ import annotations

import math

from crawler_spark.operators.revisit import revisit_schedule

# url, ts, seq, sig. hot: changes every visit; cold: never changes;
# warm: changes once; single: one visit (no comparisons).
VISITS = [
    ("hot", 0.0, 1, 1), ("hot", 100.0, 2, 2), ("hot", 200.0, 3, 3),
    ("hot", 300.0, 4, 4),
    ("cold", 0.0, 5, 7), ("cold", 500.0, 6, 7), ("cold", 1000.0, 7, 7),
    ("warm", 0.0, 8, 1), ("warm", 400.0, 9, 1), ("warm", 800.0, 10, 2),
    ("single", 50.0, 11, 9),
]
MIN_I, MAX_I = 60.0, 10_000.0


def lam_hat(n_cmp, changes, mean_gap):
    return -math.log((n_cmp - changes + 0.5) / (n_cmp + 0.5)) / mean_gap


def run(spark):
    df = spark.createDataFrame(
        VISITS, "url string, ts double, seq int, sig int"
    )
    rows = revisit_schedule(df, min_interval=MIN_I, max_interval=MAX_I)
    return {r.url: r for r in rows.collect()}


def test_counts_and_hand_computed_lambda(spark):
    out = run(spark)
    assert (out["hot"].n_visits, out["hot"].n_changes) == (4, 3)
    assert (out["cold"].n_visits, out["cold"].n_changes) == (3, 0)
    assert (out["warm"].n_visits, out["warm"].n_changes) == (3, 1)
    lam = lam_hat(3, 3, 100.0)
    assert out["hot"].lambda_per_msec == round(lam * 1e6, 6)
    assert out["hot"].revisit_interval == round(
        max(MIN_I, min(1.0 / lam, MAX_I)), 6
    )
    assert out["hot"].next_due == round(300.0 + out["hot"].revisit_interval, 6)


def test_never_changed_and_single_visit_get_max_interval(spark):
    out = run(spark)
    for u in ("cold", "single"):
        assert out[u].lambda_per_msec == 0.0
        assert out[u].revisit_interval == MAX_I
    assert out["single"].next_due == 50.0 + MAX_I


def test_more_changes_means_shorter_interval(spark):
    out = run(spark)
    assert (
        out["hot"].revisit_interval
        < out["warm"].revisit_interval
        <= MAX_I
    )


def test_clamped_to_min_interval(spark):
    fast = [("f", float(i), i, i) for i in range(6)]  # gap 1s, changes always
    df = spark.createDataFrame(fast, "url string, ts double, seq int, sig int")
    row = revisit_schedule(df, min_interval=MIN_I, max_interval=MAX_I).first()
    assert row.revisit_interval == MIN_I
