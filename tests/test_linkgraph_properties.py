"""Property tests: largest-remainder apportionment and revisit scheduling
against pure-Python mirrors on randomized inputs (hypothesis). Few
examples — each example runs Spark jobs — but adversarial shapes: ties,
single host, leftover 0, budgets barely above the floor."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_spark.operators.linkgraph import allocate_budget
from crawler_spark.operators.revisit import revisit_schedule

_SPARK = None


def _get_spark():
    # Reuse the session-scoped fixture's session (hypothesis-driven tests
    # can't take function-scoped fixtures alongside @given cleanly).
    from crawler_spark.session import get_spark

    global _SPARK
    if _SPARK is None:
        _SPARK = get_spark(
            "crawler_spark-tests", master="local[4]", shuffle_partitions=8
        )
    return _SPARK


def py_allocate(rank: dict, total: int, floor_each: int) -> dict:
    hosts = sorted(rank)
    mass = sum(rank.values())
    spend = total - floor_each * len(hosts)
    base = {h: spend * rank[h] // mass for h in hosts}
    rem = {h: spend * rank[h] % mass for h in hosts}
    left = total - sum(base.values()) - floor_each * len(hosts)
    out = {h: floor_each + base[h] for h in hosts}
    for h in sorted(hosts, key=lambda h: (-rem[h], h))[:left]:
        out[h] += 1
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ranks=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
        max_size=12,
    ),
    extra=st.integers(min_value=0, max_value=200),
    floor_each=st.integers(min_value=0, max_value=3),
)
def test_allocation_matches_python_and_sums_exact(ranks, extra, floor_each):
    spark = _get_spark()
    total = floor_each * len(ranks) + extra
    df = spark.createDataFrame(
        [(h, m) for h, m in ranks.items()], "host string, rank_micro long"
    )
    got = {
        r.host: r.budget
        for r in allocate_budget(df, total, floor_each).collect()
    }
    assert got == py_allocate(ranks, total, floor_each)
    assert sum(got.values()) == total


def py_revisit(visits, mn, mx):
    per = {}
    for url, ts, seq, sig in sorted(visits, key=lambda v: (v[0], v[1], v[2])):
        per.setdefault(url, []).append((ts, sig))
    out = {}
    for url, vs in per.items():
        n = len(vs)
        changes = sum(1 for a, b in zip(vs, vs[1:]) if a[1] != b[1])
        if n > 1 and changes > 0:
            mean_gap = (vs[-1][0] - vs[0][0]) / (n - 1)
            lam = -math.log((n - 1 - changes + 0.5) / (n - 1 + 0.5)) / mean_gap
            ivl = round(min(max(1.0 / lam, mn), mx), 6)
        else:
            lam, ivl = 0.0, round(mx, 6)
        out[url] = (n, changes, round(lam * 1e6, 6), ivl, vs[-1][0] + ivl)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    visits=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=1,
        max_size=30,
        # Unique ts per url: equal timestamps would zero the mean gap
        # (λ̂ undefined — Infinity in Spark, ZeroDivisionError in the
        # mirror); the seq tie-breaker covers ordering, not gap math.
        unique_by=lambda v: (v[0], v[1]),
    )
)
def test_revisit_matches_python(visits):
    spark = _get_spark()
    df = spark.createDataFrame(
        [(u, float(t), s, g) for u, t, s, g in visits],
        "url string, ts double, seq long, sig int",
    )
    rows = revisit_schedule(df, min_interval=60.0, max_interval=9999.0)
    got = {
        r.url: (r.n_visits, r.n_changes, r.lambda_per_msec,
                r.revisit_interval, r.next_due)
        for r in rows.collect()
    }
    assert got == py_revisit(visits, 60.0, 9999.0)
