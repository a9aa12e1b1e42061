"""Fixed-point PageRank: hand graph vs a pure-Python reference fold,
mass conservation, dangling handling, determinism under repartitioning."""

from __future__ import annotations

import pytest

from crawler_spark.operators.linkgraph import PR_SCALE, host_pagerank

# a -> b, a -> c, b -> c, c -> a, d is dangling (linked from c).
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]


def py_pagerank(edges, n_iter=4, d=85):
    """Pure-Python mirror of the integer update rule in host_pagerank."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: PR_SCALE // n for v in nodes}
    for _ in range(n_iter):
        recv = {v: 0 for v in nodes}
        for s, t in edges:
            recv[t] += rank[s] // out[s]
        dangling = sum(rank[v] for v in nodes if v not in out)
        rank = {
            v: (100 - d) * PR_SCALE // (100 * n)
            + d * (recv[v] + dangling // n) // 100
            for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def result(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    rows = host_pagerank(edges, n_iter=4).collect()
    return {r.host: r for r in rows}


def test_matches_python_reference(result):
    expected = py_pagerank(EDGES, n_iter=4)
    assert {h: r.rank_micro for h, r in result.items()} == expected


def test_mass_conserved_up_to_truncation(result):
    total = sum(r.rank_micro for r in result.values())
    # Each integer division truncates < 1 unit per node per iteration.
    n, iters = len(result), 4
    assert PR_SCALE - total < n * (n + 2) * iters
    assert total <= PR_SCALE


def test_dangling_node_has_min_rank_and_sink_is_max(result):
    # d receives only from c and emits nothing; c receives from two hosts.
    assert result["d"].rank_micro < result["c"].rank_micro
    assert result["c"].rank_micro == max(r.rank_micro for r in result.values())


def test_rank_is_exact_quotient(result):
    for r in result.values():
        assert r.rank == r.rank_micro / PR_SCALE


def test_deterministic_under_partitioning(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r.host: r.rank_micro for r in host_pagerank(edges).collect()}
    b = {
        r.host: r.rank_micro
        for r in host_pagerank(edges.repartition(7)).collect()
    }
    assert a == b


def test_more_iterations_still_exact_python_parity(spark):
    """The eager per-superstep materialization holds the Python-reference
    equality at deeper iteration counts (lineage is truncated each step,
    so this also guards against plan-growth regressions)."""
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r.host: r.rank_micro
        for r in host_pagerank(edges, n_iter=12).collect()
    }
    assert got == py_pagerank(EDGES, n_iter=12)


def py_allocate(rank, total, min_per_host=0):
    """Pure-Python largest-remainder mirror of allocate_budget."""
    hosts = sorted(rank)
    mass = sum(rank.values())
    spend = total - min_per_host * len(hosts)
    base = {h: spend * rank[h] // mass for h in hosts}
    rem = {h: spend * rank[h] % mass for h in hosts}
    left = total - sum(base.values()) - min_per_host * len(hosts)
    order = sorted(hosts, key=lambda h: (-rem[h], h))
    out = {h: min_per_host + base[h] for h in hosts}
    for h in order[:left]:
        out[h] += 1
    return out


def test_budget_allocation_exact_and_matches_python(spark, result):
    from crawler_spark.operators.linkgraph import allocate_budget

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    ranks = host_pagerank(edges, n_iter=4)
    got = {r.host: r.budget for r in
           allocate_budget(ranks, total_budget=97, min_per_host=3).collect()}
    assert sum(got.values()) == 97
    rank = {h: r.rank_micro for h, r in result.items()}
    assert got == py_allocate(rank, 97, 3)
    assert min(got.values()) >= 3


def test_shipped_python_mirrors_match_spark(spark, result):
    """host_pagerank_py / allocate_budget_py — the mirrors the simulator
    uses for the prioritized-crawl oracle — are integer-identical to the
    Spark operators (and to this test file's independent references)."""
    from crawler_spark.operators.linkgraph import (
        allocate_budget,
        allocate_budget_py,
        host_pagerank_py,
    )

    assert host_pagerank_py(EDGES, n_iter=4) == {
        h: r.rank_micro for h, r in result.items()
    }
    assert host_pagerank_py(EDGES, n_iter=12) == py_pagerank(EDGES, 12)
    rank = {h: r.rank_micro for h, r in result.items()}
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    spark_alloc = {
        r.host: r.budget
        for r in allocate_budget(
            host_pagerank(edges, n_iter=4), 97, 3
        ).collect()
    }
    assert allocate_budget_py(rank, 97, 3) == spark_alloc
    assert allocate_budget_py(rank, 23) == py_allocate(rank, 23)


def test_budget_allocation_deterministic(spark):
    from crawler_spark.operators.linkgraph import allocate_budget

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    a = allocate_budget(host_pagerank(edges), 1000).collect()
    b = allocate_budget(host_pagerank(edges.repartition(5)), 1000).collect()
    assert sorted(a) == sorted(b)
    assert sum(r.budget for r in a) == 1000
