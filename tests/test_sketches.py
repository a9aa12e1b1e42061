"""HyperLogLog distinct sketch (operators/sketches.py): register math vs
a hashlib reference, estimate accuracy, mergeability, determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crawler_spark.operators.sketches import (
    HLL_M,
    HLL_NUMERATOR,
    HLL_RHO_CAP,
    hll_distinct,
)


def _urls_df(spark, rows):
    return spark.createDataFrame(rows, "host string, url string")


def _py_hll(urls):
    regs = [0] * HLL_M
    for u in urls:
        h = int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
        b, v = h % HLL_M, h // HLL_M
        rho = min(53 - max(v.bit_length(), 1), HLL_RHO_CAP)
        regs[b] = max(regs[b], rho)
    s = sum(1 << (HLL_RHO_CAP - r) for r in regs)
    return regs, round(HLL_NUMERATOR / s, 3)


def test_hll_matches_hashlib_reference(spark):
    urls = [f"http://a.example.com/p/{i}" for i in range(3000)]
    rows = [("a.example.com", u) for u in urls]
    out = hll_distinct(_urls_df(spark, rows)).collect()[0]
    regs, est = _py_hll(urls)
    assert out.hll_estimate == est
    assert out.n_registers_set == sum(1 for r in regs if r > 0)


def test_hll_accuracy_and_duplicate_insensitivity(spark):
    # 5000 distinct URLs, each seen 3 times: the estimate must track the
    # DISTINCT count (m=256 raw HLL: sigma ~6.5%; assert 15%)
    distinct = 5000
    rows = [("h.example.com", f"http://h.example.com/x/{i % distinct}")
            for i in range(distinct * 3)]
    out = hll_distinct(_urls_df(spark, rows)).collect()[0]
    assert abs(out.hll_estimate - distinct) / distinct < 0.15
    # and exactly equals the single-copy sketch (duplicates are free)
    once = hll_distinct(_urls_df(spark, rows[:distinct])).collect()[0]
    assert out.hll_estimate == once.hll_estimate


def test_hll_groups_and_partition_determinism(spark):
    rows = [(f"g{i % 3}.example.com", f"http://g{i % 3}.example.com/{i}")
            for i in range(4000)]
    df = _urls_df(spark, rows)
    a = hll_distinct(df.repartition(1)).orderBy("host").collect()
    b = hll_distinct(df.repartition(11, "url")).orderBy("host").collect()
    assert a == b
    assert len(a) == 3


def test_hll_plan_shape(spark):
    """No distinct over the URLs, no window, no Python: two partial-agg
    groupBys (the whole point of sketching at frontier scale)."""
    rows = [("h.example.com", f"http://h.example.com/{i}")
            for i in range(500)]
    plan = hll_distinct(_urls_df(spark, rows)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
