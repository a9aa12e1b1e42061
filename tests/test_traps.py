"""Spider-trap host detection (operators/traps.py): the three IRLbot/
Heritrix-style host signals — deep calendar mills, self-link loops,
single-template dominance — plus the volume floor and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.traps import detect_traps


def _urls(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


def test_detect_traps_three_signals(spark):
    rows = []
    # calendar mill: depth 8 on every URL
    for i in range(60):
        rows.append(
            f"http://cal.example.com/archive/2021/{i % 12}/{i % 28}/{i}"
            "/view/print/mobile"
        )
    # loop host: /f/o/f/o/f/o → 6 segments, 2 distinct → rep 4
    for i in range(60):
        rows.append(f"http://loop.example.com/f/o/f/o/f/o/{i}")
    # dominance mill: one template carries everything
    for i in range(60):
        rows.append(f"http://mill.example.com/p/{i}")
    # healthy host: six templates, same volume — must NOT be flagged
    cats = ["news", "sports", "life", "tech", "world", "biz"]
    for i in range(60):
        rows.append(f"http://ok.example.com/{cats[i % 6]}/story-{i}")
    # tiny trap-shaped host below the volume floor — must NOT be flagged
    for i in range(10):
        rows.append(f"http://small.example.com/p/{i}")

    out = {r.host: r for r in detect_traps(_urls(spark, rows)).collect()}
    assert set(out) == {
        "cal.example.com", "loop.example.com", "mill.example.com"
    }
    assert out["cal.example.com"].reason == "deep"
    assert out["cal.example.com"].n_deep == 60
    assert out["loop.example.com"].reason == "loop"
    assert out["loop.example.com"].n_loop == 60
    assert out["mill.example.com"].reason == "dominance"
    assert out["mill.example.com"].top_template == "/p/N"
    assert out["mill.example.com"].top_share_bp == 10_000
    assert out["mill.example.com"].n_templates == 1


def test_detect_traps_reason_priority_and_ties(spark):
    """A host tripping deep AND dominance reports 'deep' (strongest
    evidence class); top-template ties break on template asc."""
    rows = [
        f"http://both.example.com/a/2021/{i}/{i}/{i}/x/y/z-{i}"
        for i in range(60)
    ]
    # a flagged (deep) host with two equal-count templates → the reported
    # top template is the lexicographically smaller one
    rows += [
        f"http://tie.example.com/aa/2021/{i}/{i}/{i}/x/y/z-{i}"
        for i in range(30)
    ]
    rows += [
        f"http://tie.example.com/bb/2021/{i}/{i}/{i}/x/y/z-{i}"
        for i in range(30)
    ]
    out = {r.host: r for r in detect_traps(_urls(spark, rows)).collect()}
    assert out["both.example.com"].reason == "deep"
    assert out["tie.example.com"].reason == "deep"
    assert out["tie.example.com"].top_template == "/aa/N/N/N/N/x/y/z-N"


def test_detect_traps_plan_shape(spark):
    """One partial-agg groupBy + one host-partitioned window; JVM-side
    throughout; no unpartitioned window, no cartesian."""
    urls = _urls(spark, [f"http://h{i % 4}.com/p/{i}" for i in range(200)])
    plan = detect_traps(urls)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_detect_traps_py_mirror_equality(spark):
    """The pure-Python mirror the simulator uses must produce exactly the
    Spark operator's rows — same hosts, counts, templates, reasons — on a
    mixed corpus exercising every signal and the tie-break."""
    from crawler_spark.operators.traps import detect_traps_py

    rows = []
    for i in range(60):
        rows.append(
            f"http://cal.example.com/archive/2021/{i % 12}/{i % 28}/{i}"
            "/view/print/mobile"
        )
        rows.append(f"http://loop.example.com/f/o/f/o/f/o/{i}")
        rows.append(f"http://mill.example.com/p/{i}")
        rows.append(
            "http://ok.example.com/"
            f"{['news', 'sports', 'life'][i % 3]}/story-{i}"
        )
    spark_rows = sorted(
        (r.asDict() for r in detect_traps(_urls(spark, rows)).collect()),
        key=lambda d: d["host"],
    )
    py_rows = detect_traps_py(rows)
    assert spark_rows == py_rows


def test_trap_guard_clamps_admission(spark):
    """The guarded fixture crawl admits at most TRAP_GUARD_BUDGET
    trap-host requests per batch, still fetches the whole (bounded) mill
    eventually, and leaves every other host's row multiset unchanged."""
    from collections import Counter

    from crawler_spark import oracle_crawl

    log = oracle_crawl.engine_trap_guard_log(spark).collect()
    trap = [r for r in log if r.host == "trap.example.com"]
    assert trap, "trap host must still be crawled (quarantine, not ban)"
    per_batch = Counter(r.batch_id for r in trap)
    assert max(per_batch.values()) <= oracle_crawl.TRAP_GUARD_BUDGET
    # unguarded pass-1 admits the mill much faster than the clamp allows
    assert len(per_batch) > len(trap) / 4
