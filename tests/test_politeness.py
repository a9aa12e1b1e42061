"""Politeness admission: per-host budget exactness (settings.py:28
semantics), robots precedence, and the salted two-phase window ≡ the global
window under extreme skew (SURVEY §7.1 M3)."""

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import (
    admit_per_host,
    apply_robots,
    fetch_schedule,
)
from crawler_spark.schema import ROBOTS_SCHEMA


def _frontier(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, host string, priority double, seq string"
    )
    return df.withColumn("url_hash", F.xxhash64("url"))


def test_budget_exact_per_host(spark):
    rows = [
        (f"http://h{h}.com/{i}", f"h{h}.com", 0.0, f"{h}{i:04d}")
        for h in range(3)
        for i in range(10)
    ]
    f = _frontier(spark, rows).withColumn("crawl_delay", F.lit(0.2))
    admitted, deferred = admit_per_host(f, batch_seconds=1.0)  # budget = 5
    per_host = {
        r.host: r.n
        for r in admitted.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {"h0.com": 5, "h1.com": 5, "h2.com": 5}
    assert deferred.count() == 15
    # admitted are exactly each host's 5 smallest seqs
    seqs = sorted(r.seq for r in admitted.filter(F.col("host") == "h0.com").collect())
    assert seqs == [f"0{i:04d}" for i in range(5)]


def test_salted_two_phase_equals_global_under_skew(spark):
    # one mega-host with 90% of rows + minnows
    rows = [(f"http://big.com/{i}", "big.com", 0.0, f"{i:06d}") for i in range(900)]
    rows += [(f"http://s{i}.com/x", f"s{i}.com", 0.0, f"z{i:04d}") for i in range(100)]
    f = _frontier(spark, rows).withColumn("crawl_delay", F.lit(0.1))
    admitted, deferred = admit_per_host(f, batch_seconds=2.0, salt_k=16)  # budget 20
    big = sorted(
        r.seq for r in admitted.filter(F.col("host") == "big.com").collect()
    )
    assert big == [f"{i:06d}" for i in range(20)]  # exactly the global top-20
    assert admitted.filter(F.col("host") != "big.com").count() == 100
    assert deferred.count() == 880


def test_priority_beats_seq(spark):
    rows = [
        ("http://h.com/low", "h.com", 0.0, "0001"),
        ("http://h.com/high", "h.com", 5.0, "0009"),
    ]
    f = _frontier(spark, rows).withColumn("crawl_delay", F.lit(2.0))
    admitted, _ = admit_per_host(f, batch_seconds=1.0)  # budget = 1
    assert [r.url for r in admitted.collect()] == ["http://h.com/high"]


def test_robots_deny_allow_and_delay(spark):
    robots = spark.createDataFrame(
        [
            ("h.com", ["/public/"], ["/public/private/", "/secret/"], 1.0),
        ],
        ROBOTS_SCHEMA,
    )
    f = _frontier(
        spark,
        [
            ("http://h.com/public/a", "h.com", 0.0, "1"),
            ("http://h.com/secret/b", "h.com", 0.0, "2"),
            ("http://h.com/public/private/c", "h.com", 0.0, "3"),
            ("http://other.com/x", "other.com", 0.0, "4"),
        ],
    )
    out = apply_robots(f, robots)
    got = {(r.url, r.crawl_delay) for r in out.select("url", "crawl_delay").collect()}
    assert got == {
        ("http://h.com/public/a", 1.0),
        ("http://other.com/x", 0.2),  # default delay, settings.py:28
    }


def test_fetch_schedule_slots(spark):
    rows = [(f"http://h.com/{i}", "h.com", 0.0, f"{i:04d}") for i in range(3)]
    f = _frontier(spark, rows).withColumn("crawl_delay", F.lit(0.5))
    admitted, _ = admit_per_host(f, batch_seconds=2.0)
    sched = fetch_schedule(admitted, batch_start_epoch=100.0)
    got = sorted((r.seq, r.scheduled_at) for r in sched.collect())
    assert got == [("0000", 100.0), ("0001", 100.5), ("0002", 101.0)]
