"""W4 AutoThrottle: the adaptive per-host delay (Scrapy's published
adjustment policy, shipped commented-out in the reference with its default
knobs — demo/settings.py:72-82) as a vectorized per-batch fold.

Parity contract: engine (JVM aggregate fold over checkpointed state) ==
simulator (sequential Python mirror) bit-for-bit — delays are IEEE doubles
through +, /2, min, max only, and the mock fetcher's latency model
(bytes / 50 KiB/s) is deterministic on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import (
    AUTOTHROTTLE_MAX_DELAY,
    AUTOTHROTTLE_MIN_DELAY,
    autothrottle_step_py,
    autothrottle_update,
)
from crawler_spark.simulator import simulate_crawl
from crawler_spark.sources.fetcher import LATENCY_BYTES_PER_SEC
from crawler_spark.sources.mock_web import (
    AS_OF,
    build_site_graph,
    seeds_df,
    site_graph_df,
)
from crawler_spark.streaming.crawl_loop import CrawlEngine

AT = {"start_delay": 0.5}  # faster fixture convergence; other knobs default


def test_fold_matches_python_mirror(spark):
    """autothrottle_update (JVM aggregate over collect_list) == the
    sequential Python fold, per host, for multi-response batches with
    out-of-order collect ordering and an absent-host default."""
    prev = spark.createDataFrame(
        [("a.com", 1.0), ("idle.com", 7.25)], "host string, at_delay double"
    )
    # host_rank deliberately shuffled within each host: the fold must sort.
    obs_rows = [
        ("a.com", 2, 3.5), ("a.com", 1, 0.25), ("a.com", 3, 80.0),
        ("b.com", 1, 0.01),  # absent from prev → folds from start_delay
    ]
    obs = spark.createDataFrame(
        obs_rows, "host string, host_rank int, g_latency_s double"
    )
    got = {
        r.host: r.at_delay
        for r in autothrottle_update(prev, obs, start_delay=0.5).collect()
    }

    def fold(init, lats):
        d = init
        for t in lats:
            d = autothrottle_step_py(d, t)
        return d

    assert got["a.com"] == fold(1.0, [0.25, 3.5, 80.0])
    assert got["b.com"] == fold(0.5, [0.01])
    assert got["idle.com"] == 7.25  # no responses → unchanged
    # clamp actually engaged on the 80 s latency
    assert got["a.com"] == AUTOTHROTTLE_MAX_DELAY


def test_step_clamps():
    assert autothrottle_step_py(5.0, 1000.0) == AUTOTHROTTLE_MAX_DELAY
    assert autothrottle_step_py(0.2, 0.0001) == AUTOTHROTTLE_MIN_DELAY
    # max(target, mean): a slow response jumps straight to its target
    assert autothrottle_step_py(1.0, 30.0) == 30.0


def _graph():
    g = build_site_graph(n_sites=3, cats_per_site=1, pages_per_cat=1,
                         entries_per_page=3, dup_fraction=0.2, seed=11)
    # One LIST page is huge: its host's delay must RISE (the others decay
    # toward min_delay) — and because lists are fetched before articles,
    # the raised delay shrinks that host's budget for the article batch,
    # so the throttle visibly reorders admission (not just final state).
    lists = sorted(k for k, p in g["pages"].items() if p["kind"] == "list")
    g["pages"][lists[0]]["bytes"] = 6 * 51200  # 6 s latency at 50 KiB/s
    return g


def test_engine_matches_simulator_with_autothrottle(spark, tmp_path):
    g = _graph()
    sim = simulate_crawl(g, autothrottle=AT)
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, g),
        registry=g["registry"],
        seeds=seeds_df(spark, g),
        cutoff_epoch=g["cutoff_epoch"],
        as_of=AS_OF,
        checkpoint_dir=str(tmp_path / "ckpt"),
        autothrottle=AT,
    )
    res = eng.run()

    from tests.test_crawl_e2e import _engine_docs, _engine_log, _sim_docs

    assert _engine_log(res) == sim["crawl_log"]
    assert _engine_docs(res) == _sim_docs(sim)
    # the adaptive state itself is part of the parity contract
    got = {r.host: r.at_delay for r in res["at_delays"].collect()}
    assert got == sim["at_delays"]
    # and it moved in both directions off the start value
    big_host = next(
        h for h, d in sim["at_delays"].items() if d > AT["start_delay"]
    )
    assert any(d < AT["start_delay"] for h, d in sim["at_delays"].items()
               if h != big_host)


def test_autothrottle_changes_admission(spark, tmp_path):
    """The adaptive delay actually bites: the slow host's per-batch budget
    shrinks, so the throttled crawl needs more batches than the static
    one — and the throttled ordering differs from the static ordering."""
    g = _graph()
    static = simulate_crawl(g)
    throttled = simulate_crawl(g, autothrottle=AT)
    assert throttled["batches"] > static["batches"]
    assert throttled["crawl_log"] != static["crawl_log"]
    # same coverage either way — throttling reorders, never drops
    assert {u for _, u in throttled["crawl_log"]} == {
        u for _, u in static["crawl_log"]
    }


def test_autothrottle_state_survives_resume(spark, tmp_path):
    """Interrupting after 2 batches and resuming continues from the
    checkpointed at_delays snapshot — final state equals the
    uninterrupted run's."""
    g = _graph()
    sim = simulate_crawl(g, autothrottle=AT)

    def mk(d):
        return CrawlEngine(
            spark,
            site_graph=site_graph_df(spark, g),
            registry=g["registry"],
            seeds=seeds_df(spark, g),
            cutoff_epoch=g["cutoff_epoch"],
            as_of=AS_OF,
            checkpoint_dir=str(d),
            autothrottle=AT,
        )

    d = tmp_path / "ckpt_resume"
    mk(d).run(max_batches=2)
    res = mk(d).run(resume=True)
    got = {r.host: r.at_delay for r in res["at_delays"].collect()}
    assert got == sim["at_delays"]


def test_mock_fetch_latency_is_deterministic(spark):
    g = build_site_graph(n_sites=2, seed=3)
    from crawler_spark.sources.fetcher import MockWebFetcher

    rows = [
        (p["url"], p["method"], p["body"], p.get("fail_times", 0),
         p["kind"], "ua", None, p["host"])
        for p in list(g["pages"].values())[:5]
    ]
    adm = spark.createDataFrame(
        rows,
        "url string, method string, body string, attempt int,"
        " parse_kind string, ua string, cookie string, host string",
    )
    out = MockWebFetcher(spark, site_graph_df(spark, g)).fetch(adm).collect()
    for r in out:
        if r.f_status == "ok":
            assert r.g_latency_s == r.g_bytes / LATENCY_BYTES_PER_SEC
        else:
            assert r.g_latency_s is None
