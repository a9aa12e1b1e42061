"""Crawl-lifecycle correctness fixtures for the driver's DuckDB oracle.

VERDICT r2 'Next round #3': the crawl-engine operators (S1-S6, U1-U4, W3,
W6, K1-K2, P1/P2/P4, J3) were verified only by the pytest parity suite —
the driver's oracle gate never saw them. This module closes that gap by
materializing BOTH sides of the parity check as tables the gate can
compare:

- the SPARK side: run the micro-batch CrawlEngine (streaming/crawl_loop.py)
  on a fixed deterministic mock-web fixture and expose its outputs
  (documents, per-span rows, the canonically-ordered crawl log, per-host
  fetch metrics) as DataFrames;
- the ORACLE side: run the single-threaded reference-semantics simulator
  (simulator.py — exact middlewares.py:50-68 dedup + settings.py:28
  politeness + zeenews.py:96-101 cutoff semantics) on the SAME fixture and
  write its outputs as parquet that the DuckDB oracle SQL reads with
  read_parquet().

Everything is deterministic (seeded fixture, no wall clock), so the
comparison is exact: row counts, schemas, and values must agree
byte-for-byte — the same invariant the e2e pytest suite asserts, now
enforced by the driver's own gate.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions.identity import ua_pick_py
from crawler_spark.simulator import simulate_crawl
from crawler_spark.sources.mock_web import (
    build_site_graph,
    seeds_df,
    site_graph_df,
)
from crawler_spark.streaming.crawl_loop import CrawlEngine

# The shared fixture: all five mock pagination rules (incl. the POST
# form-paginated feed), two raw-HTML markup shapes, duplicate cross-links,
# redirects, a dont_filter probe site, a cutoff mid-list — PLUS three real
# ported sites (sources/real_sites.py): aajtak (two-level menus filling
# category2, reordered Hindi dates), maharashtratimes (nested menus,
# last-entry dont_filter pagination probe, breadcrumb categories), and
# interaksyon (SELECTOR rules over attribute-jumbled markup, seed-to-list,
# URL-derived category1) — so the driver's gate also certifies the
# real-site registry surface, non-null category2, and the htmlsel selector
# engine end-to-end.
# pages_per_cat/entries_per_page sized so the mock cutoff (60% of the
# per-site timeline = 14 h) sits more than a day before BASE_DT: aajtak's
# dates are DAY-granular (midnight timestamps), so a cutoff inside the
# newest day would cut its whole corpus instead of mid-chain.
FIXTURE_KW = dict(
    n_sites=5,
    cats_per_site=2,
    pages_per_cat=3,
    entries_per_page=4,
    dup_fraction=0.25,
    html_sites=2,
    seed=97,
)
# aajtak + maharashtratimes certify two-level menus / probes / category2;
# interaksyon certifies the SELECTOR rule surface (htmlsel) over jumbled
# markup through the driver's gate; boholchronicle certifies multi-group
# menus with fixed labels and sibling-combinator selectors; latestnews1
# certifies soft-404 skip, list-page-derived category1, menu skip-slice,
# and the body fallback; apkaakhbar certifies the round-4 SIDE-FETCH
# seam (judge_pub_time entry gates) plus the scraped-max-pages POST
# chain; udaybulletin certifies parent-suppressed nested menus,
# label-conditional slug composition, and the unbounded offset API with
# gate-time ≠ stored-time fields.
# PERMANENT roster members and the engine mechanic each one pins through
# the driver's crawl_log gate (do not rotate these out — each is the ONLY
# driver-gated exerciser of its mechanic; the e2e pytest pair covers them
# too, but the oracle fixture is what lands in CORRECTNESS_r*.json):
#   aajtak           two-level menus -> category2 lineage
#   maharashtratimes dont_filter probe + self-refetch pagination
#   interaksyon      selector-rule surface (htmlsel DOM engine)
#   boholchronicle   multi-group menus, sibling-combinator bodies
#   latestnews1      soft-404 detection, skip-slice menus
#   apkaakhbar       in-parse side-fetch gates + scraped-max-pages POST
#   udaybulletin     root-list JSON API, unbounded offset pagination
#   unbox            POST seeds + double-JSON envelope (S5 form chains)
#   hatawtabloid     clearance-cookie fetch identity + /page/N paths
REAL_FIXTURE_SITES = [
    "aajtak", "maharashtratimes", "interaksyon", "boholchronicle",
    "latestnews1", "apkaakhbar", "udaybulletin", "unbox", "hatawtabloid",
]
_FIXTURE_VERSION = 11  # bump when fixture composition/output shape changes

# The recrawl pass (crawl_recrawl_* rows): after pass 1 the first
# RECRAWL_EVICT_N stored request_urls (sorted) are evicted, then a second
# run starts from the seeds — certifying through the driver's gate that a
# recrawl refetches menus/lists and EXACTLY the evicted articles
# (run(recrawl=True) + evict_urls semantics, W5+).
RECRAWL_EVICT_N = 5

# Fixed path the oracle SQL reads — fingerprinted on the fixture config so
# a stale parquet set from an older code version can never be compared.
import hashlib as _hashlib  # noqa: E402

_FP = _hashlib.md5(
    repr((sorted(FIXTURE_KW.items()), REAL_FIXTURE_SITES, _FIXTURE_VERSION))
    .encode()
).hexdigest()[:10]
SIM_ORACLE_DIR = f"/tmp/crawler_spark_sim_oracle_{_FP}"


def fixture_graph() -> dict:
    from crawler_spark.sources.real_sites import build_real_graph

    g = build_site_graph(**FIXTURE_KW)
    # Merge the real-site pages under the mock graph's cutoff (both share
    # the same AS_OF/BASE_DT anchors; the mock cutoff is tighter, so the
    # real sites' time gates trip earlier — still deterministic and
    # identical on both sides of the comparison).
    real = build_real_graph(REAL_FIXTURE_SITES)
    g["pages"].update(real["pages"])
    g["seeds"].extend(real["seeds"])
    g["registry"].update(real["registry"])
    return g


# Prioritized-crawl fixture inputs (crawl_prioritized_log): a
# deterministic "previous crawl's" host link graph — ring plus hub spokes
# over the fixture's seed hosts — whose PageRank mass is deliberately
# non-uniform, and a global fetch budget tight enough (2 slots/host
# average, min 1) that both the authority-weighted ORDERING and the
# apportioned admission caps really reshape the crawl. Cho, Garcia-Molina
# & Page 1998: crawl ordering by importance estimated from a prior crawl.
PRIORITIZED_BUDGET_PER_HOST = 2
PRIORITIZED_MIN_PER_HOST = 1


def fixture_host_edges() -> list[tuple[str, str]]:
    from crawler_spark.simulator import _host

    hosts = sorted({_host(s["url"]) for s in fixture_graph()["seeds"]})
    hub = hosts[0]
    edges = [
        (hosts[i], hosts[(i + 1) % len(hosts)]) for i in range(len(hosts))
    ]
    edges += [(h, hub) for h in hosts[1:]]
    return sorted(set(edges))


# Trap-guard fixture (crawl_trap_guard_log): the fixture graph plus a
# calendar-mill host (mock_web.add_trap_site — every URL 8 segments deep).
# Pass 1 crawls unguarded; detect_traps over its admitted URLs flags the
# mill by the DEEP signal alone (fixture thresholds: the volume floor sits
# above every legit fixture host, dominance is disabled because bounded
# JSON sites legitimately serve one template); pass 2 clamps flagged
# hosts' admission to TRAP_GUARD_BUDGET per batch — IRLbot's
# reputation-throttled quarantine, not a blacklist. Engine uses the Spark
# operator, the simulator its pure-Python mirror; the pass-2 ordered log
# must match byte-for-byte.
TRAP_GUARD_MIN_URLS = 20
TRAP_GUARD_DOMINANCE_BP = 10_001  # > 10000 = disabled at fixture scale
TRAP_GUARD_BUDGET = 2

# URL-filter-guarded fixture (crawl_url_filter_log): the RefinedWeb
# §3.1.2 pre-admission filter runs INSIDE the engine (crawl_loop step 0)
# with the simulator fed the pure-Python mirror. The config blocklists
# one whole mock host (its seed is dropped in batch 0 — the site never
# crawls) and hard-drops the c=1/p=0 article shard via a scored word,
# while "?page=" only FLAGS (kept) — so the log exercises all three
# actions and must still match byte-for-byte.
URL_FILTER_CFG = dict(
    blocklist_hosts=["site3.example.com"],
    scored_words=[("_1_0_", 300), ("?page=", 120)],
    flag_bp=100,
    drop_bp=300,
)


def fixture_trap_graph() -> dict:
    from crawler_spark.sources.mock_web import add_trap_site

    return add_trap_site(fixture_graph())


# ---------------------------------------------------------------------------
# Oracle side: simulator outputs → parquet for DuckDB
# ---------------------------------------------------------------------------

def _docs_tables(sim: dict) -> tuple[pa.Table, pa.Table]:
    """(sim_docs, sim_spans) with types matching the engine's schemas
    exactly (int32 where Spark emits int, so the pandas dtypes the gate
    reprs agree). Built from docs_rows — the exact stored-table content,
    duplicates included (pipelines.py INSERTs one row per item with no
    unique key)."""
    doc_rows = sorted(
        ((d["doc_id"], d) for d in sim["docs_rows"]),
        key=lambda kv: (kv[0], repr(sorted(
            (k, v) for k, v in kv[1].items() if k != "spans"
        ))),
    )
    docs = pa.table(
        {
            "doc_id": pa.array([k for k, _ in doc_rows], pa.string()),
            "title": pa.array([d["title"] for _, d in doc_rows], pa.string()),
            "abstract": pa.array(
                [d["abstract"] for _, d in doc_rows], pa.string()
            ),
            "category1": pa.array(
                [d["category1"] for _, d in doc_rows], pa.string()
            ),
            "category2": pa.array(
                [d["category2"] for _, d in doc_rows], pa.string()
            ),
            "pub_time": pa.array(
                [d["pub_time"] for _, d in doc_rows], pa.string()
            ),
            "request_url": pa.array(
                [d["request_url"] for _, d in doc_rows], pa.string()
            ),
            "response_url": pa.array(
                [d["response_url"] for _, d in doc_rows], pa.string()
            ),
            "website_id": pa.array(
                [d["website_id"] for _, d in doc_rows], pa.int32()
            ),
            "language_id": pa.array(
                [d["language_id"] for _, d in doc_rows], pa.int32()
            ),
            "html": pa.array([d.get("html") for _, d in doc_rows], pa.string()),
        }
    )
    span_cols: dict[str, list] = {
        "doc_id": [], "offset": [], "kind": [], "text": [], "media_ref": []
    }
    for doc_id, d in doc_rows:
        for s in d["spans"]:
            span_cols["doc_id"].append(doc_id)
            span_cols["offset"].append(s["offset"])
            span_cols["kind"].append(s["kind"])
            span_cols["text"].append(s["text"])
            span_cols["media_ref"].append(s["media_ref"])
    spans = pa.table(
        {
            "doc_id": pa.array(span_cols["doc_id"], pa.string()),
            "offset": pa.array(span_cols["offset"], pa.int32()),
            "kind": pa.array(span_cols["kind"], pa.string()),
            "text": pa.array(span_cols["text"], pa.string()),
            "media_ref": pa.array(span_cols["media_ref"], pa.string()),
        }
    )
    return docs, spans


def _log_table(sim: dict) -> pa.Table:
    """The ordered crawl log with its canonical rank materialized as data —
    the crawl-ORDERING invariant, comparable by an order-insensitive gate."""
    rows = sim["crawl_log_full"]
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), pa.int32()),
            "batch_id": pa.array([r["batch_id"] for r in rows], pa.int32()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "host": pa.array([r["host"] for r in rows], pa.string()),
            "method": pa.array([r["method"] for r in rows], pa.string()),
            "body": pa.array([r["body"] for r in rows], pa.string()),
            "attempt": pa.array([r["attempt"] for r in rows], pa.int32()),
            "ua": pa.array([ua_pick_py(r["url"]) for r in rows], pa.string()),
        }
    )


def _metrics_table(sim: dict) -> pa.Table:
    rows = sorted(sim["metrics"])
    return pa.table(
        {
            "batch_id": pa.array([r[0] for r in rows], pa.int32()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "scheduled": pa.array([r[2] for r in rows], pa.int64()),
            "deduped": pa.array([r[3] for r in rows], pa.int64()),
            "fetched": pa.array([r[4] for r in rows], pa.int64()),
            "bytes": pa.array([r[5] for r in rows], pa.int64()),
            "max_depth": pa.array([r[6] for r in rows], pa.int32()),
        }
    )


def ensure_sim_outputs(out_dir: str = SIM_ORACLE_DIR) -> str:
    """Run the simulator on the fixture and write its outputs as parquet
    (idempotent: skipped when the marker file exists). Pure Python + Arrow
    — milliseconds, no Spark."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    sim = simulate_crawl(fixture_graph())
    tmp = tempfile.mkdtemp(prefix="sim_oracle_", dir="/tmp")
    docs, spans = _docs_tables(sim)
    pq.write_table(docs, os.path.join(tmp, "sim_docs.parquet"))
    pq.write_table(spans, os.path.join(tmp, "sim_spans.parquet"))
    pq.write_table(_log_table(sim), os.path.join(tmp, "sim_log.parquet"))
    pq.write_table(_metrics_table(sim), os.path.join(tmp, "sim_metrics.parquet"))
    # pass 2: evict, then recrawl with the surviving seen set
    evict = sorted({d["request_url"] for d in sim["docs_rows"]})
    evict = set(evict[:RECRAWL_EVICT_N])
    sim2 = simulate_crawl(
        fixture_graph(), url_seen_init=sim["url_seen"] - evict
    )
    docs2, _ = _docs_tables(sim2)
    pq.write_table(docs2, os.path.join(tmp, "sim_recrawl_docs.parquet"))
    pq.write_table(
        _log_table(sim2), os.path.join(tmp, "sim_recrawl_log.parquet")
    )
    # prioritized pass: authority + apportioned budgets from the pure-
    # Python mirrors (integer-identical to the Spark operators the engine
    # side uses — asserted in tests/test_linkgraph.py).
    from crawler_spark.operators.linkgraph import (
        allocate_budget_py,
        host_pagerank_py,
    )

    edges = fixture_host_edges()
    auth = host_pagerank_py(edges)
    budgets = allocate_budget_py(
        auth,
        total_budget=PRIORITIZED_BUDGET_PER_HOST * len(auth),
        min_per_host=PRIORITIZED_MIN_PER_HOST,
    )
    sim3 = simulate_crawl(
        fixture_graph(), authority=auth, host_budgets=budgets
    )
    pq.write_table(
        _log_table(sim3), os.path.join(tmp, "sim_prioritized_log.parquet")
    )
    # trap-guard pass: unguarded crawl of the trap-augmented fixture, the
    # pure-Python trap detector over its admitted URLs, then the guarded
    # re-crawl with flagged hosts clamped.
    from crawler_spark.operators.traps import detect_traps_py

    tg = fixture_trap_graph()
    sim4 = simulate_crawl(tg)
    flagged = detect_traps_py(
        [r["url"] for r in sim4["crawl_log_full"]],
        min_urls=TRAP_GUARD_MIN_URLS,
        dominance_bp=TRAP_GUARD_DOMINANCE_BP,
    )
    sim5 = simulate_crawl(
        tg,
        host_budgets={f["host"]: TRAP_GUARD_BUDGET for f in flagged},
    )
    pq.write_table(
        _log_table(sim5), os.path.join(tmp, "sim_trap_guard_log.parquet")
    )
    # URL-filter pass: the plain fixture crawled under the RefinedWeb
    # pre-admission filter (pure-Python mirror drives the simulator).
    sim6 = simulate_crawl(fixture_graph(), url_filter=URL_FILTER_CFG)
    pq.write_table(
        _log_table(sim6), os.path.join(tmp, "sim_url_filter_log.parquet")
    )
    with open(os.path.join(tmp, "_COMPLETE"), "w") as fh:
        fh.write("ok")
    # Atomic publish: another process may be racing; first rename wins.
    try:
        os.rename(tmp, out_dir)
    except OSError:
        pass  # already published
    return out_dir


# ---------------------------------------------------------------------------
# Spark side: engine outputs as DataFrames (one engine run per process)
# ---------------------------------------------------------------------------

_ENGINE_CACHE: dict[str, object] = {}


def engine_results(spark: SparkSession) -> dict:
    """Run the CrawlEngine once on the fixture (memoized per process) and
    return its results dict (docs / crawl_log / metrics DataFrames)."""
    key = "r"
    if key in _ENGINE_CACHE:
        return _ENGINE_CACHE[key]
    graph = fixture_graph()
    ckpt = tempfile.mkdtemp(prefix="crawl_oracle_ckpt_")
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, graph),
        registry=graph["registry"],
        seeds=seeds_df(spark, graph),
        cutoff_epoch=graph["cutoff_epoch"],
        as_of=graph["as_of"],
        checkpoint_dir=ckpt,
    )
    res = eng.run()
    _ENGINE_CACHE[key] = res
    _ENGINE_CACHE["eng"] = eng
    return res


def engine_prioritized_log(spark: SparkSession) -> DataFrame:
    """The PRIORITIZED crawl's ordered log: a fresh engine over the same
    fixture with (a) per-host authority mass from host_pagerank on the
    prior-crawl link graph added to every T1 priority and (b) per-host
    admission capped by allocate_budget's apportionment — the end-to-end
    'crawl prioritization' contract, byte-identical to the simulator fed
    the pure-Python mirrors of the same two operators."""
    if "rp" in _ENGINE_CACHE:
        return _ENGINE_CACHE["rp"]  # type: ignore[return-value]
    from crawler_spark.operators.linkgraph import (
        allocate_budget,
        host_pagerank,
    )

    graph = fixture_graph()
    edges = fixture_host_edges()
    edges_df = spark.createDataFrame(edges, "src string, dst string")
    ranks = host_pagerank(edges_df).persist()
    budgets = allocate_budget(
        ranks,
        total_budget=PRIORITIZED_BUDGET_PER_HOST * len(
            {h for e in edges for h in e}
        ),
        min_per_host=PRIORITIZED_MIN_PER_HOST,
    )
    ckpt = tempfile.mkdtemp(prefix="crawl_oracle_prio_ckpt_")
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, graph),
        registry=graph["registry"],
        seeds=seeds_df(spark, graph),
        cutoff_epoch=graph["cutoff_epoch"],
        as_of=graph["as_of"],
        checkpoint_dir=ckpt,
        authority=ranks,
        host_budgets=budgets,
    )
    res = eng.run()
    out = _canonical_rank(res["crawl_log"]).select(
        "rank",
        "batch_id", "url", "host", "method", "body", "attempt", "ua",
    )
    _ENGINE_CACHE["rp"] = out
    return out


def engine_trap_guard_log(spark: SparkSession) -> DataFrame:
    """The trap-GUARDED crawl's ordered log: engine pass 1 crawls the
    trap-augmented fixture unguarded, detect_traps (the Spark operator)
    flags the calendar mill from that log's admitted URLs, and pass 2
    re-crawls with the flagged hosts' admission clamped to
    TRAP_GUARD_BUDGET per batch via the host_budgets seam — byte-identical
    to the simulator fed detect_traps_py."""
    if "tg" in _ENGINE_CACHE:
        return _ENGINE_CACHE["tg"]  # type: ignore[return-value]
    from crawler_spark.operators.traps import detect_traps

    graph = fixture_trap_graph()

    def run_once(host_budgets):
        ckpt = tempfile.mkdtemp(prefix="crawl_oracle_trap_ckpt_")
        eng = CrawlEngine(
            spark,
            site_graph=site_graph_df(spark, graph),
            registry=graph["registry"],
            seeds=seeds_df(spark, graph),
            cutoff_epoch=graph["cutoff_epoch"],
            as_of=graph["as_of"],
            checkpoint_dir=ckpt,
            host_budgets=host_budgets,
        )
        return eng.run()

    res1 = run_once(None)
    flagged = detect_traps(
        res1["crawl_log"].select("url"),
        min_urls=TRAP_GUARD_MIN_URLS,
        dominance_bp=TRAP_GUARD_DOMINANCE_BP,
    )
    budgets = flagged.select(
        "host", F.lit(TRAP_GUARD_BUDGET).alias("budget")
    ).persist()
    res2 = run_once(budgets)
    out = _canonical_rank(res2["crawl_log"]).select(
        "rank",
        "batch_id", "url", "host", "method", "body", "attempt", "ua",
    )
    _ENGINE_CACHE["tg"] = out
    return out


def engine_url_filter_log(spark: SparkSession) -> DataFrame:
    """The URL-filter-guarded crawl's ordered log: the engine runs with
    CrawlEngine(url_filter=URL_FILTER_CFG) — the RefinedWeb pre-admission
    filter as a map-side column predicate ahead of every dedup/fetch
    stage — byte-identical to the simulator fed url_quality_action_py."""
    if "uf" in _ENGINE_CACHE:
        return _ENGINE_CACHE["uf"]  # type: ignore[return-value]
    graph = fixture_graph()
    ckpt = tempfile.mkdtemp(prefix="crawl_oracle_uf_ckpt_")
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, graph),
        registry=graph["registry"],
        seeds=seeds_df(spark, graph),
        cutoff_epoch=graph["cutoff_epoch"],
        as_of=graph["as_of"],
        checkpoint_dir=ckpt,
        url_filter=URL_FILTER_CFG,
    )
    res = eng.run()
    out = _canonical_rank(res["crawl_log"]).select(
        "rank",
        "batch_id", "url", "host", "method", "body", "attempt", "ua",
    )
    _ENGINE_CACHE["uf"] = out
    return out


def engine_recrawl(spark: SparkSession) -> tuple[dict, int]:
    """(pass-2 results, pass-2 first batch): evict the deterministic
    subset, then run(recrawl=True) on the SAME checkpoint — memoized.
    Pass-1 DataFrames stay valid (delta dirs are append-only)."""
    if "r2" in _ENGINE_CACHE:
        return _ENGINE_CACHE["r2"], _ENGINE_CACHE["b0"]
    res1 = engine_results(spark)
    eng: CrawlEngine = _ENGINE_CACHE["eng"]  # type: ignore[assignment]
    b0 = res1["last_batch"] + 1
    evict = sorted(
        r.request_url for r in res1["docs"].select("request_url").distinct().collect()
    )[:RECRAWL_EVICT_N]
    eng.evict_urls(
        spark.createDataFrame([(u,) for u in evict], "url string")
    )
    res2 = eng.run(recrawl=True)
    _ENGINE_CACHE["r2"] = res2
    _ENGINE_CACHE["b0"] = b0
    return res2, b0


def engine_docs(spark: SparkSession) -> DataFrame:
    res = engine_results(spark)
    return res["docs"].select(
        "doc_id",
        "title",
        "abstract",
        "category1",
        "category2",
        F.date_format("pub_time", "yyyy-MM-dd HH:mm:ss").alias("pub_time"),
        "request_url",
        "response_url",
        "website_id",
        "language_id",
        "html",
    )


def engine_spans(spark: SparkSession) -> DataFrame:
    res = engine_results(spark)
    return (
        res["docs"]
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def _canonical_rank(log: DataFrame) -> DataFrame:
    """Canonical crawl-log rank (batch_id, priority desc, seq) computed
    scale-safely: a per-batch row_number plus a broadcast per-batch offset
    (cumulative count over the few-rows-per-run batch summary) instead of
    one global unpartitioned window — identical rank values, but the sort
    parallelizes across batches and no single task ever holds the whole
    log."""
    per_batch = Window.partitionBy("batch_id").orderBy(
        F.desc("priority"), "seq"
    )
    counts = log.groupBy("batch_id").agg(F.count(F.lit(1)).alias("_n"))
    # The offset scan runs over the per-batch SUMMARY (one row per
    # micro-batch — bounded by run length, not corpus size): collect the
    # sorted summary in one bounded aggregate and compute each batch's
    # exclusive prefix sum array-side.  Not a window — PySpark 4 folds
    # constant partition keys out of window specs, so the old
    # partitionBy(lit(0)) idiom planned as an unpartitioned window and
    # warned on every execution (functions/ranking.py has the rationale).
    offs = (
        counts.agg(
            F.sort_array(
                F.collect_list(F.struct("batch_id", "_n"))
            ).alias("_a")
        )
        .select(
            F.explode(
                F.transform(
                    F.col("_a"),
                    lambda x, i: F.struct(
                        x["batch_id"].alias("batch_id"),
                        F.aggregate(
                            F.slice(F.col("_a"), F.lit(1), i),
                            F.lit(0).cast("long"),
                            lambda acc, y: acc + y["_n"],
                        ).alias("_off"),
                    ),
                )
            ).alias("_kv")
        )
        .select("_kv.batch_id", "_kv._off")
    )
    return (
        log.withColumn("_rb", F.row_number().over(per_batch))
        .join(F.broadcast(offs), "batch_id")
        .withColumn("rank", (F.col("_off") + F.col("_rb")).cast("int"))
    )


def engine_log(spark: SparkSession) -> DataFrame:
    """Crawl log with the canonical rank (batch_id, priority desc, seq)
    materialized — the ordering contract as data."""
    res = engine_results(spark)
    return _canonical_rank(res["crawl_log"]).select(
        "rank",
        "batch_id", "url", "host", "method", "body", "attempt", "ua",
    )


def engine_categories(spark: SparkSession) -> DataFrame:
    """Per-(category1, category2) document rollup — certifies that the
    two-level menu lineage (aajtak) and breadcrumb overrides
    (maharashtratimes) really fill category2 end-to-end (VERDICT r2 'Next
    round #7'); mock-site docs keep category2 null, so both populations
    must appear."""
    res = engine_results(spark)
    return (
        res["docs"]
        .groupBy("category1", "category2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def engine_recrawl_log(spark: SparkSession) -> DataFrame:
    """Pass-2 crawl log, batch ids remapped to the simulator's 0-based
    numbering — certifies the per-run dupefilter reset (menus/lists
    refetch) and that only never-stored/evicted articles are fetched."""
    res2, b0 = engine_recrawl(spark)
    scoped = res2["crawl_log"].filter(F.col("batch_id") >= F.lit(b0))
    return _canonical_rank(scoped).select(
        "rank",
        (F.col("batch_id") - F.lit(b0)).cast("int").alias("batch_id"),
        "url", "host", "method", "body", "attempt", "ua",
    )


def engine_recrawl_docs(spark: SparkSession) -> DataFrame:
    """Pass-2 stored documents — must be EXACTLY the evicted articles,
    re-stored (the eviction + recrawl contract)."""
    res2, b0 = engine_recrawl(spark)
    eng: CrawlEngine = _ENGINE_CACHE["eng"]  # type: ignore[assignment]
    cut = eng.base_epoch + b0 * eng.batch_seconds
    return (
        res2["docs"]
        .filter(F.unix_timestamp("cole_time") >= F.lit(cut))
        .select(
            "doc_id",
            "title",
            "abstract",
            "category1",
            "category2",
            F.date_format("pub_time", "yyyy-MM-dd HH:mm:ss").alias("pub_time"),
            "request_url",
            "response_url",
            "website_id",
            "language_id",
            "html",
        )
    )


def engine_metrics(spark: SparkSession) -> DataFrame:
    res = engine_results(spark)
    return res["metrics"].select(
        "batch_id", "host", "scheduled", "deduped", "fetched", "bytes",
        "max_depth",
    )
