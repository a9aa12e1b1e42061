"""Spider-trap detection over the URL frontier.

Crawler traps — calendar pages, session-id mills, self-linking loops —
generate unbounded URL families that a polite BFS crawler will happily
drain its per-host budget into (the reference crawler has no guard: its
only defenses are the URL-seen probe, middlewares.py:50-68, and the
per-spider time cutoff). The classic large-crawl countermeasures are
host-level heuristics: IRLbot budgets hosts by reputation (Lee et al.,
WWW 2008, "IRLbot: Scaling to 6 Billion Pages and Beyond" §5), and
Heritrix/Mercator flag pathological path shapes. This operator computes
the standard three signals per host, all as engine-exact integer
arithmetic over one pass of the frontier:

- **deep paths**: segment depth ≥ ``max_depth`` (calendar/archive mills
  nest /2021/05/30/...).
- **looping paths**: the same path segment repeated — measured as
  ``segments − distinct segments ≥ rep_k`` (catches /a/b/a/b/a/b without
  regex backreferences, which RE2-based engines don't support).
- **template dominance**: digit-runs collapsed to ``N`` (the Mercator
  URL-pattern normalization); a host whose single busiest template
  carries ≥ ``dominance_bp``/10000 of its URLs at volume is a mill.

Output: one row per FLAGGED host with its counts and the dominant
reason (priority deep > loop > dominance — a host tripping several
signals reports the strongest evidence class).

Scale shape (10^10-URL frontier): project/filter map-side → one
partial-agg groupBy (host, template) → one host-partitioned window +
final host agg. No global window, no collect; host skew is bounded by
template cardinality after digit collapsing, and AQE splits stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import host_of

MAX_DEPTH = 8
REP_K = 3
DOMINANCE_BP = 6_000  # busiest template ≥ 60% of the host's URLs
MIN_URLS = 50


def detect_traps(
    urls: DataFrame,
    url_col: str = "url",
    max_depth: int = MAX_DEPTH,
    rep_k: int = REP_K,
    dominance_bp: int = DOMINANCE_BP,
    min_urls: int = MIN_URLS,
) -> DataFrame:
    """Flag trap-suspect hosts; see module docstring for the signals."""
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/[^?#]*)", 1
    )
    # split('/a/b/', '/') → ['', 'a', 'b', ''] — drop empties so depth
    # and repetition count real segments only
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    per_url = urls.select(
        host_of(F.col(url_col)).alias("host"),
        F.size(segs).alias("depth"),
        (F.size(segs) - F.size(F.array_distinct(segs))).alias("rep"),
        F.regexp_replace(path, "[0-9]+", "N").alias("template"),
    )
    by_tmpl = per_url.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("depth") >= max_depth, 1).otherwise(0))
        .alias("deep"),
        F.sum(F.when(F.col("rep") >= rep_k, 1).otherwise(0)).alias("loop"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("cnt").desc(), F.col("template").asc()
    )
    hosts = (
        by_tmpl.withColumn("rn", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.sum("cnt").alias("n_urls"),
            F.count(F.lit(1)).alias("n_templates"),
            F.sum("deep").alias("n_deep"),
            F.sum("loop").alias("n_loop"),
            F.max(F.when(F.col("rn") == 1, F.col("template")))
            .alias("top_template"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt")))
            .alias("top_count"),
        )
        .withColumn(
            "top_share_bp",
            # integer basis points: floor((10000·top)/n) — exact in any
            # engine, no float share
            F.floor(F.lit(10_000) * F.col("top_count") / F.col("n_urls"))
            .cast("long"),
        )
    )
    flagged = hosts.filter(
        (F.col("n_urls") >= min_urls)
        & (
            (F.col("n_deep") * 2 >= F.col("n_urls"))
            | (F.col("n_loop") * 2 >= F.col("n_urls"))
            | (F.col("top_share_bp") >= dominance_bp)
        )
    )
    reason = (
        F.when(F.col("n_deep") * 2 >= F.col("n_urls"), F.lit("deep"))
        .when(F.col("n_loop") * 2 >= F.col("n_urls"), F.lit("loop"))
        .otherwise(F.lit("dominance"))
    )
    return flagged.select(
        "host",
        "n_urls",
        "n_templates",
        "n_deep",
        "n_loop",
        "top_template",
        "top_count",
        "top_share_bp",
        reason.alias("reason"),
    )


def detect_traps_py(
    urls: list[str],
    max_depth: int = MAX_DEPTH,
    rep_k: int = REP_K,
    dominance_bp: int = DOMINANCE_BP,
    min_urls: int = MIN_URLS,
) -> list[dict]:
    """Pure-Python mirror of :func:`detect_traps` — same rows, same
    values, no Spark. The reference-semantics simulator uses it to build
    the trap-guard budgets so the engine-vs-simulator crawl parity gate
    covers the guard end-to-end (the allocate_budget_py pattern,
    operators/linkgraph.py). Equality with the Spark operator is pinned
    by tests/test_traps.py."""
    import re
    from collections import Counter, defaultdict

    per_host: dict[str, list] = defaultdict(list)
    for u in urls:
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)", u)
        host = m.group(1).lower() if m else ""
        pm = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/[^?#]*)", u)
        path = pm.group(1) if pm else ""
        segs = [s for s in path.split("/") if s != ""]
        per_host[host].append(
            (len(segs), len(segs) - len(set(segs)),
             re.sub(r"[0-9]+", "N", path))
        )
    out = []
    for host in sorted(per_host):
        rows = per_host[host]
        n_urls = len(rows)
        tmpl = Counter(t for _, _, t in rows)
        deep_by_t: Counter = Counter()
        loop_by_t: Counter = Counter()
        for depth, rep, t in rows:
            if depth >= max_depth:
                deep_by_t[t] += 1
            if rep >= rep_k:
                loop_by_t[t] += 1
        top_template = min(
            tmpl, key=lambda t: (-tmpl[t], t)
        )
        top_count = tmpl[top_template]
        n_deep = sum(deep_by_t.values())
        n_loop = sum(loop_by_t.values())
        top_share_bp = (10_000 * top_count) // n_urls
        if n_urls < min_urls:
            continue
        if not (
            n_deep * 2 >= n_urls
            or n_loop * 2 >= n_urls
            or top_share_bp >= dominance_bp
        ):
            continue
        reason = (
            "deep" if n_deep * 2 >= n_urls
            else "loop" if n_loop * 2 >= n_urls
            else "dominance"
        )
        out.append(
            {
                "host": host,
                "n_urls": n_urls,
                "n_templates": len(tmpl),
                "n_deep": n_deep,
                "n_loop": n_loop,
                "top_template": top_template,
                "top_count": top_count,
                "top_share_bp": top_share_bp,
                "reason": reason,
            }
        )
    return out
