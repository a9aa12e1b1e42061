"""Adaptive recrawl scheduling from observed change rates.

The reference recrawls every site daily with a fixed epoch cutoff
(start.bat:1 ``-a time=<epoch>``; 88/116 spiders gate pagination on it —
SURVEY §1.3 "incremental crawl cursor"). A frontier at 10^10-URL scale
cannot afford uniform revisit periods: it estimates each URL's change
rate from its own fetch history and schedules the next visit accordingly
(Cho & Garcia-Molina 2003, "Estimating Frequency of Change", ACM TOIT —
the standard incremental-crawler policy).

``revisit_schedule`` consumes the visit log the engine already produces
(crawl_log / documents ``cole_time`` + content fingerprint) and emits the
next-due time per URL:

* change detection = content fingerprint differs from the previous
  visit's (window ``lag`` over the per-URL visit sequence);
* λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / ī  — the bias-corrected
  estimator from §4 of the paper (n comparisons, X detected changes,
  ī = mean inter-visit gap);
* revisit interval = clamp(1/λ̂, min_interval, max_interval); URLs that
  never changed get max_interval (λ̂ → 0).

Whole plan is window + groupBy built-ins — one shuffle on the URL key,
partial-aggregated, no Python — and the output feeds straight into the
frontier's priority term (operators/politeness.py priority_score_col):
overdue URLs score higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revisit_schedule(
    visits: DataFrame,
    min_interval: float = 3600.0,
    max_interval: float = 7 * 86400.0,
) -> DataFrame:
    """Per-URL change-rate estimate and next-due fetch time.

    ``visits``: DataFrame(url string, ts double epoch-seconds, seq —
    deterministic tie-breaker for equal timestamps, sig — any
    equality-comparable content fingerprint column). Returns
    DataFrame(url, n_visits, n_changes, lambda_per_msec,
    revisit_interval, next_due) — λ̂ reported per 10^6 seconds for
    readable magnitudes (0.0 when no change was ever observed),
    ``next_due`` = last visit + clamped 1/λ̂.
    """
    w = Window.partitionBy("url").orderBy("ts", "seq")
    v = visits.withColumn("_prev_sig", F.lag("sig").over(w))
    per_url = v.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum(
            F.when(
                F.col("_prev_sig").isNotNull()
                & (F.col("sig") != F.col("_prev_sig")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.min("ts").alias("_first"),
        F.max("ts").alias("_last"),
    )
    n_cmp = (F.col("n_visits") - 1).cast("double")
    mean_gap = (F.col("_last") - F.col("_first")) / n_cmp
    lam = (
        -F.log(
            (n_cmp - F.col("n_changes") + 0.5) / (n_cmp + 0.5)
        )
        / mean_gap
    )
    # Single visit (no comparisons) or zero observed changes → schedule at
    # the max interval; λ̂ undefined/zero there.
    lam = F.when(
        (F.col("n_visits") > 1) & (F.col("n_changes") > 0), lam
    ).otherwise(F.lit(0.0))
    interval = F.when(lam > 0.0, F.lit(1.0) / lam).otherwise(
        F.lit(float(max_interval))
    )
    interval = F.least(
        F.greatest(interval, F.lit(float(min_interval))),
        F.lit(float(max_interval)),
    )
    # Round the interval (ln() may differ by 1 ulp across engines), then
    # derive next_due as a single unrounded IEEE add of the rounded
    # interval — rounding next_due itself at epoch magnitude (~1.7e9)
    # sits at double precision's edge and tie-breaks differently across
    # engines.
    interval_r = F.round(interval, 6)
    return per_url.select(
        "url",
        "n_visits",
        "n_changes",
        F.round(lam * 1e6, 6).alias("lambda_per_msec"),
        interval_r.alias("revisit_interval"),
        (F.col("_last") + interval_r).alias("next_due"),
    )


def revisit_sql(
    visits_sql: str,
    min_interval: float = 3600.0,
    max_interval: float = 7 * 86400.0,
) -> str:
    """Exact ANSI-SQL mirror of :func:`revisit_schedule` for the DuckDB
    oracle. ``visits_sql`` must select columns (url, ts, seq, sig)."""
    mn, mx = float(min_interval), float(max_interval)
    return f"""
WITH visits AS ({visits_sql}),
lagged AS (
  SELECT url, ts, sig,
         LAG(sig) OVER (PARTITION BY url ORDER BY ts, seq) AS prev_sig
  FROM visits
),
per_url AS (
  SELECT url,
         COUNT(*) AS n_visits,
         CAST(SUM(CASE WHEN prev_sig IS NOT NULL AND sig <> prev_sig
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         MIN(ts) AS first_ts,
         MAX(ts) AS last_ts
  FROM lagged GROUP BY url
),
est AS (
  SELECT url, n_visits, n_changes, last_ts,
         CASE WHEN n_visits > 1 AND n_changes > 0 THEN
           -LN((CAST(n_visits - 1 AS DOUBLE) - n_changes + 0.5)
               / (CAST(n_visits - 1 AS DOUBLE) + 0.5))
           / ((last_ts - first_ts) / CAST(n_visits - 1 AS DOUBLE))
         ELSE 0.0 END AS lam
  FROM per_url
),
clamped AS (
  SELECT url, n_visits, n_changes, last_ts, lam,
         ROUND(LEAST(GREATEST(CASE WHEN lam > 0.0 THEN 1.0 / lam
                                   ELSE {mx} END, {mn}), {mx}), 6) AS ivl
  FROM est
)
SELECT url, n_visits, n_changes,
       ROUND(lam * 1e6, 6) AS lambda_per_msec,
       ivl AS revisit_interval,
       last_ts + ivl AS next_due
FROM clamped ORDER BY url
"""
