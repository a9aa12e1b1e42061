"""Distributed cardinality sketches over the crawl frontier.

``hll_distinct`` is a deterministic HyperLogLog (Flajolet et al. 2007)
per-group distinct counter: the per-host "how many unique URLs have we
seen" statistic a 10^10-URL frontier needs without ever shuffling the
URLs themselves. Spark's built-in ``approx_count_distinct`` is the same
algorithm, but its register layout is engine-private — this operator
keeps the registers as PLAIN COLUMNS (md5-derived bucket + leading-zero
rank), so the DuckDB oracle computes the identical estimate bit-for-bit,
the registers themselves are mergeable state (max is associative — the
same property that lets micro-batches OR bloom shards incrementally),
and the estimate is reproducible across engines and parallelism.

Scale shape: one partial-agg groupBy(host, bucket) max — at most 256
combiner cells per host per task regardless of URL volume — then one
tiny groupBy(host) over hosts×256 rows. No window, no distinct on URLs,
no driver state. The register rank is capped at 40 (P[rho > 40] ≈ 2^-40
per hash; the cap keeps the 2^(40-rho) summands exact in int64).

Reference capability anchored: the reference's only frontier statistic
is the MySQL row count its report job issues per site (baogao.py:56);
this is the sketch that replaces COUNT(DISTINCT) at frontier scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawler_spark.functions.text import md5_long60

HLL_M = 256          # registers per group (2^8 buckets from the low byte)
HLL_RHO_CAP = 40
# alpha_256 * m^2 * 2^cap — one shared double literal so the final
# division is the only float op (correctly rounded from exact bigints,
# hence identical in Spark and DuckDB).
HLL_ALPHA_256 = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMERATOR = HLL_ALPHA_256 * HLL_M * HLL_M * float(2 ** HLL_RHO_CAP)


def hll_distinct(
    urls: DataFrame,
    group_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Per-``group_col`` HLL distinct estimate of ``url_col``:
    ``(group, n_registers_set, hll_estimate)``.

    h = md5_long60(url) (60 uniform bits); bucket = h mod 256; rank =
    leading-zero count of the remaining 52 bits + 1, via the exact
    string identity bitlen(v) = length(bin(v)) — no float log anywhere.
    Raw estimator only (no small-range linear counting: ln() is not
    bit-reproducible across libm builds; callers counting < 2.5m
    distinct per group should use an exact groupBy instead)."""
    h = urls.select(
        F.col(group_col).alias("g"), md5_long60(F.col(url_col)).alias("hv")
    )
    rb = h.select(
        "g",
        F.pmod(F.col("hv"), F.lit(HLL_M)).alias("bucket"),
        F.least(
            F.lit(53) - F.length(F.bin(F.expr("hv div 256"))),
            F.lit(HLL_RHO_CAP),
        ).alias("rho"),
    )
    reg = rb.groupBy("g", "bucket").agg(F.max("rho").alias("reg"))
    full = (
        h.select("g").distinct()
        .select("g", F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1)))
                .alias("bucket"))
        .join(reg, on=["g", "bucket"], how="left")
        .withColumn("reg", F.coalesce("reg", F.lit(0)))
    )
    s = full.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - reg)")).alias("s"),
        F.sum(F.when(F.col("reg") > 0, 1).otherwise(0)).cast("bigint")
        .alias("n_registers_set"),
    )
    return s.select(
        F.col("g").alias(group_col),
        "n_registers_set",
        F.round(F.lit(HLL_NUMERATOR) / F.col("s"), 3).alias("hll_estimate"),
    )


def hll_distinct_sql(
    from_clause: str,
    group_col: str = "host",
    url_col: str = "url",
) -> str:
    """DuckDB oracle: the same registers and the same single float op.
    ``from_clause`` supplies the URL relation (``FROM ...`` subquery with
    columns ``host`` and ``url``)."""
    return f"""
        WITH h AS (
          SELECT {group_col} AS g,
                 ('0x' || substr(md5({url_col}), 1, 15))::bigint AS hv
          {from_clause}),
        rb AS (
          SELECT g, hv % {HLL_M} AS bucket,
                 least(53 - length(bin(hv // 256)), {HLL_RHO_CAP}) AS rho
          FROM h),
        reg AS (SELECT g, bucket, max(rho) AS reg FROM rb GROUP BY 1, 2),
        gs AS (SELECT DISTINCT g FROM h),
        b AS (SELECT unnest(range(0, {HLL_M})) AS bucket),
        filled AS (
          SELECT gs.g, b.bucket, coalesce(reg.reg, 0) AS reg
          FROM gs CROSS JOIN b
          LEFT JOIN reg ON reg.g = gs.g AND reg.bucket = b.bucket),
        s AS (
          SELECT g, sum(1::bigint << ({HLL_RHO_CAP} - reg)) AS s,
                 cast(sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS bigint)
                   AS n_registers_set
          FROM filled GROUP BY g)
        SELECT g AS {group_col}, n_registers_set,
               round({HLL_NUMERATOR!r} / s, 3) AS hll_estimate
        FROM s ORDER BY g
    """
