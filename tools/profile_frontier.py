"""Frontier-pipeline scaling profiler.

Times each SUB-pipeline of the frontier bench separately at one
parallelism level so the N-vs-4N sweep can attribute lost scaling
efficiency to a stage (map-only canonicalize/hash, +intra-batch dedup,
+anti-join, +politeness admission). Run via subprocess at two levels:

    SPARK_GRAFT_CPUS=4  python tools/profile_frontier.py
    SPARK_GRAFT_CPUS=16 python tools/profile_frontier.py

Prints one JSON line: {"cpus": N, "stages": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import canonicalize_col, host_of
from crawler_spark.operators.dedup import intra_batch_dedup
from crawler_spark.operators.politeness import admit_per_host
from crawler_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    mult = int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "40"))
    spark = get_spark(
        "frontier-profile", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    par = spark.sparkContext.defaultParallelism * 4
    li = spark.read.parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    ).repartition(par)
    li = li.withColumn("rep", F.explode(F.expr(f"sequence(0, {mult - 1})")))
    raw = F.concat(
        F.lit("HTTP://Site"),
        F.pmod(F.col("l_suppkey"), F.lit(400)).cast("string"),
        F.lit(".Example.COM/item/"), F.col("l_orderkey").cast("string"),
        F.lit("_"), F.col("l_linenumber").cast("string"),
        F.lit("_"), F.col("rep").cast("string"), F.lit("#ref"),
    )
    cand = li.select(
        raw.alias("raw_url"),
        F.lpad(
            F.concat(F.col("l_orderkey").cast("string"), F.lit("."),
                     F.col("l_linenumber").cast("string"), F.lit("."),
                     F.col("rep").cast("string")),
            20, "0",
        ).alias("seq"),
        F.lit(0.0).alias("priority"),
        F.lit(False).alias("dont_filter"),
    )
    li0 = spark.read.parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    ).repartition(spark.sparkContext.defaultParallelism)
    seen = li0.filter(F.col("l_orderkey") % 5 != 0).select(
        F.concat(
            F.lit("http://site"),
            F.pmod(F.col("l_suppkey"), F.lit(400)).cast("string"),
            F.lit(".example.com/item/"), F.col("l_orderkey").cast("string"),
            F.lit("_"), F.col("l_linenumber").cast("string"), F.lit("_0"),
        ).alias("url")
    )

    def canon():
        return cand.select(
            canonicalize_col(F.col("raw_url")).alias("url"),
            host_of(F.col("raw_url")).alias("host"),
            "seq", "priority", "dont_filter",
        ).withColumn("url_hash", F.xxhash64(F.col("url"))).withColumn(
            "crawl_delay", F.lit(0.2)
        )

    def checksum(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(url))").alias("checksum"),
        )

    stages = {
        "scan_explode": lambda: li.agg(F.count(F.lit(1))),
        "canon_hash": lambda: checksum(canon()),
        "plus_dedup": lambda: checksum(intra_batch_dedup(canon())),
        "plus_antijoin": lambda: checksum(
            intra_batch_dedup(canon()).join(seen, on="url", how="left_anti")
        ),
        "plus_admission": lambda: checksum(
            admit_per_host(
                intra_batch_dedup(canon()).join(seen, on="url", how="left_anti"),
                batch_seconds=120.0,
            )[0]
        ),
    }
    out: dict[str, float] = {}
    for name, build in stages.items():
        build().collect()  # warmup (codegen)
        t0 = time.monotonic()
        build().collect()
        out[name] = round(time.monotonic() - t0, 3)
    print(json.dumps({"cpus": cpus, "mult": mult, "stages": out}))


if __name__ == "__main__":
    main()
