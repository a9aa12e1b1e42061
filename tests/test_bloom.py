"""Bloom prefilter invariants (SURVEY §7.4): ZERO false negatives ever;
false-positive rate within a sane bound of the configured fpp."""

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.operators.bloom import bloom_probe_col, build_bloom


def test_no_false_negatives_and_fp_bound(spark):
    n = 5000
    members = spark.range(n).select(F.xxhash64("id").alias("h"))
    bloom = build_bloom(members, "h", expected_items=n, fpp=0.01)

    # every member must probe positive
    probed = members.select(bloom_probe_col(spark, bloom, "h").alias("m"))
    assert probed.filter(~F.col("m")).count() == 0

    # non-members: FP rate near fpp (generous 5x bound for small samples)
    non = spark.range(n, 3 * n).select(F.xxhash64("id").alias("h"))
    fp = non.select(bloom_probe_col(spark, bloom, "h").alias("m")).filter(
        F.col("m")
    ).count()
    assert fp / (2 * n) < 0.05


def test_partitioned_build_matches_single_partition(spark):
    df = spark.range(2000).select(F.xxhash64("id").alias("h"))
    b_many = build_bloom(df.repartition(8), "h", expected_items=2000)
    b_one = build_bloom(df.coalesce(1), "h", expected_items=2000)
    assert np.array_equal(b_many.bits, b_one.bits)
    assert b_many.num_hashes == b_one.num_hashes
