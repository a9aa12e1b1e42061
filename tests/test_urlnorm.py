"""Canonicalizer golden pairs (SURVEY §5 test 1). Byte-stability matters:
this feeds the parity-checked URL-seen set."""

from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import (
    canonicalize_col,
    host_of,
    resolve_urls_udf,
    url_hash_col,
)

GOLDEN = [
    ("http://Example.COM/Path?Q=1#frag", "http://example.com/Path?Q=1"),
    ("HTTPS://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com?q=2", "https://example.com/?q=2"),
    ("http://site0.example.com/a/1_2_3", "http://site0.example.com/a/1_2_3"),
    ("not a url", "not a url"),
]


def test_canonicalize_golden(spark):
    df = spark.createDataFrame([(a,) for a, _ in GOLDEN], "url string")
    got = [r.c for r in df.select(canonicalize_col(F.col("url")).alias("c")).collect()]
    assert got == [b for _, b in GOLDEN]


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame([(b,) for _, b in GOLDEN], "url string")
    got = [r.c for r in df.select(canonicalize_col(F.col("url")).alias("c")).collect()]
    assert got == [b for _, b in GOLDEN]


def test_host_of(spark):
    df = spark.createDataFrame(
        [("http://A.example.com:8080/x?y#z",), ("https://b.example.com/",)],
        "url string",
    )
    got = [r.h for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["a.example.com", "b.example.com"]


def test_url_hash_deterministic(spark):
    df = spark.createDataFrame([("http://x.com/a",)] * 3, "url string")
    got = {r.h for r in df.select(url_hash_col(F.col("url")).alias("h")).collect()}
    assert len(got) == 1


def test_resolve_urls(spark):
    df = spark.createDataFrame(
        [
            ("http://h.com/dir/page", "/abs"),
            ("http://h.com/dir/page", "rel"),
            ("http://h.com/dir/page", "http://other.com/x"),
            ("http://h.com/dir/page", None),
        ],
        "base string, href string",
    )
    got = [
        r.u
        for r in df.select(
            resolve_urls_udf(F.col("base"), F.col("href")).alias("u")
        ).collect()
    ]
    assert got == [
        "http://h.com/abs",
        "http://h.com/dir/rel",
        "http://other.com/x",
        None,
    ]
