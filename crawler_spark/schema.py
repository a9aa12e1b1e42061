"""Canonical schemas for the crawl engine's tables.

The document schema follows the interleaved-span input shape
(BASELINE.json ``input_hint``): body paragraphs and in-body images are one
ordered ``spans`` array, reproducing the reference's order-preserving body
assembly (reference demo/已部署/zeenews.py:119-122 — paragraphs joined in
document order) and image collection (demo/已部署/yehey.py:127-134 — header
image first, then in-paragraph images). The remaining columns mirror the
``news`` MySQL table (reference demo/pipelines.py:9-23).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Scrapy default RETRY_TIMES (the reference never customizes its retry
# middleware — SURVEY §2.7 W3). Single source of truth for BOTH the engine
# (streaming/crawl_loop.py) and the reference-semantics simulator
# (simulator.py): a config drift between them would surface as a confusing
# byte-for-byte parity failure instead of an obvious constant mismatch.
MAX_RETRIES = 2

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 'text' | 'image'
        T.StructField("text", T.StringType()),  # null for kind='image'
        T.StructField("media_ref", T.StringType()),  # null for kind='text'
        T.StructField("offset", T.IntegerType()),  # 0-based document order
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),  # md5(response_url) (pipelines.py:50-52)
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("title", T.StringType()),
        T.StructField("abstract", T.StringType()),  # first paragraph default (items.py:8)
        T.StructField("category1", T.StringType()),
        T.StructField("category2", T.StringType()),
        T.StructField("pub_time", T.TimestampType()),  # normalized (items.py:6)
        T.StructField("cole_time", T.TimestampType()),  # crawl time (pipelines.py:56)
        T.StructField("website_id", T.IntegerType()),
        T.StructField("language_id", T.IntegerType()),
        T.StructField("request_url", T.StringType()),  # dedup key (middlewares.py:51)
        T.StructField("response_url", T.StringType()),  # identity key (pipelines.py:51)
        T.StructField("html", T.StringType()),  # K2 raw page (pipelines.py:74-78,
        # folded into the table per SURVEY §1.4); null for API/JSON sites
    ]
)

# Frontier row: one pending request. ``seq`` is the lineage-stable ordering
# key (parent seq + '.' + zero-padded child index) — never
# monotonically_increasing_id(), which is partition-dependent (SURVEY §4).
# ``method``/``body`` model FormRequest POST pagination (S5 — reference
# demo/已部署/yehey.py:70-71,103): request identity (and Scrapy's dupefilter
# fingerprint) is (url, method, body), while the cross-run URL-seen probe
# stays on url alone, exactly like the reference's middlewares.py:51.
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("seq", T.StringType()),
        T.StructField("parse_kind", T.StringType()),  # menu|list|article|api
        T.StructField("dont_filter", T.BooleanType()),  # middlewares.py:55 bypass
        T.StructField("meta_json", T.StringType()),  # lineage meta, JSON-encoded
        T.StructField("website_id", T.IntegerType()),
        T.StructField("language_id", T.IntegerType()),
        T.StructField("batch_id", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),  # retry count (W3)
        T.StructField("method", T.StringType()),  # GET | POST (S5)
        T.StructField("body", T.StringType()),  # form body, '' for GET
    ]
)

URL_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),  # exact request_url (middlewares.py:51)
        T.StructField("url_hash", T.LongType()),
        T.StructField("first_seen_batch", T.IntegerType()),
    ]
)

SCHEDULED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("batch_id", T.IntegerType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("scheduled", T.LongType()),
        T.StructField("deduped", T.LongType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("max_depth", T.IntegerType()),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("website_id", T.IntegerType()),
        T.StructField("language_id", T.IntegerType()),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("deny_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay", T.DoubleType()),  # default 0.2 s (settings.py:28)
    ]
)

# Mock-web page table (tests/bench only; a real deployment fetches HTTP).
# Keyed by (url, method, body) — POST form pages share one URL and differ
# only in body (yehey.py:70-104 infinite scroll). ``required_cookie``
# models a Cloudflare-style clearance gate (no_pass/cloudfare/
# hatawtabloid.py:28,37): the response payload is usable only when the
# request carries that Cookie header.
SITE_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("response_url", T.StringType()),  # != url on redirect
        T.StructField("kind", T.StringType()),  # menu|list|article|api
        T.StructField("payload", T.StringType()),  # JSON body the mock fetch returns
        T.StructField("host", T.StringType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("fail_times", T.IntegerType()),  # first N fetches fail (W3)
        T.StructField("required_cookie", T.StringType()),  # nullable gate
    ]
)
