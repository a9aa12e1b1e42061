"""URL canonicalization + hashing.

The reference dedups on the *raw request URL string* (one MySQL probe per
request, reference demo/middlewares.py:51); spiders absolutize hrefs ad hoc
while parsing (e.g. demo/已部署/zeenews.py:50,60,74). We split that into:

- ``resolve_urls_udf``   — relative→absolute resolution at parse time
  (Arrow-batched pandas UDF; needs urljoin semantics).
- ``canonicalize_col``   — byte-stable normalization as pure JVM column
  expressions (lowercase scheme+host, strip default port, strip fragment,
  empty path → '/'). Runs inside whole-stage codegen: the dedup hot path
  never leaves the JVM.
- ``url_hash_col``       — xxhash64 of the canonical URL for bloom/partition
  keys; md5 stays the stored document id for parity (pipelines.py:50-52).

Canonicalization must be byte-stable (it feeds the parity-checked URL-seen
set), so every rule is a deterministic regexp_replace cascade.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def canonicalize_col(url: Column) -> Column:
    """Byte-stable canonical form, pure built-in expressions.

    Rules (in order): strip fragment; lowercase scheme+authority; strip
    default :80 (http) / :443 (https); empty path → '/'.
    """
    # 1. strip fragment
    c = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host[:port] (authority), keep path/query casing
    head = F.lower(F.regexp_extract(c, _SCHEME_HOST, 1))
    tail = F.regexp_replace(c, _SCHEME_HOST, "")
    c = F.when(head == "", c).otherwise(F.concat(head, tail))
    # 3. strip default ports
    c = F.regexp_replace(c, r"^(http://[^/:?#]+):80(?=[/?]|$)", r"$1")
    c = F.regexp_replace(c, r"^(https://[^/:?#]+):443(?=[/?]|$)", r"$1")
    # 4. authority with no path: add '/'
    c = F.regexp_replace(c, r"^([A-Za-z0-9+.\-]+://[^/?#]+)$", r"$1/")
    c = F.regexp_replace(c, r"^([A-Za-z0-9+.\-]+://[^/?#]+)\?", r"$1/?")
    return c


def host_of(url: Column) -> Column:
    """Lowercased host (no port) — the politeness partition key."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)", 1))


def url_hash_col(canonical_url: Column) -> Column:
    """64-bit frontier key. xxhash64 built-in → JVM-side, codegen-friendly.

    The stored document id remains md5(response_url) for reference parity
    (pipelines.py:50-52); this hash is only an engine-internal join/bloom key.
    """
    return F.xxhash64(canonical_url)


@pandas_udf(StringType())
def resolve_urls_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """RFC-3986 relative→absolute resolution, Arrow-batched.

    Mirrors the spiders' ad-hoc absolutizing ('https://zeenews.india.com' +
    href, zeenews.py:50) but correctly for any base. Python is unavoidable
    here (urljoin); it runs once per Arrow batch, never per Spark row.
    """
    out = [
        None if h is None else (h if b is None else urljoin(b, h))
        for b, h in zip(base, href)
    ]
    return pd.Series(out, dtype="object")
