"""Fetch identity — User-Agent rotation + per-site cookies.

The reference fakes browser identity instead of obeying robots: a random
``fake_useragent`` UA per request plus an optional per-request Cookie
(reference demo/middlewares.py:59-62; the Cloudflare clearance workaround
at demo/no_pass/cloudfare/hatawtabloid.py:28,37). Random UA would break
byte-for-byte parity and resume-determinism, so the engine rotates
deterministically: UA = pool[md5(url) mod |pool|] — vectorized as a pure
JVM column expression, mirrored bit-for-bit in the simulator's Python.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small fixed pool standing in for fake_useragent's catalogue.
UA_POOL = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/90.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 Chrome/91.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/89.0",
    "Mozilla/5.0 (Windows NT 10.0; rv:88.0) Gecko/20100101 Firefox/88.0",
)


def ua_pick_col(url: Column) -> Column:
    """Deterministic UA per URL: first 8 md5 hex chars mod pool size —
    identical math in Spark, DuckDB, and Python."""
    idx = F.conv(F.substring(F.md5(url), 1, 8), 16, 10).cast("long") % len(UA_POOL)
    pool = F.array(*[F.lit(u) for u in UA_POOL])
    return F.element_at(pool, (idx + 1).cast("int"))


def ua_pick_py(url: str) -> str:
    """Plain-Python mirror of ua_pick_col."""
    idx = int(hashlib.md5(url.encode("utf-8")).hexdigest()[:8], 16) % len(UA_POOL)
    return UA_POOL[idx]
