"""Property tests for the URL canonicalizer (F10): it feeds the
parity-checked URL-seen set, so it must be idempotent and byte-stable on
arbitrary URL-shaped inputs (SURVEY §2.8)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import canonicalize_col, host_of

scheme = st.sampled_from(["http", "https", "HTTP", "Https"])
host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9\-]{0,10}\.){1,3}[A-Za-z]{2,6}",
                     fullmatch=True)
port = st.sampled_from(["", ":80", ":443", ":8080"])
path = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,12}){0,4}", fullmatch=True)
query = st.one_of(st.just(""),
                  st.from_regex(r"\?[A-Za-z0-9=&_\-]{0,20}", fullmatch=True))
frag = st.one_of(st.just(""),
                 st.from_regex(r"#[A-Za-z0-9]{0,10}", fullmatch=True))
urls = st.builds(lambda s, h, p, pa, q, f: f"{s}://{h}{p}{pa}{q}{f}",
                 scheme, host, port, path, query, frag)


def _canon_batch(spark, batch: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    return [r.c for r in df.select(canonicalize_col(F.col("url")).alias("c"))
            .collect()]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(urls, min_size=1, max_size=8))
def test_canonicalize_idempotent(spark, batch):
    once = _canon_batch(spark, batch)
    twice = _canon_batch(spark, once)
    assert once == twice


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(urls, min_size=1, max_size=8))
def test_canonicalize_invariants(spark, batch):
    out = _canon_batch(spark, batch)
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    hosts = [r.h for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    for u, c, h in zip(batch, out, hosts):
        assert "#" not in c  # fragment stripped
        assert not c.startswith(("HTTP", "Https"))  # scheme lowercased
        assert h == h.lower()
        scheme_host = c.split("://", 1)[0]
        assert scheme_host == scheme_host.lower()
        # default ports stripped
        assert ":80/" not in c.split("?")[0] or not c.startswith("http://")
        # authority always followed by a path
        rest = c.split("://", 1)[1]
        assert "/" in rest
