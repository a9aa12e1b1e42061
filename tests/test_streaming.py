"""Structured Streaming surfaces: watermarked windowed metrics (append
mode emits each window exactly once, late data dropped) and the stateful
streaming URL-seen operator (state survives a restart via checkpoint)."""

from datetime import datetime

from pyspark.sql import functions as F

from crawler_spark.streaming.stream import (
    FETCH_EVENT_SCHEMA,
    hourly_host_metrics_stream,
    streaming_url_seen,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, FETCH_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _ev(h, m, host, url, nbytes=100):
    return (datetime(2024, 1, 1, h, m), host,
            f"http://{host}/{url}", hash((host, url)) % (1 << 40), nbytes)


def test_hourly_metrics_watermark_append(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two hosts, hours 00 and 01
    _write_events(spark, src, [
        _ev(0, 5, "a.test", "x", 100), _ev(0, 40, "a.test", "y", 200),
        _ev(1, 10, "b.test", "z", 300),
    ])
    hourly_host_metrics_stream(spark, src, out, ckpt)

    # batch 2: hour 05 data pushes the watermark (2h) past hours 0-1,
    # finalizing those windows; the restart recovers watermark state
    # from the checkpoint.
    _write_events(spark, src, [_ev(5, 0, "a.test", "w", 50)])
    hourly_host_metrics_stream(spark, src, out, ckpt)

    got = {
        (r.win_start.hour, r.host): (r.n_fetches, r.bytes)
        for r in spark.read.parquet(out).collect()
    }
    assert got[(0, "a.test")] == (2, 300)
    assert got[(1, "b.test")] == (1, 300)


def test_streaming_url_seen_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_events(spark, src, [
        _ev(0, 1, "a.test", "u1"), _ev(0, 2, "a.test", "u2"),
        _ev(0, 3, "a.test", "u1"),  # dup within the batch
        _ev(0, 4, "b.test", "u1"),
    ])
    streaming_url_seen(spark, src, out, ckpt)

    r1 = {r.host: (r.batch_new, r.total_seen)
          for r in spark.read.parquet(out).collect()}
    assert r1["a.test"] == (2, 2)
    assert r1["b.test"] == (1, 1)

    # second run = a RESTART: u2 is already in per-host state (recovered
    # from the checkpoint), so only u3 is new for a.test
    _write_events(spark, src, [
        _ev(1, 1, "a.test", "u2"), _ev(1, 2, "a.test", "u3"),
    ])
    streaming_url_seen(spark, src, out, ckpt)

    rows = spark.read.parquet(out).collect()
    a_rows = sorted(
        [(r.batch_new, r.total_seen) for r in rows if r.host == "a.test"]
    )
    assert a_rows == [(1, 3), (2, 2)]


def test_streaming_url_seen_state_bounded_by_bloom_tier(spark, tmp_path):
    """Beyond ``exact_max`` the per-host state converts to a FIXED-SIZE
    bloom bitset (ADVICE r2 #2): dedup keeps working across triggers and
    restarts, counts stay exact-or-lower-bound, and state stops growing
    with the URL count."""
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_events(spark, src,
                  [_ev(0, 1, "big.test", f"u{i}") for i in range(80)])
    streaming_url_seen(spark, src, out, ckpt, exact_max=16)

    r1 = {r.host: (r.batch_new, r.total_seen)
          for r in spark.read.parquet(out).collect()}
    assert r1["big.test"] == (80, 80)  # first batch counted exactly

    # Restart with 40 repeats + 40 genuinely new: repeats must NOT count
    # (bloom has no false negatives); new ones count modulo rare FPs.
    _write_events(spark, src,
                  [_ev(1, 1, "big.test", f"u{i}") for i in range(40, 120)])
    streaming_url_seen(spark, src, out, ckpt, exact_max=16)

    rows = [(r.batch_new, r.total_seen)
            for r in spark.read.parquet(out).collect()
            if r.host == "big.test"]
    second = [r for r in rows if r != (80, 80)]
    assert len(second) == 1
    batch_new, total = second[0]
    assert batch_new <= 40  # repeats never re-counted
    assert batch_new >= 38  # ≥ new minus a rare FP or two
    assert total == 80 + batch_new
