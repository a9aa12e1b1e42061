"""Structured Streaming surfaces over the crawl's event stream.

The crawl engine itself is an iterative micro-batch loop (the reference is
bounded incremental batch, SURVEY §2.11) — but the engine's OUTPUT streams
(crawl_log / fetch events) are naturally unbounded, and a deployment tails
them with real Structured Streaming jobs. Two such jobs live here:

1. ``hourly_host_metrics_stream`` — watermarked tumbling-window per-host
   fetch metrics (the streaming rendering of A4 / q_event_hourly_agg):
   ``readStream`` → ``withWatermark`` → windowed groupBy → append-mode
   parquet sink. Late events beyond the watermark are dropped exactly like
   the crawl drops articles older than the cutoff (P3).

2. ``streaming_url_seen`` — the URL-seen set as a CUSTOM STATEFUL
   streaming operator (``applyInPandasWithState``): per-host state holds
   the set of url hashes seen so far; each micro-batch emits
   (host, batch_new, total_seen). State survives restarts through the
   checkpoint — the streaming twin of the engine's checkpointed seen set.

Both run with ``Trigger.AvailableNow`` in tests: process everything
available, commit the checkpoint, stop — so tests are deterministic and a
second invocation proves watermark/state recovery from checkpoint.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The fetch-event stream schema (a projection of crawl_log + metrics).
FETCH_EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("url_hash", LongType()),
        StructField("bytes", LongType()),
    ]
)

SEEN_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("batch_new", LongType()),
        StructField("total_seen", LongType()),
    ]
)

# State: the host's seen hash set. At 10^10 scale this would be the
# sharded bloom bitset (operators/bloom.py) serialized per group; the
# exact set keeps the test oracle trivial at fixture scale.
SEEN_STATE_SCHEMA = StructType(
    [StructField("hashes", ArrayType(LongType()))]
)


def hourly_host_metrics_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Tumbling 1-hour per-host fetch metrics with late-data handling.

    Append output mode: a window row is emitted exactly once, when the
    watermark passes its end — the streaming contract the batch query
    q_event_hourly_agg approximates. Returns the finished query (blocks
    until the available data is processed)."""
    events = (
        spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "host")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum("bytes").alias("bytes"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "host", "n_fetches", "bytes",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _seen_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-host stateful update: merge this batch's url hashes into the
    seen set; emit how many were new. Arrow-batched — the per-group Python
    touches pandas arrays, never Python-per-row."""
    (host,) = key
    seen: set[int] = set(state.get[0]) if state.exists else set()
    new_count = 0
    for pdf in pdfs:
        hashes = set(int(h) for h in pdf["url_hash"].tolist())
        fresh = hashes - seen
        new_count += len(fresh)
        seen |= fresh
    state.update((sorted(seen),))
    yield pd.DataFrame(
        {"host": [host], "batch_new": [new_count], "total_seen": [len(seen)]}
    )


def streaming_url_seen(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """The URL-seen set as a stateful streaming operator: per-host state
    accumulates url hashes across micro-batches AND restarts (state lives
    in the checkpoint); each trigger appends (host, batch_new, total_seen)
    rows. Returns the finished query."""
    events = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(input_dir)
    out = events.groupBy("host").applyInPandasWithState(
        _seen_update,
        outputStructType=SEEN_OUTPUT_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
