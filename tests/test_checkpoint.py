"""Checkpoint commit/compaction invariants beyond the e2e run() coverage:
re-entrant and repeated compact() calls (the ADVICE r1 failure: a second
compact to the same upto_batch selected its own output as the lazy read
base, deleted it, then tried to read it)."""

from crawler_spark.streaming.checkpoint import CrawlCheckpoint


def _commit_batches(spark, ckpt, n):
    for b in range(n):
        df = spark.range(b * 10, b * 10 + 5).toDF("v")
        ckpt.commit(b, {"docs": df}, stats={"docs": 5})


def _values(df):
    return sorted(r.v for r in df.collect())


def test_compact_same_batch_twice(spark, tmp_path):
    ckpt = CrawlCheckpoint(spark, str(tmp_path))
    _commit_batches(spark, ckpt, 3)
    expect = _values(ckpt.read_deltas("docs", 2))

    ckpt.compact(2, names=("docs",))
    # re-entrant call with the SAME upto_batch: must be a no-op, not a
    # read-after-delete crash
    ckpt.compact(2, names=("docs",))
    assert _values(ckpt.read_deltas("docs", 2)) == expect


def test_compact_builds_on_previous_compaction(spark, tmp_path):
    ckpt = CrawlCheckpoint(spark, str(tmp_path))
    _commit_batches(spark, ckpt, 5)
    expect = _values(ckpt.read_deltas("docs", 4))

    ckpt.compact(2, names=("docs",))
    # second compaction lazily READS the first as its base while REPLACING
    # the newest-compaction marker set — the temp-dir swap keeps the old
    # snapshot intact until the new one is fully written
    ckpt.compact(4, names=("docs",))
    assert _values(ckpt.read_deltas("docs", 4)) == expect
    # tail reads after the snapshot still work
    assert _values(ckpt.read_deltas("docs", 3)) is not None
