"""The Iceberg seam contract (SURVEY §7.4): SnapshotTable (manifest-swap
parquet, always available) and IcebergTable (real catalog table when the
iceberg-spark-runtime jars resolve) must satisfy the SAME append/read/
snapshot contract, exercised by one shared routine — proving the swap is
configuration, not code. The Iceberg variant skips in this sandbox (no
jars, no network for --packages) and runs verbatim on a cluster."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.tables import (
    IcebergTable,
    SnapshotTable,
    iceberg_available,
    make_table,
)


def _exercise_contract(spark, table):
    """The contract every table backend must satisfy: empty reads None at
    snapshot 0; each append commits exactly one new snapshot; reads see
    the union of all committed appends."""
    assert table.read() is None
    assert table.snapshot() == 0

    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    s1 = table.append(a)
    assert s1 == 1
    assert {(r.id, r.v) for r in table.read().collect()} == {
        (1, "a"), (2, "b")
    }

    b = spark.createDataFrame([(3, "c")], "id long, v string")
    s2 = table.append(b)
    assert s2 == 2 and table.snapshot() == 2
    assert {(r.id, r.v) for r in table.read().collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }


def test_snapshot_table_contract(spark, tmp_path):
    _exercise_contract(spark, SnapshotTable(spark, str(tmp_path / "t")))


def test_iceberg_table_contract(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jars not on the classpath")
    # V2 catalogs are looked up lazily, so a hadoop-type test catalog can
    # be configured on the live session.
    spark.conf.set(
        "spark.sql.catalog.graft_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.graft_test.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.graft_test.warehouse", str(tmp_path / "wh")
    )
    _exercise_contract(
        spark, IcebergTable(spark, "graft_test.db.contract_docs")
    )


def test_make_table_picks_fallback_without_jars(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), identifier="cat.db.t")
    if iceberg_available(spark):
        assert isinstance(t, IcebergTable)
    else:
        assert isinstance(t, SnapshotTable)
    # No identifier -> always the parquet fallback.
    assert isinstance(
        make_table(spark, str(tmp_path / "t2")), SnapshotTable
    )
