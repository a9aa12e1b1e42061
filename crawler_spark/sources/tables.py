"""Table IO.

``load_tables`` reads the driver-provided parquet star schema
(/root/testdata/sf*/ — TESTDATA.md).

``SnapshotTable`` is the Iceberg seam (SURVEY §7.4): local PySpark ships no
Iceberg jars and the sandbox has no network for --packages, so appends are
emulated with Iceberg's core trick — write new data files, then commit by
atomically renaming a new manifest listing all live files. Readers only
ever see manifest-listed files, so a killed writer leaves no torn state.
On a real cluster the same call sites switch to ``df.writeTo(...)`` with an
Iceberg catalog — config, not code.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in TABLE_NAMES
    }


class SnapshotTable:
    """Append-only table with atomic snapshot commits (manifest swap)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def _read_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"snapshot": 0, "files": []}
        with open(p) as fh:
            return json.load(fh)

    def append(self, df: DataFrame) -> int:
        """Write df as new parquet files, then commit via atomic rename.
        Returns the new snapshot id."""
        man = self._read_manifest()
        file_id = uuid.uuid4().hex
        data_dir = os.path.join(self.path, "data", file_id)
        df.write.mode("overwrite").parquet(data_dir)
        new = {
            "snapshot": man["snapshot"] + 1,
            "files": man["files"] + [os.path.join("data", file_id)],
        }
        tmp = self._manifest_path() + f".tmp.{file_id}"
        with open(tmp, "w") as fh:
            json.dump(new, fh)
        os.replace(tmp, self._manifest_path())  # atomic commit point
        return new["snapshot"]

    def read(self) -> DataFrame | None:
        man = self._read_manifest()
        if not man["files"]:
            return None
        paths = [os.path.join(self.path, f) for f in man["files"]]
        return self.spark.read.parquet(*paths)

    def snapshot(self) -> int:
        return self._read_manifest()["snapshot"]


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jars are on the JVM classpath
    (they are not in this sandbox; on a real cluster they arrive via
    --packages/--jars — config, not code)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergTable:
    """The same append/read/snapshot contract as ``SnapshotTable``, backed
    by a real Iceberg catalog table via the DataFrameWriterV2 API. Chosen
    by ``make_table`` when the runtime jars are present; every call site
    is written against the shared contract so the swap is configuration."""

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier

    def _exists(self) -> bool:
        try:
            return self.spark.catalog.tableExists(self.identifier)
        except Exception:
            return False

    def append(self, df: DataFrame) -> int:
        if self._exists():
            df.writeTo(self.identifier).append()
        else:
            df.writeTo(self.identifier).create()
        return self.snapshot()

    def read(self) -> DataFrame | None:
        if not self._exists():
            return None
        return self.spark.read.table(self.identifier)

    def snapshot(self) -> int:
        if not self._exists():
            return 0
        return self.spark.read.table(
            f"{self.identifier}.snapshots"
        ).count()


def make_table(
    spark: SparkSession, location: str, identifier: str | None = None
):
    """The Iceberg seam (SURVEY §7.4) as a factory: an ``IcebergTable``
    when an identifier is given and the Iceberg jars resolve, else the
    manifest-swap ``SnapshotTable`` over ``location``. Both satisfy the
    same append/read/snapshot contract (tests/test_tables_contract.py)."""
    if identifier is not None and iceberg_available(spark):
        return IcebergTable(spark, identifier)
    return SnapshotTable(spark, location)
