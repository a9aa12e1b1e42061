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
