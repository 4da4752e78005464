"""Real-Iceberg adapter for the SnapStore verb contract (SURVEY.md §0.1).

The sandbox has no Iceberg runtime jar, so the pipeline ships with the
Parquet+JSON emulation in :mod:`sparkcrawl.snapstore`. This module is the
documented drop-in seam: the same verbs, expressed in the public Iceberg
Spark API, so a deployment with `iceberg-spark-runtime` on the classpath
and a catalog configured can swap stores without touching rounds.py.

Verb mapping (SnapStore → Iceberg, all public API):

| SnapStore verb                 | Iceberg equivalent                        |
| ------------------------------ | ----------------------------------------- |
| ``append(table, df, parent)``  | ``df.writeTo(id).append()``; parent pin = |
|                                | retry from the round manifest's snapshot: |
|                                | ``CALL cat.system.rollback_to_snapshot``  |
|                                | before re-append when a crashed attempt   |
|                                | left orphan snapshots                     |
| ``overwrite(table, df)``       | ``df.writeTo(id).createOrReplace()`` (or  |
|                                | ``overwritePartitions()`` for dynamic     |
|                                | partition overwrite)                      |
| ``read(spark, table)``         | ``spark.table(id)``                       |
| ``read(…, snapshot_id=s)``     | ``spark.read.option("snapshot-id", s)     |
|                                | .table(id)`` (Iceberg time travel)        |
| ``snapshots(table)``           | ``SELECT snapshot_id FROM id.snapshots``  |
| ``commit_round(n, snaps)``     | kept as-is: the tiny JSON round manifest  |
|                                | records {table → iceberg snapshot_id};    |
|                                | Iceberg has no cross-table transaction,   |
|                                | so the round manifest IS the atomic       |
|                                | multi-table commit point (exactly as in   |
|                                | the emulation — rename-atomic)            |
| partition layout               | ``PARTITIONED BY (bucket(N, url_hash))``  |
|                                | replaces the hive ``bucket`` column; the  |
|                                | dedup join keys stay (url_hash, canon)    |
|                                | and storage-partitioned joins line up     |
| ``expire_snapshots(t, N)``     | ``CALL cat.system.expire_snapshots(      |
|                                | table => id, retain_last => N)`` (also    |
|                                | cleans crashed-attempt orphan files via   |
|                                | ``remove_orphan_files``)                  |
| ``compact(spark, t)``          | ``CALL cat.system.rewrite_data_files(    |
|                                | table => id)``                            |
| bloom sidecar                  | a normal bucket-keyed Iceberg table       |
|                                | (probed/merged via per-bucket cogroups —  |
|                                | sparkcrawl/seenfilter.py)                 |

Everything below is a thin functional skeleton of that mapping. It raises
a clear error in environments without an Iceberg catalog (like this
sandbox) and is exercised by tests/test_store_contract.py only when one is
configured (``SPARKCRAWL_ICEBERG_CATALOG`` env var).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    pass


def _require_catalog(spark: SparkSession, catalog: str) -> None:
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        raise IcebergUnavailable(
            f"no Iceberg catalog {catalog!r} configured "
            "(spark.sql.catalog.<name> unset; is iceberg-spark-runtime on "
            "the classpath?) — use sparkcrawl.snapstore.SnapStore instead"
        )


class IcebergSnapStore:
    """SnapStore-compatible verbs over a real Iceberg catalog.

    Only the Spark-side verbs are implemented (append/overwrite/read/
    time-travel/snapshots); round manifests stay JSON files next to the
    warehouse (see module docstring — they are the cross-table commit
    point in both implementations)."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str,
                 rounds_dir: str):
        _require_catalog(spark, catalog)
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.rounds_dir = rounds_dir

    def _id(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def append(self, table: str, df: DataFrame, partition_by=None, meta=None,
               parent: int | str = "latest") -> int:
        tid = self._id(table)
        if parent is None:
            # SnapStore contract: parent=None starts a FRESH chain, orphaning
            # all prior snapshots — init_crawl relies on this so a retried
            # init never inherits a crashed attempt's orphan seed rows
            # (ADVICE r2). createOrReplace = truncate-and-write atomically.
            w = df.writeTo(tid)
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return self.latest(table)
        if parent != "latest":
            # crashed-attempt retry: pin back to the last committed round's
            # snapshot so orphan snapshots are never silently inherited
            self.spark.sql(
                f"CALL {self.catalog}.system.rollback_to_snapshot"
                f"('{self.namespace}.{table}', {int(parent)})"
            )
        df.writeTo(tid).append()
        return self.latest(table)

    def overwrite(self, table: str, df: DataFrame, partition_by=None,
                  meta=None, options=None) -> int:
        w = df.writeTo(self._id(table))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return self.latest(table)

    def read(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None) -> DataFrame:
        if snapshot_id is None:
            return spark.table(self._id(table))
        return (
            spark.read.option("snapshot-id", int(snapshot_id))
            .table(self._id(table))
        )

    def expire_snapshots(self, table: str, keep_last: int = 1) -> dict:
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots"
            f"(table => '{self.namespace}.{table}', retain_last => {int(keep_last)})"
        )
        self.spark.sql(
            f"CALL {self.catalog}.system.remove_orphan_files"
            f"(table => '{self.namespace}.{table}')"
        )
        return {"removed_snapshots": [], "removed_dirs": []}  # ids not surfaced

    def compact(self, spark: SparkSession, table: str) -> int:
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files"
            f"(table => '{self.namespace}.{table}')"
        )
        return self.latest(table)

    def snapshots(self, table: str) -> list[int]:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._id(table)}.snapshots "
            "ORDER BY committed_at"
        ).collect()
        return [int(r["snapshot_id"]) for r in rows]

    def latest(self, table: str) -> int | None:
        s = self.snapshots(table)
        return s[-1] if s else None
