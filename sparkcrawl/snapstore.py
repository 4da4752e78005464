"""Iceberg-emulating snapshot table layer (SURVEY.md §0.1, §4.2).

No Iceberg runtime jar is available offline, so this module provides
Iceberg-*shaped* table semantics over plain Parquet + JSON manifests:

- immutable data files; a snapshot = JSON manifest listing live data dirs
- append / overwrite commit modes; atomic commit via ``os.rename`` of the
  manifest (POSIX rename atomicity — same protocol as Iceberg's
  metadata-pointer swap against a filesystem catalog)
- time travel: ``read(table, snapshot_id=...)``
- round-level multi-table commits: ``commit_round`` writes a round manifest
  mapping table → snapshot id, which is the resume point
  (BASELINE.json:6 "resumes deterministically from any round boundary")

Layout:
    root/<table>/data/<snap>-<uuid>/part-*.parquet
    root/<table>/snapshots/snapshot-%08d.json
    root/rounds/round-%06d.json

Replaces the reference's JOBDIR persistence (scrapy/core/scheduler.py::
Scheduler.open/close + dupefilters.py seen-file). Designed behind a thin
interface so a real Iceberg catalog can be dropped in (same verbs:
append/overwrite/read/time-travel).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "rounds"), exist_ok=True)

    # ----- paths -----
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snapdir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "snapshots")

    def _manifest_path(self, table: str, snap_id: int) -> str:
        return os.path.join(self._snapdir(table), "snapshot-%08d.json" % snap_id)

    # ----- snapshot bookkeeping -----
    def snapshots(self, table: str) -> list[int]:
        d = self._snapdir(table)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("snapshot-") and f.endswith(".json"):
                out.append(int(f[len("snapshot-") : -len(".json")]))
        return sorted(out)

    def latest(self, table: str) -> int | None:
        s = self.snapshots(table)
        return s[-1] if s else None

    def _load_manifest(self, table: str, snap_id: int) -> dict:
        with open(self._manifest_path(table, snap_id)) as f:
            return json.load(f)

    # ----- commit -----
    def _write_data(self, table: str, df: DataFrame, snap_id: int,
                    partition_by: list[str] | None,
                    options: dict | None = None) -> str:
        rel = os.path.join("data", "%08d-%s" % (snap_id, uuid.uuid4().hex[:8]))
        path = os.path.join(self._tdir(table), rel)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.parquet(path)
        return rel

    def _commit(self, table: str, df: DataFrame, mode: str,
                partition_by: list[str] | None = None, meta: dict | None = None,
                parent: int | str = "latest", options: dict | None = None) -> int:
        """Write data + snapshot manifest. ``parent`` pins the snapshot an
        append chains from (and overwrite supersedes): pass the id recorded in
        the last committed ROUND manifest so that snapshots written by a
        crashed round attempt are orphaned — never silently inherited — when
        the round re-runs (Iceberg's retry-from-last-committed-metadata
        semantics). "latest" keeps the single-writer fast path."""
        os.makedirs(self._snapdir(table), exist_ok=True)
        if parent == "latest":
            parent = self.latest(table)
        snap_id = (self.latest(table) or 0) + 1
        rel = self._write_data(table, df, snap_id, partition_by, options)
        files = [rel]
        if mode == "append" and parent is not None:
            files = self._load_manifest(table, parent)["files"] + files
        manifest = {
            "id": snap_id,
            "parent": parent,
            "mode": mode,
            "files": files,
            "partition_by": partition_by or [],
            "schema": json.loads(df.schema.json()),
            "meta": meta or {},
        }
        tmp = self._manifest_path(table, snap_id) + ".tmp-" + uuid.uuid4().hex[:8]
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(table, snap_id))  # atomic commit point
        return snap_id

    def append(self, table: str, df: DataFrame, partition_by=None, meta=None,
               parent: int | str = "latest") -> int:
        return self._commit(table, df, "append", partition_by, meta, parent)

    def _commit_local(self, table: str, arrow_table, spark_schema, mode: str,
                      parent: int | str = "latest") -> int:
        """Commit driver-side rows (already-collected small data, e.g. the
        per-round metrics or the bloom sidecar) without a Spark job: pyarrow
        parquet + the same manifest protocol. ~100× cheaper than
        createDataFrame+write for tiny tables."""
        import pyarrow.parquet as pq

        os.makedirs(self._snapdir(table), exist_ok=True)
        if parent == "latest":
            parent = self.latest(table)
        snap_id = (self.latest(table) or 0) + 1
        rel = os.path.join("data", "%08d-%s" % (snap_id, uuid.uuid4().hex[:8]))
        path = os.path.join(self._tdir(table), rel)
        os.makedirs(path, exist_ok=True)
        pq.write_table(arrow_table, os.path.join(path, "part-00000.parquet"))
        files = [rel]
        if mode == "append" and parent is not None:
            files = self._load_manifest(table, parent)["files"] + files
        manifest = {
            "id": snap_id, "parent": parent, "mode": mode, "files": files,
            "partition_by": [], "schema": spark_schema.jsonValue(), "meta": {},
        }
        tmp = self._manifest_path(table, snap_id) + ".tmp-" + uuid.uuid4().hex[:8]
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(table, snap_id))
        return snap_id

    def append_local(self, table: str, arrow_table, spark_schema,
                     parent: int | str = "latest") -> int:
        return self._commit_local(table, arrow_table, spark_schema, "append", parent)

    def overwrite_local(self, table: str, arrow_table, spark_schema) -> int:
        return self._commit_local(table, arrow_table, spark_schema, "overwrite")

    def read_local(self, table: str, snapshot_id: int | None = None):
        """Driver-side read of a (small) table snapshot → pyarrow Table."""
        import pyarrow.parquet as pq

        snap_id = self.latest(table) if snapshot_id is None else snapshot_id
        if snap_id is None:
            raise FileNotFoundError(f"no snapshot for table {table!r}")
        man = self._load_manifest(table, snap_id)
        import pyarrow as pa

        tabs = []
        for rel in man["files"]:
            d = os.path.join(self._tdir(table), rel)
            for f in sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                                      recursive=True)):
                tabs.append(pq.read_table(f))
        if not tabs:
            raise FileNotFoundError(f"table {table!r} snapshot {snap_id} empty")
        return pa.concat_tables(tabs)

    def overwrite(self, table: str, df: DataFrame, partition_by=None, meta=None,
                  options: dict | None = None) -> int:
        return self._commit(table, df, "overwrite", partition_by, meta,
                            options=options)

    # ----- read -----
    def read(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None) -> DataFrame:
        snap_id = self.latest(table) if snapshot_id is None else snapshot_id
        if snap_id is None:
            raise FileNotFoundError(f"no snapshot for table {table!r}")
        man = self._load_manifest(table, snap_id)
        paths = [os.path.join(self._tdir(table), rel) for rel in man["files"]]
        # a snapshot of an empty DataFrame has a data dir with no parquet
        # files — drop those and fall back to the manifest schema
        live = [
            p for p in paths
            if glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
        ]
        if not live:
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(man["schema"])
            for col in man["partition_by"]:
                if col not in schema.fieldNames():
                    schema = schema.add(col, T.IntegerType())
            return spark.createDataFrame([], schema=schema)
        if not man["partition_by"] or len(live) == 1:
            return spark.read.parquet(*live)
        # multiple hive-partitioned roots: Spark's partition discovery wants
        # one root per read — scan each snapshot dir and union (same shape a
        # real Iceberg table scan produces: a union of manifests' file scans;
        # partition pruning still applies per scan)
        dfs = [spark.read.parquet(p) for p in live]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def exists(self, table: str) -> bool:
        return self.latest(table) is not None

    def snapshot_meta(self, table: str, snapshot_id: int | None = None) -> dict:
        """The ``meta`` dict committed with a snapshot (latest by default) —
        e.g. the source-identity key an index build records so a reader can
        tell a live artifact from a stale one. Empty dict if the table has
        no snapshot."""
        snap_id = self.latest(table) if snapshot_id is None else snapshot_id
        if snap_id is None:
            return {}
        return self._load_manifest(table, snap_id).get("meta", {})

    # ----- maintenance: snapshot expiry + small-file compaction -----
    def expire_snapshots(self, table: str, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and delete every
        data dir no kept snapshot references — including ORPHANED dirs that
        have no manifest at all (a crashed round attempt writes data, then
        dies before the manifest rename; retry semantics orphan it forever).
        Iceberg analogue: ``CALL system.expire_snapshots``. Without this the
        append-chain file list and crash junk grow monotonically (VERDICT r2
        #5). Time travel to expired snapshots (and round manifests pinned to
        them) intentionally stops working — that IS expiry semantics.
        Returns {"removed_snapshots": [...], "removed_dirs": [...]}."""
        snaps = self.snapshots(table)
        keep = snaps[-keep_last:] if keep_last > 0 else []
        live: set[str] = set()
        for s in keep:
            live.update(self._load_manifest(table, s)["files"])
        removed_dirs: list[str] = []
        data_root = os.path.join(self._tdir(table), "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                rel = os.path.join("data", d)
                if rel not in live:
                    shutil.rmtree(os.path.join(data_root, d))
                    removed_dirs.append(rel)
        removed_snaps = [s for s in snaps if s not in keep]
        for s in removed_snaps:
            os.remove(self._manifest_path(table, s))
        return {"removed_snapshots": removed_snaps, "removed_dirs": removed_dirs}

    def compact(self, spark: SparkSession, table: str) -> int:
        """Rewrite the current snapshot's (possibly long) data-dir chain into
        ONE fresh data dir and commit it as a new overwrite snapshot —
        row-identical by construction, read-equal before/after. Iceberg
        analogue: ``rewrite_data_files``. Append-heavy tables (seen,
        frontier_log: one dir per round) read one dir afterwards; pair with
        :meth:`expire_snapshots` to reclaim the superseded chain."""
        snap = self.latest(table)
        if snap is None:
            raise FileNotFoundError(f"no snapshot for table {table!r}")
        man = self._load_manifest(table, snap)
        df = self.read(spark, table, snap)
        return self.overwrite(
            table, df, partition_by=man["partition_by"] or None
        )

    # ----- round-level multi-table commit (the resume point) -----
    def commit_round(self, round_n: int, table_snaps: dict[str, int],
                     meta: dict | None = None) -> None:
        doc = {"round": round_n, "tables": table_snaps, "meta": meta or {}}
        path = os.path.join(self.root, "rounds", "round-%06d.json" % round_n)
        tmp = path + ".tmp-" + uuid.uuid4().hex[:8]
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def committed_rounds(self) -> list[int]:
        d = os.path.join(self.root, "rounds")
        return sorted(
            int(f[len("round-") : -len(".json")])
            for f in os.listdir(d)
            if f.startswith("round-") and f.endswith(".json")
        )

    def round_manifest(self, round_n: int) -> dict:
        with open(os.path.join(self.root, "rounds", "round-%06d.json" % round_n)) as f:
            return json.load(f)

    def read_at_round(self, spark: SparkSession, table: str, round_n: int) -> DataFrame:
        """Time-travel read: table as of a committed round boundary."""
        return self.read(spark, table, self.round_manifest(round_n)["tables"][table])
