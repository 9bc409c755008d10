"""TableIO — snapshot-committed parquet tables with resume semantics.

Stand-in for an Iceberg catalog (SURVEY.md §7.1): the sandbox has no
network to fetch the iceberg-spark-runtime jar, so tables are parquet
directories plus a JSON manifest giving Iceberg-like snapshot commit /
current-pointer / input-lineage semantics. All engine table access goes
through this shim, so swapping in `spark.read.format("iceberg")` on a
real cluster is a one-class change.

Layout:
    <warehouse>/<table>/manifest.json
    <warehouse>/<table>/s0000/  (parquet dir per snapshot)

A snapshot is committed atomically by writing the parquet dir first and
renaming a temp manifest over the old one last. `input_snapshot` records
which upstream snapshot a stage consumed — the resume check
(`find_snapshot`) skips a stage when a committed snapshot for the same
input already exists (north rule: resumable from checkpoint).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table, "manifest.json")

    def _load_manifest(self, table: str) -> dict[str, Any]:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"snapshots": [], "current": None}
        with open(path) as f:
            return json.load(f)

    def _store_manifest(self, table: str, manifest: dict[str, Any]) -> None:
        tdir = os.path.join(self.warehouse, table)
        os.makedirs(tdir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(table))

    # -- commits -----------------------------------------------------------
    def commit(
        self,
        table: str,
        df: DataFrame,
        input_snapshot: str | None = None,
        partition_by: list[str] | None = None,
        metadata: dict[str, Any] | None = None,
    ) -> str:
        manifest = self._load_manifest(table)
        snap_id = f"s{len(manifest['snapshots']):04d}"
        path = os.path.join(self.warehouse, table, snap_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "path": path,
                "input_snapshot": input_snapshot,
                "metadata": metadata or {},
            }
        )
        manifest["current"] = snap_id
        self._store_manifest(table, manifest)
        return snap_id

    # -- reads -------------------------------------------------------------
    def read(
        self, spark: SparkSession, table: str, snapshot: str | None = None
    ) -> DataFrame:
        manifest = self._load_manifest(table)
        snap_id = snapshot or manifest["current"]
        if snap_id is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        entry = next(s for s in manifest["snapshots"] if s["id"] == snap_id)
        return spark.read.parquet(entry["path"])

    def current_snapshot(self, table: str) -> str | None:
        return self._load_manifest(table)["current"]

    def find_snapshot(self, table: str, input_snapshot: str | None) -> str | None:
        """Resume check: a committed snapshot whose lineage matches the
        given upstream snapshot id (latest wins)."""
        manifest = self._load_manifest(table)
        for s in reversed(manifest["snapshots"]):
            if s["input_snapshot"] == input_snapshot:
                return s["id"]
        return None
