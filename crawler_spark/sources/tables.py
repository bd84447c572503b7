"""Snapshot-versioned table store: the engine's state backend.

The reference keeps mutable state in Azure SQL with per-site semaphores and a
queue with visibility timeouts. This engine replaces all of that with
*snapshot-per-epoch* table semantics (SURVEY.md §1.6, §2.8 T2):

* every state table (``frontier``, ``url_seen``, ``seeds``, ``documents``)
  is written as an immutable snapshot directory per version;
* a tiny JSON *manifest* records, per epoch, which snapshot of each table is
  current — committed atomically via write-temp + ``os.replace``;
* resume = read the manifest, load the recorded snapshots (the reference's
  visibility-timeout / stale-job recovery collapses into "re-run the epoch
  from the last committed manifest").

On a real deployment this class is swapped for Iceberg tables (``MERGE
INTO``, snapshot isolation, multi-table commit via an epoch manifest); the
interface is deliberately shaped so only this module changes. Parquet
snapshots keep the sandbox dependency-free while preserving the exact
semantics tests need (atomic commit, resume, lineage).

Scale note: snapshots are written partitioned by ``host_hash`` (bucket-style
layout) so the next epoch's joins against ``url_seen``/``frontier`` scan only
matching buckets and partition pruning applies.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Directory layout::

        root/
          MANIFEST.json            # {"epoch": k, "tables": {name: version}, ...}
          <table>/v<version>/      # immutable parquet snapshot
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> Path:
        return self.root / "MANIFEST.json"

    def read_manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"epoch": -1, "tables": {}, "lineage": []}
        return json.loads(self._manifest_path.read_text())

    def commit(self, epoch: int, table_versions: dict[str, int], lineage_row: dict | None = None) -> None:
        """Atomically advance the store to ``epoch`` (os.replace = atomic)."""
        manifest = self.read_manifest()
        manifest["epoch"] = epoch
        manifest["tables"].update({k: int(v) for k, v in table_versions.items()})
        if lineage_row is not None:
            manifest.setdefault("lineage", []).append({"epoch": epoch, **lineage_row})
        tmp = self._manifest_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self._manifest_path)

    # -- snapshots ----------------------------------------------------------

    def _table_dir(self, name: str, version: int) -> Path:
        return self.root / name / f"v{version}"

    def current_version(self, name: str) -> int | None:
        v = self.read_manifest()["tables"].get(name)
        return None if v is None else int(v)

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        version = self.current_version(name)
        if version is None:
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return spark.read.parquet(str(self._table_dir(name, version)))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> int:
        """Write the next snapshot of ``name``; returns the new version.

        Not visible until :meth:`commit` records it in the manifest.
        """
        current = self.current_version(name)
        version = 0 if current is None else current + 1
        target = self._table_dir(name, version)
        if target.exists():  # stale leftover from an uncommitted epoch: re-runnable
            shutil.rmtree(target)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(target))
        return version

    def materialize(self, spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
        """Write ``df`` to a transient scratch area and read it back.

        Used for per-epoch intermediates that feed several downstream sinks
        (e.g. the extract output): one parquet pass pins the data so no sink
        re-runs the upstream Python stage — ``cache()`` alone does not give
        that guarantee across multi-action epochs, and on a real cluster the
        scratch write doubles as the shuffle-safe restart point. Scratch is
        NOT manifest-tracked: a crashed epoch simply overwrites it on re-run.
        """
        path = self.root / "scratch" / name
        df.write.mode("overwrite").parquet(str(path))
        return spark.read.parquet(str(path))

    # -- append-only tables (logs / lineage) --------------------------------

    def append(self, df: DataFrame, name: str, label: str) -> None:
        """Append a labeled part to an append-only table (e.g. per-epoch
        metrics). Parts are immutable; the union happens at read time —
        O(1) write per epoch instead of cumulative rewrites."""
        df.write.mode("overwrite").parquet(str(self.root / name / f"a{label}"))

    def read_appended(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(str(self.root / name / "a*"))

    def has_appended(self, name: str) -> bool:
        table_root = self.root / name
        return table_root.exists() and any(table_root.glob("a*"))

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop snapshot directories older than the last ``keep_last`` per table."""
        manifest = self.read_manifest()
        for name, current in manifest["tables"].items():
            table_root = self.root / name
            if not table_root.exists():
                continue
            for child in table_root.iterdir():
                if child.name.startswith("v"):
                    try:
                        v = int(child.name[1:])
                    except ValueError:
                        continue
                    if v <= int(current) - keep_last:
                        shutil.rmtree(child, ignore_errors=True)

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def wait_for_files(path: Path, timeout: float = 5.0) -> None:
    """Best-effort barrier for tests on slow filesystems."""
    deadline = time.time() + timeout
    while time.time() < deadline and not path.exists():
        time.sleep(0.05)
