"""Snapshot tables: parquet + JSON manifests with Iceberg-style discipline.

The north rule calls for Iceberg tables with snapshot commits and
time-travel.  The sandbox has no iceberg-spark-runtime jar, so this module
implements the same *discipline* over plain parquet: every commit writes
an immutable data directory plus a manifest JSON listing the directories
that make up the new snapshot, then atomically flips a CURRENT pointer
(``os.replace``).  Readers resolve a snapshot (latest or by id) to a list
of parquet paths and hand them to ``spark.read.parquet`` — so predicate
pushdown, column pruning and partition-parallel scans all still apply.

On a real cluster, swap ``SnapshotTable`` for ``spark.table(...)`` +
``df.writeTo(...).append()`` against an Iceberg catalog — the engine only
uses the four operations below (read / append / overwrite / time-travel),
all of which Iceberg provides natively.

Reference behavior replaced: the crawler's only "commit" is an
end-of-run append+flush of visitedDocs.txt (``gdprCrawler.py:292-301``) —
a crash loses the whole run's seen-set delta.  Per-round snapshot commits
fix that (SURVEY.md §3.1 note 5).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CURRENT = "CURRENT"


class SnapshotTable:
    """An append-mostly table with atomic snapshot commits + time travel."""

    def __init__(self, root: str, schema: T.StructType):
        self.root = root
        self.schema = schema
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.root, _CURRENT)

    def current_snapshot_id(self) -> str | None:
        try:
            with open(self._current_path()) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _manifest_path(self, snapshot_id: str) -> str:
        return os.path.join(self.root, "snapshots", snapshot_id + ".json")

    def _read_manifest(self, snapshot_id: str) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def snapshots(self) -> list[str]:
        d = os.path.join(self.root, "snapshots")
        return sorted(p[:-5] for p in os.listdir(d) if p.endswith(".json"))

    def _commit(self, parts: list[str], note: str) -> str:
        prev = self.current_snapshot_id()
        snapshot_id = f"s{len(self.snapshots()):08d}-{uuid.uuid4().hex[:8]}"
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": prev,
            "parts": parts,
            "note": note,
            "committed_at": time.time(),
        }
        tmp = self._manifest_path(snapshot_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(snapshot_id))
        cur_tmp = self._current_path() + ".tmp"
        with open(cur_tmp, "w") as f:
            f.write(snapshot_id)
        os.replace(cur_tmp, self._current_path())  # atomic pointer flip
        return snapshot_id

    # -- writes ---------------------------------------------------------------

    def _write_part(self, df: DataFrame) -> str:
        part = os.path.join("data", uuid.uuid4().hex)
        # enforce the declared schema (name + type) at the boundary
        cols = [df[f.name].cast(f.dataType).alias(f.name) for f in self.schema.fields]
        df.select(*cols).write.mode("overwrite").parquet(os.path.join(self.root, part))
        return part

    def append(self, df: DataFrame, note: str = "append") -> str:
        parts = list(self._current_parts())
        parts.append(self._write_part(df))
        return self._commit(parts, note)

    def overwrite(self, df: DataFrame, note: str = "overwrite") -> str:
        return self._commit([self._write_part(df)], note)

    # -- reads ----------------------------------------------------------------

    def _current_parts(self) -> list[str]:
        sid = self.current_snapshot_id()
        return self._read_manifest(sid)["parts"] if sid else []

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        """Read latest snapshot, or time-travel to ``snapshot_id``."""
        sid = snapshot_id or self.current_snapshot_id()
        parts = self._read_manifest(sid)["parts"] if sid else []
        if not parts:
            return spark.createDataFrame([], self.schema)
        paths = [os.path.join(self.root, p) for p in parts]
        return spark.read.schema(self.schema).parquet(*paths)
