"""Iceberg-layout table shim: snapshot metadata over split manifests.

No Iceberg runtime jar ships in this container, so the engine mirrors
Iceberg's metadata/manifest split with plain JSON on top of the
partitioned-parquet layout written by ``plans/manifest.py``:

    <root>/data/split=K/*.parquet     (bucketed data files)
    <root>/_manifests/split-K.json    (per-split commit manifests)
    <root>/_snapshots/v{N}.json       (table-level snapshots)
    <root>/_snapshots/current         (pointer file, atomically renamed)

``commit_snapshot`` records the schema, the committed split list and
row-count totals; ``current_snapshot`` resolves the active version.  With
a real catalog the same pipeline targets:

    CREATE TABLE docs_spans (
      doc_id STRING, spans ARRAY<STRUCT<kind:STRING, text:STRING,
      media_ref:STRING, offset:INT>>)
    USING iceberg
    PARTITIONED BY (bucket(64, doc_id))

and resume rides snapshot diffs instead of the manifest anti-join.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Dict, List, Optional

from ..plans.manifest import ManifestStore


class IcebergLayoutTable:
    def __init__(self, root: str):
        self.root = root
        self.store = ManifestStore(root)

    @property
    def snapshot_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    def _versions(self) -> List[int]:
        if not os.path.isdir(self.snapshot_dir):
            return []
        out = []
        for name in os.listdir(self.snapshot_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def commit_snapshot(self, schema_json: Optional[str] = None) -> Dict[str, Any]:
        """Roll the committed split manifests up into a new table
        snapshot; the `current` pointer flips via atomic rename."""
        splits = self.store.committed_splits()
        manifests = [self.store.read_manifest(s) for s in splits]
        version = (self._versions()[-1] + 1) if self._versions() else 1
        snap = {
            "version": version,
            "committed_at": time.time(),
            "schema": schema_json,
            "splits": splits,
            "total_docs": sum(m.get("docs", 0) for m in manifests),
            "manifest_files": [f"_manifests/split-{s}.json" for s in splits],
        }
        os.makedirs(self.snapshot_dir, exist_ok=True)
        path = os.path.join(self.snapshot_dir, f"v{version}.json")
        fd, tmp = tempfile.mkstemp(prefix=".snap.", dir=self.snapshot_dir)
        with os.fdopen(fd, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
        # pointer flip: write-temp + fsync + rename, same protocol as
        # manifests (without the fsync a crash can journal the rename
        # before the data blocks land, leaving an empty pointer that
        # bricks every subsequent read).  Single-writer protocol: like
        # Iceberg's, version allocation assumes one committer at a time
        # (a real catalog arbitrates concurrent commits).
        fd, tmp = tempfile.mkstemp(prefix=".cur.", dir=self.snapshot_dir)
        with os.fdopen(fd, "w") as f:
            f.write(f"v{version}.json")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.snapshot_dir, "current"))
        return snap

    def current_snapshot(self) -> Optional[Dict[str, Any]]:
        ptr = os.path.join(self.snapshot_dir, "current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            name = f.read().strip()
        with open(os.path.join(self.snapshot_dir, name)) as f:
            return json.load(f)

    def snapshot(self, version: int) -> Dict[str, Any]:
        with open(os.path.join(self.snapshot_dir, f"v{version}.json")) as f:
            return json.load(f)

    def read(self, spark, version: Optional[int] = None):
        """Read the table; with ``version`` this is a time-travel read —
        only the splits that snapshot had committed are visible, via a
        partition-pruned filter on the ``split`` directory column (splits
        are append-once, so split membership fully determines snapshot
        contents — the shim analog of Iceberg ``VERSION AS OF``)."""
        df = spark.read.parquet(self.store.data_dir)
        if version is None:
            return df
        from pyspark.sql import functions as F

        snap = self.snapshot(version)
        return df.filter(F.col("split").isin([int(s) for s in snap["splits"]]))

    def read_incremental(self, spark, from_version: int, to_version: int):
        """Changelog read: rows appended between two snapshots = the
        splits committed in ``to_version`` but not in ``from_version``
        (Iceberg incremental-scan analog); partition-pruned like read()."""
        from pyspark.sql import functions as F

        before = set(self.snapshot(from_version)["splits"])
        after = set(self.snapshot(to_version)["splits"])
        new_splits = sorted(int(s) for s in after - before)
        df = spark.read.parquet(self.store.data_dir)
        return df.filter(F.col("split").isin(new_splits))
