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

Schema evolution (the metadata-only Iceberg behaviors, shim analogs):

- **Add column** — real DDL: ``ALTER TABLE t ADD COLUMN quality DOUBLE``.
  Iceberg records a new schema id; old data files are untouched and old
  columns read as NULL.  Shim: commit a snapshot with the new
  ``schema_json``; ``read()`` merges parquet schemas so pre-evolution
  files surface the new column as NULL, and a time-travel
  ``read(version=v)`` projects to the columns recorded in THAT
  snapshot's schema — ``VERSION AS OF`` semantics (the old snapshot
  does not see the new column).
- **Partition-spec change** — real DDL: ``ALTER TABLE t REPLACE
  PARTITION FIELD bucket(4, doc_id) WITH bucket(8, doc_id)``.  Iceberg
  stamps each data file with its spec id; old files keep the old
  layout.  Shim: the snapshot records ``partition_spec`` ({spec_id,
  num_buckets, column}) and ``split_expr(spec)`` namespaces split ids
  as ``spec_id*SPEC_STRIDE + bucket`` so files written under different
  specs never collide in the append-once split space (the stride plays
  the role of Iceberg's per-file spec id; a real catalog needs none).

Unset ``schema_json`` / ``partition_spec`` carry forward from the
previous snapshot, like Iceberg metadata lineage.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Dict, List, Optional

from ..plans.manifest import ManifestStore

# split-id stride between partition specs: split = spec_id*STRIDE + bucket
SPEC_STRIDE = 1000


def split_expr(spec: Dict[str, Any], salt: int = 42):
    """Split-assignment column for a partition spec: the shim analog of
    Iceberg's ``bucket(N, col)`` transform, namespaced by spec id so an
    evolved spec's files occupy a disjoint split range."""
    from pyspark.sql import functions as F

    n = int(spec["num_buckets"])
    if n >= SPEC_STRIDE:
        raise ValueError(f"num_buckets must be < {SPEC_STRIDE}")
    return F.lit(int(spec.get("spec_id", 0)) * SPEC_STRIDE) + F.pmod(
        F.xxhash64(F.col(spec.get("column", "doc_id")), F.lit(salt)), F.lit(n)
    )


def _schema_columns(schema_json: Optional[str]) -> Optional[List[str]]:
    """Top-level column names from a recorded schema: accepts both the
    loose ``{"col": "type"}`` form and Spark's ``schema.json()`` form."""
    if not schema_json:
        return None
    try:
        parsed = json.loads(schema_json)
    except (ValueError, TypeError):
        return None
    if isinstance(parsed, dict) and isinstance(parsed.get("fields"), list):
        return [f["name"] for f in parsed["fields"]]
    if isinstance(parsed, dict):
        return list(parsed.keys())
    return None


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

    def commit_snapshot(
        self,
        schema_json: Optional[str] = None,
        partition_spec: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Roll the committed split manifests up into a new table
        snapshot; the `current` pointer flips via atomic rename.  Unset
        schema/spec carry forward from the previous snapshot (metadata
        lineage); passing a new value IS the evolution commit."""
        splits = self.store.committed_splits()
        manifests = [self.store.read_manifest(s) for s in splits]
        versions = self._versions()
        prev = self.snapshot(versions[-1]) if versions else {}
        version = (versions[-1] + 1) if versions else 1
        snap = {
            "version": version,
            "committed_at": time.time(),
            "schema": schema_json
            if schema_json is not None
            else prev.get("schema"),
            "partition_spec": partition_spec
            if partition_spec is not None
            else prev.get("partition_spec"),
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
        contents — the shim analog of Iceberg ``VERSION AS OF``), AND the
        row shape is the schema recorded in that snapshot: columns added
        by a later evolution are projected away, exactly as Iceberg reads
        an old snapshot with its own schema id.  mergeSchema makes
        pre-evolution files surface later-added columns as NULL on
        current reads."""
        df = spark.read.option("mergeSchema", "true").parquet(
            self.store.data_dir
        )
        if version is None:
            return df
        from pyspark.sql import functions as F

        snap = self.snapshot(version)
        df = df.filter(F.col("split").isin([int(s) for s in snap["splits"]]))
        cols = _schema_columns(snap.get("schema"))
        if cols:
            keep = [c for c in df.columns if c in set(cols) or c == "split"]
            df = df.select(*keep)
        return df

    def read_incremental(self, spark, from_version: int, to_version: int):
        """Changelog read: rows appended between two snapshots = the
        splits committed in ``to_version`` but not in ``from_version``
        (Iceberg incremental-scan analog); partition-pruned like read()."""
        from pyspark.sql import functions as F

        before = set(self.snapshot(from_version)["splits"])
        after = set(self.snapshot(to_version)["splits"])
        new_splits = sorted(int(s) for s in after - before)
        df = spark.read.option("mergeSchema", "true").parquet(
            self.store.data_dir
        )
        return df.filter(F.col("split").isin(new_splits))
