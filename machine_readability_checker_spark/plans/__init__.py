"""Execution plans: Iceberg-layout table shim, checkpointed partition
manifests for resumable batch jobs, per-partition lineage."""
