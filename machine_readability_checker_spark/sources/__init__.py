"""Sources and sinks: fixture corpus generator, docs_raw ingest helpers,
Iceberg-layout table shim with manifest-based commits."""
