"""Structured Streaming lane: continuous ingestion of docs_raw with the
same extraction kernel, plus watermarked windowed aggregations."""
