"""Structured Streaming extensions (optional — the reference is
strictly batch; this covers the incremental-crawl ingest path)."""
