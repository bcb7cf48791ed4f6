"""Structured Streaming surface (incremental ingestion)."""
