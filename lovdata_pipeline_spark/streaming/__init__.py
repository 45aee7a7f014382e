"""Structured Streaming surface: incremental file ingestion and
event-time analytics."""
