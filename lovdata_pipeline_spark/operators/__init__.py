"""Dataflow operators: incremental change detection, dedup, similarity,
text analytics, validation."""
