"""Structured Streaming jobs (incremental analogs of the batch ops)."""
