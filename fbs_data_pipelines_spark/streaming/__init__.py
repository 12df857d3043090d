"""Structured Streaming extensions (SURVEY §2.10: the reference is
batch-only; its snapshot-diff incremental pattern maps to
foreachBatch merge)."""
