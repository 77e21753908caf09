"""Structured Streaming replay (continuous tail + foreachBatch apply)."""
