"""End-to-end pipelines (batch replay, streaming replay)."""
