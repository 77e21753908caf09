"""Sinks: snapshot-versioned lake tables (Iceberg-style; parquet backend)."""
