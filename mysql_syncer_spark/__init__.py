"""mysql_syncer_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new, Spark-first reimplementation of the *capabilities* of
Terry-Mao/MySQL-Syncer (a C binlog→Redis replication pipeline): change-event
decoding, table filtering, op routing, last-writer-wins ordering, idempotent
batched upsert apply, resumable checkpoints — re-expressed as DataFrame
programs over a columnar change-event log, applied to a bucket-partitioned,
snapshot-versioned lake table (Iceberg-style; pure-parquet manifest backend
in-sandbox), plus the web-scale training-data operators (dedup, similarity,
text analysis) a 100 TB Common-Crawl-style corpus needs.

Architecture map (reference file:line → module):

- binlog tail / resume / rotation (src/master/rs_read_binlog.c:77-252,
  src/master/rs_request_dump.c:100-221) → ``streaming.runner`` (Structured
  Streaming source + checkpointLocation) and ``plans.replay`` (batch replay
  ``WHERE log_pos > last``).
- event decode + dispatch (src/master/rs_parse_binlog.c:5-117) →
  ``operators.routing`` (columnar envelope, ``op`` column branching).
- row-image decode (src/slave/rs_binlog_row.c:430-631) →
  ``sources.decoder`` (vectorized Arrow ``mapInPandas`` over packed binary).
- table filter (src/master/rs_parse_binlog.c:300-308) → ``operators.filters``.
- per-table handler registry (src/slave/rs_register_tables.c:6-36) →
  ``config.TableConfig`` registry dict.
- idempotent upsert apply + pipelined commit (src/slave/rs_mysql_test_test.c:59-87,
  src/slave/rs_redis_thread.c:27-175) → ``operators.merge`` +
  ``sink.pages_table`` (atomic snapshot commit, batch-id ledger).
- offset checkpoint (etc/slave.info, src/slave/rs_slave_info.c:118-134) →
  streaming checkpoint dir + manifest ``committed_batches`` ledger.
"""

__version__ = "0.1.0"
