"""Event-log source (SURVEY §2.1 S1-S3).

The reference tails binlog files with inotify+select and rotates via the
index file (/root/reference/src/master/rs_read_binlog.c:77-252). Columnar
equivalent: the log is a directory of parquet files, one per binlog file
(``binlog-<seq>.parquet``); Spark's file source handles discovery, and
order is data (``file_seq, log_pos``), not file-listing order.

- batch read: plain scan; resume-from-offset (S3) is a pushed-down
  predicate ``(file_seq, log_pos) > checkpoint`` — the parquet row-group
  stats give the fseek-to-position effect for free.
- streaming read: ``readStream`` with ``maxFilesPerTrigger`` as the
  micro-batch knob; Structured Streaming's checkpoint dir is the offset
  file (slave.info, /root/reference/etc/slave.info:1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_event_log(spark: SparkSession, path: str) -> DataFrame:
    """Self-describing scan — the wire payload struct may carry MORE fields
    than the base schema (columns added by DDL travel in the stream before
    the target schema knows them, like a TABLE_MAP's column list), so the
    schema must come from the files, not a fixed StructType."""
    return spark.read.parquet(path)


def read_from_offset(
    spark: SparkSession, path: str, file_seq: int, log_pos: int
) -> DataFrame:
    """Resume scan strictly after (file_seq, log_pos) — the dumpcmd fseek
    (/root/reference/src/master/rs_request_dump.c:213-221) as a predicate.
    Expressed as two pushdown-friendly conjuncts, not a struct compare."""
    df = read_event_log(spark, path)
    return df.filter(
        (F.col("file_seq") > file_seq)
        | ((F.col("file_seq") == file_seq) & (F.col("log_pos") > log_pos))
    )


def stream_event_log(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    # streaming file sources need an explicit schema: take it from the
    # files already present (the wire schema is fixed for a given log).
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # binlog files are named binlog-<seq> and listed in order; with
        # one file per trigger each micro-batch is one binlog file.
        .option("latestFirst", "false")
        .parquet(path)
    )
