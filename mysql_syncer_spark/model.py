"""Data model: change-event envelope + pages payload schemas.

Mirrors the reference's wire model in columnar form:

- the 19-byte event header (type, server_id, event_length, next_position —
  /root/reference/src/master/rs_read_binlog.h:137-143) becomes the envelope
  columns ``op / file_seq / log_pos / server_id / tx_id``;
- the per-event ``"<file>,<pos>"`` checkpoint prefix
  (/root/reference/src/master/rs_filter_binlog.c:39-49) becomes
  ``(file_seq, log_pos)`` — the total order used for last-writer-wins;
- the row image (before/after pairs for UPDATE —
  /root/reference/src/slave/rs_binlog_row.c:510-514,604-612) becomes the
  ``before`` / ``after`` structs;
- QUERY-event DDL text (/root/reference/src/master/rs_parse_binlog.c:119-185)
  becomes the typed ``ddl`` struct (the reference only passes DDL through;
  this engine actually applies it — SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Target-state payload (BASELINE.json input_hint, exact shape).
PAGE_FIELDS = [
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
]
PAGES_SCHEMA = T.StructType(PAGE_FIELDS)

PAGE_STRUCT = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in PAGE_FIELDS]
)

DDL_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),  # add_column | rename_column
        T.StructField("col", T.StringType(), True),
        T.StructField("new_name", T.StringType(), True),
        T.StructField("dtype", T.StringType(), True),
    ]
)

# The change-event log: engine input. One row per binlog row-event
# (WRITE/UPDATE/DELETE_ROWS, /root/reference/src/master/rs_read_binlog.h:129-131)
# or DDL QUERY event.
CDC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("log_pos", T.LongType(), False),
        T.StructField("file_seq", T.IntegerType(), False),
        T.StructField("server_id", T.IntegerType(), True),
        T.StructField("op", T.StringType(), False),  # I | U | D | DDL
        T.StructField("table", T.StringType(), False),  # "db.tb"
        T.StructField("tx_id", T.LongType(), True),
        T.StructField("before", PAGE_STRUCT, True),
        T.StructField("after", PAGE_STRUCT, True),
        T.StructField("ddl", DDL_STRUCT, True),
    ]
)

ROW_OPS = ("I", "U", "D")

# Spark-type lookup for DDL add_column payloads.
DDL_DTYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}
