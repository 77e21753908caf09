"""P7: INTVAR / auto-increment capture (SURVEY §2.2).

The reference parses INTVAR events of type INSERT_ID and latches the
carried id + an ``auto_incr`` flag that the NEXT insert consumes
(/root/reference/src/master/rs_parse_binlog.c:188-223). Like the
reference, the engine does not use the id downstream (web.pages keys on
url), but the capture is part of the wire protocol surface: streams
containing INTVAR events must decode the id, attribute it to the right
row event, and otherwise skip-with-position-advance.

Spark expression: a per-file lag window over log order — declarative, so
the whole attribution stays in whole-stage codegen. The plain form
partitions by file_seq (one sort per binlog file — bounded by file size,
≤1 GB typical). For hot paths, ``pos_bucket_bytes`` splits each file into
position ranges: the lag runs within each range and only the FIRST event
of a range consults a carry row (the last event of the previous non-empty
range — the dependency distance of INTVAR attribution is exactly one
event). The carry table is one row per present (file, range): O(file
size / bucket) rows, broadcast back; the widest sort becomes one range,
not one file. Same two-pass carry shape as ``asof_join_bucketed``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_auto_increment(
    events: DataFrame,
    intvar_col: str = "intvar",
    pos_bucket_bytes: int | None = None,
) -> DataFrame:
    """Attach ``auto_increment_id`` to each row event: the id of the
    immediately preceding INTVAR event in the same binlog file, consumed
    only by an INSERT (reference semantics — the latched id applies to the
    next insert and is cleared after use; a delete/update does not take
    it). ``pos_bucket_bytes`` bounds the per-task sort (see module doc);
    None keeps the single per-file window."""
    if pos_bucket_bytes is None:
        w = Window.partitionBy("file_seq").orderBy("log_pos")
        prev_op = F.lag("op").over(w)
        prev_id = F.lag(intvar_col).over(w)
        return events.withColumn(
            "auto_increment_id",
            F.when((F.col("op") == "I") & (prev_op == "INTVAR"), prev_id),
        )

    ev = events.withColumn(
        "_pb", F.floor(F.col("log_pos") / F.lit(pos_bucket_bytes))
    )
    w = Window.partitionBy("file_seq", "_pb").orderBy("log_pos")
    # last event of each PRESENT (file, range); lag over present ranges
    # skips empty ones naturally. O(buckets) rows — broadcastable.
    last = ev.groupBy("file_seq", "_pb").agg(
        F.max_by(
            F.struct(F.col("op").alias("op"), F.col(intvar_col).alias("iv")),
            F.col("log_pos"),
        ).alias("_last")
    )
    wb = Window.partitionBy("file_seq").orderBy("_pb")
    carry = last.select(
        "file_seq", "_pb", F.lag("_last").over(wb).alias("_carry")
    )
    eff_prev_op = F.when(
        F.row_number().over(w) == 1, F.col("_carry.op")
    ).otherwise(F.lag("op").over(w))
    eff_prev_id = F.when(
        F.row_number().over(w) == 1, F.col("_carry.iv")
    ).otherwise(F.lag(intvar_col).over(w))
    return (
        ev.join(F.broadcast(carry), ["file_seq", "_pb"], "left")
        .withColumn(
            "auto_increment_id",
            F.when((F.col("op") == "I") & (eff_prev_op == "INTVAR"), eff_prev_id),
        )
        .drop("_pb", "_carry")
    )
