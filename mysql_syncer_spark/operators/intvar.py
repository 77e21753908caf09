"""P7: INTVAR / auto-increment capture (SURVEY §2.2).

The reference parses INTVAR events of type INSERT_ID and latches the
carried id + an ``auto_incr`` flag that the NEXT insert consumes
(/root/reference/src/master/rs_parse_binlog.c:188-223). Like the
reference, the engine does not use the id downstream (web.pages keys on
url), but the capture is part of the wire protocol surface: streams
containing INTVAR events must decode the id, attribute it to the right
row event, and otherwise skip-with-position-advance.

Spark expression: a per-file lag window over log order — declarative, so
the whole attribution stays in whole-stage codegen; the window partitions
by file_seq (binlogs are independent streams), never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_auto_increment(
    events: DataFrame, intvar_col: str = "intvar"
) -> DataFrame:
    """Attach ``auto_increment_id`` to each row event: the id of the
    immediately preceding INTVAR event in the same binlog file, consumed
    only by an INSERT (reference semantics — the latched id applies to the
    next insert and is cleared after use; a delete/update does not take
    it)."""
    w = Window.partitionBy("file_seq").orderBy("log_pos")
    prev_op = F.lag("op").over(w)
    prev_id = F.lag(intvar_col).over(w)
    return events.withColumn(
        "auto_increment_id",
        F.when((F.col("op") == "I") & (prev_op == "INTVAR"), prev_id),
    )
