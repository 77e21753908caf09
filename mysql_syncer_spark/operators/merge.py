"""Merge-as-union+LWW: the apply step (SURVEY §2.5 A1-A3, D1).

The reference applies each row image as an idempotent key-value SET
(/root/reference/src/slave/rs_mysql_test_test.c:59-87) on a single thread.
Parallel equivalent: reduce the batch to one winner per key (dedup.lww_dedup)
and combine with the current state by the SAME reduction — merge IS dedup
over ``current ∪ batch``. One shuffle on the key, map-side partial combine,
no join needed. Deletes are TOMBSTONES (rows with ``_deleted=true`` that
keep their LWW rank) so an out-of-order older event arriving in a later
batch cannot resurrect a deleted key — equivalent to Iceberg MoR delete
files / Kafka compaction tombstones.

Hidden state columns persisted with every row:
  _lww_ts_us:long, _lww_pos:long, _lww_file:int  — the LWW rank
  _deleted:boolean                               — tombstone flag

Rank comparison order is (_lww_ts_us, _lww_file, _lww_pos): log_pos resets
at every binlog rotation (reference checkpoint format '<file>,<pos>',
/root/reference/src/slave/rs_slave_info.c), so on a warc_ts tie the file
sequence must dominate the in-file byte offset — (ts, pos, file) would let
an earlier file's large offset beat a later file's small one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import lww_dedup

HIDDEN_COLS = ["_lww_ts_us", "_lww_pos", "_lww_file", "_deleted"]
LWW_ORDER = ["_lww_ts_us", "_lww_file", "_lww_pos"]


def batch_to_state(
    row_events: DataFrame,
    column_mapping: dict[str, str],
    on_delete: str = "delete",
    target_types: dict[str, str] | None = None,
) -> DataFrame:
    """Project CDC row events → state-shaped rows (payload + hidden cols).

    ``column_mapping``: wire field name (in the event's ``after`` struct) →
    current target column name. Mirrors how a TABLE_MAP's positional columns
    bind to the catalog schema (SURVEY §1.2): DDL renames change the target
    name, never the wire name.

    ``target_types`` (target column → spark dtype string) types the NULL
    emitted when a wire field is absent from this batch's events — an
    untyped ``lit(None)`` is VOID, which parquet has no encoding for, so a
    delta written from such a batch poisons later reads of the column.
    """
    ev_fields = {f.name for f in row_events.schema["after"].dataType.fields}
    target_types = target_types or {}
    cols = []
    for wire, target in column_mapping.items():
        if wire in ev_fields:
            cols.append(F.col(f"after.{wire}").alias(target))
        else:
            cols.append(
                F.lit(None).cast(target_types.get(target, "string")).alias(target)
            )
    is_del = F.col("op") == "D"
    if on_delete == "ignore":
        # Reference parity: delete handler is a no-op
        # (/root/reference/src/slave/rs_mysql_test_test.c:84-87).
        row_events = row_events.filter(~is_del)
        is_del = F.lit(False)
    # dead-letter: a row event without a key cannot be applied (the
    # reference would fail the row decode); dropped, not crashed on
    row_events = row_events.filter(F.col("after.url").isNotNull())
    return row_events.select(
        *cols,
        F.unix_micros(F.col("after.warc_ts")).alias("_lww_ts_us"),
        F.col("log_pos").alias("_lww_pos"),
        F.col("file_seq").alias("_lww_file"),
        is_del.alias("_deleted"),
    )


def merge_state(
    current: DataFrame | None,
    batch_state: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """current ∪ batch → one winner per key by LWW rank.

    ``unionByName(allowMissingColumns=True)`` absorbs schema evolution:
    untouched old snapshots lack newly added columns → NULL-filled, exactly
    the pre-DDL-rows-are-NULL invariant.
    """
    if current is None:
        merged = batch_state
    else:
        merged = current.unionByName(batch_state, allowMissingColumns=True)
    return lww_dedup(merged, list(key_cols), LWW_ORDER, method="max_by")


def live_view(state: DataFrame) -> DataFrame:
    """Public read view: drop tombstones + hidden columns."""
    return state.filter(~F.col("_deleted")).drop(*HIDDEN_COLS)
