"""Stream filters (SURVEY §2.3) — declarative predicates, so Catalyst pushes
them into the parquet scan (the moral equivalent of the reference filtering
at the master before shipping bytes over TCP).

Check ``.explain('formatted')``: every one of these should appear under
``PushedFilters`` on the event-log scan, not as a post-scan Filter node.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import ROW_OPS


def table_filter(df: DataFrame, tables: Sequence[str] | None) -> DataFrame:
    """F1 — replicate-only-these-tables. ``None`` = all tables, matching the
    reference's NULL filter list (/root/reference/src/master/
    rs_parse_binlog.c:300-308: ',db.tb,' substring match)."""
    if not tables:
        return df
    return df.filter(F.col("table").isin(list(tables)))


def op_filter(df: DataFrame, ops: Sequence[str] = ROW_OPS) -> DataFrame:
    """F2 — keep only handled event types; everything else is skipped
    without decode (column pruning gives the skip-without-parse effect,
    /root/reference/src/master/rs_parse_binlog.c:442-466)."""
    return df.filter(F.col("op").isin(list(ops)))


def oversized_ddl_filter(df: DataFrame, max_len: int = 2048) -> DataFrame:
    """F3 — drop DDL/QUERY events whose SQL payload exceeds the cap
    (reference: 2×RS_SQL_MAX_LEN, /root/reference/src/master/
    rs_parse_binlog.c:128-131). Our DDL is typed, so the cap applies to the
    serialized struct fields."""
    too_big = (F.col("op") == "DDL") & (
        F.coalesce(F.length(F.col("ddl.col")), F.lit(0))
        + F.coalesce(F.length(F.col("ddl.new_name")), F.lit(0))
        > max_len
    )
    return df.filter(~too_big)


def server_id_guard(df: DataFrame, expected_server_id: int | None) -> DataFrame:
    """F4 — reject control events from foreign server ids
    (/root/reference/src/master/rs_parse_binlog.c:468-491)."""
    if expected_server_id is None:
        return df
    return df.filter(
        F.col("server_id").isNull() | (F.col("server_id") == expected_server_id)
    )
