"""Op routing / event-type dispatch (SURVEY §2.1 S5, §2.4 R1-R2).

The reference dispatches through a 27-entry function table
(/root/reference/src/master/rs_parse_binlog.c:5-57) and a per-table hash
registry (/root/reference/src/slave/rs_register_tables.c:11-36). Columnar
equivalent: ``op`` / ``table`` are plain columns — routing is a filter or a
``when`` branch, and "dispatch to handler" is a driver-side dict lookup over
the (tiny) distinct table set of the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import TableConfig
from ..model import ROW_OPS


def split_row_and_ddl(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One pass → (row_events, ddl_events). Cheap: both sides are scans with
    pushed predicates; Spark reads the parquet twice but prunes aggressively,
    and DDL rows are ~0% of the log."""
    return df.filter(F.col("op").isin(list(ROW_OPS))), df.filter(F.col("op") == "DDL")


def op_counts(df: DataFrame) -> DataFrame:
    """Observability: events per op code (partial-aggregated map-side)."""
    return df.groupBy("op").agg(F.count("*").alias("n_events"))


def tables_in_batch(df: DataFrame) -> list[str]:
    """Distinct table names of a batch — the driver-side routing key set.
    Bounded by the registry size, so collect() is safe at any data scale."""
    return [r[0] for r in df.select("table").distinct().collect()]


def route_tables(
    df: DataFrame, registry: dict[str, TableConfig]
) -> dict[str, tuple[TableConfig, DataFrame]]:
    """R1 — db.tb → (config, per-table slice). Unregistered tables are
    skipped, mirroring the reference's hash-miss behavior
    (/root/reference/src/slave/rs_redis_thread.c:108-111)."""
    out: dict[str, tuple[TableConfig, DataFrame]] = {}
    for name in tables_in_batch(df):
        cfg = registry.get(name)
        if cfg is not None:
            out[name] = (cfg, df.filter(F.col("table") == name))
    return out
