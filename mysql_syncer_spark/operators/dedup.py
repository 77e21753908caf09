"""Last-writer-wins dedup (SURVEY D1) + salted two-phase variant (D2).

The reference gets per-key ordering for free from its single-threaded apply
loop (/root/reference/src/slave/rs_redis_thread.c:10-85). A parallel MERGE
needs each batch reduced to ONE row per key first; the winner is the row
with the greatest ``(warc_ts, file_seq, log_pos)`` rank (north rule; file_seq before
log_pos because log_pos resets at binlog rotation).

Two physical strategies, same semantics:

- ``max_by`` (default): ``groupBy(key).agg(max_by(struct(*), rank))`` —
  a hash aggregate with MAP-SIDE PARTIAL combine, so heavy keys are
  pre-reduced before the shuffle. This is already skew-resistant for
  dedup (unlike window functions, which shuffle every duplicate row to
  one partition before ranking) and is the plan that survives 10^10 rows.
- ``salted``: explicit two-phase — partial max_by on (key, salt) then
  final max_by on key — for pathological single-key floods where even
  partial aggregation's per-task hash map overflows. Salt is derived
  from the rank itself (deterministic, no rand(); identical redelivered
  events land in the same salt bucket, keeping dedup idempotent).
- ``window``: row_number() reference implementation, used in tests to
  cross-check semantics (NOT for the hot path — a window shuffles every
  duplicate row of a hot key into one partition before ranking).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Rank floors for null-safe ordering (nulls rank lowest).
_TS_FLOOR = "1900-01-01 00:00:00"
_NUM_FLOOR = -(2**62)


def rank_struct(df: DataFrame, order_cols: Sequence[str]) -> Column:
    """Null-safe lexicographic rank struct over named columns of ``df``;
    greater = later writer."""
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    parts = []
    for i, name in enumerate(order_cols):
        col = F.col(name)
        dt = dtypes.get(name)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            floor: Column = F.lit(_TS_FLOOR).cast(dt)
        elif isinstance(dt, (T.StringType,)):
            floor = F.lit("")
        else:
            floor = F.lit(_NUM_FLOOR).cast(dt or T.LongType())
        parts.append(F.coalesce(col, floor).alias(f"r{i}"))
    return F.struct(*parts)


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    method: str = "max_by",
    salt_buckets: int = 16,
    count_col: str | None = None,
) -> DataFrame:
    """Reduce to one row per key: the max-rank writer wins. Output columns =
    input columns (order preserved). ``count_col``: also emit the number of
    source rows folded into each winner (rides the same aggregate — no
    second scan; sum(count_col) == input rows, the dedup-hits metric)."""
    cols = df.columns
    rank = rank_struct(df, order_cols)
    if method == "max_by":
        aggs = [F.max_by(F.struct(*cols), rank).alias("_w")]
        if count_col:
            aggs.append(F.count(F.lit(1)).alias(count_col))
        winner = df.groupBy(*key_cols).agg(*aggs)
        out_cols = ["_w.*"] + ([count_col] if count_col else [])
        return winner.select(*out_cols)
    if method == "salted":
        # Phase 1: partial winners per (key, salt) — spreads a flooded key
        # over `salt_buckets` reducers.
        salted = df.withColumn("_salt", F.pmod(F.xxhash64(rank), F.lit(salt_buckets)))
        partial = salted.groupBy(*key_cols, "_salt").agg(
            F.max_by(F.struct(*cols), rank).alias("_w"),
            F.count(F.lit(1)).alias("_pc"),
        )
        # Phase 2: final winner per key over ≤salt_buckets candidates.
        flat = partial.select("_w.*", "_pc")
        rank2 = rank_struct(flat, order_cols)
        aggs = [F.max_by(F.struct(*cols), rank2).alias("_w")]
        if count_col:
            aggs.append(F.sum("_pc").alias(count_col))
        final = flat.groupBy(*key_cols).agg(*aggs)
        return final.select(*(["_w.*"] + ([count_col] if count_col else [])))
    if method == "window":
        w = Window.partitionBy(*key_cols).orderBy(rank.desc())
        proj = list(cols)
        df2 = df.withColumn("_rn", F.row_number().over(w))
        if count_col:
            df2 = df2.withColumn(
                count_col, F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
            )
            proj.append(count_col)
        return df2.filter(F.col("_rn") == 1).select(*proj)
    raise ValueError(f"unknown method {method}")
