"""Temporal joins Spark lacks as built-ins, composed from shuffle-sane
primitives (the task's canonical "custom operator" cases):

- ``asof_join``: each left row matches the latest right row with the same
  key at-or-before its timestamp. NOT a non-equi join (which Catalyst
  would plan as a broadcast-nested-loop): tag both sides, UNION, and take
  ``last(right, ignorenulls=True)`` over a (key)-partitioned window
  ordered by (time, tag). ONE shuffle on the key, one sort within
  partitions — the same cost shape as a groupBy. DuckDB's native
  ``ASOF JOIN`` is the oracle twin for tests.

- ``range_join``: points against [start, end) intervals via interval
  bucketing: ranges explode into fixed-width bins, points hash to their
  bin, equi-join on (bin) + residual predicate. Catalyst alone plans a
  pure inequality join as BroadcastNestedLoop / cartesian — O(n·m); the
  binned form is an equi-join whose cost is O(points + ranges·bins_per_
  range + true matches). Pick ``bin_width`` near the typical range
  length: much smaller explodes ranges into many bins, much larger puts
  many ranges in one bin and shifts work to the residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (latest right at-or-before the left time).

    ``left_ts``/``right_ts`` must be mutually comparable orderable columns
    (numbers or timestamps). ``tolerance`` (same units as a numeric ts,
    or microseconds for timestamps) drops matches staler than the bound.
    Right payload columns arrive suffixed; unmatched left rows keep NULLs
    (left-outer semantics, like pandas merge_asof)."""
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    r_struct = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in rcols]
    )
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_probe"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_probe"),  # build rows sort BEFORE probe rows at
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),  # equal time → at-or-before includes equality
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_probe") == 1)
    )
    if tolerance is not None:
        lt, rt = F.col("_t"), F.col("_m._rts")
        # timestamps diff in microseconds; numbers diff natively
        gap = (
            F.unix_micros(lt) - F.unix_micros(rt)
            if str(matched.schema["_t"].dataType) == "TimestampType()"
            else lt - rt
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tolerance), F.col("_m"))
        )
    out = matched.select(
        *[F.col(c) for c in on],
        F.col("_t").alias(left_ts),
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        F.col("_m._rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bin_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join points p to intervals [start, end) with p in the interval,
    via interval bucketing (see module docstring). ``how``: 'inner' or
    'left' (unmatched points kept with NULL range columns)."""
    if how not in ("inner", "left"):
        raise ValueError(how)
    p_bin = F.floor(F.col(point_col) / bin_width)
    pts = points.withColumn("_bin", p_bin)
    rng = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor((F.col(end_col) - 1) / bin_width),
            )
        ),
    )
    cond = (
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    if how == "inner":
        return pts.join(rng, "_bin").filter(cond).drop("_bin")
    # left: inner part + anti part with NULL range columns
    inner = pts.join(rng, "_bin").filter(cond).drop("_bin")
    matched_keys = inner.select(*points.columns).distinct()
    unmatched = points.join(matched_keys, points.columns, "left_anti")
    for c in ranges.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(ranges.schema[c].dataType)
        )
    return inner.select(*points.columns, *ranges.columns).unionByName(
        unmatched.select(*points.columns, *ranges.columns)
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    bucket_width: int = 3600,
    suffix: str = "_right",
) -> DataFrame:
    """Scale-hardened as-of join: ``asof_join`` windows by key alone, so a
    hot key sorts ALL its rows in one task. This variant partitions the
    window by (key, time-bucket): the big sort is bounded by bucket
    population, and the only per-key-global step is a carry computed at
    BUCKET granularity (#buckets rows per key, not #rows).

    Pass 1: per (key, bucket) take the build row with max time; cumulate
    across buckets (a window over the tiny per-bucket frame, shifted by
    one so a bucket carries in the latest build row STRICTLY BEFORE it).
    Pass 2: union probe rows + build rows + carry rows, window within
    (key, bucket). Numeric timestamps only (cast timestamps to
    unix_micros first); results equal ``asof_join`` exactly
    (differential-tested)."""
    bkt = lambda c: F.floor(F.col(c) / bucket_width).alias("_bkt")
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    r_struct = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in rcols])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    rb = right.select(*on, F.col(right_ts).alias("_t"), r_struct.alias("_r"), bkt(right_ts))
    # pass 1: per-bucket max build row, then carry = previous buckets' last.
    # The carry frame must cover EVERY bucket either side touches — a
    # probe-only bucket still needs the latest build from earlier buckets.
    per_bucket = rb.groupBy(*on, "_bkt").agg(
        F.max_by("_r", F.col("_t")).alias("_last_in_bucket")
    )
    all_buckets = (
        left.select(*on, bkt(left_ts))
        .unionByName(rb.select(*on, "_bkt"))
        .distinct()
    )
    wc = (
        Window.partitionBy(*on)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)  # strictly before
    )
    carries = (
        all_buckets.join(per_bucket, [*on, "_bkt"], "left")
        .select(
            *on,
            F.col("_bkt"),
            F.last("_last_in_bucket", ignorenulls=True).over(wc).alias("_carry"),
        )
        .filter(F.col("_carry").isNotNull())
    )

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(2).alias("_tag"),  # probe rows sort after builds at equal t
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
        bkt(left_ts),
    )
    r_tagged = rb.select(
        *on,
        "_t",
        F.lit(1).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        "_r",
        "_bkt",
    )
    # carry rows enter their bucket BEFORE everything in it
    c_tagged = carries.select(
        *on,
        F.lit(None).cast(r_tagged.schema["_t"].dataType).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.col("_carry").alias("_r"),
        F.col("_bkt"),
    )
    u = l_tagged.unionByName(r_tagged).unionByName(c_tagged)
    w = (
        Window.partitionBy(*on, "_bkt")
        .orderBy(F.col("_tag") != 0, F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 2)
    )
    return matched.select(
        *on,
        F.col("_t").alias(left_ts),
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        F.col("_m._rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
