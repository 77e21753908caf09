"""Ordered-step funnel analysis over an event stream — the standard
product-analytics operator (signup → click → purchase conversion).

Spark-first shape: ONE groupBy(user) collecting the user's (time, step)
pairs for the funnel's steps only (pushdown filter), then a JVM array
fold walks the sorted pairs once to find how far the ordered sequence
got. No window over the whole stream, no self-joins per step (the naive
k-step formulation is k-1 self-joins); per-user state is bounded by that
user's funnel-step events. Everything after the single shuffle is
whole-stage codegen (sort_array + aggregate fold).

Strict-order semantics: step i+1 counts only when it occurs at-or-after
the time the user FIRST completed steps 0..i (standard funnel; equal
timestamps count, matching the SQL oracle's ``>=``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per user: ``stage`` = number of funnel steps completed in order
    (0..len(steps)) and ``stage_ts`` = completion time of the last
    completed step. Users with no funnel-step events are absent."""
    k = len(steps)
    step_idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )  # 1-based; 0 = not a funnel step
    pairs = (
        events.withColumn("_step", step_idx)
        .filter(F.col("_step") > 0)
        .select(
            F.col(user_col),
            F.struct(F.col(ts_col).alias("t"), F.col("_step").alias("s")).alias("_p"),
        )
    )
    per_user = pairs.groupBy(user_col).agg(
        F.sort_array(F.collect_list("_p")).alias("_ps")
    )
    # fold: acc = (stage, ts of last completed step); advance when the
    # next event IS the next step and not earlier than the current ts
    first_t = F.element_at(F.col("_ps"), 1)["t"]
    zero = F.struct(
        F.lit(0).cast("int").alias("stage"), first_t.alias("ts")
    )

    def step_fn(acc, p):
        advance = (p["s"] == acc["stage"] + 1) & (
            (acc["stage"] == 0) | (p["t"] >= acc["ts"])
        )
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                p["t"].alias("ts"),
            ),
        ).otherwise(acc)

    folded = per_user.select(
        F.col(user_col),
        F.aggregate(F.col("_ps"), zero, step_fn).alias("_f"),
    )
    return folded.select(
        F.col(user_col),
        F.col("_f.stage").alias("stage"),
        F.when(F.col("_f.stage") >= 1, F.col("_f.ts")).alias("stage_ts"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic funnel report: for each step, how many users got AT LEAST
    that far in order. One row per step, monotone non-increasing."""
    stages = funnel_stages(events, steps, user_col, type_col, ts_col)
    per_stage = stages.groupBy("stage").agg(
        F.countDistinct(user_col).alias("n")
    )
    # users at stage >= i: suffix sum over the tiny per-stage frame
    rows = per_stage.collect()
    by_stage = {r["stage"]: r["n"] for r in rows}
    k = len(steps)
    out = []
    running = 0
    for i in range(k, 0, -1):
        running += by_stage.get(i, 0)
        out.append((i, steps[i - 1], running))
    spark = events.sparkSession
    return spark.createDataFrame(
        sorted(out), "step int, step_name string, n_users long"
    )
