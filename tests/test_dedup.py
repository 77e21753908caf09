"""LWW dedup operator (D1/D2): strategy equivalence + tie semantics."""

import datetime as dt

import pyspark.sql.functions as F

from mysql_syncer_spark.operators.dedup import lww_dedup

TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload string, log_pos long, file_seq int"
    )


def test_higher_log_pos_wins_on_ts_tie(spark):
    """FIXTURES §6: same url, same warc_ts, different log_pos → higher wins."""
    df = _df(
        spark,
        [("u", TS, "old", 10, 0), ("u", TS, "new", 20, 0)],
    )
    out = lww_dedup(df, ["url"], ["warc_ts", "file_seq", "log_pos"]).collect()
    assert len(out) == 1 and out[0]["payload"] == "new"


def test_file_seq_dominates_log_pos_on_ts_tie(spark):
    """log_pos resets at binlog rotation: on a warc_ts tie, a later FILE's
    small offset must beat an earlier file's large offset (regression for
    the (ts, pos, file) inversion)."""
    df = _df(
        spark,
        [("u", TS, "old-file-big-pos", 9999, 0), ("u", TS, "new-file-small-pos", 4, 1)],
    )
    out = lww_dedup(df, ["url"], ["warc_ts", "file_seq", "log_pos"]).collect()
    assert out[0]["payload"] == "new-file-small-pos"


def test_warc_ts_dominates_log_pos(spark):
    df = _df(
        spark,
        [("u", TS + dt.timedelta(days=1), "late-ts", 10, 0), ("u", TS, "late-pos", 99, 0)],
    )
    out = lww_dedup(df, ["url"], ["warc_ts", "file_seq", "log_pos"]).collect()
    assert out[0]["payload"] == "late-ts"


def test_null_ts_ranks_lowest(spark):
    df = _df(spark, [("u", None, "null-ts", 99, 9), ("u", TS, "has-ts", 1, 0)])
    out = lww_dedup(df, ["url"], ["warc_ts", "file_seq", "log_pos"]).collect()
    assert out[0]["payload"] == "has-ts"


def test_three_strategies_agree(spark, sf_dir):
    """max_by / salted / window produce identical winners on real data."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumnRenamed("user_id", "url")
        .withColumnRenamed("ts", "warc_ts")
        .withColumn("log_pos", F.col("event_id"))
        .withColumn("file_seq", F.lit(0))
    )
    order = ["warc_ts", "file_seq", "log_pos"]
    a = lww_dedup(ev, ["url"], order, method="max_by")
    b = lww_dedup(ev, ["url"], order, method="salted", salt_buckets=4)
    c = lww_dedup(ev, ["url"], order, method="window")
    ka = sorted((r["url"], r["event_id"]) for r in a.collect())
    kb = sorted((r["url"], r["event_id"]) for r in b.collect())
    kc = sorted((r["url"], r["event_id"]) for r in c.collect())
    assert ka == kb == kc


def test_dedup_plan_is_partial_aggregate(spark, sf_dir):
    """Scale check: max_by must plan as hash agg with map-side partial
    (two HashAggregate nodes), not a window sort."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumnRenamed("user_id", "url")
        .withColumnRenamed("ts", "warc_ts")
        .withColumn("log_pos", F.col("event_id"))
        .withColumn("file_seq", F.lit(0))
    )
    plan = lww_dedup(ev, ["url"], ["warc_ts", "file_seq", "log_pos"])._jdf.queryExecution().executedPlan().toString()
    # struct-valued max_by buffers plan as SortAggregate; the scale property
    # we need is the MAP-SIDE PARTIAL combine before the exchange.
    assert "partial_max_by" in plan
    assert "Window" not in plan
