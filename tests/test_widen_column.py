"""widen_column schema evolution (MySQL ALTER ... MODIFY analog):
lossless type widening with NO data rewrite — old int32 vintages upcast
in the scan, new deltas write the wide type, values beyond int range
apply correctly, and redelivery stays a no-op."""

import os
import tempfile

import pytest
from pyspark.sql import types as T

from mysql_syncer_spark.model import CDC_EVENT_SCHEMA
from mysql_syncer_spark.sink.pages_table import PagesTable

BIG = 9_000_000_000  # > int32 range


def _events(spark, rows, views_type, ddls=()):
    """Envelope events whose after struct carries an extra `views` column."""
    after_t = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("views", views_type),
        ]
    )
    by_name = {f.name: f for f in CDC_EVENT_SCHEMA.fields}
    schema = T.StructType(
        [
            by_name["log_pos"], by_name["file_seq"], by_name["server_id"],
            by_name["op"], by_name["table"], by_name["tx_id"],
            T.StructField("before", after_t), T.StructField("after", after_t),
            by_name["ddl"],
        ]
    )
    import datetime as dt

    data = []
    for i, (url, views) in enumerate(rows):
        data.append(
            (
                100 + i, 1, 1, "I", "web.pages", None, None,
                (url, dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc), views),
                None,
            )
        )
    for j, d in enumerate(ddls):
        data.append((10 + j, 1, 1, "DDL", "web.pages", None, None, None, d))
    return spark.createDataFrame(data, schema)


def test_widen_int_to_long_across_vintages(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="widen_"), "pages")
    t = PagesTable.create(spark, path, num_buckets=4)
    # batch 1: add views INT + narrow rows
    b1 = _events(
        spark,
        [("https://a.example.com/1", 7), ("https://a.example.com/2", 11)],
        T.IntegerType(),
        ddls=[("add_column", "views", None, "int")],
    )
    t.apply_batch("b1", b1)
    assert dict(t.manifest().schema)["views"] == "int"

    # batch 2: widen to BIGINT + a row beyond int range
    b2 = _events(
        spark,
        [("https://a.example.com/3", BIG)],
        T.LongType(),
        ddls=[("widen_column", "views", None, "long")],
    )
    t.apply_batch("b2", b2)
    m = t.manifest()
    assert dict(m.schema)["views"] == "bigint"

    out = {r["url"]: r["views"] for r in t.read().collect()}
    assert out["https://a.example.com/1"] == 7      # old int32 vintage upcast
    assert out["https://a.example.com/3"] == BIG    # wide value applied
    assert dict(t.read().dtypes)["views"] == "bigint"

    # redelivery no-op; DDL idempotent under re-apply
    assert t.apply_batch("b2", b2)["skipped"] is True
    # time travel: the pre-widen snapshot still reads with its own schema
    pre = t.read(version=m.version - 1)
    assert dict(pre.dtypes)["views"] == "int"

    # compaction folds vintages without disturbing widened values
    t.compact()
    out2 = {r["url"]: r["views"] for r in t.read().collect()}
    assert out2 == out


def test_widen_rejects_narrowing_and_unknown(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="widen2_"), "pages")
    t = PagesTable.create(spark, path, num_buckets=4)
    b1 = _events(
        spark,
        [("https://a.example.com/1", 7)],
        T.IntegerType(),
        ddls=[("add_column", "views", None, "int")],
    )
    t.apply_batch("b1", b1)
    bad = _events(
        spark, [], T.IntegerType(), ddls=[("widen_column", "views", None, "string")]
    )
    with pytest.raises(Exception):
        t.apply_batch("bad", bad)
    # unknown column widen is an idempotent skip, not a crash
    ok = _events(
        spark, [], T.IntegerType(), ddls=[("widen_column", "ghost", None, "long")]
    )
    assert t.apply_batch("ok", ok)["skipped"] is False
