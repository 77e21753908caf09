"""Iceberg execution smoke test — run where network/jars exist:

    $SPARK_HOME/bin/spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.6.1 \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf "spark.sql.catalog.lake.warehouse=file:///tmp/iceberg_smoke_wh" \
      --py-files dist/mysql_syncer_spark.zip \
      tools/submit_iceberg_smoke.py

Drives sink.iceberg_table.apply_batch_iceberg end-to-end against a local
hadoop catalog: CREATE (bucketed), two batches with an out-of-order
older event, one ADD COLUMN DDL, then asserts the LWW winners match the
parquet-backend semantics. Exits non-zero on any divergence.

In-sandbox (no jars) this script fails fast with the adapter's clear
RuntimeError — the same condition tests/test_skew_and_iceberg.py pins.
"""

from __future__ import annotations

import datetime as dt
import sys

from pyspark.sql import SparkSession

from mysql_syncer_spark.config import TableConfig
from mysql_syncer_spark.sink.iceberg_table import (
    apply_batch_iceberg,
    build_create_sql,
    iceberg_available,
)

SCHEMA = (
    "log_pos long, file_seq int, server_id int, op string, table string,"
    " tx_id long,"
    " before struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " after struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
)


def main() -> int:
    spark = SparkSession.builder.appName("iceberg_smoke").getOrCreate()
    if not iceberg_available(spark):
        print(
            "FAIL: Iceberg extensions not on the classpath — launch via the "
            "spark-submit line in this file's docstring",
            file=sys.stderr,
        )
        return 2
    ident = "lake.smoke.pages"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.smoke")
    spark.sql(f"DROP TABLE IF EXISTS {ident}")
    schema = [["url", "string"], ["warc_ts", "timestamp"], ["html", "binary"],
              ["text", "string"], ["lang", "string"]]
    spark.sql(build_create_sql(ident, schema, num_buckets=4))

    ts = lambda h: dt.datetime(2024, 1, 1, h, tzinfo=dt.timezone.utc)
    row = lambda pos, fs, url, t, txt: (
        pos, fs, 1, "I", "web.pages", 1, None, (url, t, None, txt, "en"), None,
    )
    cfg = TableConfig(name="web.pages")
    mapping = {c: c for c, _ in schema}

    b0 = spark.createDataFrame(
        [row(1, 0, "u1", ts(5), "v1"), row(2, 0, "u2", ts(5), "w1")], SCHEMA
    )
    apply_batch_iceberg(spark, ident, b0, cfg, mapping)
    # batch 1: newer u1 wins, OLDER u2 must lose, one DDL lands
    b1 = spark.createDataFrame(
        [
            row(10, 1, "u1", ts(9), "v2"),
            row(11, 1, "u2", ts(1), "stale"),
            (12, 1, 1, "DDL", "web.pages", None, None, None,
             ("add_column", "extra", None, "string")),
        ],
        SCHEMA,
    )
    apply_batch_iceberg(spark, ident, b1, cfg, mapping)

    got = {
        r["url"]: r["text"]
        for r in spark.sql(
            f"SELECT url, text FROM {ident} WHERE NOT _deleted"
        ).collect()
    }
    want = {"u1": "v2", "u2": "w1"}
    cols = {f.name for f in spark.table(ident).schema.fields}
    ok = got == want and "extra" in cols
    print(("PASS" if ok else "FAIL"), got, sorted(cols))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
