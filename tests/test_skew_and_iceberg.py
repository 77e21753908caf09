"""Hot-key detection + Iceberg adapter SQL generation."""

import pyspark.sql.functions as F
import pytest

from mysql_syncer_spark.operators.skew import hot_key_candidates, needs_salting
from mysql_syncer_spark.sink.iceberg_table import (
    apply_batch_iceberg,
    build_create_sql,
    build_ddl_sql,
    build_merge_sql,
    iceberg_available,
)


def test_hot_keys_found_and_ranked(spark):
    rows = [("hot",)] * 500 + [(f"u{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "url string")
    hot = hot_key_candidates(df, ["url"], min_share=0.1).collect()
    assert len(hot) == 1
    assert hot[0]["url"] == "hot" and hot[0]["rank"] == 1
    assert abs(hot[0]["share"] - 0.5) < 1e-6
    assert needs_salting(df, ["url"], threshold=0.3)
    assert not needs_salting(df, ["url"], threshold=0.6)


def test_iceberg_sql_generation():
    create = build_create_sql(
        "lake.web.pages", [["url", "string"], ["warc_ts", "timestamp"]], 4096
    )
    assert "USING iceberg" in create
    assert "PARTITIONED BY (bucket(4096, url))" in create
    assert "_lww_pos bigint" in create

    merge = build_merge_sql("lake.web.pages", ["url", "text", "_lww_ts_us",
                                               "_lww_pos", "_lww_file", "_deleted"])
    assert "MERGE INTO lake.web.pages t" in merge
    assert "ON t.url = s.url" in merge
    # LWW guard: strictly-newer rank only
    assert "(s._lww_ts_us, s._lww_file, s._lww_pos) > (t._lww_ts_us, t._lww_file, t._lww_pos)" in merge
    assert "WHEN NOT MATCHED THEN INSERT" in merge

    assert build_ddl_sql("t", {"kind": "add_column", "col": "x", "dtype": "string"}) == \
        "ALTER TABLE t ADD COLUMN x string"
    assert build_ddl_sql("t", {"kind": "rename_column", "col": "x", "new_name": "y"}) == \
        "ALTER TABLE t RENAME COLUMN x TO y"


def test_iceberg_unavailable_is_clear(spark):
    assert not iceberg_available(spark)
    from mysql_syncer_spark.config import TableConfig

    ev = spark.createDataFrame([], "op string, table string, log_pos long")
    with pytest.raises(RuntimeError, match="Iceberg extensions not on the classpath"):
        apply_batch_iceberg(spark, "lake.t", ev, TableConfig(name="web.pages"), {})
