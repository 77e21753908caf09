"""D3: DDL applied transactionally before the batch's merge."""

import pyspark.sql.functions as F

from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
from mysql_syncer_spark.oracle import sequential_replay
from mysql_syncer_spark.plans.replay import replay
from mysql_syncer_spark.sink.pages_table import PagesTable


def test_add_then_rename_column(spark, tmp_table_path, tmp_path):
    spec = GenSpec(
        n_events=1_200,
        n_urls=200,
        events_per_file=400,
        ddl_scenario=(
            (0.30, "add_column", "extra", None, "string"),
            (0.60, "rename_column", "extra", "extra_v2", None),
        ),
    )
    tbl = generate_events(spec)
    d = str(tmp_path / "log")
    write_event_log(tbl, d)
    replay(spark, d, tmp_table_path, num_buckets=4)
    t = PagesTable(spark, tmp_table_path)
    m = t.manifest()
    assert [n for n, _ in m.schema] == ["url", "warc_ts", "html", "text", "lang", "extra_v2"]
    assert m.column_mapping["extra"] == "extra_v2"
    assert m.renames == [["extra", "extra_v2"]]
    df = t.read()
    assert "extra_v2" in df.columns and "extra" not in df.columns
    oracle, cols, _ = sequential_replay(tbl)
    assert df.columns == cols
    # pre-DDL winners have NULL extra_v2, post-DDL winners carry values
    vals = {r["url"]: r["extra_v2"] for r in df.collect()}
    expect = {u: row.get("extra_v2") for u, row in oracle.items()}
    assert vals == expect
    assert any(v is not None for v in vals.values())
    assert any(v is None for v in vals.values())


def test_ddl_redelivery_idempotent(spark, tmp_table_path):
    t = PagesTable.create(spark, tmp_table_path, num_buckets=2)
    schema = (
        "log_pos long, file_seq int, server_id int, op string, table string,"
        " tx_id long,"
        " before struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
        " after struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
        " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
    )
    ddl = ("add_column", "extra", None, "string")
    ev = spark.createDataFrame(
        [
            (1, 0, 1, "DDL", "web.pages", None, None, None, ddl),
            (2, 0, 1, "DDL", "web.pages", None, None, None, ddl),  # duplicate
        ],
        schema,
    )
    t.apply_batch("b0", ev, None)
    t.apply_batch("b1", ev.withColumn("log_pos", F.col("log_pos") + 10), None)
    names = [n for n, _ in t.manifest().schema]
    assert names.count("extra") == 1
