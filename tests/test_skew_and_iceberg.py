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


def test_hot_key_detection_single_scan(spark):
    """The detector must not scan the input twice: the total comes from the
    (key,count) partials, so the plan reuses the groupBy exchange instead
    of a second full scan."""
    rows = [(f"u{i % 50}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "url string")
    out = hot_key_candidates(df, ["url"], min_share=0.0)
    out.collect()  # AQE materializes exchange reuse in the FINAL plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_sink_switches_to_salted_merge_on_flood(spark, tmp_path):
    """Zipf-flood batch: the planner must pick the salted two-phase merge
    and produce the same final state as the plain plan."""
    import datetime as dt

    from mysql_syncer_spark.config import TableConfig
    from mysql_syncer_spark.sink.pages_table import PagesTable

    def mkevents():
        rows = []
        for i in range(600):
            url = "https://hot.example.com/" if i % 2 == 0 else f"https://u{i}.example.com/"
            rows.append(
                (
                    i * 97 + 4, 0, 1, "I", "web.pages", i // 7,
                    None,
                    (url, dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                     + dt.timedelta(seconds=i), b"<p>x</p>", None, "en"),
                    None,
                )
            )
        return spark.createDataFrame(
            rows,
            "log_pos long, file_seq int, server_id int, op string, table string,"
            "tx_id long, before struct<url:string,warc_ts:timestamp,html:binary,"
            "text:string,lang:string>, after struct<url:string,warc_ts:timestamp,"
            "html:binary,text:string,lang:string>, ddl struct<kind:string,"
            "col:string,new_name:string,dtype:string>",
        )

    ev = mkevents()
    hot_cfg = TableConfig(name="web.pages", salt_min_rows=100,
                          salt_threshold_share=0.05, salt_buckets=4)
    plain_cfg = TableConfig(name="web.pages", salt_min_rows=10**9)

    t_hot = PagesTable.create(spark, str(tmp_path / "hot"), num_buckets=4)
    res_hot = t_hot.apply_batch("b0", ev, cfg=hot_cfg)
    assert res_hot["salted_merge"] is True
    # max_key_rows is the (rows - distinct) flood-mass ESTIMATE (HLL ±2%)
    assert 250 <= res_hot["max_key_rows"] <= 330

    t_plain = PagesTable.create(spark, str(tmp_path / "plain"), num_buckets=4)
    res_plain = t_plain.apply_batch("b0", ev, cfg=plain_cfg)
    assert res_plain["salted_merge"] is False

    a = {(r["url"], r["warc_ts"], r["lang"]) for r in t_hot.read().collect()}
    b = {(r["url"], r["warc_ts"], r["lang"]) for r in t_plain.read().collect()}
    assert a == b and len(a) == 301  # 300 cold urls + 1 hot winner


def test_iceberg_golden_sql_edge_cases():
    """Golden statements for every generated shape the adapter can emit
    (the jars are absent in-sandbox, so the SQL text IS the contract):
    tombstone-as-row inserts, rename mid-batch, add+rename chains."""
    # 1. tombstones are ROWS: the column list must carry _deleted so a
    #    winning delete INSERTS a tombstone when unmatched
    cols = ["url", "text", "_lww_ts_us", "_lww_pos", "_lww_file", "_deleted"]
    merge = build_merge_sql("lake.t", cols)
    assert "INSERT (url, text, _lww_ts_us, _lww_pos, _lww_file, _deleted)" in merge
    assert "VALUES (s.url, s.text, s._lww_ts_us, s._lww_pos, s._lww_file, s._deleted)" in merge
    # and the rank guard must allow updating a live row INTO a tombstone
    assert "t._deleted" not in merge.split("WHEN MATCHED")[1].split("THEN")[0], (
        "rank guard must not exclude tombstone transitions"
    )

    # 2. rename mid-batch: DDL statements are emitted in log order BEFORE
    #    the merge, so the merge's column list uses the post-rename name
    ddls = [
        {"kind": "add_column", "col": "extra", "dtype": "string"},
        {"kind": "rename_column", "col": "extra", "new_name": "extra_v2"},
    ]
    stmts = [build_ddl_sql("lake.t", d) for d in ddls]
    assert stmts == [
        "ALTER TABLE lake.t ADD COLUMN extra string",
        "ALTER TABLE lake.t RENAME COLUMN extra TO extra_v2",
    ]
    merge2 = build_merge_sql("lake.t", ["url", "extra_v2", "_lww_ts_us",
                                        "_lww_pos", "_lww_file", "_deleted"])
    assert "s.extra_v2" in merge2 and "s.extra " not in merge2

    # 3. add_column dtype defaulting (DDL events may omit dtype)
    assert build_ddl_sql("t", {"kind": "add_column", "col": "x", "dtype": None}) \
        == "ALTER TABLE t ADD COLUMN x string"

    # 4. composite create: bucket partitioning + hidden columns present once
    create = build_create_sql("lake.t", [["url", "string"], ["extra_v2", "string"]], 8)
    assert create.count("_deleted boolean") == 1
    assert "PARTITIONED BY (bucket(8, url))" in create


def test_adaptive_planner_skips_probe_between_edges(spark, tmp_path):
    """Pipelined auto mode: the first batches probe, a stable duplicate
    share carries the decision with NO probe job (observe-only, exact
    events_in), and a hot-key flood moves the share enough to force a
    re-probe that flips the merge to salted."""
    import datetime as dt

    from mysql_syncer_spark.config import TableConfig
    from mysql_syncer_spark.sink.pages_table import PagesTable

    schema = (
        "log_pos long, file_seq int, server_id int, op string, table string,"
        "tx_id long, before struct<url:string,warc_ts:timestamp,html:binary,"
        "text:string,lang:string>, after struct<url:string,warc_ts:timestamp,"
        "html:binary,text:string,lang:string>, ddl struct<kind:string,"
        "col:string,new_name:string,dtype:string>"
    )

    def mk(seq, hot=False):
        rows = []
        for i in range(300):
            url = (
                "https://hot.example.com/" if hot and i % 2 == 0
                else f"https://u{seq}-{i}.example.com/"
            )
            rows.append(
                (seq * 1000 + i, seq, 1, "I", "web.pages", None, None,
                 (url, dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                  + dt.timedelta(seconds=i), b"<p>x</p>", None, "en"), None)
            )
        return spark.createDataFrame(rows, schema)

    cfg = TableConfig(name="web.pages", salt_min_rows=100,
                      salt_threshold_share=0.05, salt_buckets=4,
                      skew_probe="auto", salt_reprobe_delta=0.10)
    t = PagesTable.create(spark, str(tmp_path / "adaptive"), num_buckets=4)
    # depth=1 so planner state updates before each next submit
    batches = [(f"b-{k}", mk(k)) for k in range(3)] + [("b-3", mk(3, hot=True)), ("b-4", mk(4, hot=True))]
    res = t.apply_batches_pipelined(batches, cfg=cfg, depth=1)
    by_id = {r["batch_id"]: r for r in res}
    assert by_id["b-0"]["skew_probed"] is True      # first batch probes
    assert by_id["b-1"]["skew_probed"] is False     # stable share carries
    assert by_id["b-2"]["skew_probed"] is False
    assert by_id["b-3"]["skew_probed"] is False     # flood batch itself ran carried...
    assert by_id["b-4"]["skew_probed"] is True      # ...its share moved → re-probe
    assert by_id["b-4"]["salted_merge"] is True     # and the probe flips to salted
    # events_in stays EXACT in observe-only batches
    assert by_id["b-1"]["events_in"] == 300
    # final state correct: 5*150-ish cold urls + hot winner
    urls = {r["url"] for r in t.read().collect()}
    assert "https://hot.example.com/" in urls
    assert len(urls) == 3 * 300 + 2 * 150 + 1


def test_iceberg_apply_batch_executes_when_available(spark):
    """EXECUTES apply_batch_iceberg (CREATE → two MERGE batches with an
    out-of-order older event → DDL) when the jars are on the classpath;
    skipped in-sandbox (no network for --packages). The same flow runs
    standalone via tools/submit_iceberg_smoke.py under spark-submit."""
    import datetime as dt

    import pytest as _pytest

    from mysql_syncer_spark.sink.iceberg_table import build_create_sql

    if not iceberg_available(spark):
        _pytest.skip(
            "Iceberg jars absent in-sandbox — run tools/submit_iceberg_smoke.py "
            "under spark-submit with iceberg-spark-runtime"
        )
    schema_sql = (
        "log_pos long, file_seq int, server_id int, op string, table string,"
        " tx_id long,"
        " before struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
        " after struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
        " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
    )
    ident = "lake.smoke.pages_pytest"
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
    apply_batch_iceberg(
        spark,
        ident,
        spark.createDataFrame(
            [row(1, 0, "u1", ts(5), "v1"), row(2, 0, "u2", ts(5), "w1")],
            schema_sql,
        ),
        cfg, mapping,
    )
    apply_batch_iceberg(
        spark,
        ident,
        spark.createDataFrame(
            [row(10, 1, "u1", ts(9), "v2"), row(11, 1, "u2", ts(1), "stale")],
            schema_sql,
        ),
        cfg, mapping,
    )
    got = {r["url"]: r["text"] for r in
           spark.sql(f"SELECT url, text FROM {ident} WHERE NOT _deleted").collect()}
    assert got == {"u1": "v2", "u2": "w1"}
