"""Targeted FIXTURES §6 invariants: delete/insert ordering across batches,
bucket pruning, null-key dead-lettering."""

import os

import pyspark.sql.functions as F

from mysql_syncer_spark.sink.pages_table import PagesTable

SCHEMA = (
    "log_pos long, file_seq int, server_id int, op string, table string,"
    " tx_id long,"
    " before struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " after struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
)


def _ev(spark, rows):
    """rows: (log_pos, file_seq, op, url, warc_ts_str)"""
    import datetime as dt

    data = [
        (
            pos,
            seq,
            1,
            op,
            "web.pages",
            1,
            None,
            (url, dt.datetime.fromisoformat(ts), b"<p>x</p>" if op != "D" else None,
             None, "en" if op != "D" else None),
            None,
        )
        for pos, seq, op, url, ts in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_delete_beats_older_insert_across_batches(spark, tmp_table_path):
    """D with higher (warc_ts) wins; an OLDER insert arriving in a LATER
    batch must NOT resurrect the url (tombstone retains the rank)."""
    t = PagesTable.create(spark, tmp_table_path, num_buckets=4)
    t.apply_batch("b0", _ev(spark, [(1, 0, "I", "u1", "2024-01-01T00:00"),
                                    (2, 0, "D", "u1", "2024-01-05T00:00")]), None)
    assert t.read().count() == 0
    # older event redelivered later
    t.apply_batch("b1", _ev(spark, [(3, 1, "U", "u1", "2024-01-03T00:00")]), None)
    assert t.read().count() == 0


def test_newer_insert_resurrects_after_delete(spark, tmp_table_path):
    t = PagesTable.create(spark, tmp_table_path, num_buckets=4)
    t.apply_batch("b0", _ev(spark, [(1, 0, "D", "u1", "2024-01-05T00:00")]), None)
    t.apply_batch("b1", _ev(spark, [(2, 1, "I", "u1", "2024-01-06T00:00")]), None)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["url"] == "u1"


def test_bucket_pruning_leaves_untouched_buckets_alone(spark, tmp_table_path):
    """A single-url batch rewrites only that url's bucket: every other
    bucket's data dir pointer is unchanged in the new manifest."""
    t = PagesTable.create(spark, tmp_table_path, num_buckets=8)
    seed_rows = [(i, 0, "I", f"u{i}", "2024-01-01T00:00") for i in range(50)]
    t.apply_batch("b0", _ev(spark, seed_rows), None)
    before = dict(t.manifest().buckets)
    res = t.apply_batch("b1", _ev(spark, [(99, 1, "U", "u7", "2024-02-01T00:00")]), None)
    assert res["buckets_touched"] == 1
    after = t.manifest().buckets
    changed = [b for b in after if before.get(b) != after[b]]
    assert len(changed) == 1
    for b in after:
        if b not in changed:
            assert after[b] == before[b]
    # and the untouched files still exist on disk untouched (buckets map
    # to LISTS of delta dirs under merge-on-read)
    untouched = [b for b in before if b not in changed][0]
    for d in before[untouched]:
        assert os.path.isdir(os.path.join(tmp_table_path, d))
    # MoR invariant: the touched bucket APPENDED a delta, not rewrote
    assert after[changed[0]][:-1] == before.get(changed[0], [])


def test_null_key_rows_dead_lettered(spark, tmp_table_path):
    t = PagesTable.create(spark, tmp_table_path, num_buckets=4)
    bad = _ev(spark, [(1, 0, "I", None, "2024-01-01T00:00"),
                      (2, 0, "I", "ok", "2024-01-01T00:00")])
    res = t.apply_batch("b0", bad, None)
    assert res["events_in"] == 1  # null-key row dropped before apply
    rows = t.read().collect()
    assert [r["url"] for r in rows] == ["ok"]
