"""Time travel + incremental changelog (CDC OUT) on the pages table."""

import datetime as dt

from mysql_syncer_spark.sink.pages_table import PagesTable

SCHEMA = (
    "log_pos long, file_seq int, server_id int, op string, table string,"
    " tx_id long,"
    " before struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " after struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
)


def _ev(spark, rows):
    data = [
        (
            pos, seq, 1, op, "web.pages", 1, None,
            (url, dt.datetime.fromisoformat(ts),
             b"<p>x</p>" if op != "D" else None, None,
             "en" if op != "D" else None),
            None,
        )
        for pos, seq, op, url, ts in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_time_travel_and_incremental_changelog(spark, tmp_table_path):
    t = PagesTable.create(spark, tmp_table_path, num_buckets=4)
    t.apply_batch("b0", _ev(spark, [
        (1, 0, "I", "u1", "2024-01-01T00:00"),
        (2, 0, "I", "u2", "2024-01-01T00:01"),
    ]), None)
    v1 = int(t.manifest().version)
    t.apply_batch("b1", _ev(spark, [
        (3, 1, "U", "u1", "2024-02-01T00:00"),
        (4, 1, "D", "u2", "2024-02-01T00:01"),
        (5, 1, "I", "u3", "2024-02-01T00:02"),
    ]), None)
    v2 = int(t.manifest().version)

    # time travel: the old snapshot still reads exactly the b0 state
    old = {r["url"]: r["warc_ts"] for r in t.read(version=v1).collect()}
    assert set(old) == {"u1", "u2"}
    assert old["u1"].isoformat().startswith("2024-01-01")
    now = {r["url"] for r in t.read().collect()}
    assert now == {"u1", "u3"}

    # incremental changelog v1 -> v2: exactly the net delta, classified
    ch = {r["url"]: r["change_op"] for r in t.changes_between(v1, v2).collect()}
    assert ch == {"u1": "U", "u2": "D", "u3": "I"}
    # the U row carries the NEW payload
    u1 = [r for r in t.changes_between(v1, v2).collect() if r["url"] == "u1"][0]
    assert u1["warc_ts"].isoformat().startswith("2024-02-01")

    # from-empty changelog = everything live as inserts... plus the
    # tombstoned key never appears as I
    ch0 = {r["url"]: r["change_op"] for r in t.changes_between(0).collect()}
    assert ch0 == {"u1": "I", "u3": "I"}

    # no-op window: identical snapshots → empty changelog
    assert t.changes_between(v2, v2).collect() == []


def test_changelog_resurrection_is_insert(spark, tmp_table_path):
    t = PagesTable.create(spark, tmp_table_path, num_buckets=4)
    t.apply_batch("b0", _ev(spark, [(1, 0, "D", "u1", "2024-01-05T00:00")]), None)
    v1 = int(t.manifest().version)
    t.apply_batch("b1", _ev(spark, [(2, 1, "I", "u1", "2024-01-06T00:00")]), None)
    ch = {r["url"]: r["change_op"] for r in t.changes_between(v1).collect()}
    assert ch == {"u1": "I"}  # tombstone → live = resurrection = I


def test_history_metadata_table(spark, tmp_path):
    """history(): one row per persisted version, metrics consistent with
    the replay (Iceberg snapshots-table parity)."""
    import tempfile

    from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
    from mysql_syncer_spark.plans.replay import replay
    from mysql_syncer_spark.sink.pages_table import PagesTable

    tbl = generate_events(GenSpec(n_events=900, events_per_file=300))
    d = tempfile.mkdtemp()
    write_event_log(tbl, d)
    path = str(tmp_path / "pages")
    replay(spark, d, path, num_buckets=4)
    t = PagesTable(spark, path)

    h = t.history().orderBy("version").collect()
    assert h[-1]["version"] == t.manifest().version
    assert len(h) == t.manifest().version + 1  # v0 (create) .. current
    batch_rows = [r for r in h if r["batch_id"] is not None]
    assert len(batch_rows) >= 3  # one per binlog file
    assert sum(r["events_in"] for r in batch_rows) >= 900
    assert all(r["merge_ms"] >= 0 for r in batch_rows)
    # ledger grows (or holds, post-fold) along the history
    ledgers = [r["ledger_entries"] for r in h]
    assert ledgers[-1] >= 1


def test_wall_clock_time_travel_and_lag(spark, event_log_dir, tmp_table_path):
    import json
    import os

    from mysql_syncer_spark.plans.replay import replay

    replay(spark, event_log_dir, tmp_table_path, num_buckets=8)
    t = PagesTable(spark, tmp_table_path)
    vdir = os.path.join(tmp_table_path, "_versions")
    stamped = []
    for fn in sorted(f for f in os.listdir(vdir) if f.endswith(".json")):
        mj = json.load(open(os.path.join(vdir, fn)))
        cts = (mj.get("metrics") or {}).get("commit_ts_ms")
        if cts:
            stamped.append((int(mj["version"]), int(cts)))
    assert len(stamped) >= 2
    # commit timestamps are monotone with version order
    assert [v for v, _ in stamped] == sorted(v for v, _ in stamped)
    assert all(a[1] <= b[1] for a, b in zip(stamped, stamped[1:]))
    mid_v, mid_ts = stamped[len(stamped) // 2]
    assert t.version_as_of(mid_ts) == mid_v
    got = {r["url"] for r in t.read_as_of(mid_ts).collect()}
    want = {r["url"] for r in t.read(version=mid_v).collect()}
    assert got == want
    # before the first stamped commit only the unstamped create
    # version (arbitrarily old by contract) qualifies
    assert t.version_as_of(stamped[0][1] - 10_000) < stamped[0][0]
    # lag gauge: commit happened after the newest event in the log
    lag = t.replication_lag_ms()
    assert lag is not None and lag >= 0


def test_named_snapshot_tags(spark, event_log_dir, tmp_table_path):
    import pytest as _pytest

    from mysql_syncer_spark.plans.replay import replay

    replay(spark, event_log_dir, tmp_table_path, num_buckets=8)
    t = PagesTable(spark, tmp_table_path)
    head = t.manifest().version
    t.tag("after-initial-load")
    t.tag("halfway", version=max(1, head // 2))
    assert t.tags() == {"after-initial-load": head, "halfway": max(1, head // 2)}
    assert {r["url"] for r in t.read_tag("after-initial-load").collect()} == {
        r["url"] for r in t.read().collect()
    }
    assert t.read_tag("halfway").count() <= t.read().count() + 1_000_000  # readable
    with _pytest.raises(KeyError):
        t.read_tag("nope")
    with _pytest.raises(FileNotFoundError):
        t.tag("bad", version=99999)
