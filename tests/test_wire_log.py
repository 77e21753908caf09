"""Wire-format event log: typed events → real ROWS_EVENT blobs + QUERY
DDL text → distributed decode → streaming replay parity."""

import tempfile

from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
from mysql_syncer_spark.oracle import _to_us
from mysql_syncer_spark.plans.replay import replay
from mysql_syncer_spark.sink.pages_table import PagesTable
from mysql_syncer_spark.sources.wire_log import (
    decode_wire_events,
    ddl_to_query,
    parse_ddl_query,
    write_wire_event_log,
)
from mysql_syncer_spark.streaming.runner import run_streaming_replay


def test_ddl_query_text_roundtrip():
    add = {"kind": "add_column", "col": "extra", "new_name": None, "dtype": "string"}
    ren = {"kind": "rename_column", "col": "extra", "new_name": "extra_v2",
           "dtype": None}
    drop = {"kind": "drop_column", "col": "extra_v2", "new_name": None,
            "dtype": None}
    assert parse_ddl_query(ddl_to_query(add)) == add
    assert parse_ddl_query(ddl_to_query(ren)) == ren
    assert parse_ddl_query(ddl_to_query(drop)) == drop


def _norm_payload(p):
    if p is None:
        return None
    d = p.asDict()
    d["warc_ts"] = _to_us(d["warc_ts"])
    d["html"] = bytes(d["html"]) if d["html"] is not None else None
    return d


def test_wire_decode_equals_typed_log(spark):
    tbl = generate_events(GenSpec(n_events=1500))
    d_typed, d_wire = tempfile.mkdtemp(), tempfile.mkdtemp()
    write_event_log(tbl, d_typed)
    write_wire_event_log(tbl, d_wire)

    key = lambda r: (r["file_seq"], r["log_pos"])
    typed = sorted(spark.read.parquet(d_typed).collect(), key=key)
    decoded = sorted(
        decode_wire_events(spark.read.parquet(d_wire)).collect(), key=key
    )
    # generator adds duplicate redeliveries + DDL events beyond n_events
    assert len(typed) == len(decoded) >= 1500
    for t, w in zip(typed, decoded):
        for c in ("log_pos", "file_seq", "server_id", "op", "table", "tx_id"):
            assert t[c] == w[c], (c, t, w)
        assert _norm_payload(t["before"]) == _norm_payload(w["before"]), (t, w)
        assert _norm_payload(t["after"]) == _norm_payload(w["after"]), (t, w)
        tddl = t["ddl"].asDict() if t["ddl"] is not None else None
        wddl = w["ddl"].asDict() if w["ddl"] is not None else None
        assert tddl == wddl, (t, w)


def test_streaming_wire_replay_matches_typed_replay(spark):
    """End to end: tail the wire log (real ROWS_EVENT blobs) with the
    streaming runner and land the SAME final table as the typed replay —
    including the DDL-added extra_v2 column."""
    tbl = generate_events(GenSpec(n_events=1200, events_per_file=400))
    d_typed, d_wire = tempfile.mkdtemp(), tempfile.mkdtemp()
    write_event_log(tbl, d_typed)
    write_wire_event_log(tbl, d_wire)

    p_typed = tempfile.mkdtemp() + "/pages"
    replay(spark, d_typed, p_typed, num_buckets=8)

    p_wire = tempfile.mkdtemp() + "/pages"
    run_streaming_replay(
        spark,
        d_wire,
        p_wire,
        tempfile.mkdtemp() + "/ckpt",
        num_buckets=8,
        timeout_sec=240,
        transform=decode_wire_events,
    )

    def snap(path):
        rows = PagesTable(spark, path).read().collect()
        return {
            r["url"]: {
                k: (_to_us(v) if k == "warc_ts" else
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v)
                for k, v in r.asDict().items()
            }
            for r in rows
        }

    a, b = snap(p_typed), snap(p_wire)
    assert a == b and len(a) > 0


def test_route_wire_tables_multi_table(spark):
    """Two tables with different wire schemas in ONE log; per-table routed
    decode returns each table's typed stream (R1 at the wire level)."""
    from decimal import Decimal

    from mysql_syncer_spark.sources.mysql_rows import MySQLColumn, MySQLTableDef
    from mysql_syncer_spark.sources.wire_log import route_wire_tables

    users = MySQLTableDef(
        columns=(MySQLColumn("uid", "longlong"), MySQLColumn("name", "varchar(40)"))
    )
    orders = MySQLTableDef(
        columns=(
            MySQLColumn("oid", "long"),
            MySQLColumn("amount", "newdecimal(12,2)"),
        )
    )
    rows = [
        (4, 0, 1, "I", "db.users", 0,
         users.encode_rows_event([{"uid": 7, "name": "ada"}], "write"), None),
        (101, 0, 1, "I", "db.orders", 0,
         orders.encode_rows_event([{"oid": 1, "amount": Decimal("12.50")}], "write"),
         None),
        (198, 0, 1, "U", "db.users", 1,
         users.encode_rows_event([({"uid": 7, "name": "ada"},
                                   {"uid": 7, "name": "lovelace"})], "update"),
         None),
    ]
    df = spark.createDataFrame(
        rows,
        "log_pos long, file_seq int, server_id int, op string, table string, "
        "tx_id long, rows_event binary, query string",
    )
    routed = route_wire_tables(df, {"db.users": users, "db.orders": orders})
    u = sorted(routed["db.users"].collect(), key=lambda r: r["log_pos"])
    assert u[0]["after"]["name"] == "ada" and u[0]["before"] is None
    assert u[1]["before"]["name"] == "ada" and u[1]["after"]["name"] == "lovelace"
    o = routed["db.orders"].collect()
    assert len(o) == 1 and o[0]["after"]["amount"] == Decimal("12.50")


def test_wire_changelog_roundtrip(spark):
    """CDC OUT as wire: changes_between → ROWS_EVENT blobs → decode gives
    back the same changelog (I full image, U/D minimal before images)."""
    from mysql_syncer_spark.sources.wire_log import (
        decode_wire_events,
        encode_wire_changelog,
        wire_def_for,
    )

    tbl = generate_events(GenSpec(n_events=1200, events_per_file=300))
    d = tempfile.mkdtemp()
    write_event_log(tbl, d)
    path = tempfile.mkdtemp() + "/pages"
    replay(spark, d, path, num_buckets=8)
    t = PagesTable(spark, path)
    v1 = t.manifest().version
    # diff across the middle of the replay so the changelog carries real
    # U (and, config permitting, D) rows, not just the initial inserts
    changes = t.changes_between(max(1, v1 // 2), v1)
    n_changes = changes.count()
    ops_present = {r["change_op"] for r in changes.select("change_op").distinct().collect()}
    assert n_changes > 0 and "U" in ops_present, ops_present

    wire = encode_wire_changelog(changes)
    payload_cols = [c for c in changes.columns if c != "change_op"]
    td, ts_cols = wire_def_for(changes.schema, payload_cols)
    decoded = decode_wire_events(wire, table_def=td)
    assert decoded.count() == n_changes

    def key_of(r):
        img = r["after"] if r["after"] is not None else r["before"]
        return img["url"]

    want = {r["url"]: r for r in changes.collect()}
    for r in decoded.collect():
        url = key_of(r)
        exp = want[url]
        op = {"I": "I", "U": "U", "D": "D"}[r["op"]]
        assert op == exp["change_op"], (url, r)
        img = r["after"]
        # D carries the FULL tombstone image (its warc_ts must travel for
        # the downstream LWW rank) — fall through to the value check
        if op == "U":  # before image is key-only (binlog_row_image=MINIMAL)
            assert r["before"]["url"] == url
            assert all(
                v is None for k, v in r["before"].asDict().items() if k != "url"
            )
        for c in payload_cols:
            got_v, exp_v = img[c], exp[c]
            if c in ts_cols:
                exp_v = _to_us(exp_v)
            if isinstance(exp_v, bytearray):
                exp_v = bytes(exp_v)
            if isinstance(got_v, bytearray):
                got_v = bytes(got_v)
            assert got_v == exp_v, (url, c, got_v, exp_v)


def test_streaming_wire_kill_and_resume(spark, tmp_path):
    """Exactly-once survives a mid-stream kill on the WIRE path too: stop
    after ≥1 committed micro-batch, resume from the same checkpoint, final
    state equals the sequential oracle."""
    import time

    from mysql_syncer_spark.oracle import sequential_replay
    from mysql_syncer_spark.streaming.runner import start_streaming_replay

    tbl = generate_events(GenSpec(n_events=1500, events_per_file=300))
    d_wire = tempfile.mkdtemp()
    write_wire_event_log(tbl, d_wire)
    table_path = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")

    q = start_streaming_replay(
        spark, d_wire, table_path, ckpt, num_buckets=8,
        available_now=True, transform=decode_wire_events,
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if PagesTable.exists(table_path) and PagesTable(spark, table_path).n_committed() > 0:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)
    assert PagesTable(spark, table_path).n_committed() >= 1

    run_streaming_replay(
        spark, d_wire, table_path, ckpt, num_buckets=8,
        timeout_sec=240, transform=decode_wire_events,
    )
    oracle, cols, _ = sequential_replay(tbl)
    got = {r["url"]: r.asDict() for r in PagesTable(spark, table_path).read().collect()}
    assert set(got) == set(oracle)
    for url, o in oracle.items():
        for c in cols:
            ov, ev = o.get(c), got[url].get(c)
            if c == "warc_ts":
                ov, ev = _to_us(ov), _to_us(ev)
            assert ov == ev, (url, c, ov, ev)


def test_decode_on_error_skip_drops_poison_pills(spark):
    import pytest

    from mysql_syncer_spark.sources.mysql_rows import MySQLColumn, MySQLTableDef

    td = MySQLTableDef(
        columns=(MySQLColumn("uid", "longlong"), MySQLColumn("name", "varchar(40)"))
    )
    good = td.encode_rows_event([{"uid": 1, "name": "ok"}], "write")
    rows = [
        (1, 0, 1, "I", "db.users", 0, good, None),
        (2, 0, 1, "I", "db.users", 0, good[: len(good) - 3], None),  # truncated
        (3, 0, 1, "DDL", "db.users", 0, None, "DROP TABLE nope"),  # unsupported
        (4, 0, 1, "I", "db.users", 0, good, None),
    ]
    schema = (
        "log_pos long, file_seq int, server_id int, op string, table string, "
        "tx_id long, rows_event binary, query string"
    )
    df = spark.createDataFrame(rows, schema)

    # default mode is loud
    with pytest.raises(Exception):
        decode_wire_events(df, table_def=td).collect()

    got = decode_wire_events(df, table_def=td, on_error="skip").collect()
    assert sorted(r["log_pos"] for r in got) == [1, 4]
    assert all(r["after"]["name"] == "ok" for r in got)


def test_chained_replication_via_wire_changelog(spark):
    """Master→slave chaining: table A replays the binlog, publishes its
    changelog as wire ROWS_EVENT batches (two incremental spans so U and
    D flow, not just initial inserts); table B applies the decoded wire
    changelog and converges to A's live state."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.sources.wire_log import (
        encode_wire_changelog,
        restore_timestamps,
        wire_def_for,
    )

    tbl = generate_events(GenSpec(n_events=1200, events_per_file=300))
    d = tempfile.mkdtemp()
    write_event_log(tbl, d)
    pa_path = tempfile.mkdtemp() + "/pages"
    replay(spark, d, pa_path, num_buckets=8)
    a = PagesTable(spark, pa_path)
    v_end = a.manifest().version
    # split where the schema is already post-rename: a changelog span that
    # straddles a RENAME would emit the old column name (a real relay
    # forwards the DDL between spans; here we span within one schema era)
    v_mid = next(
        v for v in range(1, v_end + 1)
        if "extra_v2" in [n for n, _ in a.manifest(v).schema]
    )
    assert v_mid < v_end, "need a non-empty second span for U/D coverage"

    b = PagesTable.create(spark, tempfile.mkdtemp() + "/pages", num_buckets=8)
    payload_cols = None
    for i, (v0, v1) in enumerate([(0, v_mid), (v_mid, v_end)]):
        changes = a.changes_between(v0, v1)
        if payload_cols is None:
            payload_cols = [c for c in changes.columns if c != "change_op"]
            td, ts_cols = wire_def_for(changes.schema, payload_cols)
        wire = encode_wire_changelog(changes)
        decoded = restore_timestamps(
            decode_wire_events(wire, table_def=td), ts_cols
        )
        # chained batches must keep the span order for LWW: offset
        # file_seq per span (a real relay assigns positions serially)
        decoded = decoded.withColumn("file_seq", F.lit(i).cast("int"))
        # the slave's registry needs DDL-added cols up front (the
        # changelog is post-schema; replay DDL is not re-emitted)
        for c in payload_cols:
            if c not in [n for n, _ in b.manifest().schema]:
                b.apply_batch(
                    f"ddl-{c}",
                    _chained_ddl_batch(spark, c),
                    None,
                )
        res = b.apply_batch(f"chain-{i}", decoded, None)
        assert res["skipped"] is False

    live_a = {
        r["url"]: tuple(
            _to_us(r[c]) if c == "warc_ts" else
            (bytes(r[c]) if isinstance(r[c], (bytes, bytearray)) else r[c])
            for c in payload_cols
        )
        for r in a.read().collect()
    }
    live_b = {
        r["url"]: tuple(
            _to_us(r[c]) if c == "warc_ts" else
            (bytes(r[c]) if isinstance(r[c], (bytes, bytearray)) else r[c])
            for c in payload_cols
        )
        for r in PagesTable(spark, b.path).read().collect()
    }
    assert set(live_b) == set(live_a)
    diffs = {u: (live_a[u], live_b[u]) for u in live_a if live_a[u] != live_b[u]}
    assert not diffs, list(diffs.items())[:3]


def _chained_ddl_batch(spark, col):
    pay = "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    schema = (
        "log_pos long, file_seq int, server_id int, op string, table string,"
        f" tx_id long, before {pay}, after {pay},"
        " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
    )
    return spark.createDataFrame(
        [(0, 0, 1, "DDL", "web.pages", None, None, None,
          ("add_column", col, None, "string"))],
        schema,
    )


def test_wire_dead_letters_complement_skip(spark):
    """DLQ split: every event lands in exactly one of decode(on_error=
    'skip') / wire_dead_letters, rejects carry envelope + raw blob +
    reason — quarantine-and-replay instead of silent loss."""
    from mysql_syncer_spark.sources.mysql_rows import MySQLColumn, MySQLTableDef
    from mysql_syncer_spark.sources.wire_log import wire_dead_letters

    td = MySQLTableDef(
        columns=(MySQLColumn("uid", "longlong"), MySQLColumn("name", "varchar(40)"))
    )
    good = td.encode_rows_event([{"uid": 1, "name": "ok"}], "write")
    rows = [
        (1, 0, 1, "I", "db.users", 0, good, None),
        (2, 0, 1, "I", "db.users", 0, good[: len(good) - 3], None),
        (3, 0, 1, "DDL", "db.users", 0, None, "DROP TABLE nope"),
        (4, 0, 1, "I", "db.users", 0, good, None),
    ]
    schema = (
        "log_pos long, file_seq int, server_id int, op string, table string, "
        "tx_id long, rows_event binary, query string"
    )
    df = spark.createDataFrame(rows, schema)
    kept = decode_wire_events(df, table_def=td, on_error="skip").collect()
    dead = wire_dead_letters(df, table_def=td).collect()
    assert sorted(r["log_pos"] for r in kept) == [1, 4]
    assert sorted(r["log_pos"] for r in dead) == [2, 3]
    by_pos = {r["log_pos"]: r for r in dead}
    assert "ValueError" in by_pos[3]["reason"]
    assert bytes(by_pos[2]["rows_event"]) == bytes(good[: len(good) - 3])


def test_wire_dead_letters_cover_convert_failures(spark):
    """A blob that DECODES but whose payload convert raises (invalid
    UTF-8 in the text column) lands in the DLQ, not nowhere: the DLQ
    re-runs the same convert step as decode_wire_events, so the two
    streams partition the input exactly."""
    from mysql_syncer_spark.sources.wire_log import (
        PAGES_WIRE_TABLE,
        wire_dead_letters,
    )

    ok = {
        "url": "u1", "warc_ts_us": 0, "html": b"<p>", "text": b"fine",
        "lang": "en", "extra": None,
    }
    bad = dict(ok, url="u2", text=b"\xff\xfe\xfa")  # invalid UTF-8
    good_blob = PAGES_WIRE_TABLE.encode_rows_event([ok], "write")
    bad_blob = PAGES_WIRE_TABLE.encode_rows_event([bad], "write")
    schema = (
        "log_pos long, file_seq int, server_id int, op string, table string, "
        "tx_id long, rows_event binary, query string"
    )
    df = spark.createDataFrame(
        [
            (1, 0, 1, "I", "web.pages", 0, good_blob, None),
            (2, 0, 1, "I", "web.pages", 0, bad_blob, None),
        ],
        schema,
    )
    kept = decode_wire_events(df, on_error="skip").collect()
    dead = wire_dead_letters(df).collect()
    assert [r["log_pos"] for r in kept] == [1]
    assert [r["log_pos"] for r in dead] == [2]
    assert "UnicodeDecodeError" in dead[0]["reason"]
