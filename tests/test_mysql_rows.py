"""Byte-compatible MySQL ROWS_EVENT decode (reference layout parity:
/root/reference/src/slave/rs_binlog_row.c:430-631 framing + per-type
length walks :284-427)."""

import datetime as dt
from decimal import Decimal

from mysql_syncer_spark.sources.mysql_rows import (
    MySQLColumn,
    MySQLTableDef,
    decode_mysql_rows,
)

TD = MySQLTableDef(
    columns=(
        MySQLColumn("id", "long"),
        MySQLColumn("big", "longlong"),
        MySQLColumn("name", "varchar(300)"),   # 2-byte prefix (max >= 256)
        MySQLColumn("tag", "varchar(40)"),     # 1-byte prefix
        MySQLColumn("code", "string(300)"),    # bug-37426 meta fold
        MySQLColumn("body", "blob(2)"),
        MySQLColumn("price", "newdecimal(12,4)"),
        MySQLColumn("d", "date"),
        MySQLColumn("t", "time"),
        MySQLColumn("ts", "timestamp"),
        MySQLColumn("dtm", "datetime"),
        MySQLColumn("y", "year"),
        MySQLColumn("flags", "bit(16)"),
        MySQLColumn("legacy", "varchar(10)"),  # unused in fixtures
        MySQLColumn("secret", "varchar(10)"),  # skip sentinel (pos == -1)
    ),
    skip=frozenset({"secret"}),
)
USED = tuple(c.name for c in TD.columns if c.name != "legacy")


def _row(i: int) -> dict:
    return {
        "id": i - 3,
        "big": i * 7_000_000_000,
        "name": "n" * (i % 280) + str(i),
        "tag": None if i % 7 == 0 else f"t{i}",
        "code": f"c{i % 100}",
        "body": bytes([i % 256, (i * 3) % 256]),
        "price": None if i % 11 == 0 else Decimal(i * 7919 - 100000).scaleb(-4),
        "d": dt.date(2000, 1, 1) + dt.timedelta(days=i),
        "t": (i * 7919) % 86400,
        "ts": 1_700_000_000 + i * 97,
        "dtm": dt.datetime(2001, 1, 1) + dt.timedelta(seconds=i * 100_003),
        "y": 0 if i % 9 == 0 else 1901 + (i % 150),
        "flags": ((i * 40503) % 65536).to_bytes(2, "big"),
        "secret": f"s{i}",
    }


def test_write_event_roundtrip_with_skip_and_unused():
    rows = [_row(i) for i in range(50)]
    blob = TD.encode_rows_event(rows, "write", used=USED)
    got = TD.decode_rows_event(blob, "write")
    assert len(got) == 50
    for i, r in enumerate(got):
        want = {k: v for k, v in _row(i).items() if k != "secret"}
        assert "secret" not in r  # skip sentinel: walked, never emitted
        assert "legacy" not in r  # unused: no bytes, no key
        assert r == want, (i, r, want)


def test_varchar_prefix_width_follows_meta():
    # same value under a 1-byte and a 2-byte prefix column → different
    # image lengths, same decoded value
    one = MySQLTableDef((MySQLColumn("v", "varchar(40)"),))
    two = MySQLTableDef((MySQLColumn("v", "varchar(300)"),))
    b1 = one.encode_rows_event([{"v": "abc"}])
    b2 = two.encode_rows_event([{"v": "abc"}])
    assert len(b2) == len(b1) + 1  # extra prefix byte only
    assert one.decode_rows_event(b1) == two.decode_rows_event(b2) == [{"v": "abc"}]


def test_string_bug_37426_meta_roundtrip():
    # max_len 300 > 255: the high bits must fold into meta byte0's 0x30
    # field and decode back to a 2-byte prefix
    col = MySQLColumn("c", "string(300)")
    m = col.meta_bytes()
    assert (m[0] & 0x30) != 0x30 and m[1] == 300 - 256
    td = MySQLTableDef((col,))
    val = "x" * 299
    assert td.decode_rows_event(td.encode_rows_event([{"c": val}])) == [{"c": val}]
    # and a small CHAR keeps the plain branch (0x30 bits intact)
    small = MySQLColumn("c", "string(40)")
    assert (small.meta_bytes()[0] & 0x30) == 0x30


def test_update_event_pairs_before_after_with_second_bitmap():
    td = MySQLTableDef(
        (MySQLColumn("id", "long"), MySQLColumn("v", "varchar(40)"))
    )
    pairs = [
        ({"id": 1, "v": "old"}, {"id": 1, "v": "new"}),
        ({"id": 2, "v": None}, {"id": 2, "v": "set"}),
    ]
    # after-image carries only id+v; before also only id+v (same bitmap)
    blob = td.encode_rows_event(pairs, "update")
    got = td.decode_rows_event(blob, "update")
    assert got == [
        {"before_id": 1, "before_v": "old", "after_id": 1, "after_v": "new"},
        {"before_id": 2, "before_v": None, "after_id": 2, "after_v": "set"},
    ]
    # minimal before-image replication: before uses id only
    blob2 = td.encode_rows_event(pairs, "update", used=("id",),
                                 used_after=("id", "v"))
    got2 = td.decode_rows_event(blob2, "update")
    assert got2[0] == {"before_id": 1, "after_id": 1, "after_v": "new"}


def test_decode_mysql_rows_distributed(spark):
    rows = [_row(i) for i in range(30)]
    blobs = [
        (k, TD.encode_rows_event(rows[k * 10:(k + 1) * 10], "write", used=USED))
        for k in range(3)
    ]
    df = spark.createDataFrame(blobs, "seq long, rows_event binary")
    out = decode_mysql_rows(df, TD, keep_cols=("seq",), used=USED)
    got = {(r["seq"], r["id"]): r.asDict() for r in out.collect()}
    assert len(got) == 30
    r = got[(1, 12 - 3)]
    assert r["name"] == "n" * 12 + "12" and r["ts"] == 1_700_000_000 + 12 * 97
    assert "secret" not in out.columns and "legacy" not in out.columns
