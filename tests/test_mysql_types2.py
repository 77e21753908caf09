"""MySQL 5.6+ temporal-v2 (TIMESTAMP2/DATETIME2/TIME2) and 5.7+ JSON
binary format — byte-level vectors built by hand from the public layouts
(MySQL my_time.cc / sql/json_binary.h), round-trips, and the wire-level
ROWS_EVENT path through MySQLTableDef. The 5.5-era C reference predates
these types; they extend the wire layer the same way GTID/CRC32 did."""

import datetime as dt

import pytest

from mysql_syncer_spark.sources.json_binary import (
    decode_json_binary,
    encode_json_binary,
    json_text,
)
from mysql_syncer_spark.sources.mysql_rows import MySQLColumn, MySQLTableDef
from mysql_syncer_spark.sources.temporal2 import (
    decode_datetime2,
    decode_time2,
    decode_timestamp2,
    encode_datetime2,
    encode_time2,
    encode_timestamp2,
)

# ---------------------------------------------------------------------------
# TIME2 — hand-built vectors (incl. the negative-fraction borrow path)
# ---------------------------------------------------------------------------


def test_time2_zero_fsp0_bytes():
    assert encode_time2(0, 0) == b"\x80\x00\x00"
    assert decode_time2(b"\x80\x00\x00", 0) == 0


def test_time2_negative_half_second_fsp1_bytes():
    # nr = -500000; int3 = 0x800000 + (nr >> 24 floor) = 0x7FFFFF;
    # frac byte = trunc(-500000 % 2^24 / 10^4) & 0xFF = -50 & 0xFF = 0xCE
    b = encode_time2(-500_000, 1)
    assert b == b"\x7f\xff\xff\xce"
    assert decode_time2(b, 1) == -500_000


def test_time2_positive_fsp3_bytes():
    # 1:02:03.045 → int_part = (1<<12)|(2<<6)|3 = 0x1083,
    # head = 0x800000+0x1083, frac16 = 45000/100 = 450
    micros = (3600 + 2 * 60 + 3) * 1_000_000 + 45_000
    b = encode_time2(micros, 3)
    assert b == bytes.fromhex("801083") + (450).to_bytes(2, "big")
    assert decode_time2(b, 3) == micros


def test_time2_negative_with_hours_fsp1_borrow():
    # -1:00:00.3 → decode must re-borrow the integer part
    micros = -(3600 * 1_000_000 + 300_000)
    b = encode_time2(micros, 1)
    int3 = int.from_bytes(b[:3], "big")
    assert int3 == 0x800000 - 4097  # floor(nr / 2^24) = -(4096)-1
    assert b[3] == (256 - 30)
    assert decode_time2(b, 1) == micros


def test_time2_range_edges_fsp6():
    edge = (838 * 3600 + 59 * 60 + 59) * 1_000_000 + 999_999
    for v in (edge, -edge):
        assert decode_time2(encode_time2(v, 6), 6) == v
    with pytest.raises(ValueError):
        encode_time2(edge + 1, 6)


@pytest.mark.parametrize("fsp", range(7))
def test_time2_round_trip_sweep(fsp):
    q = 10 ** (6 - fsp)
    vals = [0, 1, -1, 59, 3599, 86399, 838 * 3600 + 59 * 60 + 59]
    for sec in vals:
        for usec in (0, 100_000, 999_999):
            for sign in (1, -1):
                v = sign * (sec * 1_000_000 + usec - usec % q)
                assert decode_time2(encode_time2(v, fsp), fsp) == v


# ---------------------------------------------------------------------------
# DATETIME2 / TIMESTAMP2
# ---------------------------------------------------------------------------


def test_datetime2_known_bytes_fsp0():
    v = dt.datetime(2003, 12, 31, 1, 2, 3)
    # long-hand independent layout computation
    ymd = ((2003 * 13 + 12) << 5) | 31
    hms = (1 << 12) | (2 << 6) | 3
    expect = ((ymd << 17) | hms) + 0x8000000000
    b = encode_datetime2(v, 0)
    assert b == expect.to_bytes(5, "big")
    assert decode_datetime2(b, 0) == v


@pytest.mark.parametrize("fsp", range(7))
def test_datetime2_round_trip_sweep(fsp):
    q = 10 ** (6 - fsp)
    for us in (0, 90_000, 123_456, 999_999):
        v = dt.datetime(1000, 1, 1, 0, 0, 0, us - us % q)
        w = dt.datetime(9999, 12, 31, 23, 59, 59, us - us % q)
        assert decode_datetime2(encode_datetime2(v, fsp), fsp) == v
        assert decode_datetime2(encode_datetime2(w, fsp), fsp) == w


def test_timestamp2_known_bytes():
    us = 1_700_000_000 * 1_000_000 + 123_456
    assert encode_timestamp2(us, 6) == (1_700_000_000).to_bytes(4, "big") + (
        123_456
    ).to_bytes(3, "big")
    assert encode_timestamp2(us, 3) == (1_700_000_000).to_bytes(4, "big") + (
        1_230
    ).to_bytes(2, "big")  # quantized to ms, stored as usec/100
    assert decode_timestamp2(encode_timestamp2(us, 6), 6) == us
    assert decode_timestamp2(encode_timestamp2(us, 3), 3) == us - 456


# ---------------------------------------------------------------------------
# JSON binary — hand-built documents
# ---------------------------------------------------------------------------


def test_json_small_object_exact_bytes():
    # {"a":1,"b":"x"}: count=2, header=18, keys at 18/19, "x" data at 20
    doc = encode_json_binary({"a": 1, "b": "x"})
    expect = bytes.fromhex(
        "00"        # small object
        "0200" "1600"              # count=2, size=22
        "1200" "0100" "1300" "0100"  # key entries (off,len)
        "05" "0100"                # int16 1 inline
        "0c" "1400"                # string at offset 20
        "6162"                     # 'a' 'b'
        "01" "78"                  # varlen 1, 'x'
    )
    assert doc == expect
    assert json_text(doc) == '{"a":1,"b":"x"}'


def test_json_small_array_literals_inline():
    doc = encode_json_binary([True, None])
    expect = bytes.fromhex("02" "0200" "0a00" "04" "0100" "04" "0000")
    assert doc == expect
    assert json_text(doc) == "[true,null]"


def test_json_object_keys_sorted_mysql_order():
    # MySQL sorts keys by (length, bytes): "bb" after "c"
    assert json_text(encode_json_binary({"bb": 1, "c": 2})) == '{"c":2,"bb":1}'


def test_json_scalars_round_trip():
    for v in (None, True, False, 0, -1, 32767, -32768, 40_000, -(1 << 31),
              (1 << 40), -(1 << 63), (1 << 64) - 1, 2.5, -0.125, "",
              "héllo ☃", "x" * 300):
        assert decode_json_binary(encode_json_binary(v)) == v


def test_json_nested_round_trip():
    v = {
        "k": {"n": [1, 2.5, "s", False, None], "empty": {}},
        "arr": [[], {"deep": [{"a": 1}]}],
        "u": (1 << 64) - 1,
        "s": "日本語",
    }
    assert decode_json_binary(encode_json_binary(v)) == v


def test_json_large_format_when_small_overflows():
    big = ["pad-" + "y" * 95] * 700  # ~70 KB > uint16 size field
    doc = encode_json_binary(big)
    assert doc[0] == 0x03  # large array
    assert decode_json_binary(doc) == big
    # nested inside an object: the *object* goes large too
    wrap = encode_json_binary({"k": big, "n": 5})
    assert wrap[0] == 0x01
    assert decode_json_binary(wrap) == {"k": big, "n": 5}


def test_json_opaque_decodes_as_tagged_value():
    # type 0x0f, inner type 0x0a, varlen length 2, payload
    doc = bytes.fromhex("0f" "0a" "02" "beef")
    assert decode_json_binary(doc) == {"$opaque_type": 0x0A, "$hex": "beef"}


def test_json_null_column_convention():
    assert encode_json_binary(None) == b""
    assert json_text(b"") is None


# ---------------------------------------------------------------------------
# wire level: ROWS_EVENT round trip through MySQLTableDef
# ---------------------------------------------------------------------------

TD2 = MySQLTableDef(
    columns=(
        MySQLColumn("id", "long"),
        MySQLColumn("created", "timestamp2(3)"),
        MySQLColumn("updated", "datetime2(6)"),
        MySQLColumn("elapsed", "time2(4)"),
        MySQLColumn("attrs", "json"),
        MySQLColumn("name", "varchar(40)"),
    )
)


def _row2(i: int) -> dict:
    return {
        "id": i,
        "created": (1_700_000_000 + i) * 1_000_000 + i * 1000 % 1_000_000,
        "updated": dt.datetime(2024, 1, 1 + i % 28, 12, 0, i % 60, i * 7 % 1_000_000),
        "elapsed": (-1) ** i * (i * 61_001_000 % (800 * 3600 * 1_000_000)
                                - (i * 61_001_000) % 100),
        "attrs": None if i % 5 == 0 else {"i": i, "tags": [f"t{i % 3}", None],
                                          "ok": i % 2 == 0},
        "name": f"row{i}",
    }


def test_rows_event_with_56_types_round_trip():
    rows = [_row2(i) for i in range(40)]
    blob = TD2.encode_rows_event(rows, "write")
    out = TD2.decode_rows_event(blob, "write")
    assert len(out) == 40
    for i, r in enumerate(out):
        src = _row2(i)
        assert r["id"] == src["id"]
        assert r["created"] == src["created"]
        assert r["updated"] == src["updated"]
        assert r["elapsed"] == src["elapsed"]
        if src["attrs"] is None:
            assert r["attrs"] is None
        else:
            import json as _json

            assert _json.loads(r["attrs"]) == src["attrs"]
        assert r["name"] == src["name"]


def test_rows_event_update_pairing_with_json():
    before = _row2(1)
    after = dict(before, attrs={"i": 1, "v": 2}, elapsed=-100)
    blob = TD2.encode_rows_event([(before, after)], "update")
    (pair,) = TD2.decode_rows_event(blob, "update")
    assert pair["before_elapsed"] == before["elapsed"]
    assert pair["after_elapsed"] == -100  # fsp=4 ⇒ 100 µs quantum
    assert pair["after_attrs"] == '{"i":1,"v":2}'


def test_decode_mysql_rows_spark_schema(spark):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.sources.mysql_rows import decode_mysql_rows

    events = [(0, TD2.encode_rows_event([_row2(i) for i in range(20)], "write"))]
    df = spark.createDataFrame(events, "event_seq long, rows_event binary")
    out = decode_mysql_rows(df, TD2, keep_cols=("event_seq",))
    assert dict(out.dtypes)["created"] == "bigint"
    assert dict(out.dtypes)["updated"] == "timestamp_ntz"
    assert dict(out.dtypes)["elapsed"] == "bigint"
    assert dict(out.dtypes)["attrs"] == "string"
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 20
    assert got[3]["updated"] == _row2(3)["updated"]
    assert got[4]["elapsed"] == _row2(4)["elapsed"]
    n_null = out.where(F.col("attrs").isNull()).count()
    assert n_null == len([i for i in range(20) if i % 5 == 0])
