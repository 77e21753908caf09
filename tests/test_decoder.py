"""P2-P4 parity: packed row-image codec roundtrip, incl. nulls/unicode/
packed-int boundary lengths."""

import random

from mysql_syncer_spark.sources.decoder import (
    RowCodec,
    decode_packed_int,
    decode_packed_rows,
    encode_packed_int,
)

CODEC = RowCodec(
    fields=(
        ("id", "i64"),
        ("flags", "i8"),
        ("score", "f64"),
        ("ts", "ts_us"),
        ("url", "str"),
        ("payload", "bin"),
    )
)


def test_packed_int_boundaries():
    for n in [0, 1, 250, 251, 255, 256, 65535, 65536, (1 << 24) - 1, 1 << 24, 1 << 40]:
        enc = encode_packed_int(n)
        val, pos = decode_packed_int(memoryview(enc), 0)
        assert val == n and pos == len(enc)


def _rand_row(rng: random.Random, i: int) -> dict:
    return {
        "id": i,
        "flags": rng.randint(-128, 127) if rng.random() > 0.2 else None,
        "score": rng.random() * 1e6 if rng.random() > 0.2 else None,
        "ts": 1_700_000_000_000_000 + i,
        "url": (
            f"https://d{i}.example.com/p/{'π' * rng.randint(0, 300)}"
            if rng.random() > 0.1
            else None
        ),
        "payload": bytes(rng.randbytes(rng.choice([0, 5, 251, 300]))),
    }


def test_python_roundtrip():
    rng = random.Random(42)
    for i in range(200):
        row = _rand_row(rng, i)
        assert CODEC.decode(CODEC.encode(row)) == row


def test_spark_decode_matches(spark):
    rng = random.Random(7)
    rows = [_rand_row(rng, i) for i in range(500)]
    blobs = [(i, CODEC.encode(r)) for i, r in enumerate(rows)]
    df = spark.createDataFrame(blobs, "seq long, row_image binary")
    out = decode_packed_rows(df, CODEC, keep_cols=("seq",))
    got = {r["seq"]: r.asDict() for r in out.collect()}
    assert len(got) == 500
    for i, r in enumerate(rows):
        g = got[i]
        for k, v in r.items():
            gv = g[k]
            if isinstance(v, float):
                assert abs(gv - v) < 1e-9
            else:
                assert gv == v, (i, k, v, gv)


def test_mysql_native_types_roundtrip():
    """P3 (SURVEY §1.3): NEWDECIMAL / DATE / TIME / DATETIME / YEAR / BIT
    wire parsers added in round 2 (reference rs_binlog_row.c:23-280)."""
    import datetime as dt
    from decimal import Decimal

    codec = RowCodec(
        fields=(
            ("amount", "decimal(12,2)"),
            ("big_dec", "decimal(30,10)"),
            ("d", "date"),
            ("t", "time"),
            ("dtv", "datetime"),
            ("y", "year"),
            ("flags", "bit(12)"),
        )
    )
    rows = [
        {
            "amount": Decimal("-31415.93"),
            "big_dec": Decimal("12345678901234567890.0123456789"),
            "d": dt.date(2020, 2, 29),
            "t": 86399,
            "dtv": dt.datetime(1999, 12, 31, 23, 59, 59),
            "y": 2024,
            "flags": b"\x0f\xff",
        },
        {
            "amount": Decimal("0.00"),
            "big_dec": Decimal("-0.0000000001"),
            "d": dt.date(1000, 1, 1),
            "t": 0,
            "dtv": dt.datetime(9999, 12, 31, 0, 0, 0),
            "y": 0,
            "flags": b"\x00\x00",
        },
        {"amount": None, "big_dec": None, "d": None, "t": None, "dtv": None,
         "y": None, "flags": None},
    ]
    for r in rows:
        assert codec.decode(codec.encode(r)) == r


def test_mysql_decimal_binsize_matches_reference_table():
    """binsize must equal the reference's dig2bytes arithmetic
    (rs_binlog_row.c:411-423) for every (precision, scale) shape."""
    from mysql_syncer_spark.sources.decoder import decimal_binsize

    # spot values computed by hand from the dig2bytes table
    assert decimal_binsize(9, 0) == 4
    assert decimal_binsize(10, 0) == 5
    assert decimal_binsize(18, 9) == 8
    assert decimal_binsize(12, 4) == 6   # intg 8 → 4B, frac 4 → 2B
    assert decimal_binsize(30, 10) == 14  # intg 20 → 4+4+1, frac 10 → 4+1


def test_mysql_decimal_ordering_preserved_in_wire_bytes():
    """MySQL's packing makes unsigned byte order == numeric order (that is
    the point of the sign-bit flip + complement) — the property that lets
    a sink sort/merge on raw bytes."""
    from decimal import Decimal

    from mysql_syncer_spark.sources.decoder import encode_mysql_decimal

    vals = [Decimal(s) for s in
            ("-99999.99", "-1.50", "-0.01", "0.00", "0.01", "1.50", "99999.99")]
    encs = [encode_mysql_decimal(v, 12, 2) for v in vals]
    assert encs == sorted(encs)
