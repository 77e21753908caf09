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
