"""Packed binary row-image codec (SURVEY §2.2 P2-P4 parity).

The reference decodes MySQL row images byte-by-byte: null bitmap + typed
values, variable-length fields with length prefixes, lengths as MySQL
packed integers (/root/reference/src/slave/rs_binlog_row.c:430-631 row
loop, :284-427 typed parsers; /root/reference/src/core/rs_string.c:275-298
packed ints). This module re-expresses that capability for an event stream
whose payload arrives as an opaque ``binary`` column.

Wire format (ours, MySQL-shaped, not byte-compatible):
  row := null_bitmap[ceil(n/8)] ++ value(col) for each non-null col
  fixed types  : i8 i16 i32 i64 f32 f64 ts_us (little-endian)
  var types    : str (utf-8), bin — packed-length prefix ++ payload
  packed length: first byte b: b<=250 → b; 252 → 2B LE; 253 → 3B LE;
                 254 → 8B LE (mirrors the reference's ranges)

Execution model: ``mapInPandas`` — Arrow moves the bytes in columnar
batches; the inner byte-walk is necessarily sequential per row (variable-
length rows have no vectorizable layout; the reference walks bytes the
same way). In the main CDC path events are already columnar and decode is
a plain projection (SURVEY P2) — this operator exists for packed/legacy
feeds and for parity tests.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_FIXED = {
    "i8": ("<b", 1),
    "i16": ("<h", 2),
    "i32": ("<i", 4),
    "i64": ("<q", 8),
    "f32": ("<f", 4),
    "f64": ("<d", 8),
    "ts_us": ("<q", 8),
}
_SPARK_TYPES = {
    "i8": T.ByteType(),
    "i16": T.ShortType(),
    "i32": T.IntegerType(),
    "i64": T.LongType(),
    "f32": T.FloatType(),
    "f64": T.DoubleType(),
    "ts_us": T.LongType(),  # epoch micros; cast downstream if needed
    "str": T.StringType(),
    "bin": T.BinaryType(),
}


def encode_packed_int(n: int) -> bytes:
    """Length-encoded int, reference-range-compatible
    (/root/reference/src/core/rs_string.c:275-298)."""
    if n <= 250:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def decode_packed_int(buf: memoryview, pos: int) -> tuple[int, int]:
    b = buf[pos]
    if b <= 250:
        return b, pos + 1
    if b == 252:
        return int.from_bytes(buf[pos + 1 : pos + 3], "little"), pos + 3
    if b == 253:
        return int.from_bytes(buf[pos + 1 : pos + 4], "little"), pos + 4
    if b == 254:
        return int.from_bytes(buf[pos + 1 : pos + 9], "little"), pos + 9
    raise ValueError(f"bad packed-int lead byte {b}")


@dataclass(frozen=True)
class RowCodec:
    """Column binding table — the analogue of the reference's per-table
    offset registry (rs_dm_pos_alloc_t, /root/reference/src/slave/
    rs_binlog_row.h:63-67), as data instead of compiled C."""

    fields: tuple[tuple[str, str], ...]  # (name, type key)

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(n, _SPARK_TYPES[t], True) for n, t in self.fields]
        )

    # -- encode (test/generator side) ----------------------------------
    def encode(self, row: dict) -> bytes:
        n = len(self.fields)
        bitmap = bytearray((n + 7) // 8)
        out = bytearray()
        for i, (name, typ) in enumerate(self.fields):
            v = row.get(name)
            if v is None:
                bitmap[i // 8] |= 1 << (i % 8)
                continue
            if typ in _FIXED:
                fmt, _ = _FIXED[typ]
                out += struct.pack(fmt, v)
            elif typ == "str":
                b = v.encode("utf-8")
                out += encode_packed_int(len(b)) + b
            elif typ == "bin":
                out += encode_packed_int(len(v)) + bytes(v)
            else:
                raise ValueError(f"unknown type {typ}")
        return bytes(bitmap) + bytes(out)

    # -- decode (engine side) -------------------------------------------
    def decode(self, blob: bytes) -> dict:
        n = len(self.fields)
        nb = (n + 7) // 8
        buf = memoryview(blob)
        pos = nb
        row: dict = {}
        for i, (name, typ) in enumerate(self.fields):
            if blob[i // 8] & (1 << (i % 8)):
                row[name] = None
                continue
            if typ in _FIXED:
                fmt, width = _FIXED[typ]
                row[name] = struct.unpack_from(fmt, buf, pos)[0]
                pos += width
            elif typ == "str":
                ln, pos = decode_packed_int(buf, pos)
                row[name] = bytes(buf[pos : pos + ln]).decode("utf-8")
                pos += ln
            elif typ == "bin":
                ln, pos = decode_packed_int(buf, pos)
                row[name] = bytes(buf[pos : pos + ln])
                pos += ln
        return row


def decode_packed_rows(
    df: DataFrame,
    codec: RowCodec,
    binary_col: str = "row_image",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Decode a binary row-image column into typed columns via mapInPandas
    (Arrow-batched; byte-walk per row, like the reference's row loop)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep_cols]
        + list(codec.spark_schema().fields)
    )
    names = [n for n, _ in codec.fields]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [codec.decode(b) for b in pdf[binary_col]]
            out = pd.DataFrame(decoded, columns=names)
            for k in keep_cols:
                out.insert(0, k, pdf[k].values)
            yield out[[*keep_cols, *names]]

    return df.mapInPandas(mapper, schema=out_schema)
