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
  MySQL native types (SURVEY §1.3; parsers the reference ships in
  rs_binlog_row.c:23-280 that round 1 lacked):
    decimal(p,s): MySQL NEWDECIMAL packing — big-endian 9-digit/4-byte
                  groups with dig2bytes partial groups, sign in the first
                  byte's MSB, negative = one's complement
                  (rs_binlog_row.c:394-427, dig2bytes :282)
    date        : 3B LE, day + month*32 + year*512  (rs_binlog_row.c:34)
    time        : 3B LE, hh*10000 + mm*100 + ss     (:35)
    datetime    : 8B LE, YYYYMMDDhhmmss as integer  (:36)
    year        : 1B, offset from 1900 (0 = year 0) (:37)
    bit(n)      : ceil(n/8) bytes big-endian        (:317-329)

Execution model: ``mapInPandas`` — Arrow moves the bytes in columnar
batches; the inner byte-walk is necessarily sequential per row (variable-
length rows have no vectorizable layout; the reference walks bytes the
same way). In the main CDC path events are already columnar and decode is
a plain projection (SURVEY P2) — this operator exists for packed/legacy
feeds and for parity tests.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
from collections.abc import Iterator
from dataclasses import dataclass
from decimal import Decimal, localcontext

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# MySQL decimal packing: bytes needed for a partial group of N digits
# (dig2bytes, /root/reference/src/slave/rs_binlog_row.c:282 — same table
# as MySQL strings/decimal.c).
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]

_TYPE_RE = re.compile(r"^(decimal|bit)\((\d+)(?:,\s*(\d+))?\)$")

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
    "date": T.DateType(),
    "time": T.IntegerType(),  # seconds of day (Spark has no TimeType)
    "datetime": T.TimestampNTZType(),  # MySQL DATETIME carries no zone
    "year": T.ShortType(),
}


def decimal_binsize(precision: int, scale: int) -> int:
    """Packed size of a NEWDECIMAL(p,s) — the reference's
    rs_binlog_decimal_binsize (rs_binlog_row.c:411-423)."""
    intg = precision - scale
    intg0, intg0x = divmod(intg, 9)
    frac0, frac0x = divmod(scale, 9)
    return intg0 * 4 + _DIG2BYTES[intg0x] + frac0 * 4 + _DIG2BYTES[frac0x]


def encode_mysql_decimal(v, precision: int, scale: int) -> bytes:
    """MySQL NEWDECIMAL packing: big-endian digit groups (9 digits / 4
    bytes, partial groups per dig2bytes), built for the absolute value;
    negative → one's complement; first byte's MSB is the (inverted) sign."""
    with localcontext() as ctx:
        ctx.prec = precision + scale + 4  # MySQL allows up to 65 digits
        q = Decimal(v).quantize(Decimal(1).scaleb(-scale))
        neg = q < 0
        intg = precision - scale
        unscaled = int(abs(q).scaleb(scale))
    if len(str(unscaled)) > precision:
        raise ValueError(f"{v} overflows decimal({precision},{scale})")
    s = str(unscaled).rjust(precision, "0")
    int_part, frac_part = s[:intg], s[intg:]
    intg0, intg0x = divmod(intg, 9)
    frac0, frac0x = divmod(scale, 9)
    buf = bytearray()
    pos = 0
    if intg0x:
        buf += int(int_part[:intg0x] or "0").to_bytes(_DIG2BYTES[intg0x], "big")
        pos = intg0x
    for _ in range(intg0):
        buf += int(int_part[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    pos = 0
    for _ in range(frac0):
        buf += int(frac_part[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    if frac0x:
        buf += int(frac_part[pos : pos + frac0x]).to_bytes(_DIG2BYTES[frac0x], "big")
    if neg:
        buf = bytearray(b ^ 0xFF for b in buf)
    buf[0] ^= 0x80
    return bytes(buf)


def decode_mysql_decimal(b, precision: int, scale: int) -> Decimal:
    buf = bytearray(b)
    positive = bool(buf[0] & 0x80)
    buf[0] ^= 0x80
    if not positive:
        buf = bytearray(x ^ 0xFF for x in buf)
    intg = precision - scale
    intg0, intg0x = divmod(intg, 9)
    frac0, frac0x = divmod(scale, 9)
    pos = 0
    int_digits = ""
    if intg0x:
        w = _DIG2BYTES[intg0x]
        int_digits += str(int.from_bytes(buf[pos : pos + w], "big")).rjust(intg0x, "0")
        pos += w
    for _ in range(intg0):
        int_digits += str(int.from_bytes(buf[pos : pos + 4], "big")).rjust(9, "0")
        pos += 4
    frac_digits = ""
    for _ in range(frac0):
        frac_digits += str(int.from_bytes(buf[pos : pos + 4], "big")).rjust(9, "0")
        pos += 4
    if frac0x:
        w = _DIG2BYTES[frac0x]
        frac_digits += str(int.from_bytes(buf[pos : pos + w], "big")).rjust(frac0x, "0")
        pos += w
    sign = "" if positive else "-"
    txt = f"{sign}{int_digits or '0'}"
    if scale:
        txt += f".{frac_digits}"
    return Decimal(txt)


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

    @staticmethod
    def _parse(typ: str) -> tuple[str, int, int]:
        """type key → (kind, p1, p2); plain kinds return (typ, 0, 0)."""
        m = _TYPE_RE.match(typ)
        if not m:
            return typ, 0, 0
        kind, p1, p2 = m.group(1), int(m.group(2)), int(m.group(3) or 0)
        return kind, p1, p2

    def spark_schema(self) -> T.StructType:
        out = []
        for n, t in self.fields:
            kind, p1, p2 = self._parse(t)
            if kind == "decimal":
                st: T.DataType = T.DecimalType(p1, p2)
            elif kind == "bit":
                st = T.BinaryType()
            else:
                st = _SPARK_TYPES[kind]
            out.append(T.StructField(n, st, True))
        return T.StructType(out)

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
            elif typ == "date":
                out += (v.day + v.month * 32 + v.year * 512).to_bytes(3, "little")
            elif typ == "time":  # v: seconds of day
                h, rem = divmod(int(v), 3600)
                mnt, sec = divmod(rem, 60)
                out += (h * 10000 + mnt * 100 + sec).to_bytes(3, "little")
            elif typ == "datetime":  # v: naive datetime, second precision
                packed = (
                    (v.year * 10000 + v.month * 100 + v.day) * 1_000_000
                    + v.hour * 10000
                    + v.minute * 100
                    + v.second
                )
                out += packed.to_bytes(8, "little")
            elif typ == "year":
                out += bytes([0 if v == 0 else int(v) - 1900])
            else:
                kind, p1, p2 = self._parse(typ)
                if kind == "decimal":
                    out += encode_mysql_decimal(v, p1, p2)
                elif kind == "bit":
                    width = (p1 + 7) // 8
                    b = bytes(v)
                    if len(b) != width:
                        raise ValueError(f"bit({p1}) needs {width} bytes")
                    out += b
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
            elif typ == "date":
                v = int.from_bytes(buf[pos : pos + 3], "little")
                row[name] = _dt.date(v >> 9, (v >> 5) & 15, v & 31)
                pos += 3
            elif typ == "time":
                v = int.from_bytes(buf[pos : pos + 3], "little")
                row[name] = (v // 10000) * 3600 + (v // 100 % 100) * 60 + v % 100
                pos += 3
            elif typ == "datetime":
                v = int.from_bytes(buf[pos : pos + 8], "little")
                d, t = divmod(v, 1_000_000)
                row[name] = _dt.datetime(
                    d // 10000, d // 100 % 100, d % 100,
                    t // 10000, t // 100 % 100, t % 100,
                )
                pos += 8
            elif typ == "year":
                v = buf[pos]
                row[name] = 0 if v == 0 else 1900 + v
                pos += 1
            else:
                kind, p1, p2 = self._parse(typ)
                if kind == "decimal":
                    w = decimal_binsize(p1, p2)
                    row[name] = decode_mysql_decimal(buf[pos : pos + w], p1, p2)
                    pos += w
                elif kind == "bit":
                    w = (p1 + 7) // 8
                    row[name] = bytes(buf[pos : pos + w])
                    pos += w
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
