"""Byte-compatible MySQL ROWS_EVENT row-image codec (SURVEY §2.2 P1-P4).

Unlike ``decoder.RowCodec`` (an engine-defined packed format proving the
bitmap+typed-parse pipeline), this module walks the REFERENCE'S exact wire
layout — the framing rs_dm_binlog_row consumes after the master prepends
the TABLE_MAP info (/root/reference/src/slave/rs_binlog_row.c:430-631):

  u32 column_count | type byte per column | u32 meta_len | meta bytes |
  8B table id + reserved | packed-int column_count |
  used-columns bitmap ceil(cn/8) | (UPDATE: second bitmap for after-images)
  then per row image: null bitmap | value bytes of used, non-null columns

Reference-parity details deliberately reproduced:
- used-columns bitmap with the skip sentinel: a column whose used bit is 0
  contributes NO bytes to the image (rs_binlog_row.c:485-514); a column the
  target registry does not map is still length-walked but not copied
  (``pas.pos == -1`` skip, :559-561 — our ``skip`` set).
- null-bitmap index j advances for EVERY column (used or not), exactly as
  the reference's ``next_col: j++`` does (:594-601).
- VARCHAR length prefix is 1 byte when the column's max byte length < 256
  and 2 bytes otherwise, driven by the 2-byte little-endian meta
  (rs_binlog_parse_varchar, :294-314).
- STRING carries the MySQL bug-37426 meta encoding: when byte0's 0x30 bits
  are not both set, the real max length's high bits hide in
  ``(byte0 & 0x30) ^ 0x30`` (rs_binlog_parse_string, :364-392).
- VAR_STRING's prefix width comes from meta byte1 (rs_binlog_parse_
  varstring, :347-361); BLOB's from its 1-byte meta
  (rs_binlog_parse_blob, :332-345).
- BIT walks ``meta[0] // 8`` bytes (rs_binlog_parse_bit, :317-329).
- NEWDECIMAL size from (precision, scale) meta via dig2bytes
  (rs_binlog_parse_decimal/rs_binlog_decimal_binsize, :394-427).
- UPDATE rows alternate before/after images; the after-image uses the
  SECOND used-columns bitmap (:509-514, :603-616).

The encoder exists for fixtures/tests (the reference's master side ships
raw binlog bytes; MySQL itself is the producer in production). Execution
is Arrow-batched mapInPandas — same shape as decoder.decode_packed_rows.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .decoder import (
    decimal_binsize,
    decode_mysql_decimal,
    decode_packed_int,
    encode_mysql_decimal,
    encode_packed_int,
)
from .json_binary import encode_json_binary, json_text
from .temporal2 import (
    FRAC_BYTES,
    decode_datetime2,
    decode_time2,
    decode_timestamp2,
    encode_datetime2,
    encode_time2,
    encode_timestamp2,
)

# MySQL wire type codes (rs_binlog_row.c:22-280 meta table positions).
MYSQL_TYPE_CODES = {
    "tiny": 1,
    "short": 2,
    "long": 3,
    "float": 4,
    "double": 5,
    "timestamp": 7,
    "longlong": 8,
    "int24": 9,
    "date": 10,
    "time": 11,
    "datetime": 12,
    "year": 13,
    "varchar": 15,
    "bit": 16,
    # MySQL 5.6.4+ temporal v2 (temporal2.py) and 5.7+ JSON
    # (json_binary.py) — beyond the 5.5-era reference, like GTID/CRC32
    "timestamp2": 17,
    "datetime2": 18,
    "time2": 19,
    "json": 245,
    "newdecimal": 246,
    "blob": 252,
    "varstring": 253,
    "string": 254,
}
# fixed byte widths (meta table fixed_len column)
_FIXED_LEN = {
    "tiny": 1, "short": 2, "long": 4, "float": 4, "double": 8,
    "timestamp": 4, "longlong": 8, "int24": 3, "date": 3, "time": 3,
    "datetime": 8, "year": 1,
}
_SIGNED_INT = {"tiny": 1, "short": 2, "long": 4, "longlong": 8, "int24": 3}

_COLTYPE_RE = re.compile(r"^([a-z]+[0-9]*)(?:\((\d+)(?:,\s*(\d+))?\))?$")


def _apply_partial_json(before: dict, after: dict) -> dict:
    """Fold decoded JSON diff streams into the before-image documents —
    the consumer-side patch step of PARTIAL_UPDATE_ROWS_EVENT. Requires
    the before image to carry the full document (binlog_row_image=FULL
    before images, which is what MySQL pairs with PARTIAL_JSON)."""
    import json as _json

    from .json_diff import JsonDiffError, JsonDiffs, apply_json_diffs

    out = dict(after)
    for k, v in after.items():
        if not isinstance(v, JsonDiffs):
            continue
        base_text = before.get(k)
        if base_text is None:
            raise JsonDiffError(
                f"partial JSON for {k!r} without a before-image document"
            )
        doc = apply_json_diffs(_json.loads(base_text), list(v))
        out[k] = _json.dumps(doc, separators=(",", ":"), ensure_ascii=False)
    return out


@dataclass(frozen=True)
class MySQLColumn:
    """One column binding: name + MySQL type spec, e.g. ``varchar(300)``
    (param = max BYTE length), ``string(300)``, ``blob(2)`` (param = length
    prefix width), ``newdecimal(12,4)``, ``bit(16)``."""

    name: str
    spec: str

    def parse(self) -> tuple[str, int, int]:
        m = _COLTYPE_RE.match(self.spec)
        if not m or m.group(1) not in MYSQL_TYPE_CODES:
            raise ValueError(f"unknown MySQL column spec {self.spec}")
        return m.group(1), int(m.group(2) or 0), int(m.group(3) or 0)

    def meta_bytes(self) -> bytes:
        """The TABLE_MAP meta for this column, in the layout the reference
        parsers read."""
        kind, p1, p2 = self.parse()
        if kind in ("varchar",):
            return struct.pack("<H", p1)  # 2B LE max byte length
        if kind == "varstring":
            # parse_varstring reads prefix width from meta byte 1
            return bytes([0, 1 if p1 < 256 else 2])
        if kind == "string":
            # bug-37426 encoding: high bits of max_len fold into byte0's
            # 0x30 field; byte0 carries the real type with 0x30 cleared
            high = (p1 >> 8) & 0x03
            b0 = (MYSQL_TYPE_CODES["string"] & ~0x30) | (0x30 ^ (high << 4))
            return bytes([b0, p1 & 0xFF])
        if kind == "blob":
            return bytes([p1 or 2])  # length-prefix width
        if kind == "bit":
            return bytes([p1, 0])  # parse_bit reads byte0, walks p1//8
        if kind == "newdecimal":
            return bytes([p1, p2])  # (precision, scale) a.k.a. (decimal,
            # precision) in the reference's argument naming
        if kind in ("float", "double"):
            return bytes([_FIXED_LEN[kind]])
        if kind in ("timestamp2", "datetime2", "time2"):
            return bytes([p1])  # fsp (fractional-second precision, 0-6)
        if kind == "json":
            return bytes([p1 or 4])  # length-prefix width (server uses 4)
        return b""

    def spark_field(self) -> T.StructField:
        kind, p1, p2 = self.parse()
        st: T.DataType
        if kind == "tiny":
            st = T.ByteType()
        elif kind == "short":
            st = T.ShortType()
        elif kind in ("long", "int24"):
            st = T.IntegerType()
        elif kind in ("longlong", "timestamp"):
            st = T.LongType()  # timestamp = epoch seconds
        elif kind == "float":
            st = T.FloatType()
        elif kind == "double":
            st = T.DoubleType()
        elif kind in ("varchar", "varstring", "string"):
            st = T.StringType()
        elif kind in ("blob", "bit"):
            st = T.BinaryType()
        elif kind == "newdecimal":
            st = T.DecimalType(p1, p2)
        elif kind == "date":
            st = T.DateType()
        elif kind == "time":
            st = T.IntegerType()  # seconds of day
        elif kind == "datetime":
            st = T.TimestampNTZType()
        elif kind == "datetime2":
            st = T.TimestampNTZType()  # carries microseconds
        elif kind == "timestamp2":
            st = T.LongType()  # epoch microseconds
        elif kind == "time2":
            st = T.LongType()  # signed microseconds of day
        elif kind == "json":
            st = T.StringType()  # canonical JSON text
        elif kind == "year":
            st = T.ShortType()
        else:  # pragma: no cover
            raise ValueError(kind)
        return T.StructField(self.name, st, True)


@dataclass(frozen=True)
class MySQLTableDef:
    """Column registry for one replicated table — the data-driven analogue
    of the reference's compile-time pas_arr offset registry."""

    columns: tuple[MySQLColumn, ...]
    # columns the consumer does not map (pas.pos == -1): still byte-walked,
    # never emitted
    skip: frozenset[str] = field(default_factory=frozenset)

    def spark_schema(self, used: tuple[str, ...] | None = None) -> T.StructType:
        names = set(used) if used is not None else {c.name for c in self.columns}
        return T.StructType(
            [
                c.spark_field()
                for c in self.columns
                if c.name in names and c.name not in self.skip
            ]
        )

    # ------------------------------------------------------------------
    # encode (fixture side — MySQL is the real producer)
    # ------------------------------------------------------------------
    def _encode_value(self, col: MySQLColumn, v) -> bytes:
        kind, p1, p2 = col.parse()
        if kind in _SIGNED_INT:
            return int(v).to_bytes(_SIGNED_INT[kind], "little", signed=True)
        if kind == "float":
            return struct.pack("<f", v)
        if kind == "double":
            return struct.pack("<d", v)
        if kind == "timestamp":
            return int(v).to_bytes(4, "little")
        if kind == "date":
            return (v.day + v.month * 32 + v.year * 512).to_bytes(3, "little")
        if kind == "time":
            h, rem = divmod(int(v), 3600)
            mnt, sec = divmod(rem, 60)
            return (h * 10000 + mnt * 100 + sec).to_bytes(3, "little")
        if kind == "datetime":
            packed = (
                (v.year * 10000 + v.month * 100 + v.day) * 1_000_000
                + v.hour * 10000 + v.minute * 100 + v.second
            )
            return packed.to_bytes(8, "little")
        if kind == "year":
            return bytes([0 if v == 0 else int(v) - 1900])
        if kind in ("varchar", "string"):
            b = v.encode("utf-8")
            width = 1 if p1 < 256 else 2
            return len(b).to_bytes(width, "little") + b
        if kind == "varstring":
            b = v.encode("utf-8")
            width = 1 if p1 < 256 else 2
            return len(b).to_bytes(width, "little") + b
        if kind == "blob":
            b = bytes(v)
            return len(b).to_bytes(p1 or 2, "little") + b
        if kind == "bit":
            b = bytes(v)
            if len(b) != p1 // 8:
                raise ValueError(f"bit({p1}) image must be {p1 // 8} bytes")
            return b
        if kind == "newdecimal":
            return encode_mysql_decimal(v, p1, p2)
        if kind == "timestamp2":
            return encode_timestamp2(v, p1)
        if kind == "datetime2":
            return encode_datetime2(v, p1)
        if kind == "time2":
            return encode_time2(v, p1)
        if kind == "json":
            from .json_diff import JsonDiffs, encode_json_diffs

            b = (encode_json_diffs(v) if isinstance(v, JsonDiffs)
                 else encode_json_binary(v))
            return len(b).to_bytes(p1 or 4, "little") + b
        raise ValueError(kind)  # pragma: no cover

    def encode_rows_event(
        self,
        rows: list[dict] | list[tuple[dict, dict]],
        event_type: str = "write",
        used: tuple[str, ...] | None = None,
        used_after: tuple[str, ...] | None = None,
        table_id: int = 1,
    ) -> bytes:
        """Build one ROWS_EVENT payload in the reference framing. For
        ``event_type='update'`` each element of ``rows`` is a (before,
        after) dict pair.

        ``event_type='update_partial'`` is MySQL 8.0's
        PARTIAL_UPDATE_ROWS_EVENT (binlog_row_value_options=PARTIAL_JSON):
        each AFTER image opens with a packed-int value_options and — when
        its PARTIAL_JSON bit is set — partial_bits (one bit per JSON
        column of the table); a JSON value given as ``JsonDiffs([...])``
        is stored as a length-prefixed diff stream instead of a full
        document (sources/json_diff.py)."""
        cols = self.columns
        cn = len(cols)
        used = used if used is not None else tuple(c.name for c in cols)
        used_after = used_after if used_after is not None else used
        meta = b"".join(c.meta_bytes() for c in cols)
        out = bytearray()
        out += struct.pack("<I", cn)
        out += bytes(MYSQL_TYPE_CODES[c.parse()[0]] for c in cols)
        out += struct.pack("<I", len(meta))
        out += meta
        out += table_id.to_bytes(6, "little") + b"\x00\x00"  # id + reserved
        out += encode_packed_int(cn)
        un = (cn + 7) // 8

        def bitmap(names: tuple[str, ...]) -> bytes:
            bm = bytearray(un)
            for i, c in enumerate(cols):
                if c.name in names:
                    bm[i // 8] |= 1 << (i % 8)
            return bytes(bm)

        is_update = event_type in ("update", "update_partial")
        out += bitmap(used)
        if is_update:
            out += bitmap(used_after)
        json_cols = [c.name for c in cols if c.parse()[0] == "json"]

        def image(row: dict, names: tuple[str, ...], partial: bool = False) -> bytes:
            from .json_diff import JsonDiffs

            pre = b""
            if partial:
                pb = bytearray((len(json_cols) + 7) // 8)
                for k, name in enumerate(json_cols):
                    if isinstance(row.get(name), JsonDiffs):
                        pb[k // 8] |= 1 << (k % 8)
                pre = encode_packed_int(1) + bytes(pb)  # PARTIAL_JSON bit
            nn = (un * 8 + 7) // 8
            null_bits = bytearray(nn)
            vals = bytearray()
            for j, c in enumerate(cols):  # j advances per column, like the
                if c.name not in names:  # reference's next_col: j++
                    continue
                v = row.get(c.name)
                if v is None:
                    null_bits[j // 8] |= 1 << (j % 8)
                    continue
                vals += self._encode_value(c, v)
            return pre + bytes(null_bits) + bytes(vals)

        if is_update:
            for before, after in rows:  # alternating images
                out += image(before, used) + image(
                    after, used_after, partial=(event_type == "update_partial")
                )
        else:
            for row in rows:
                out += image(row, used)
        return bytes(out)

    # ------------------------------------------------------------------
    # decode (engine side — the reference's row loop, re-expressed)
    # ------------------------------------------------------------------
    def _decode_value(self, col: MySQLColumn, buf: memoryview, pos: int,
                      meta: bytes):
        """Return (value, new_pos). Length discovery mirrors the
        reference's per-type parse handlers byte for byte."""
        kind, p1, p2 = col.parse()
        if kind in _SIGNED_INT:
            w = _SIGNED_INT[kind]
            return int.from_bytes(buf[pos:pos + w], "little", signed=True), pos + w
        if kind == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if kind == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if kind == "timestamp":
            return int.from_bytes(buf[pos:pos + 4], "little"), pos + 4
        if kind == "date":
            v = int.from_bytes(buf[pos:pos + 3], "little")
            return _dt.date(v >> 9, (v >> 5) & 15, v & 31), pos + 3
        if kind == "time":
            v = int.from_bytes(buf[pos:pos + 3], "little")
            return (v // 10000) * 3600 + (v // 100 % 100) * 60 + v % 100, pos + 3
        if kind == "datetime":
            v = int.from_bytes(buf[pos:pos + 8], "little")
            d, t = divmod(v, 1_000_000)
            return _dt.datetime(d // 10000, d // 100 % 100, d % 100,
                                t // 10000, t // 100 % 100, t % 100), pos + 8
        if kind == "year":
            v = buf[pos]
            return (0 if v == 0 else 1900 + v), pos + 1
        if kind == "varchar":
            # rs_binlog_parse_varchar: 2B LE max from meta → 1B prefix
            # when max < 256, else 2B
            mx = struct.unpack_from("<H", meta, 0)[0]
            width = 1 if mx < 256 else 2
            ln = int.from_bytes(buf[pos:pos + width], "little")
            pos += width
            return bytes(buf[pos:pos + ln]).decode("utf-8"), pos + ln
        if kind == "varstring":
            # rs_binlog_parse_varstring: prefix width = meta byte 1
            width = meta[1]
            ln = int.from_bytes(buf[pos:pos + width], "little")
            pos += width
            return bytes(buf[pos:pos + ln]).decode("utf-8"), pos + ln
        if kind == "string":
            # rs_binlog_parse_string with the bug-37426 meta fold
            b0 = meta[0]
            if (b0 & 0x30) != 0x30:
                mx = meta[1] | (((b0 & 0x30) ^ 0x30) << 4)
            else:
                mx = meta[1]
            width = 1 if mx < 256 else 2
            ln = int.from_bytes(buf[pos:pos + width], "little")
            pos += width
            return bytes(buf[pos:pos + ln]).decode("utf-8"), pos + ln
        if kind == "blob":
            width = meta[0]  # rs_binlog_parse_blob: prefix width = meta
            ln = int.from_bytes(buf[pos:pos + width], "little")
            pos += width
            return bytes(buf[pos:pos + ln]), pos + ln
        if kind == "bit":
            w = meta[0] // 8  # rs_binlog_parse_bit
            return bytes(buf[pos:pos + w]), pos + w
        if kind == "newdecimal":
            w = decimal_binsize(meta[0], meta[1])
            return decode_mysql_decimal(buf[pos:pos + w], meta[0], meta[1]), pos + w
        if kind == "timestamp2":
            w = 4 + FRAC_BYTES[meta[0]]
            return decode_timestamp2(bytes(buf[pos:pos + w]), meta[0]), pos + w
        if kind == "datetime2":
            w = 5 + FRAC_BYTES[meta[0]]
            return decode_datetime2(bytes(buf[pos:pos + w]), meta[0]), pos + w
        if kind == "time2":
            w = (6 if meta[0] >= 5 else 3 + FRAC_BYTES[meta[0]])
            return decode_time2(bytes(buf[pos:pos + w]), meta[0]), pos + w
        if kind == "json":
            width = meta[0]
            ln = int.from_bytes(buf[pos:pos + width], "little")
            pos += width
            return json_text(bytes(buf[pos:pos + ln])), pos + ln
        raise ValueError(kind)  # pragma: no cover

    def decode_rows_event(self, blob: bytes, event_type: str = "write") -> list[dict]:
        """Decode one ROWS_EVENT payload. WRITE/DELETE → one dict per row
        image; UPDATE → one dict per row with ``before_``/``after_``
        prefixed keys (the P5 pairing). Skipped columns are byte-walked
        but never emitted; unused columns contribute no bytes."""
        buf = memoryview(blob)
        pos = 0
        cn = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        type_codes = bytes(buf[pos:pos + cn])
        pos += cn
        ml = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        metas: list[bytes] = []
        mp = pos
        code_to_kind = {v: k for k, v in MYSQL_TYPE_CODES.items()}
        meta_widths = {"varchar": 2, "varstring": 2, "string": 2, "bit": 2,
                       "newdecimal": 2, "blob": 1, "float": 1, "double": 1,
                       "timestamp2": 1, "datetime2": 1, "time2": 1, "json": 1}
        for code in type_codes:
            w = meta_widths.get(code_to_kind[code], 0)
            metas.append(bytes(buf[mp:mp + w]))
            mp += w
        pos += ml
        pos += 8  # table id + reserved
        cn2, pos = decode_packed_int(buf, pos)
        assert cn2 == cn, (cn2, cn)
        un = (cn + 7) // 8
        use_bits = bytes(buf[pos:pos + un])
        pos += un
        is_update = event_type in ("update", "update_partial")
        use_after = use_bits
        if is_update:
            use_after = bytes(buf[pos:pos + un])
            pos += un

        cols = self.columns
        json_cols = [c.name for c in cols if c.parse()[0] == "json"]
        rows: list[dict] = []
        before_img: dict | None = None
        is_before = True
        while pos < len(blob):
            partial_json: set[str] = set()
            if event_type == "update_partial" and not is_before:
                # PARTIAL_UPDATE_ROWS_EVENT after-image prefix:
                # value_options packed int, then (if PARTIAL_JSON bit)
                # one partial bit per JSON column of the table
                vopts, pos = decode_packed_int(buf, pos)
                if vopts & 1:
                    pbn = (len(json_cols) + 7) // 8
                    pb = bytes(buf[pos:pos + pbn])
                    pos += pbn
                    partial_json = {
                        name
                        for k, name in enumerate(json_cols)
                        if (pb[k // 8] >> (k % 8)) & 1
                    }
            nn = (un * 8 + 7) // 8
            null_bits = bytes(buf[pos:pos + nn])
            pos += nn
            ub = use_bits if (not is_update or is_before) else use_after
            row: dict = {}
            for i, c in enumerate(cols):
                if not (ub[i // 8] >> (i % 8)) & 1:
                    continue  # unused: no bytes in the image
                if (null_bits[i // 8] >> (i % 8)) & 1:
                    if c.name not in self.skip:
                        row[c.name] = None
                    continue
                if c.name in partial_json:
                    # length-prefixed JSON diff stream instead of a doc
                    from .json_diff import JsonDiffs, decode_json_diffs

                    width = metas[i][0]
                    ln = int.from_bytes(buf[pos:pos + width], "little")
                    pos += width
                    v = JsonDiffs(decode_json_diffs(bytes(buf[pos:pos + ln])))
                    pos += ln
                else:
                    v, pos = self._decode_value(c, buf, pos, metas[i])
                if pos > len(blob):  # claimed length runs past the buffer
                    raise ValueError(
                        f"truncated row image at column {c.name!r}"
                    )
                if c.name not in self.skip:  # pas.pos == -1 → walk, drop
                    row[c.name] = v
            if is_update:
                if is_before:
                    before_img, is_before = row, False
                else:
                    if event_type == "update_partial":
                        row = _apply_partial_json(before_img or {}, row)
                    rows.append(
                        {f"before_{k}": v for k, v in (before_img or {}).items()}
                        | {f"after_{k}": v for k, v in row.items()}
                    )
                    before_img, is_before = None, True
            else:
                rows.append(row)
        return rows


def decode_mysql_rows(
    df: DataFrame,
    table_def: MySQLTableDef,
    binary_col: str = "rows_event",
    event_type_col: str | None = None,
    keep_cols: tuple[str, ...] = (),
    used: tuple[str, ...] | None = None,
) -> DataFrame:
    """Arrow-batched decode of a ROWS_EVENT binary column: one output row
    per decoded row image (events expand — mapInPandas may yield more rows
    than in). WRITE/DELETE only (UPDATE pairing returns prefixed columns;
    use ``table_def.decode_rows_event`` directly or a dedicated schema)."""
    out_fields = [f for f in df.schema.fields if f.name in keep_cols]
    val_schema = table_def.spark_schema(used)
    out_schema = T.StructType(out_fields + list(val_schema.fields))
    names = [f.name for f in val_schema.fields]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            keeps = []
            etypes = (
                pdf[event_type_col] if event_type_col is not None
                else ["write"] * len(pdf)
            )
            for idx, (blob, et) in enumerate(zip(pdf[binary_col], etypes)):
                decoded = table_def.decode_rows_event(bytes(blob), et)
                out_rows.extend(decoded)
                keeps.extend([idx] * len(decoded))
            out = pd.DataFrame(
                [[r.get(n) for n in names] for r in out_rows], columns=names
            )
            for k in reversed(list(keep_cols)):
                out.insert(0, k, pdf[k].values[keeps] if len(out) else [])
            yield out[[*keep_cols, *names]]

    return df.mapInPandas(mapper, schema=out_schema)


def decode_mysql_updates(
    df: DataFrame,
    table_def: MySQLTableDef,
    binary_col: str = "rows_event",
    keep_cols: tuple[str, ...] = (),
    used: tuple[str, ...] | None = None,
    used_after: tuple[str, ...] | None = None,
    partial: bool = False,
) -> DataFrame:
    """Arrow-batched decode of UPDATE_ROWS_EVENT /
    PARTIAL_UPDATE_ROWS_EVENT blobs: one output row per (before, after)
    image pair, columns prefixed ``before_``/``after_`` (the reference's
    P5 pairing, rs_binlog_row.c alternating-image walk). With
    ``partial=True`` the after image opens with MySQL 8.0's
    value_options + partial bits and JSON diff streams are folded into
    the before-image documents executor-side (sources/json_diff.py) —
    the distributed consumer-side patch step of
    ``binlog_row_value_options=PARTIAL_JSON``."""
    out_fields = [f for f in df.schema.fields if f.name in keep_cols]
    bsch = table_def.spark_schema(used)
    asch = table_def.spark_schema(used_after if used_after is not None else used)
    pair_fields = [
        T.StructField(f"before_{f.name}", f.dataType) for f in bsch.fields
    ] + [T.StructField(f"after_{f.name}", f.dataType) for f in asch.fields]
    out_schema = T.StructType(out_fields + pair_fields)
    names = [f.name for f in pair_fields]
    etype = "update_partial" if partial else "update"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            keeps = []
            for idx, blob in enumerate(pdf[binary_col]):
                decoded = table_def.decode_rows_event(bytes(blob), etype)
                out_rows.extend(decoded)
                keeps.extend([idx] * len(decoded))
            out = pd.DataFrame(
                [[r.get(n) for n in names] for r in out_rows], columns=names
            )
            for k in reversed(list(keep_cols)):
                out.insert(0, k, pdf[k].values[keeps] if len(out) else [])
            yield out[[*keep_cols, *names]]

    return df.mapInPandas(mapper, schema=out_schema)
