"""MySQL JSON binary format (``MYSQL_TYPE_JSON`` = 245, MySQL 5.7+).

The reference C engine predates the JSON type (MySQL 5.5 era), but any
modern binlog stream carries it, so the wire layer decodes it the same
way it already handles the 5.6-era GTID/CRC32 features: from the public
on-disk layout (MySQL ``sql/json_binary.h`` documents it exhaustively;
Debezium / python-mysql-replication implement the identical walk).

Layout (all integers little-endian):

- document ::= type(1B) ++ value
- scalar types: 0x04 literal (payload 0=null 1=true 2=false), 0x05
  int16, 0x06 uint16, 0x07 int32, 0x08 uint32, 0x09 int64, 0x0a uint64,
  0x0b double, 0x0c string (varlen length ++ utf8 bytes), 0x0f opaque
  (1B inner type ++ varlen length ++ bytes).
- containers: 0x00/0x02 small object/array (2-byte counts/offsets),
  0x01/0x03 large (4-byte). A container value is
  ``count ++ size ++ key-entries* ++ value-entries* ++ keys ++ data``
  where size covers the whole container value and every offset is
  relative to the container value's first byte. Key entries are
  (offset, uint16 length); value entries are (1B type, offset-or-inline).
  Small containers inline literal/int16/uint16 in the 2-byte slot;
  large containers additionally inline int32/uint32.
- object keys are stored sorted by (byte length, bytes) — MySQL's
  ``Json_object`` ordering; the decoder preserves stored order.
- varlen ints (string/opaque lengths) are base-128 little-endian with
  the high bit as the continuation flag (max 5 bytes).

``decode_json_binary`` returns plain Python values; ``json_text`` is
the deterministic canonical serialization (compact separators, no ASCII
escaping) used for engine/oracle comparison. ``encode_json_binary`` is
the fixture-side producer (MySQL is the real one) and round-trips with
the decoder for null/bool/int/float/str/list/dict.
"""

from __future__ import annotations

import json
import struct

JSONB_SMALL_OBJECT = 0x00
JSONB_LARGE_OBJECT = 0x01
JSONB_SMALL_ARRAY = 0x02
JSONB_LARGE_ARRAY = 0x03
JSONB_LITERAL = 0x04
JSONB_INT16 = 0x05
JSONB_UINT16 = 0x06
JSONB_INT32 = 0x07
JSONB_UINT32 = 0x08
JSONB_INT64 = 0x09
JSONB_UINT64 = 0x0A
JSONB_DOUBLE = 0x0B
JSONB_STRING = 0x0C
JSONB_OPAQUE = 0x0F

_LITERALS = {0x00: None, 0x01: True, 0x02: False}


def _read_varlen(buf: memoryview, pos: int) -> tuple[int, int]:
    """Base-128 LE length with high-bit continuation (json_binary.cc
    read_variable_length)."""
    n = 0
    for i in range(5):
        b = buf[pos + i]
        n |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return n, pos + i + 1
    raise ValueError("varlen int longer than 5 bytes")


def _write_varlen(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_value(t: int, buf: memoryview, pos: int):
    """Decode one value whose payload starts at ``pos`` (type byte already
    consumed / carried in the entry)."""
    if t == JSONB_LITERAL:
        return _LITERALS[buf[pos]]
    if t == JSONB_INT16:
        return struct.unpack_from("<h", buf, pos)[0]
    if t == JSONB_UINT16:
        return struct.unpack_from("<H", buf, pos)[0]
    if t == JSONB_INT32:
        return struct.unpack_from("<i", buf, pos)[0]
    if t == JSONB_UINT32:
        return struct.unpack_from("<I", buf, pos)[0]
    if t == JSONB_INT64:
        return struct.unpack_from("<q", buf, pos)[0]
    if t == JSONB_UINT64:
        return struct.unpack_from("<Q", buf, pos)[0]
    if t == JSONB_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0]
    if t == JSONB_STRING:
        ln, pos = _read_varlen(buf, pos)
        return bytes(buf[pos:pos + ln]).decode("utf-8")
    if t == JSONB_OPAQUE:
        inner = buf[pos]
        ln, pos = _read_varlen(buf, pos + 1)
        return {"$opaque_type": inner, "$hex": bytes(buf[pos:pos + ln]).hex()}
    if t in (JSONB_SMALL_OBJECT, JSONB_LARGE_OBJECT,
             JSONB_SMALL_ARRAY, JSONB_LARGE_ARRAY):
        return _decode_container(t, buf, pos)
    raise ValueError(f"unknown JSONB type 0x{t:02x}")


def _decode_container(t: int, buf: memoryview, base: int):
    large = t in (JSONB_LARGE_OBJECT, JSONB_LARGE_ARRAY)
    is_obj = t in (JSONB_SMALL_OBJECT, JSONB_LARGE_OBJECT)
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    count = struct.unpack_from(fmt, buf, base)[0]
    pos = base + 2 * w  # skip count + size
    keys: list[str] = []
    if is_obj:
        for _ in range(count):
            koff = struct.unpack_from(fmt, buf, pos)[0]
            klen = struct.unpack_from("<H", buf, pos + w)[0]
            keys.append(bytes(buf[base + koff:base + koff + klen]).decode("utf-8"))
            pos += w + 2
    vals = []
    # inlined small: literal/int16/uint16; large additionally int32/uint32
    inline = {JSONB_LITERAL, JSONB_INT16, JSONB_UINT16}
    if large:
        inline |= {JSONB_INT32, JSONB_UINT32}
    for _ in range(count):
        vt = buf[pos]
        if vt in inline:
            # the value lives in the offset slot itself
            vals.append(_decode_value(vt, buf, pos + 1))
        else:
            off = struct.unpack_from(fmt, buf, pos + 1)[0]
            vals.append(_decode_value(vt, buf, base + off))
        pos += 1 + w
    return dict(zip(keys, vals)) if is_obj else vals


def decode_json_binary(blob: bytes):
    """MySQL JSON binary document → Python value. An empty blob is SQL
    NULL (MySQL writes a zero-length value for a NULL JSON column)."""
    if len(blob) == 0:
        return None
    buf = memoryview(blob)
    return _decode_value(buf[0], buf, 1)


def json_text(blob: bytes) -> str | None:
    """Canonical JSON text of a binary document (compact separators,
    UTF-8 kept raw) — the engine's string-typed output for JSON columns."""
    v = decode_json_binary(blob)
    if v is None and len(blob) == 0:
        return None
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


# ---------------------------------------------------------------------------
# encode (fixture side)
# ---------------------------------------------------------------------------


def _scalar_type_and_payload(v) -> tuple[int, bytes]:
    if v is None:
        return JSONB_LITERAL, b"\x00"
    if v is True:
        return JSONB_LITERAL, b"\x01"
    if v is False:
        return JSONB_LITERAL, b"\x02"
    if isinstance(v, int):
        # smallest signed/unsigned class, like Json_wrapper serialization
        if -(1 << 15) <= v < (1 << 15):
            return JSONB_INT16, struct.pack("<h", v)
        if -(1 << 31) <= v < (1 << 31):
            return JSONB_INT32, struct.pack("<i", v)
        if -(1 << 63) <= v < (1 << 63):
            return JSONB_INT64, struct.pack("<q", v)
        if v < (1 << 64):
            return JSONB_UINT64, struct.pack("<Q", v)
        raise ValueError("integer out of 64-bit range")
    if isinstance(v, float):
        return JSONB_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return JSONB_STRING, _write_varlen(len(b)) + b
    raise TypeError(f"unsupported JSON scalar {type(v)!r}")


def _encode_container(v) -> tuple[int, bytes]:
    """Encode a dict/list → (type byte, container value bytes). Chooses
    the small format unless counts/size/offsets overflow uint16."""
    is_obj = isinstance(v, dict)
    if is_obj:
        items = sorted(
            ((str(k).encode("utf-8"), val) for k, val in v.items()),
            key=lambda kv: (len(kv[0]), kv[0]),
        )
        children = [val for _, val in items]
    else:
        items = []
        children = list(v)

    # serialize children first (type, payload, inlinable-in-small?)
    ser: list[tuple[int, bytes]] = []
    for c in children:
        if isinstance(c, (dict, list)):
            ser.append(_encode_container(c))
        else:
            ser.append(_scalar_type_and_payload(c))

    def build(large: bool) -> bytes | None:
        w = 4 if large else 2
        fmt = "<I" if large else "<H"
        inline = {JSONB_LITERAL, JSONB_INT16, JSONB_UINT16}
        if large:
            inline |= {JSONB_INT32, JSONB_UINT32}
        count = len(children)
        header = 2 * w + (w + 2) * count * is_obj + (1 + w) * count
        out_keys = b"".join(k for k, _ in items)
        # lay out non-inlined payloads after keys
        data = bytearray()
        entries = []
        key_off = header
        data_off = header + len(out_keys)
        for t, payload in ser:
            if t in inline:
                entries.append((t, None, payload))
            else:
                entries.append((t, data_off + len(data), None))
                data += payload
        size = data_off + len(data)
        if not large and (count > 0xFFFF or size > 0xFFFF):
            return None
        buf = bytearray()
        buf += struct.pack(fmt, count) + struct.pack(fmt, size)
        for k, _ in items:
            if len(k) > 0xFFFF:
                raise ValueError("JSON object key longer than 65535 bytes")
            buf += struct.pack(fmt, key_off) + struct.pack("<H", len(k))
            key_off += len(k)
        for t, off, payload in entries:
            if off is None:
                buf += bytes([t]) + payload.ljust(w, b"\x00")
            else:
                buf += bytes([t]) + struct.pack(fmt, off)
        buf += out_keys + data
        assert len(buf) == size
        return bytes(buf)

    small = build(False)
    if small is not None:
        t = JSONB_SMALL_OBJECT if is_obj else JSONB_SMALL_ARRAY
        return t, small
    t = JSONB_LARGE_OBJECT if is_obj else JSONB_LARGE_ARRAY
    return t, build(True)


def encode_json_binary(v) -> bytes:
    """Python value → MySQL JSON binary document (None → empty blob, the
    SQL-NULL convention)."""
    if v is None:
        return b""
    if isinstance(v, (dict, list)):
        t, payload = _encode_container(v)
    else:
        t, payload = _scalar_type_and_payload(v)
    return bytes([t]) + payload
