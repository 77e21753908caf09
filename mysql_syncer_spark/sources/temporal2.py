"""MySQL 5.6.4+ temporal-v2 storage formats: TIMESTAMP2 / DATETIME2 /
TIME2 (wire type codes 17 / 18 / 19).

The reference C engine parses the 5.5-era temporals (little-endian packed
integers, rs_binlog_row.c:34-37); servers since 5.6.4 write the v2 layouts
for every new table, so a real binlog feed needs these exactly like it
needs CRC32 checksums and GTIDs (both already handled by the FILE layer).
Layouts are the public ones from MySQL ``my_time.cc`` (also implemented by
Debezium / python-mysql-replication):

- big-endian storage with a sign-flip offset so memcmp order == value
  order (the point of v2);
- fractional seconds: ``fsp`` (0-6) decimal digits stored in
  ``(fsp+1)//2`` extra bytes — 1 byte holding usec/10⁴ for fsp 1-2,
  2 bytes of usec/10² for fsp 3-4, 3 bytes of usec for fsp 5-6;
- TIMESTAMP2: 4-byte big-endian epoch seconds ++ frac
  (``my_timestamp_to_binary``);
- DATETIME2: 5-byte big-endian ``0x8000000000 + int_part`` where
  ``int_part = ((year*13 + month) << 22 | day << 17 | hour << 12 |
  minute << 6 | second)`` ++ frac (``my_datetime_packed_to_binary``);
- TIME2: signed — the packed value ``nr = ±((hour<<12|min<<6|sec) << 24
  + usec)``; fsp 0-4 store ``0x800000 + (nr >> 24)`` in 3 big-endian
  bytes plus the frac as a TRUNCATED-toward-zero signed quotient
  (C ``%``/``/`` semantics — negative fractions ride as two's-complement
  bytes with a borrow into the integer part, ``my_time_packed_to_binary``
  / ``my_time_packed_from_binary``); fsp 5-6 store the whole
  ``nr + 0x800000000000`` in 6 bytes.

Value models used by the wire codec (mysql_rows.py):
TIMESTAMP2 ↔ epoch **microseconds** (int), DATETIME2 ↔ naive
``datetime.datetime``, TIME2 ↔ signed **microseconds** (int, MySQL range
±838:59:59.999999). Encoders truncate sub-fsp digits exactly like the
server quantizes before storage.
"""

from __future__ import annotations

import datetime as _dt

FRAC_BYTES = {0: 0, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}

_TIMEF_INT_OFS = 0x800000
_TIMEF_OFS = 0x800000000000
_DATETIMEF_INT_OFS = 0x8000000000
_TIME_MAX_MICROS = ((838 * 3600 + 59 * 60 + 59) * 1_000_000) + 999_999


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero)."""
    q = abs(a) // b
    return -q if (a < 0) != (b < 0) else q


def _trunc_mod(a: int, b: int) -> int:
    return a - _trunc_div(a, b) * b


def _quantize(usec: int, fsp: int) -> int:
    return usec - usec % 10 ** (6 - fsp) if fsp < 6 else usec


def _frac_encode(usec: int, fsp: int) -> bytes:
    """Non-negative fractional tail for TIMESTAMP2/DATETIME2."""
    if fsp == 0:
        return b""
    if fsp <= 2:
        return bytes([usec // 10_000])
    if fsp <= 4:
        return (usec // 100).to_bytes(2, "big")
    return usec.to_bytes(3, "big")


def _frac_decode(buf: bytes, fsp: int) -> int:
    if fsp == 0:
        return 0
    if fsp <= 2:
        return buf[0] * 10_000
    if fsp <= 4:
        return int.from_bytes(buf[:2], "big") * 100
    return int.from_bytes(buf[:3], "big")


# ---------------------------------------------------------------------------
# TIMESTAMP2
# ---------------------------------------------------------------------------


def encode_timestamp2(epoch_micros: int, fsp: int) -> bytes:
    sec, usec = divmod(int(epoch_micros), 1_000_000)
    return sec.to_bytes(4, "big") + _frac_encode(_quantize(usec, fsp), fsp)


def decode_timestamp2(buf: bytes, fsp: int) -> int:
    sec = int.from_bytes(buf[:4], "big")
    return sec * 1_000_000 + _frac_decode(buf[4:], fsp)


# ---------------------------------------------------------------------------
# DATETIME2
# ---------------------------------------------------------------------------


def encode_datetime2(v: _dt.datetime, fsp: int) -> bytes:
    ymd = ((v.year * 13 + v.month) << 5) | v.day
    hms = (v.hour << 12) | (v.minute << 6) | v.second
    int_part = (ymd << 17) | hms
    head = (int_part + _DATETIMEF_INT_OFS).to_bytes(5, "big")
    return head + _frac_encode(_quantize(v.microsecond, fsp), fsp)


def decode_datetime2(buf: bytes, fsp: int) -> _dt.datetime:
    int_part = int.from_bytes(buf[:5], "big") - _DATETIMEF_INT_OFS
    hms = int_part & 0x1FFFF
    ymd = int_part >> 17
    ym, day = ymd >> 5, ymd & 31
    year, month = divmod(ym, 13)
    return _dt.datetime(
        year, month, day, hms >> 12, (hms >> 6) & 63, hms & 63,
        _frac_decode(buf[5:], fsp),
    )


# ---------------------------------------------------------------------------
# TIME2 (signed)
# ---------------------------------------------------------------------------


def encode_time2(micros: int, fsp: int) -> bytes:
    micros = int(micros)
    if abs(micros) > _TIME_MAX_MICROS:
        raise ValueError("TIME out of MySQL range ±838:59:59.999999")
    neg = micros < 0
    sec, usec = divmod(abs(micros), 1_000_000)
    usec = _quantize(usec, fsp)
    h, rem = divmod(sec, 3600)
    mnt, s = divmod(rem, 60)
    nr = ((h << 12) | (mnt << 6) | s) << 24 | usec
    if neg:
        nr = -nr
    if fsp >= 5:
        return (nr + _TIMEF_OFS).to_bytes(6, "big")
    head = (_TIMEF_INT_OFS + (nr >> 24)).to_bytes(3, "big")  # floor shift
    if fsp == 0:
        return head
    frac = _trunc_mod(nr, 1 << 24)  # C %: negative for negative nr
    if fsp <= 2:
        return head + bytes([_trunc_div(frac, 10_000) & 0xFF])
    return head + (_trunc_div(frac, 100) & 0xFFFF).to_bytes(2, "big")


def decode_time2(buf: bytes, fsp: int) -> int:
    if fsp >= 5:
        nr = int.from_bytes(buf[:6], "big") - _TIMEF_OFS
    else:
        int_part = int.from_bytes(buf[:3], "big") - _TIMEF_INT_OFS
        if fsp == 0:
            nr = int_part << 24
        elif fsp <= 2:
            frac = buf[3]
            if int_part < 0 and frac:
                int_part += 1
                frac -= 0x100
            nr = int_part * (1 << 24) + frac * 10_000
        else:
            frac = int.from_bytes(buf[3:5], "big")
            if int_part < 0 and frac:
                int_part += 1
                frac -= 0x10000
            nr = int_part * (1 << 24) + frac * 100
    neg = nr < 0
    a = -nr if neg else nr
    int_part, usec = a >> 24, a & 0xFFFFFF
    sec = (int_part >> 12) * 3600 + ((int_part >> 6) & 63) * 60 + (int_part & 63)
    micros = sec * 1_000_000 + usec
    return -micros if neg else micros
