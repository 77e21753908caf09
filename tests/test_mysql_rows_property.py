"""Property-based roundtrip fuzz of the byte-compatible MySQL ROWS_EVENT
codec (reference layout: /root/reference/src/slave/rs_binlog_row.c:430-631).

Hypothesis drives random schemas over all 18 wire types, random NULL
patterns, random used-columns subsets, random skip registries, and both
WRITE and UPDATE (paired-image) events; encode → decode must reproduce the
projected row exactly. Pure Python — no Spark session needed."""

import datetime as dt
import string as _string
import struct
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_syncer_spark.sources.mysql_rows import MySQLColumn, MySQLTableDef

_ASCII = _string.ascii_letters + _string.digits + " _-"


def _value_strategy(kind: str, p1: int, p2: int):
    if kind == "tiny":
        return st.integers(-128, 127)
    if kind == "short":
        return st.integers(-(2**15), 2**15 - 1)
    if kind in ("long",):
        return st.integers(-(2**31), 2**31 - 1)
    if kind == "int24":
        return st.integers(-(2**23), 2**23 - 1)
    if kind == "longlong":
        return st.integers(-(2**63), 2**63 - 1)
    if kind == "float":
        return st.floats(allow_nan=False, allow_infinity=False, width=32)
    if kind == "double":
        return st.floats(allow_nan=False, allow_infinity=False)
    if kind == "timestamp":
        return st.integers(0, 2**31 - 1)
    if kind == "date":
        return st.dates(dt.date(1000, 1, 1), dt.date(9999, 12, 31))
    if kind == "time":
        return st.integers(0, 86399)
    if kind == "datetime":
        return st.datetimes(
            dt.datetime(1000, 1, 1), dt.datetime(9999, 12, 31)
        ).map(lambda v: v.replace(microsecond=0))
    if kind == "year":
        return st.sampled_from([0] + list(range(1901, 2156)))
    if kind in ("varchar", "string", "varstring"):
        # MySQL invariant: encoded byte length <= declared max (ascii here)
        return st.text(alphabet=_ASCII, max_size=min(p1, 300))
    if kind == "blob":
        return st.binary(max_size=200)
    if kind == "bit":
        return st.binary(min_size=p1 // 8, max_size=p1 // 8)
    if kind == "newdecimal":
        # string construction: exact at any precision (Decimal.scaleb
        # rounds at the default 28-digit context)
        lim = 10**p1 - 1
        return st.integers(-lim, lim).map(lambda i: Decimal(f"{i}E{-p2}"))
    raise AssertionError(kind)


@st.composite
def _column(draw, idx: int):
    kind = draw(
        st.sampled_from(
            [
                "tiny", "short", "long", "int24", "longlong", "float",
                "double", "timestamp", "date", "time", "datetime", "year",
                "varchar", "string", "varstring", "blob", "bit", "newdecimal",
            ]
        )
    )
    if kind in ("varchar", "string", "varstring"):
        p1 = draw(st.sampled_from([10, 255, 256, 300, 700]))  # 1B vs 2B prefix
        spec = f"{kind}({p1})"
    elif kind == "blob":
        p1 = draw(st.sampled_from([1, 2, 3, 4]))  # meta-sized prefix widths
        spec = f"blob({p1})"
    elif kind == "bit":
        p1 = draw(st.sampled_from([8, 16, 24, 64]))
        spec = f"bit({p1})"
    elif kind == "newdecimal":
        p1 = draw(st.integers(1, 30))
        p2 = draw(st.integers(0, min(p1, 12)))
        spec = f"newdecimal({p1},{p2})"
        return MySQLColumn(f"c{idx}", spec), _value_strategy(kind, p1, p2)
    else:
        spec = kind
        p1 = 0
    return MySQLColumn(f"c{idx}", spec), _value_strategy(kind, p1, 0)


@st.composite
def _case(draw):
    n = draw(st.integers(1, 10))
    cols, val_sts = zip(*[draw(_column(i)) for i in range(n)])
    names = [c.name for c in cols]
    used = tuple(
        nm for nm in names if draw(st.booleans())
    ) or (names[0],)  # at least one used column
    skip = frozenset(nm for nm in names if draw(st.integers(0, 3)) == 0)
    n_rows = draw(st.integers(1, 4))

    def row():
        return {
            nm: (None if draw(st.integers(0, 4)) == 0 else draw(vs))
            for nm, vs in zip(names, val_sts)
        }

    rows = [row() for _ in range(n_rows)]
    rows_after = [row() for _ in range(n_rows)]
    used_after = tuple(nm for nm in names if draw(st.booleans())) or (names[-1],)
    return cols, used, used_after, skip, rows, rows_after


def _norm(col: MySQLColumn, v):
    if v is None:
        return None
    kind = col.parse()[0]
    if kind == "float":  # value quantizes to float32 on the wire
        return struct.unpack("<f", struct.pack("<f", v))[0]
    return v


def _expect(cols, used, skip, row):
    return {
        c.name: _norm(c, row[c.name])
        for c in cols
        if c.name in used and c.name not in skip
    }


@settings(max_examples=80, deadline=None)
@given(_case())
def test_write_roundtrip_random_schema(case):
    cols, used, _ua, skip, rows, _ra = case
    td = MySQLTableDef(columns=cols, skip=skip)
    blob = td.encode_rows_event(rows, "write", used=used)
    got = td.decode_rows_event(blob, "write")
    assert got == [_expect(cols, used, skip, r) for r in rows]


@settings(max_examples=80, deadline=None)
@given(_case())
def test_update_roundtrip_random_schema_second_bitmap(case):
    cols, used, used_after, skip, rows, rows_after = case
    td = MySQLTableDef(columns=cols, skip=skip)
    blob = td.encode_rows_event(
        list(zip(rows, rows_after)), "update", used=used, used_after=used_after
    )
    got = td.decode_rows_event(blob, "update")
    want = [
        {f"before_{k}": v for k, v in _expect(cols, used, skip, b).items()}
        | {f"after_{k}": v for k, v in _expect(cols, used_after, skip, a).items()}
        for b, a in zip(rows, rows_after)
    ]
    assert got == want


# ---------------------------------------------------------------------------
# NEWDECIMAL wire codec invariants across all (precision, scale)
# ---------------------------------------------------------------------------

from mysql_syncer_spark.sources.decoder import (  # noqa: E402
    decimal_binsize,
    decode_mysql_decimal,
    encode_mysql_decimal,
)


@st.composite
def _decimal_case(draw):
    precision = draw(st.integers(1, 38))
    scale = draw(st.integers(0, min(precision, 30)))
    lim = 10**precision - 1
    a = Decimal(f"{draw(st.integers(-lim, lim))}E{-scale}")
    b = Decimal(f"{draw(st.integers(-lim, lim))}E{-scale}")
    return precision, scale, a, b


@settings(max_examples=200, deadline=None)
@given(_decimal_case())
def test_newdecimal_roundtrip_and_memcmp_order(case):
    precision, scale, a, b = case
    wa = encode_mysql_decimal(a, precision, scale)
    wb = encode_mysql_decimal(b, precision, scale)
    # size is exactly the reference's dig2bytes-derived binsize
    assert len(wa) == len(wb) == decimal_binsize(precision, scale)
    # exact roundtrip
    assert decode_mysql_decimal(wa, precision, scale) == a
    assert decode_mysql_decimal(wb, precision, scale) == b
    # MySQL's storage invariant: byte order == numeric order (memcmp-sortable)
    assert (wa < wb) == (a < b) and (wa == wb) == (a == b)
