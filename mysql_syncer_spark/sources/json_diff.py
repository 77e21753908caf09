"""MySQL 8.0 partial JSON updates — JSON diff streams
(``binlog_row_value_options=PARTIAL_JSON``, PARTIAL_UPDATE_ROWS_EVENT).

Instead of re-shipping a multi-megabyte JSON document because one field
changed, MySQL 8.0 logs a sequence of **diffs** per JSON column:
``operation ++ path ++ [value]``, applied in order against the previous
document. Public layout (MySQL ``sql/json_diff.h`` /
``libbinlogevents rows_event.h`` WL#2955; Debezium and
python-mysql-replication implement the same walk):

- diff stream ::= diff*
- diff ::= operation(1B) ++ path_len(packed int) ++ path(utf8)
           ++ [value_len(packed int) ++ value(JSON binary document)]
  where operation: 0=REPLACE, 1=INSERT, 2=REMOVE (REMOVE carries no
  value), packed ints are the engine's length-encoded ints
  (sources/decoder.py — same ranges the reference parses), and value is
  a complete JSON binary document (sources/json_binary.py).
- paths are the MySQL JSON path subset diffs actually use: ``$``,
  member legs ``.ident`` / ``."quoted ident"``, array legs ``[N]``
  (json_path.cc; diffs never contain wildcards).

``apply_json_diffs`` folds a diff stream into a Python document — the
consumer-side patch step. INSERT on an array index shifts elements
right (MySQL Json_diff semantics); INSERT on an existing member or
REPLACE on a missing path is a no-op diff error MySQL treats as
"cannot apply" → we raise, callers fall back to requesting the full
document (the server's own fallback behavior).
"""

from __future__ import annotations

import re

from .decoder import decode_packed_int, encode_packed_int
from .json_binary import decode_json_binary, encode_json_binary

DIFF_REPLACE = 0
DIFF_INSERT = 1
DIFF_REMOVE = 2


class JsonDiffs(list):
    """Marker type: a JSON column value that is a diff list
    ``[(op, path, value), ...]`` rather than a document — the encoder
    stores it partial, the decoder returns it for partial columns."""

_MEMBER = re.compile(r'\.(?:([A-Za-z_][A-Za-z0-9_]*)|"((?:[^"\\]|\\.)*)")')
_ELEMENT = re.compile(r"\[(\d+)\]")


class JsonDiffError(ValueError):
    """A diff cannot apply to the current document — the consumer must
    fall back to a full-document read (MySQL's own fallback)."""


def parse_json_path(path: str) -> list:
    """``$.a."b c"[3]`` → ['a', 'b c', 3]. Only the diff subset — no
    wildcards/ranges (MySQL never emits them in diffs)."""
    if not path.startswith("$"):
        raise JsonDiffError(f"path must start with $: {path!r}")
    legs: list = []
    i = 1
    while i < len(path):
        m = _MEMBER.match(path, i)
        if m:
            legs.append(m.group(1) if m.group(1) is not None
                        else m.group(2).replace('\\"', '"').replace("\\\\", "\\"))
            i = m.end()
            continue
        m = _ELEMENT.match(path, i)
        if m:
            legs.append(int(m.group(1)))
            i = m.end()
            continue
        raise JsonDiffError(f"bad path leg at {i} in {path!r}")
    return legs


def _walk(doc, legs: list):
    """Return the container holding the last leg's slot."""
    cur = doc
    for leg in legs[:-1]:
        if isinstance(leg, int):
            if not isinstance(cur, list) or leg >= len(cur):
                raise JsonDiffError(f"no array element {leg}")
            cur = cur[leg]
        else:
            if not isinstance(cur, dict) or leg not in cur:
                raise JsonDiffError(f"no member {leg!r}")
            cur = cur[leg]
    return cur


def apply_json_diffs(doc, diffs: list[tuple[int, str, object]]):
    """Fold ``(op, path, value)`` diffs into ``doc`` (returns a new
    document; ``doc`` itself is not mutated)."""
    import copy

    doc = copy.deepcopy(doc)
    for op, path, value in diffs:
        legs = parse_json_path(path)
        if not legs:
            if op == DIFF_REPLACE:
                doc = value
                continue
            raise JsonDiffError(f"op {op} on root path")
        parent = _walk(doc, legs)
        leg = legs[-1]
        if isinstance(leg, int):
            if not isinstance(parent, list):
                raise JsonDiffError(f"array leg on non-array at {path!r}")
            if op == DIFF_REPLACE:
                if leg >= len(parent):
                    raise JsonDiffError(f"REPLACE past end at {path!r}")
                parent[leg] = value
            elif op == DIFF_INSERT:
                # Json_diff INSERT shifts right; index may equal len
                if leg > len(parent):
                    raise JsonDiffError(f"INSERT past end at {path!r}")
                parent.insert(leg, value)
            else:
                if leg >= len(parent):
                    raise JsonDiffError(f"REMOVE past end at {path!r}")
                del parent[leg]
        else:
            if not isinstance(parent, dict):
                raise JsonDiffError(f"member leg on non-object at {path!r}")
            if op == DIFF_REPLACE:
                if leg not in parent:
                    raise JsonDiffError(f"REPLACE of missing member {leg!r}")
                parent[leg] = value
            elif op == DIFF_INSERT:
                if leg in parent:
                    raise JsonDiffError(f"INSERT of existing member {leg!r}")
                parent[leg] = value
            else:
                if leg not in parent:
                    raise JsonDiffError(f"REMOVE of missing member {leg!r}")
                del parent[leg]
    return doc


# ---------------------------------------------------------------------------
# binary diff stream
# ---------------------------------------------------------------------------


def encode_json_diffs(diffs: list[tuple[int, str, object]]) -> bytes:
    """(op, path, python value) list → the binlog diff stream."""
    out = bytearray()
    for op, path, value in diffs:
        if op not in (DIFF_REPLACE, DIFF_INSERT, DIFF_REMOVE):
            raise ValueError(f"bad diff op {op}")
        out.append(op)
        p = path.encode("utf-8")
        out += encode_packed_int(len(p)) + p
        if op != DIFF_REMOVE:
            v = encode_json_binary(value)
            out += encode_packed_int(len(v)) + v
    return bytes(out)


def decode_json_diffs(blob: bytes) -> list[tuple[int, str, object]]:
    buf = memoryview(blob)
    pos = 0
    diffs: list[tuple[int, str, object]] = []
    while pos < len(buf):
        op = buf[pos]
        pos += 1
        ln, pos = decode_packed_int(buf, pos)
        path = bytes(buf[pos:pos + ln]).decode("utf-8")
        pos += ln
        value = None
        if op != DIFF_REMOVE:
            vl, pos = decode_packed_int(buf, pos)
            value = decode_json_binary(bytes(buf[pos:pos + vl]))
            pos += vl
        diffs.append((op, path, value))
    return diffs
