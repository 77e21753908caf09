"""Sequential pure-Python applier — the executable spec the engine is judged
against (SURVEY §5.2 item 2).

Folds the event log in ARRIVAL order, exactly like the reference's
single-threaded redis apply thread (/root/reference/src/slave/
rs_redis_thread.c:10-85), with the north rule's LWW guard layered on:
an I/U/D event takes effect only if its ``(warc_ts, file_seq, log_pos)``
rank is STRICTLY greater than the rank already applied for that url —
this makes replay order-insensitive and duplicate-delivery idempotent,
matching the engine's parallel max_by/MERGE semantics.

Apply semantics per op (reference parity points):
- I / U  → full-row upsert (reference: both callbacks do the same SET,
  /root/reference/src/slave/rs_mysql_test_test.c:59-82).
- D      → ``on_delete='delete'``: tombstone (url absent from final state);
  ``on_delete='ignore'``: no-op (reference parity,
  /root/reference/src/slave/rs_mysql_test_test.c:84-87).
- DDL    → schema mutation, applied at its log position (the engine applies
  it transactionally before the containing batch's merge).

Text extraction: the oracle computes ``text`` with the same pure-bytes
function the engine's Arrow UDF uses (functions.text.extract_text_bytes),
so the byte-identity invariant is checked end-to-end.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .functions.text import extract_text_bytes

BASE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def sequential_replay(
    events: pa.Table,
    on_delete: str = "delete",
    extract_text: bool = True,
) -> tuple[dict[str, dict[str, Any]], list[str], dict[str, str]]:
    """Fold the event log → (final_state, final_columns, column_mapping).

    final_state: url → row dict keyed by FINAL column names.
    final_columns: ordered target schema column names after DDL.
    column_mapping: wire field name → final column name.
    """
    state: dict[str, dict[str, Any]] = {}
    rank: dict[str, tuple] = {}  # url -> (warc_ts_us, file_seq, log_pos)
    deleted: set[str] = set()
    columns: list[str] = list(BASE_COLUMNS)
    mapping: dict[str, str] = {c: c for c in BASE_COLUMNS}

    rows = events.to_pylist()
    for ev in rows:
        op = ev["op"]
        if op == "DDL":
            d = ev["ddl"]
            if d["kind"] == "add_column":
                if d["col"] not in mapping:  # idempotent re-delivery
                    mapping[d["col"]] = d["col"]
                    columns.append(d["col"])
            elif d["kind"] == "rename_column":
                # find wire field currently mapping to d["col"]
                for wire, cur in mapping.items():
                    if cur == d["col"]:
                        mapping[wire] = d["new_name"]
                        columns[columns.index(cur)] = d["new_name"]
                        break
            continue
        after = ev["after"]
        url = after["url"]
        ts = after["warc_ts"]
        ts_us = _to_us(ts)
        r = (ts_us, ev["file_seq"], ev["log_pos"])
        if url in rank and r <= rank[url]:
            continue  # older or duplicate — LWW guard
        if op == "D":
            if on_delete == "delete":
                rank[url] = r
                state.pop(url, None)
                deleted.add(url)
            # 'ignore': reference parity — do not even advance rank, a
            # delete never affects final state
            continue
        rank[url] = r
        deleted.discard(url)
        row = {k: after.get(k) for k in mapping}
        if extract_text and row.get("html") is not None:
            row["text"] = extract_text_bytes(row["html"])
        state[url] = row

    # project to final names
    out = {
        url: {mapping[k]: v for k, v in row.items()} for url, row in state.items()
    }
    return out, columns, mapping


def _to_us(ts: Any) -> int:
    if ts is None:
        return -1
    if isinstance(ts, int):
        return ts
    # datetime from arrow to_pylist
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=ts.tzinfo)
        return int((ts - epoch).total_seconds() * 1_000_000)
    raise TypeError(f"unsupported ts {type(ts)}")
