"""Deterministic synthetic CDC event-log generator (seed-fixed, vectorized).

Produces the engine input of SURVEY §7.1 / FIXTURES §3: a Common-Crawl-style
change stream over ``web.pages`` with zipf-skewed urls, configurable
update/delete mixes, out-of-order ``warc_ts``, duplicate redelivery, and
mid-stream DDL (ADD/RENAME COLUMN). Built with numpy + pyarrow only, so the
pure-Python sequential oracle (oracle.py) consumes identical bytes without a
SparkSession.

Event identity/order mirrors the reference: ``(file_seq, log_pos)`` is the
arrival total order (binlog file number + byte position,
/root/reference/src/master/rs_parse_binlog.c:91,
/root/reference/src/master/rs_read_binlog.c:210-252); LWW rank is
``(warc_ts, log_pos)`` per the north rule.

Payload fields carry STABLE wire names (like a TABLE_MAP's positional
columns, /root/reference/src/master/rs_parse_binlog.c:247-321); DDL renames
apply to the *target* schema via the engine's column mapping, not to the
event wire format.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Wire payload fields: input_hint base schema + one evolvable column.
BASE_FIELDS = ["url", "warc_ts", "html", "text", "lang"]
EXTRA_FIELD = "extra"  # added mid-stream by the DDL scenario
PAYLOAD_ARROW = pa.struct(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field(EXTRA_FIELD, pa.string()),
    ]
)
DDL_ARROW = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("col", pa.string()),
        pa.field("new_name", pa.string()),
        pa.field("dtype", pa.string()),
    ]
)
EVENT_ARROW = pa.schema(
    [
        pa.field("log_pos", pa.int64()),
        pa.field("file_seq", pa.int32()),
        pa.field("server_id", pa.int32()),
        pa.field("op", pa.string()),
        pa.field("table", pa.string()),
        pa.field("tx_id", pa.int64()),
        pa.field("before", PAYLOAD_ARROW),
        pa.field("after", PAYLOAD_ARROW),
        pa.field("ddl", DDL_ARROW),
    ]
)

LANGS = np.array(["en", "de", "fr", "zh", None], dtype=object)
BASE_TS_US = np.int64(1_700_000_000_000_000)  # 2023-11-14T22:13:20Z


@dataclass(frozen=True)
class GenSpec:
    """All knobs seeded + deterministic. Defaults give a mixed workload."""

    n_events: int = 5_000
    n_urls: int = 1_000
    n_domains: int = 50
    zipf_a: float = 1.2
    p_update: float = 0.45
    p_delete: float = 0.05
    p_out_of_order: float = 0.10  # warc_ts regressions vs log order
    p_duplicate: float = 0.02  # exact redelivery of an earlier event
    events_per_file: int = 2_000  # binlog rotation cadence
    seed: int = 42
    table: str = "web.pages"
    html_repeat: int = 1  # page-body size knob (~125 B per unit)
    # (fraction_of_stream, kind, col, new_name, dtype); empty = no DDL
    ddl_scenario: tuple = (
        (0.40, "add_column", EXTRA_FIELD, None, "string"),
        (0.70, "rename_column", EXTRA_FIELD, "extra_v2", None),
    )
    extra_cols: dict = field(default_factory=dict)  # reserved


def make_url(url_id: int, n_domains: int) -> str:
    return f"https://d{url_id % n_domains:04d}.example.com/p/{url_id}"


_FILLER = (
    "<p>lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua</p>"
)


def make_html(url: str, ts_us: int, rev: int, repeat: int = 1) -> bytes:
    """Deterministic page bytes embedding url + ts (FIXTURES §2).
    ``repeat`` scales the body toward realistic web-page sizes (~125 B per
    unit; bench uses ~30-50 for KB-scale pages)."""
    body = (
        f"<html><head><title>{url}</title></head><body>"
        f"<h1>Rev {rev}</h1><p>Crawled at {ts_us} from {url}.</p>"
        f"<p>Lorem ipsum &amp; filler {ts_us % 97}.</p>{_FILLER * repeat}</body></html>"
    )
    return body.encode("utf-8")


def generate_events(spec: GenSpec = GenSpec()) -> pa.Table:
    """Return the event log as an Arrow table in ARRIVAL order.

    Arrival order == (file_seq, log_pos) order except for injected duplicate
    redeliveries, which re-ship an earlier (file_seq, log_pos) later in the
    stream (reconnect-replay semantics, /root/reference/src/slave/
    rs_io_thread.c:102-110).

    Fully columnar construction (numpy + Arrow StructArrays) — ~10 MB/s of
    events per core, so bench-scale logs (millions of events) generate in
    seconds and deterministically (seeded).
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- url per event: zipf-skewed ids (hot heads) ---------------------
    url_ids = (rng.zipf(spec.zipf_a, size=n) - 1) % spec.n_urls

    # --- ops -------------------------------------------------------------
    r = rng.random(n)
    ops = np.where(
        r < spec.p_delete, "D", np.where(r < spec.p_delete + spec.p_update, "U", "I")
    ).astype(object)
    is_del = ops == "D"

    # --- order columns ----------------------------------------------------
    idx = np.arange(n, dtype=np.int64)
    file_seq = (idx // spec.events_per_file).astype(np.int32)
    log_pos = (idx % spec.events_per_file) * 97 + 4  # byte-position-ish

    # warc_ts: monotone-ish with out-of-order regressions
    step_us = np.int64(60_000_000)
    ts_us = BASE_TS_US + idx * step_us + rng.integers(0, 1000, n)
    ooo = rng.random(n) < spec.p_out_of_order
    ts_us = np.where(
        ooo, ts_us - rng.integers(2, 500, n) * step_us, ts_us
    ).astype(np.int64)

    tx_id = idx // 7  # ~7 events per transaction (XID bracket, §1.1)

    # --- DDL events interleaved ------------------------------------------
    ddl_rows = [
        (int(frac * n), kind, col, new_name, dtype)
        for frac, kind, col, new_name, dtype in spec.ddl_scenario
    ]
    ddl_at = {pos: (k, c, nn, dt) for pos, k, c, nn, dt in ddl_rows}
    extra_active_from = next(
        (pos for pos, (k, c, _, _) in ddl_at.items() if k == "add_column"), n + 1
    )

    # --- payload columns (list comps over ints — no per-row dicts) -------
    urls = [make_url(int(u), spec.n_domains) for u in url_ids]
    lang_pick = LANGS[rng.integers(0, len(LANGS), n)]
    langs = [None if is_del[i] else lang_pick[i] for i in range(n)]
    htmls = [
        None
        if is_del[i]
        else make_html(urls[i], int(ts_us[i]), int(tx_id[i]), spec.html_repeat)
        for i in range(n)
    ]
    extras = [
        None
        if (i < extra_active_from or is_del[i])
        else f"x{int(url_ids[i])}-{int(ts_us[i]) % 1000}"
        for i in range(n)
    ]

    def payload_struct(
        url_a, ts_a, html_a, lang_a, extra_a, null_mask=None
    ) -> pa.StructArray:
        m = len(url_a)
        return pa.StructArray.from_arrays(
            [
                pa.array(url_a, pa.string()),
                ts_a if ts_a is not None else pa.nulls(m, pa.timestamp("us", tz="UTC")),
                pa.array(html_a, pa.binary()) if html_a is not None else pa.nulls(m, pa.binary()),
                pa.nulls(m, pa.string()),  # text: extraction is the ENGINE's job
                pa.array(lang_a, pa.string()) if lang_a is not None else pa.nulls(m, pa.string()),
                pa.array(extra_a, pa.string()) if extra_a is not None else pa.nulls(m, pa.string()),
            ],
            fields=list(PAYLOAD_ARROW),
            mask=null_mask,
        )

    arrival = idx * 2 + 1  # leave even slots for DDL inserts
    # build in slices: a single binary array is capped at 2 GB of offsets,
    # and big html payloads blow past that at bench scale
    slice_rows = max(1, min(n, (1 << 30) // max(1, 130 * spec.html_repeat)))
    slices = []
    for lo in range(0, n, slice_rows):
        hi = min(n, lo + slice_rows)
        after = payload_struct(
            urls[lo:hi],
            pa.array(ts_us[lo:hi], pa.timestamp("us", tz="UTC")),
            htmls[lo:hi],
            langs[lo:hi],
            extras[lo:hi],
        )
        # before-image: present only for U (url filled, rest null — the
        # reference's before_update handler ignores it anyway, SURVEY A2)
        before = payload_struct(
            urls[lo:hi], None, None, None, None, null_mask=pa.array(ops[lo:hi] != "U")
        )
        slices.append(
            pa.Table.from_arrays(
                [
                    pa.array(log_pos[lo:hi], pa.int64()),
                    pa.array(file_seq[lo:hi], pa.int32()),
                    pa.array(np.full(hi - lo, 1, dtype=np.int32), pa.int32()),
                    pa.array(ops[lo:hi], pa.string()),
                    pa.array([spec.table] * (hi - lo), pa.string()),
                    pa.array(tx_id[lo:hi], pa.int64()),
                    before,
                    after,
                    pa.nulls(hi - lo, DDL_ARROW),
                ],
                schema=EVENT_ARROW,
            ).append_column("_arrival", pa.array(arrival[lo:hi], pa.int64()))
        )
    row_table = pa.concat_tables(slices)

    ddl_dicts = [
        {
            "log_pos": int(log_pos[pos]) - 1,
            "file_seq": int(file_seq[pos]),
            "server_id": 1,
            "op": "DDL",
            "table": spec.table,
            "tx_id": None,
            "before": None,
            "after": None,
            "ddl": {"kind": k, "col": c, "new_name": nn, "dtype": dt},
            "_arrival": int(pos) * 2,  # just before row event `pos`
        }
        for pos, (k, c, nn, dt) in sorted(ddl_at.items())
        if pos < n
    ]
    # Splice DDL rows in by zero-copy slicing (a global sort+take would
    # re-concatenate >2GB binary arrays and overflow 32-bit offsets).
    schema_with_arrival = row_table.schema
    parts = []
    prev = 0
    for d in ddl_dicts:  # already sorted by _arrival
        pos = d["_arrival"] // 2
        parts.append(row_table.slice(prev, pos - prev))
        parts.append(pa.Table.from_pylist([d], schema=schema_with_arrival))
        prev = pos
    parts.append(row_table.slice(prev))
    combined = pa.concat_tables(parts)

    # --- duplicate redelivery: re-ship earlier events verbatim, later ----
    # (chunk-local takes: a whole-table take concatenates chunks and can
    # overflow 32-bit binary offsets at bench scale)
    n_dup = int(spec.p_duplicate * n)
    if n_dup:
        dup_src = np.sort(rng.integers(0, combined.num_rows, n_dup))
        out_batches, start = [], 0
        for b in combined.to_batches():
            local = dup_src[(dup_src >= start) & (dup_src < start + b.num_rows)] - start
            if len(local):
                out_batches.append(b.take(pa.array(local)))
            start += b.num_rows
        dup_tbl = pa.Table.from_batches(out_batches, schema=combined.schema)
        combined = pa.concat_tables([combined, dup_tbl])
    return combined.drop_columns(["_arrival"])


def write_event_log(
    table: pa.Table, out_dir: str, row_group_rows: int = 50_000
) -> list[str]:
    """Write the event log as one parquet file PER file_seq value, in order —
    mirrors binlog rotation and gives the streaming source incremental file
    discovery (S1/S2). Returns written paths.

    row_group_rows caps row-group size: parquet input splits align to row
    groups, so a file with one giant row group serializes its whole scan +
    map-side partial aggregation into ONE task no matter how many cores the
    cluster has. 50k rows ≈ 15-20 MB groups → plenty of splits."""
    os.makedirs(out_dir, exist_ok=True)
    fs = table.column("file_seq").to_numpy(zero_copy_only=False)
    paths = []
    for seq in sorted(set(int(x) for x in fs)):
        mask = pa.array(fs == seq)
        chunk = table.filter(mask)
        path = os.path.join(out_dir, f"binlog-{seq:06d}.parquet")
        # footer DDL index: schema history rides OUT of the data path
        # (Debezium's schema-history-topic pattern) — replay collects each
        # batch's DDL from a millisecond pyarrow footer read instead of a
        # full pushed-predicate Spark scan over the log
        meta = dict(chunk.schema.metadata or {})
        meta[b"msss.ddl"] = json.dumps(_ddl_footer_rows(chunk)).encode()
        chunk = chunk.replace_schema_metadata(meta)
        pq.write_table(chunk, path, row_group_size=row_group_rows)
        paths.append(path)
    return paths


def _ddl_footer_rows(chunk: pa.Table) -> list[dict]:
    """The file's DDL events (ordered) as plain dicts for the footer
    index — carries ``table`` so replay can apply the same F1 ownership
    filter the scan path applies."""
    ops = chunk.column("op").to_pylist()
    idx = [i for i, op in enumerate(ops) if op == "DDL"]
    if not idx:
        return []
    ddls = chunk.column("ddl").to_pylist()
    tables = chunk.column("table").to_pylist()
    seqs = chunk.column("file_seq").to_pylist()
    poss = chunk.column("log_pos").to_pylist()
    rows = []
    for i in idx:
        d = dict(ddls[i] or {})
        d["table"] = tables[i]
        d["file_seq"] = int(seqs[i])
        d["log_pos"] = int(poss[i])
        rows.append(d)
    rows.sort(key=lambda r: (r["file_seq"], r["log_pos"]))
    return rows


def minimalize_event_log(
    table: pa.Table, payload_fields: tuple[str, ...] | None = None
) -> pa.Table:
    """Derive the ``binlog_row_image=MINIMAL`` version of a full-image
    event log (fixture producer — a real MySQL server is the production
    one): each U event keeps only the payload fields whose value differs
    from the row the PRECEDING log events produced, recorded in a new
    ``present: list<string>`` column (the used-bitmap, by name; NULL =
    full image). The key and ``warc_ts`` are always present.

    MINIMAL diffs are only well-defined against a source-ordered log
    (MySQL's binlog order IS commit order), so per-key LWW ranks
    (warc_ts, file_seq, log_pos) must be monotone in arrival order —
    generate with ``p_out_of_order=0``. Exact duplicate redeliveries
    (``p_duplicate``) are fine: they re-ship the SAME minimal image as
    their first occurrence. Anything else raises.

    Driver-side ordered fold, O(n) — fixture scale only.
    """
    fields = list(payload_fields or (f for f in BASE_FIELDS if f != "url"))
    diff_fields = [f for f in fields if f != "warc_ts"]
    rows = table.to_pylist()
    state: dict[str, tuple | None] = {}  # url -> (rank, row) | None if deleted
    memo: dict[tuple, list | None] = {}  # (url, rank) -> shipped present
    present_col: list[list | None] = []
    for r in rows:
        if r["op"] not in ("I", "U", "D") or not r.get("after"):
            present_col.append(None)
            continue
        after = r["after"]
        url = after["url"]
        rank = (after["warc_ts"], r["file_seq"], r["log_pos"])
        cur = state.get(url, None)
        cur_rank = cur[0] if cur else None
        if cur_rank is not None and rank < cur_rank:
            # must be a verbatim redelivery of an already-seen event
            if (url, rank) not in memo:
                raise ValueError(
                    f"rank regression for key {url!r}: MINIMAL images "
                    "require per-key monotone ranks (p_out_of_order=0)"
                )
            present_col.append(memo[(url, rank)])
            continue
        if r["op"] == "D":
            state[url] = (rank, None)
            memo[(url, rank)] = None
            present_col.append(None)
            continue
        prev_row = cur[1] if cur else None
        if r["op"] == "I" or prev_row is None:
            shipped = None  # full image (insert / first write after D)
        else:
            shipped = ["url", "warc_ts"] + [
                f for f in diff_fields if after.get(f) != prev_row.get(f)
            ]
        new_row = dict(prev_row or {})
        for f in diff_fields:
            new_row[f] = after.get(f)
        state[url] = (rank, new_row)
        memo[(url, rank)] = shipped
        present_col.append(shipped)
    return table.append_column(
        pa.field("present", pa.list_(pa.string())),
        pa.array(present_col, type=pa.list_(pa.string())),
    )
