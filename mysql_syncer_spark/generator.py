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
    # (fraction_of_stream, kind, col, new_name, dtype); empty = no DDL
    ddl_scenario: tuple = (
        (0.40, "add_column", EXTRA_FIELD, None, "string"),
        (0.70, "rename_column", EXTRA_FIELD, "extra_v2", None),
    )
    extra_cols: dict = field(default_factory=dict)  # reserved


def make_url(url_id: int, n_domains: int) -> str:
    return f"https://d{url_id % n_domains:04d}.example.com/p/{url_id}"


def make_html(url: str, ts_us: int, rev: int) -> bytes:
    """Deterministic page bytes embedding url + ts (FIXTURES §2)."""
    body = (
        f"<html><head><title>{url}</title></head><body>"
        f"<h1>Rev {rev}</h1><p>Crawled at {ts_us} from {url}.</p>"
        f"<p>Lorem ipsum &amp; filler {ts_us % 97}.</p></body></html>"
    )
    return body.encode("utf-8")


def generate_events(spec: GenSpec = GenSpec()) -> pa.Table:
    """Return the event log as an Arrow table in ARRIVAL order.

    Arrival order == (file_seq, log_pos) order except for injected duplicate
    redeliveries, which re-ship an earlier (file_seq, log_pos) later in the
    stream (reconnect-replay semantics, /root/reference/src/slave/
    rs_io_thread.c:102-110).
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
    server_id = np.full(n, 1, dtype=np.int32)

    # --- DDL events interleaved ------------------------------------------
    ddl_rows = []  # (insert_at, kind, col, new_name, dtype)
    for frac, kind, col, new_name, dtype in spec.ddl_scenario:
        ddl_rows.append((int(frac * n), kind, col, new_name, dtype))
    ddl_at = {pos: (k, c, nn, dt) for pos, k, c, nn, dt in ddl_rows}
    extra_active_from = next(
        (pos for pos, (k, c, _, _) in ddl_at.items() if k == "add_column"), n + 1
    )

    # --- payload ----------------------------------------------------------
    urls = np.array([make_url(int(u), spec.n_domains) for u in url_ids], dtype=object)
    langs = LANGS[rng.integers(0, len(LANGS), n)]
    html = np.array(
        [
            make_html(urls[i], int(ts_us[i]), int(tx_id[i])) if ops[i] != "D" else None
            for i in range(n)
        ],
        dtype=object,
    )
    extra_vals = np.array(
        [
            f"x{int(url_ids[i])}-{int(ts_us[i]) % 1000}"
            if (i >= extra_active_from and ops[i] != "D")
            else None
            for i in range(n)
        ],
        dtype=object,
    )

    rows: list[dict] = []
    for i in range(n):
        if i in ddl_at:
            kind, col, new_name, dtype = ddl_at[i]
            rows.append(
                {
                    "log_pos": int(log_pos[i]) - 1,
                    "file_seq": int(file_seq[i]),
                    "server_id": 1,
                    "op": "DDL",
                    "table": spec.table,
                    "tx_id": None,
                    "before": None,
                    "after": None,
                    "ddl": {
                        "kind": kind,
                        "col": col,
                        "new_name": new_name,
                        "dtype": dtype,
                    },
                }
            )
        op = ops[i]
        after = {
            "url": urls[i],
            "warc_ts": int(ts_us[i]),
            "html": html[i] if op != "D" else None,
            "text": None,  # extraction is the ENGINE's job (D4)
            "lang": langs[i] if op != "D" else None,
            EXTRA_FIELD: extra_vals[i],
        }
        before = (
            {
                "url": urls[i],
                "warc_ts": None,
                "html": None,
                "text": None,
                "lang": None,
                EXTRA_FIELD: None,
            }
            if op == "U"
            else None
        )
        rows.append(
            {
                "log_pos": int(log_pos[i]),
                "file_seq": int(file_seq[i]),
                "server_id": 1,
                "op": op,
                "table": spec.table,
                "tx_id": int(tx_id[i]),
                "before": before,
                "after": after,
                "ddl": None,
            }
        )

    # --- duplicate redelivery: re-append earlier events verbatim ----------
    n_dup = int(spec.p_duplicate * n)
    if n_dup:
        dup_src = rng.integers(0, len(rows), n_dup)
        rows.extend(rows[int(j)] for j in dup_src)

    cols: dict[str, list] = {name: [] for name in EVENT_ARROW.names}
    for row in rows:
        for name in EVENT_ARROW.names:
            cols[name].append(row[name])
    # timestamps: ints(us) → arrow timestamp
    arrays = []
    for fld in EVENT_ARROW:
        if fld.name in ("before", "after"):
            arrays.append(_payload_array(cols[fld.name]))
        else:
            arrays.append(pa.array(cols[fld.name], type=fld.type))
    return pa.Table.from_arrays(arrays, schema=EVENT_ARROW)


def _payload_array(dicts: list) -> pa.Array:
    fixed = []
    for d in dicts:
        if d is None:
            fixed.append(None)
        else:
            e = dict(d)
            fixed.append(e)
    return pa.array(fixed, type=PAYLOAD_ARROW)


def write_event_log(
    table: pa.Table, out_dir: str, files_per_chunk: int | None = None
) -> list[str]:
    """Write the event log as one parquet file PER file_seq value, in order —
    mirrors binlog rotation and gives the streaming source incremental file
    discovery (S1/S2). Returns written paths."""
    os.makedirs(out_dir, exist_ok=True)
    fs = table.column("file_seq").to_numpy(zero_copy_only=False)
    paths = []
    for seq in sorted(set(int(x) for x in fs)):
        mask = pa.array(fs == seq)
        chunk = table.filter(mask)
        path = os.path.join(out_dir, f"binlog-{seq:06d}.parquet")
        pq.write_table(chunk, path)
        paths.append(path)
    return paths
