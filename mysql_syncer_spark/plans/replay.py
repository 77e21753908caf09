"""Batch replay plan: event log → final-state table (SURVEY §3.4, M1).

Replays the log one binlog file per batch (batch_id = file_seq →
deterministic, so a re-run is idempotent end-to-end via the table ledger).
This is the ``Trigger.AvailableNow``-shaped driver loop; the streaming
runner (streaming/runner.py) is the same apply under foreachBatch.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TableConfig
from ..functions.text import with_extracted_text, with_filled_text
from ..sink.pages_table import PagesTable
from ..sources.event_log import read_event_log

_BINLOG_RE = re.compile(r"binlog-(\d+)\.parquet$")


def default_pages_config(text_impl: str = "pandas") -> TableConfig:
    """web.pages binding. The transform runs on MERGE WINNERS (post-LWW):
    the fill-missing extractor touches only rows newly won from the change
    stream (current-state winners already carry text), so extraction cost
    scales with the batch's unique winning urls, not table size or raw
    event count."""

    def transform(df: DataFrame) -> DataFrame:
        if text_impl == "pandas":
            return with_filled_text(df, "html", "text")
        return with_extracted_text(df, "html", "text", impl=text_impl)

    return TableConfig(name="web.pages", transform=transform)


def replay_multi(
    spark: SparkSession,
    event_dir: str,
    base_path: str,
    registry: dict[str, TableConfig],
    num_buckets: int = 64,
) -> dict:
    """Multi-table replay (SURVEY R1): one event log carrying several
    ``db.tb`` streams, routed to one target table per registered config —
    the dict-registry equivalent of the reference's compile-time handler
    array (/root/reference/src/slave/rs_register_tables.c:6-36).
    Unregistered tables are skipped (hash-miss behavior). Each target keeps
    its own ledger, so per-table idempotence is independent."""
    results = {}
    for name, cfg in registry.items():
        path = os.path.join(base_path, name.replace(".", "_"))
        results[name] = replay(spark, event_dir, path, cfg, num_buckets)
    return results


def replay(
    spark: SparkSession,
    event_dir: str,
    table_path: str,
    cfg: TableConfig | None = None,
    num_buckets: int = 64,
    from_file_seq: int | None = None,
) -> dict:
    """Full (or resumed) replay. Returns summary metrics."""
    cfg = cfg or default_pages_config()
    if PagesTable.exists(table_path):
        table = PagesTable(spark, table_path)
    else:
        table = PagesTable.create(spark, table_path, num_buckets=num_buckets)

    # one batch per binlog file; discover by the index (filename), like the
    # reference's mysql-bin.index walk (/root/reference/src/master/
    # rs_read_binlog.c:210-252) — no data scan needed to plan batches
    by_name = {}
    for fn in os.listdir(event_dir):
        mm = _BINLOG_RE.search(fn)
        if mm:
            by_name[int(mm.group(1))] = os.path.join(event_dir, fn)
    if by_name:
        batches_src = [(seq, by_name[seq]) for seq in sorted(by_name)]
    else:  # arbitrary layout: fall back to a pruned scan
        events = read_event_log(spark, event_dir)
        seqs = [
            r[0]
            for r in events.select("file_seq").distinct().orderBy("file_seq").collect()
        ]
        batches_src = [(seq, None) for seq in seqs]
    total_events = 0
    batches = []
    for seq, path in batches_src:
        if from_file_seq is not None and seq < from_file_seq:
            continue
        if path is not None:
            batch = spark.read.parquet(path)
        else:
            batch = read_event_log(spark, event_dir).filter(F.col("file_seq") == seq)
        res = table.apply_batch(batch_id=f"fileseq-{seq}", events=batch, cfg=cfg)
        batches.append(res)
        total_events += res.get("events_in", 0)
    return {
        "n_batches": len(batches),
        "events_applied": total_events,
        "batches": batches,
        "table_path": table_path,
    }
