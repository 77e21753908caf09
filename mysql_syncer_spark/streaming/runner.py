"""Streaming replay runner (SURVEY §2.1 S1/S3, M6).

The reference's live tail is inotify+select on the binlog + a dump loop
(/root/reference/src/master/rs_read_binlog.c:77-208); its offset file is
slave.info (/root/reference/src/slave/rs_slave_info.c:118-134). Spark-first
equivalent:

- ``readStream`` over the event-log dir — micro-batch trigger replaces the
  1 s EOF poll (RS_BINLOG_EOF_WAIT_SEC); new binlog files are discovered
  incrementally (rotation S2 is free).
- the streaming ``checkpointLocation`` is the offset file — resume after a
  kill re-delivers the in-flight batch with the SAME batchId, and the
  table's ledger makes the re-delivery a no-op → exactly-once END TO END
  (source offsets checkpointed + idempotent sink commit).
- ``Trigger.AvailableNow`` = bounded replay (catch-up then stop);
  ``processingTime`` = continuous tail.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import TableConfig
from ..sink.pages_table import PagesTable
from ..sources.event_log import stream_event_log


def start_streaming_replay(
    spark: SparkSession,
    event_dir: str,
    table_path: str,
    checkpoint_dir: str,
    cfg: TableConfig | None = None,
    num_buckets: int = 64,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    processing_time: str = "1 second",
    transform=None,
    source=None,
    partial: bool = False,
    progress_log: bool = False,
) -> StreamingQuery:
    """Start (or resume from checkpoint) the streaming replay query.

    ``progress_log=True`` registers a ``ProgressLogListener`` (D5): every
    micro-batch's source offsets / row counts / trigger latency append to
    ``<table>/_metrics/stream_progress.jsonl``. The listener object is
    exposed as ``query._msss_listener`` so a caller can
    ``spark.streams.removeListener`` it when the tail stops.

    ``transform`` (DataFrame -> DataFrame, optional) runs on the source
    stream before the sink — e.g. ``sources.wire_log.decode_wire_events``
    to tail a wire-format log of real ROWS_EVENT blobs.

    ``source`` (streaming DataFrame, optional) replaces the typed
    event-log source — e.g. ``sources.binlog_file.stream_binlog_files``
    to tail RAW binlog file bytes (``event_dir`` is then ignored).

    ``partial=True`` tails a ``binlog_row_image=MINIMAL`` stream: each
    micro-batch routes through ``operators.partial.apply_partial_batch``
    (column-level fold + touched-bucket enrichment) before the same
    exactly-once sink commit — checkpointed batchIds stay the ledger
    keys, so kill/resume semantics are identical to the full-image
    tail."""
    if cfg is None:
        from ..plans.replay import default_pages_config

        cfg = default_pages_config()
    if PagesTable.exists(table_path):
        table = PagesTable(spark, table_path)
    else:
        table = PagesTable.create(spark, table_path, num_buckets=num_buckets)

    # micro-batch skew planner: probe the first batch, carry the salting
    # decision, re-probe on duplicate-share signal edges — the same
    # amortization the batch paths use; one Spark job per steady micro-batch
    planner = {"last_probe_share": None, "salted": False, "latest": None}
    # threshold compaction runs on a maintenance thread and commits
    # between micro-batches — the trigger never pays the table-sized fold
    # (the cause of the round-5 p95 spikes: a fold landing INSIDE a
    # micro-batch tripled its latency)
    compactor = table.async_compactor()

    def _batch_source_files(batch_id: int) -> list[str]:
        """The trigger's input files from the FileStreamSource metadata
        log (``<checkpoint>/sources/0/<batchId>``) — a driver-side file
        read, no Spark job. Entries may live in a ``.compact`` rollup
        instead; both carry per-entry batchIds."""
        import json as _json

        d = os.path.join(checkpoint_dir, "sources", "0")
        out: list[str] = []
        for fn in (str(batch_id), f"{batch_id}.compact"):
            p = os.path.join(d, fn)
            if not os.path.exists(p):
                continue
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if not line.startswith("{"):
                        continue
                    e = _json.loads(line)
                    if fn.endswith(".compact") and e.get("batchId") != batch_id:
                        continue
                    path = e.get("path", "")
                    if path.startswith("file:"):
                        path = path[len("file:"):]
                    out.append(path)
            break
        return out

    def _footer_ddls(batch_id: int) -> list | None:
        """Micro-batch DDL rows from the source files' parquet footers —
        skips the per-batch DDL collect job entirely when every file in
        the trigger carries the writer's ``msss.ddl`` index (same filters
        as the scan path; foreign logs return None and fall back)."""
        from ..plans.replay import _BINLOG_RE, ddl_rows_from_footers

        try:
            files = _batch_source_files(batch_id)
        except Exception:
            return None
        if not files or not all(_BINLOG_RE.search(f) for f in files):
            return None
        return ddl_rows_from_footers(files, cfg.name)

    def apply(batch_df, batch_id: int) -> None:
        # batchId is stable across checkpointed restarts → the ledger key.
        if partial:
            from ..operators.partial import apply_partial_batch

            res = apply_partial_batch(
                table, f"stream-{batch_id}", batch_df, cfg
            )
            planner["latest"] = res.get("dup_share")
            return
        if cfg.skew_probe != "auto" or planner["last_probe_share"] is None:
            carry = None
        elif (
            planner["latest"] is not None
            and abs(planner["latest"] - planner["last_probe_share"])
            > cfg.salt_reprobe_delta
        ):
            carry = None
        else:
            carry = planner["salted"]
        res = table.apply_batch(
            f"stream-{batch_id}", batch_df, cfg, carry_salted=carry,
            ddls=(
                None
                if transform is not None or source is not None
                else _footer_ddls(batch_id)
            ),
            inline_compact=False,
        )
        if not res.get("skipped"):
            if res.get("skew_probed"):
                planner["last_probe_share"] = res.get("dup_share")
                planner["salted"] = bool(res.get("salted_merge"))
            planner["latest"] = res.get("dup_share")
            compactor.tick()

    stream = (
        source
        if source is not None
        else stream_event_log(spark, event_dir, max_files_per_trigger)
    )
    if transform is not None:
        stream = transform(stream)
    writer = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("cdc_replay")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    listener = None
    if progress_log:
        from .listener import ProgressLogListener

        listener = ProgressLogListener(
            os.path.join(table_path, "_metrics"), query_name="cdc_replay"
        )
        spark.streams.addListener(listener)
    q = writer.start()
    q._msss_listener = listener
    # callers that stop the query directly should drain this (a pending
    # fold is committed; a never-drained one only leaves vacuumable
    # orphans) — run_streaming_replay does it automatically
    q._msss_compactor = compactor
    return q


def run_streaming_replay(
    spark: SparkSession,
    event_dir: str,
    table_path: str,
    checkpoint_dir: str,
    cfg: TableConfig | None = None,
    num_buckets: int = 64,
    max_files_per_trigger: int = 1,
    timeout_sec: float | None = None,
    transform=None,
    source=None,
    partial: bool = False,
    progress_log: bool = False,
) -> dict:
    """Bounded replay: process everything available, then stop."""
    q = start_streaming_replay(
        spark,
        event_dir,
        table_path,
        checkpoint_dir,
        cfg,
        num_buckets,
        max_files_per_trigger,
        available_now=True,
        transform=transform,
        source=source,
        partial=partial,
        progress_log=progress_log,
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
    if getattr(q, "_msss_compactor", None) is not None:
        q._msss_compactor.close()
    if q._msss_listener is not None:
        # the listener bus is async but ORDERED: once this query's
        # terminated event lands in the log, every progress line before
        # it has been flushed — safe to deregister without losing the
        # final micro-batch's row
        import time as _time

        from .listener import read_progress_log

        mdir = os.path.join(table_path, "_metrics")
        qid = str(q.id)
        deadline = _time.time() + 15
        while _time.time() < deadline:
            if any(
                r.get("event") == "terminated" and r.get("id") == qid
                for r in read_progress_log(mdir)
            ):
                break
            _time.sleep(0.1)
        spark.streams.removeListener(q._msss_listener)
    table = PagesTable(spark, table_path)
    return {
        "table_path": table_path,
        "n_commits": table.n_committed(),
        "last_progress": q.lastProgress,
    }


def start_corpus_ingest(
    spark: SparkSession,
    docs_dir: str,
    table_path: str,
    checkpoint_dir: str,
    k: int = 8,
    bands: int = 4,
    max_files_per_trigger: int = 1,
    doc_schema: str = "doc_id long, text string",
) -> StreamingQuery:
    """Streamed corpus ingest (the webtext twin of the CDC replay): tail a
    directory of document parquet drops, dedup-gate each micro-batch
    against the corpus's persisted band index, and commit through the
    ledgered CorpusTable — batchId keys the ledger, so checkpointed
    restarts re-deliver batches as committed no-ops (exactly-once in
    final state, same contract as the pages sink).

    ``docs_dir`` may be a glob; note the file source does NOT recurse
    into subdirectories, so per-batch parquet DIRECTORIES need
    ``dir/*.parquet`` pointing at the part files."""
    from ..sink.corpus_table import CorpusTable

    if os.path.exists(os.path.join(table_path, "_versions", "CURRENT")):
        table = CorpusTable(spark, table_path)
    else:
        table = CorpusTable.create(spark, table_path, k=k, bands=bands)

    def apply(batch_df, batch_id: int) -> None:
        table.apply_batch(f"stream-{batch_id}", batch_df)

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("corpus_ingest")
        .trigger(availableNow=True)
        .start()
    )
