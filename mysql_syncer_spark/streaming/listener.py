"""StreamingQueryListener → durable per-micro-batch progress log (D5).

The reference surfaces liveness only as the slave.info checkpoint file
and log lines (/root/reference/src/slave/rs_redis_thread.c:133-175);
production CDC needs the numbers a monitoring stack scrapes: rows per
trigger, batch duration, source offsets, watermark. Spark already
computes all of it per micro-batch — this listener persists each
``QueryProgressEvent`` as one JSON line under the table's
``_metrics/stream_progress.jsonl``, complementing the table's own
commit-time ``metrics_history()`` (which tracks applied/dedup/lag):
progress rows cover the SOURCE side (offsets read, trigger latency),
commit metrics cover the SINK side; their batch ids line up
(``stream-<batchId>`` ledger keys).

Driver-side only, O(1) per micro-batch, append-only (crash-safe: a
torn last line is ignored by the reader). Note ``numInputRows`` counts
every action's scan of the micro-batch (the skew probe / DDL collect /
write each re-read the source under foreachBatch), so it gauges
per-batch READ AMPLIFICATION; exact applied-event counts live in the
sink's commit metrics (``events_in``). On a real cluster the same
listener would feed a metrics agent instead of a file — the hook point
is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Append each micro-batch's progress to ``<dir>/stream_progress.jsonl``.

    ``query_name`` (optional) restricts logging to one named query so a
    shared SparkSession running several streams doesn't interleave logs.
    """

    def __init__(self, out_dir: str, query_name: str | None = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "stream_progress.jsonl")
        self.query_name = query_name
        # query ids seen starting under our name — terminated events carry
        # no name, so the filter matches them by id
        self._ids: set[str] = set()

    # -- StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event) -> None:
        if self.query_name is not None and event.name != self.query_name:
            return
        self._ids.add(str(event.id))
        self._append(
            {"event": "started", "id": str(event.id), "runId": str(event.runId),
             "name": event.name}
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        if self.query_name is not None and p.name != self.query_name:
            return
        row = {
            "event": "progress",
            "name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "trigger_ms": (p.durationMs or {}).get("triggerExecution"),
            "add_batch_ms": (p.durationMs or {}).get("addBatch"),
            "input_rows_per_sec": p.inputRowsPerSecond,
            "timestamp": p.timestamp,
            "sources": [
                {
                    "description": s.description,
                    "start_offset": s.startOffset,
                    "end_offset": s.endOffset,
                    "num_input_rows": s.numInputRows,
                }
                for s in (p.sources or [])
            ],
        }
        wm = (p.eventTime or {}).get("watermark")
        if wm:
            row["watermark"] = wm
        self._append(row)

    def onQueryTerminated(self, event) -> None:
        if self.query_name is not None and str(event.id) not in self._ids:
            return
        self._append(
            {"event": "terminated", "id": str(event.id),
             "exception": event.exception}
        )

    def onQueryIdle(self, event) -> None:  # Spark 3.4+ callback
        pass

    # -- io -------------------------------------------------------------
    def _append(self, row: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(row, default=str) + "\n")


def read_progress_log(out_dir: str) -> list[dict]:
    """Parsed progress rows (torn trailing line from a crash is skipped)."""
    path = os.path.join(out_dir, "stream_progress.jsonl")
    if not os.path.exists(path):
        return []
    rows: list[dict] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn tail
    return rows
