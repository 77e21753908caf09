"""M6: streaming replay == batch replay == oracle; kill/resume mid-stream."""

import time

from mysql_syncer_spark.oracle import sequential_replay
from mysql_syncer_spark.sink.pages_table import PagesTable
from mysql_syncer_spark.streaming.runner import (
    run_streaming_replay,
    start_streaming_replay,
)
from tests.test_replay_parity import assert_state_equal


def test_streaming_replay_matches_oracle(spark, event_log_dir, event_table, tmp_path):
    res = run_streaming_replay(
        spark,
        event_log_dir,
        str(tmp_path / "pages"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
    )
    assert res["n_commits"] >= 2  # one per binlog file (maxFilesPerTrigger=1)
    oracle, _, _ = sequential_replay(event_table)
    t = PagesTable(spark, str(tmp_path / "pages"))
    assert_state_equal(t.read().collect(), oracle)


def test_streaming_kill_and_resume(spark, event_log_dir, event_table, tmp_path):
    """Stop after the first micro-batch; resume from checkpoint; final state
    identical to an uninterrupted run (FIXTURES §6)."""
    table_path = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    q = start_streaming_replay(
        spark, event_log_dir, table_path, ckpt, num_buckets=8, available_now=True
    )
    # wait for ≥1 committed micro-batch, then kill mid-stream
    deadline = time.time() + 120
    while time.time() < deadline:
        t = PagesTable(spark, table_path)
        if PagesTable.exists(table_path) and t.n_committed() > 0:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)
    n_before = PagesTable(spark, table_path).n_committed()
    assert n_before >= 1

    # resume from the same checkpoint
    res = run_streaming_replay(
        spark, event_log_dir, table_path, ckpt, num_buckets=8
    )
    assert res["n_commits"] >= 2
    oracle, _, _ = sequential_replay(event_table)
    assert_state_equal(PagesTable(spark, table_path).read().collect(), oracle)


def test_windowed_op_counts_stream_equals_batch(spark, event_log_dir, tmp_path):
    """Watermarked event-time windows over the CDC stream: the streaming
    result (availableNow, complete mode) must equal the batch computation
    of the SAME function — late out-of-order warc_ts rows included."""
    from mysql_syncer_spark.sources.event_log import read_event_log, stream_event_log
    from mysql_syncer_spark.streaming.windows import windowed_op_counts

    batch = {
        (r["window_start_us"], r["op"]): r["n_events"]
        for r in windowed_op_counts(
            read_event_log(spark, event_log_dir).filter("op in ('I','U','D')")
        ).collect()
    }
    stream = stream_event_log(spark, event_log_dir, max_files_per_trigger=1)
    out = windowed_op_counts(stream.filter("op in ('I','U','D')"))
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start_us"], r["op"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == batch and len(got) > 0


def test_progress_log_listener_records_micro_batches(spark, tmp_path):
    """D5 source-side observability: the bounded tail with
    progress_log=True persists one JSON line per micro-batch (rows,
    offsets, trigger latency) under the table's _metrics dir, and the
    row totals reconcile with the events consumed."""
    import os
    import tempfile

    from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
    from mysql_syncer_spark.streaming.listener import read_progress_log
    from mysql_syncer_spark.streaming.runner import run_streaming_replay

    tbl = generate_events(GenSpec(n_events=900, events_per_file=300))
    d = tempfile.mkdtemp(prefix="prog_")
    write_event_log(tbl, d)
    table_path = str(tmp_path / "pages")
    run_streaming_replay(
        spark, d, table_path, str(tmp_path / "ckpt"), num_buckets=4,
        timeout_sec=240, progress_log=True,
    )
    rows = read_progress_log(os.path.join(table_path, "_metrics"))
    prog = [r for r in rows if r["event"] == "progress"]
    assert len(prog) == 3  # one per binlog file (maxFilesPerTrigger=1)
    # numInputRows counts every ACTION's scan of the micro-batch (probe /
    # DDL collect / write re-read the source), so it gauges per-batch read
    # amplification; exact applied counts live in the table's commit
    # metrics (events_in). Each batch read its file at least once.
    assert all(r["num_input_rows"] >= 300 for r in prog)
    assert all(r["trigger_ms"] is not None for r in prog)
    assert all(r["sources"] and r["sources"][0]["end_offset"] for r in prog)
    # started/terminated bracket the run
    assert rows[0]["event"] == "started"
    # listener was removed: a second, listener-less run appends nothing
    n_lines = len(rows)
    run_streaming_replay(
        spark, d, table_path, str(tmp_path / "ckpt"), num_buckets=4,
        timeout_sec=240,
    )
    assert len(read_progress_log(os.path.join(table_path, "_metrics"))) == n_lines


def test_progress_listener_filters_other_queries(spark, tmp_path):
    """query_name filtering covers started/terminated too: in a shared
    SparkSession running several streams, another query's lifecycle
    events must not interleave into this table's stream_progress.jsonl."""
    import time

    from mysql_syncer_spark.streaming.listener import (
        ProgressLogListener,
        read_progress_log,
    )

    out = str(tmp_path / "metrics")
    lst = ProgressLogListener(out, query_name="mine")
    spark.streams.addListener(lst)
    try:
        src = spark.readStream.format("rate").option("rowsPerSecond", 10).load()
        q_other = (
            src.writeStream.format("noop")
            .queryName("other")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .start()
        )
        q_mine = (
            src.writeStream.format("noop")
            .queryName("mine")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )
        time.sleep(4)
        q_other.stop()
        q_mine.stop()
        q_other.awaitTermination(30)
        q_mine.awaitTermination(30)
        # listener callbacks are async — wait for the terminated line
        for _ in range(50):
            rows = read_progress_log(out)
            if any(r["event"] == "terminated" for r in rows):
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(lst)
    rows = read_progress_log(out)
    assert rows, "no rows logged for the named query"
    names = {r.get("name") for r in rows if r["event"] in ("started", "progress")}
    assert names <= {"mine"}, names
    started_ids = {r["id"] for r in rows if r["event"] == "started"}
    term_ids = {r["id"] for r in rows if r["event"] == "terminated"}
    assert term_ids <= started_ids, (term_ids, started_ids)
