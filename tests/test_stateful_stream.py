"""In-stream stateful LWW filter: cross-batch suppression == oracle winners."""

from mysql_syncer_spark.oracle import _to_us, sequential_replay
from mysql_syncer_spark.sources.event_log import stream_event_log
from mysql_syncer_spark.streaming.stateful import streaming_lww_filter


def test_stream_lww_filter_matches_oracle(spark, event_log_dir, event_table, tmp_path):
    stream = stream_event_log(spark, event_log_dir, max_files_per_trigger=1)
    out = streaming_lww_filter(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("lww_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from lww_out").collect()
    assert rows, "stateful stream emitted nothing"

    # the LAST emitted event per url must be the oracle winner, and every
    # emission must strictly advance the rank (cross-batch suppression)
    by_url: dict = {}
    for r in rows:
        rank = (r["ts_us"], r["file_seq"], r["log_pos"])
        prev = by_url.get(r["url"])
        by_url[r["url"]] = max(prev, rank) if prev else rank

    oracle, _, _ = sequential_replay(event_table, on_delete="delete")
    # oracle tracks winners incl. deletes via rank; reconstruct winner rank
    # directly from the event table for every url
    import collections

    want: dict = collections.defaultdict(lambda: (-(2**62),) * 3)
    for ev in event_table.to_pylist():
        if ev["op"] not in ("I", "U", "D"):
            continue
        rank = (_to_us(ev["after"]["warc_ts"]), ev["file_seq"], ev["log_pos"])
        u = ev["after"]["url"]
        if rank > want[u]:
            want[u] = rank
    assert set(by_url) == set(want)
    for u, rank in want.items():
        assert by_url[u] == rank, (u, by_url[u], rank)

    # duplicates never emitted twice: emissions per (url, rank) unique
    seen = set()
    for r in rows:
        key = (r["url"], r["ts_us"], r["file_seq"], r["log_pos"])
        assert key not in seen
        seen.add(key)
