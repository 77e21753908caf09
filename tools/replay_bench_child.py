"""Isolated bench runs (one fresh JVM per measurement).

Usage:
    python tools/replay_bench_child.py replay <cores> <event_dir> <warm_dir> <out_json>
    python tools/replay_bench_child.py sha2   <cores> <n_rows>    <out_json>

`replay` warms with a SMALL log (JIT + python workers) then times the full
replay of <event_dir>. `sha2` is the hardware-ceiling calibration: an
embarrassingly parallel JVM-only job — its speedup between two core counts
is the best ANY job can do on this host (shared/oversubscribed vCPUs).
All working dirs live on /dev/shm so the shared virtual disk adds no noise.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_replay(
    cores: int, event_dir: str, warm_dir: str, out_path: str, depth: int = 1
) -> None:
    from mysql_syncer_spark.plans.replay import replay
    from mysql_syncer_spark.session import get_spark

    shm = tempfile.mkdtemp(dir="/dev/shm", prefix=f"bench_{cores}_")
    try:
        local_log = os.path.join(shm, "log")
        shutil.copytree(event_dir, local_log)
        spark = get_spark(
            app_name=f"replay_bench_{cores}",
            cores=cores,
            # FIXED partitioning across levels — same task sizes, different
            # executor counts, like comparing two cluster sizes
            shuffle_partitions=32,
            extra_conf={"spark.local.dir": os.path.join(shm, "sparktmp")},
        )
        replay(
            spark,
            warm_dir,
            os.path.join(shm, "warm", "pages"),
            num_buckets=64,
            pipeline_depth=depth,
        )
        t0 = time.time()
        res = replay(
            spark,
            local_log,
            os.path.join(shm, "pages"),
            num_buckets=64,
            pipeline_depth=depth,
        )
        walls = [time.time() - t0]
        wall = min(walls)
        events = res["events_applied"]
        spark.stop()
    finally:
        shutil.rmtree(shm, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "cores": cores,
                "wall_sec": round(wall, 2),
                "walls": [round(w, 2) for w in walls],
                "events": events,
                "events_per_sec": round(events / wall, 1),
                "n_batches": res["n_batches"],
                "pipeline_depth": depth,
                # ordered-commit serial floor vs head-wait (parallel
                # compute) decomposition, when pipelined
                "pipeline_profile": res.get("pipeline_profile"),
            },
            f,
        )


def run_stream(cores: int, event_dir: str, warm_dir: str, out_path: str) -> None:
    """Streaming-tail throughput: the same CDC log replayed through
    Structured Streaming (readStream tail → foreachBatch exactly-once
    sink, one binlog file per micro-batch) with the progress listener
    recording per-micro-batch latency. This times the cadence a LIVE
    tail pays (trigger scheduling + checkpoint + commit per batch), which
    the batch replay modes exclude."""
    import glob

    import pyarrow.parquet as pq

    from mysql_syncer_spark.plans.replay import replay
    from mysql_syncer_spark.session import get_spark
    from mysql_syncer_spark.streaming.listener import read_progress_log
    from mysql_syncer_spark.streaming.runner import run_streaming_replay

    shm = tempfile.mkdtemp(dir="/dev/shm", prefix=f"stream_{cores}_")
    try:
        local_log = os.path.join(shm, "log")
        shutil.copytree(event_dir, local_log)
        n_events = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(local_log, "*.parquet"))
        )
        spark = get_spark(
            app_name=f"stream_bench_{cores}",
            cores=cores,
            shuffle_partitions=32,
            extra_conf={"spark.local.dir": os.path.join(shm, "sparktmp")},
        )
        replay(  # JIT + python-worker warmup, same as the batch modes
            spark, warm_dir, os.path.join(shm, "warm", "pages"), num_buckets=64
        )
        table_path = os.path.join(shm, "pages")
        t0 = time.time()
        run_streaming_replay(
            spark, local_log, table_path, os.path.join(shm, "ckpt"),
            num_buckets=64, timeout_sec=3600, progress_log=True,
        )
        wall = time.time() - t0
        rows = read_progress_log(os.path.join(table_path, "_metrics"))
        prog = [
            r for r in rows
            if r.get("event") == "progress" and (r.get("num_input_rows") or 0)
        ]
        lat = sorted(r["trigger_ms"] for r in prog if r.get("trigger_ms"))
        med = lat[len(lat) // 2] if lat else None
        spark.stop()
    finally:
        shutil.rmtree(shm, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "cores": cores,
                "wall_sec": round(wall, 2),
                "events": n_events,
                "rows_per_sec": round(n_events / wall, 1),
                "n_micro_batches": len(prog),
                "median_batch_sec": round(med / 1000, 2) if med else None,
                "p95_batch_sec": (
                    round(lat[int(len(lat) * 0.95)] / 1000, 2) if lat else None
                ),
            },
            f,
        )


def run_sha2(cores: int, n_rows: int, out_path: str) -> None:
    """Hardware-ceiling calibration: embarrassingly parallel pure-JVM
    hashing, zero shuffle, zero Python. NOTE this ceiling is CONSERVATIVE
    against the replay: Arrow-UDF stages run JVM task threads and Python
    worker processes concurrently, so a local[1] UDF-bearing job already
    uses up to 2 CPUs — its measured 1→4 "speedup" is deflated relative to
    a job that uses exactly N CPUs at local[N]. (A hybrid JVM+pandas-UDF
    calibration measures 4.1x for 1→4 for the same reason.)"""
    from mysql_syncer_spark.session import get_spark

    _ = pd  # module import kept for UDF-bearing calibrations
    spark = get_spark(app_name=f"ceiling_{cores}", cores=cores, shuffle_partitions=32)
    spark.range(10_000).selectExpr("sum(id)").collect()
    walls = []
    for _i in range(2):  # best-of-2, same noise rationale as replay
        t0 = time.time()
        spark.range(n_rows, numPartitions=32).selectExpr(
            "sha2(cast(id as string), 256) as h"
        ).selectExpr("count(distinct substring(h, 1, 8))").collect()
        walls.append(time.time() - t0)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump({"cores": cores, "wall_sec": round(min(walls), 2)}, f)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "replay":
        # replay <cores> <event_dir> <warm_dir> [depth] <out_json>
        if len(sys.argv) > 6:
            run_replay(
                int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[6],
                depth=int(sys.argv[5]),
            )
        else:
            run_replay(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
    elif mode == "stream":
        # stream <cores> <event_dir> <warm_dir> <out_json>
        run_stream(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
    elif mode == "sha2":
        run_sha2(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        raise SystemExit(f"unknown mode {mode}")
