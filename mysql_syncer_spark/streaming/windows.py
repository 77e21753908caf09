"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no time-windowed analytics (single-threaded apply loop);
this is Structured-Streaming-native monitoring over the change stream:
tumbling event-time windows on the payload timestamp, a watermark bounding
how long state waits for late events (the generator injects out-of-order
warc_ts regressions — p_out_of_order — which is exactly the late data the
watermark absorbs), counts per (window, op).

Scale: the aggregation state is one row per (window, op) — O(windows)
regardless of event volume; map-side partial counts mean the shuffle
carries partials, never events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_op_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "after.warc_ts",
) -> DataFrame:
    """events (batch or streaming) → (window_start, op, n_events).
    On a streaming input the watermark bounds state and admits late rows
    up to `watermark` behind the max observed event time; on a batch input
    withWatermark is a no-op, so the SAME code serves both (and the batch
    run is the oracle for the streaming run in tests)."""
    flat = events.select(F.col(ts_col).alias("_ts"), "op")
    if flat.isStreaming:
        flat = flat.withWatermark("_ts", watermark)
    return (
        flat.groupBy(F.window("_ts", window).alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "op",
            "n_events",
        )
    )
