"""Custom stateful streaming operator: cross-batch LWW dedup filter.

The sink already achieves exactly-once LWW via per-batch max_by + MERGE
(stateless in the stream, state in the table — SURVEY §7.4 point 5, the
scale-safe default). This operator is the complementary *in-stream* form:
``applyInPandasWithState`` keeps the running max ``(warc_ts, file_seq,
log_pos)`` rank per url and emits ONLY rank-advancing events — a streaming
change-compactor that suppresses duplicates/regressions before they reach
the sink (useful when the sink is append-only or expensive per event).

State per key = 3 longs (bounded; no payload retained). At 10^10-url scale
in-stream state is the expensive design — that trade-off is why the engine
defaults to table-side LWW — so this stage is opt-in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("file_seq", T.LongType()),
        T.StructField("log_pos", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("log_pos", T.LongType()),
        T.StructField("file_seq", T.IntegerType()),
        T.StructField("op", T.StringType()),
    ]
)


def _advance(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cur = tuple(state.get) if state.exists else (-(2**62), -(2**62), -(2**62))
    url = key[0]
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "file_seq", "log_pos"])
        ranks = list(zip(pdf["ts_us"], pdf["file_seq"], pdf["log_pos"]))
        keep = []
        for i, r in enumerate(ranks):
            r = (int(r[0]), int(r[1]), int(r[2]))
            if r > cur:
                cur = r
                keep.append(i)
        if keep:
            out = pdf.iloc[keep][["ts_us", "log_pos", "file_seq", "op"]].copy()
            out.insert(0, "url", url)
            yield out
    state.update((int(cur[0]), int(cur[1]), int(cur[2])))


def streaming_lww_filter(events: DataFrame) -> DataFrame:
    """events (streaming DF with after.url/after.warc_ts envelope) →
    rank-advancing events only, keyed state per url."""
    from pyspark.sql import functions as F

    flat = events.filter(F.col("op").isin("I", "U", "D")).select(
        F.col("after.url").alias("url"),
        F.unix_micros(F.col("after.warc_ts")).alias("ts_us"),
        F.col("log_pos"),
        F.col("file_seq"),
        F.col("op"),
    )
    return flat.groupBy("url").applyInPandasWithState(
        _advance,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
