"""Stateful-streaming sessionization (applyInPandasWithState).

The batch `sessionize` query (queries.py) assigns gap-based session
indices with a window; its streaming twin keeps an explicit per-user
state — last event time + current session index — and processes
micro-batches with ``applyInPandasWithState`` (the north-star's
"custom stateful operators" path; the reference has no streaming, so
this is the engine's incremental story for a continuously-crawled
events feed).

Semantics (identical to the batch window when events arrive in order):
an event opens a new session when it is the user's first or when the
gap to the previous event exceeds ``gap_sec``. State per user:
(last_ts, session_idx) — two longs, bounded regardless of history
length, the property that makes this run forever at 10^12 rows where
a window over all history cannot.

Tested in tests/test_streaming.py: the stream drains with
Trigger.AvailableNow and must reproduce the batch sessionize result
row-for-row; a second drain from the same checkpoint continues the
session numbering from saved state.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_t", LongType()),
        StructField("session_idx", LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_sec: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_t, session_idx = state.get
    else:
        last_t, session_idx = None, 0
    out_event, out_sess = [], []
    for pdf in pdfs:
        # deterministic in-batch order: (t, event_id) — matches the
        # batch window's ORDER BY
        sdf = pdf.assign(
            _t=pdf["ts"].astype("int64") // 1_000_000_000
        ).sort_values(["_t", "event_id"])
        for eid, ti in zip(
            sdf["event_id"].astype("int64"), sdf["_t"].astype("int64")
        ):
            ti = int(ti)
            if last_t is None or ti - last_t > gap_sec:
                session_idx += 1
            last_t = ti
            out_event.append(int(eid))
            out_sess.append(session_idx)
    state.update((last_t, session_idx))
    yield pd.DataFrame(
        {
            "event_id": out_event,
            "user_id": user_id,
            "session_idx": out_sess,
        }
    )


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """(event_id, user_id, session_idx) with per-user bounded state."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_sec)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_available_now(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_sec: int = 1800,
) -> DataFrame:
    """Drain the events currently in input_dir (AvailableNow), appending
    sessionized rows to a parquet sink (the memory sink cannot recover
    an append-mode checkpoint); per-user state persists in the
    checkpoint so later drains continue numbering. Returns ALL rows
    appended so far."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    out = sessionize_stream(raw, gap_sec)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(OUT_SCHEMA).parquet(output_dir)
