"""Custom stateful streaming operator: user sessionization with
``applyInPandasWithState``.

The reference has no streaming (SURVEY §2.9); this is the engine's custom
stateful-operator surface for incremental crawl processing: per-user session
counting across micro-batches. State = (last_ts_epoch, n_sessions); a new
session starts when the gap from the previous event exceeds ``gap``.
State survives restarts via the checkpoint (verified in tests by feeding
two availableNow batches through one checkpoint).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
    StructField("last_ts", TimestampType()),
])

STATE_SCHEMA = StructType([
    StructField("last_epoch", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(user_id, ts) stream -> per-user running session/event counts.

    Emits one row per user per micro-batch that touched the user
    (update semantics); counts are cumulative across batches via GroupState.
    """

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            last_epoch, n_sessions, n_events = state.get
        else:
            last_epoch, n_sessions, n_events = None, 0, 0
        last_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts in pdf["ts"]:
                epoch = int(ts.value // 1_000_000_000)
                if last_epoch is None or epoch - last_epoch > gap_seconds:
                    n_sessions += 1
                last_epoch = epoch
                n_events += 1
                last_ts = ts
        state.update((last_epoch, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
