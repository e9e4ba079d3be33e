"""Custom stateful streaming operators via applyInPandasWithState.

Built-in streaming aggregations cover windows/dedup; anything with
bespoke per-key state transitions (running counters with custom merge
logic, ingestion-delay gauges per key, session payload accumulation)
needs the arbitrary-state operator.  This module ships the canonical
shape: a per-key running activity tracker whose state is a tiny tuple,
updated once per micro-batch per key, Arrow-batched end to end.

Scale: state lives in the executor state store (HDFS/RocksDB backed),
keyed by the group column — the same partitioning as any streaming
aggregation.  The pandas function sees ONE key's rows per call, so
driver memory is never involved.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "n BIGINT, last_us BIGINT"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_user_activity(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State transition: fold this batch's rows for one user into the
    (count, max event time µs) running state; emit the new snapshot."""
    if state.exists:
        n, last_us = state.get
    else:
        n, last_us = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # nullable longs arrive in pandas as float64; .max() over an
        # all-NULL chunk is NaN and int(NaN) would kill the query — count
        # such rows but leave the event-time watermark untouched
        chunk_max = pdf["ts_us"].max()
        if len(pdf) and pd.notna(chunk_max):
            last_us = max(last_us, int(chunk_max))
    state.update((n, last_us))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_us": [last_us]})


def user_activity_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user running activity over a stream with columns
    (user_id, ts_us).  Emits one updated snapshot per key per batch
    (output mode: update)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_activity,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
