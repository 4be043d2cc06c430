"""Custom stateful streaming operator: per-conversation progress tracking.

`applyInPandasWithState` keeps one state row per conversation across
micro-batches: turns seen, latest LSN, deletes seen. This is the
arbitrary-stateful extension point the engine offers beyond foreachBatch
(the reference has no equivalent — its only state is the applied table +
offset registers; this powers live per-conversation monitors).

Arrow-batched: state updates run over whole pandas groups, no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("n_deletes", LongType(), False),
        StructField("max_lsn", LongType(), False),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("n_deletes", LongType(), False),
        StructField("max_lsn", LongType(), False),
        StructField("batch_events", IntegerType(), False),
    ]
)


def _track(
    key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, n_deletes, max_lsn = (
        state.get if state.exists else (0, 0, 0)
    )
    batch_events = 0
    for pdf in batches:
        batch_events += len(pdf)
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "D").sum())
        max_lsn = max(max_lsn, int(pdf["change_lsn"].max()))
    state.update((n_events, n_deletes, max_lsn))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_events": [n_events],
            "n_deletes": [n_deletes],
            "max_lsn": [max_lsn],
            "batch_events": [batch_events],
        }
    )


def conversation_progress(feed_stream: DataFrame) -> DataFrame:
    """Streaming per-conversation progress: cumulative counts + high LSN,
    emitted every micro-batch for conversations with activity."""
    return (
        feed_stream.select("conv_id", "op", "change_lsn")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
