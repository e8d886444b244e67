"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for stateful logic that windows/aggregations can't
express (SURVEY §2 Part C: 'applyInPandasWithState for custom stateful
operators').

``running_user_totals`` keeps per-user cumulative counters across
micro-batches: the state store holds one small row per user, each trigger
updates only the users present in that batch, and emission is per-update.
At 100 TB the state is partitioned by the group key across executors and
checkpointed; eviction is by timeout (set a ProcessingTimeTimeout and
drop idle users) — here NoTimeout since the driver data is bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "batch_events": [batch_n],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value-sum) maintained in the state store
    across micro-batches; emits the updated totals for users seen in each
    trigger."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
