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

import numpy as np
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

# state keeps the value total as a scale-4 INTEGER so accumulation is
# exact and order-independent across micro-batches/row order — the same
# decimal-sum discipline as functions.exact_sum, which is what lets the
# streaming entry share an exact DuckDB oracle (sum(DECIMAL(25,4))).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)


def _scaled_sum(values: pd.Series) -> int:
    """Sum of round-half-away(value * 10^4) over the NON-NULL values, as a
    plain int. Nulls are skipped (SQL sum semantics — the oracle's
    sum(DECIMAL(25,4)) ignores NULLs; the previous int cast would raise on
    the first NaN), and rounding is half-AWAY-from-zero to match the
    DECIMAL cast the oracle applies (pandas .round() is half-to-even —
    divergent only for >4-decimal inputs, but match the contract anyway)."""
    vals = values.dropna()
    if vals.empty:
        return 0
    scaled = np.floor(vals.abs().mul(10_000).add(0.5)).mul(np.sign(vals))
    return int(scaled.astype("int64").sum())


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total_scaled = state.get if state.exists else (0, 0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        n += len(pdf)
        total_scaled += _scaled_sum(pdf["value"])
    state.update((n, total_scaled))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total_scaled / 10000.0, 6)],
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


# --- Spark 4 transformWithStateInPandas form --------------------------------
# The successor API (SPARK-49395 "state v2"): typed per-key state handles
# (value/list/map state, TTL, timers) instead of one opaque state tuple.
# Same semantics as running_user_totals above; both forms are kept because
# applyInPandasWithState remains the widely-deployed API while
# transformWithState is where new capabilities (per-state TTL, multiple
# state variables, timers in processing/event time) land.
#
# ENVIRONMENT GATE: executing this path needs `google.protobuf` (the
# state-server wire protocol, pyspark/sql/streaming/proto/StateMessage_pb2)
# which is absent in this container — the driver worker crashes with
# ImportError at query start. The operator itself is complete; the parity
# test (tests/test_stateful_and_formats.py) skips unless protobuf imports,
# mirroring the Kafka-jar and image-codec gates. Re-probed each round
# (last: round 7) — still absent; the test unskips itself the round the
# environment gains the module.

try:  # the API exists in Spark >= 4.0; guard so the module imports anywhere
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningUserTotalsProcessor(StatefulProcessor):
        """Per-user cumulative counters as a typed ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            n, total_scaled = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            batch_n = 0
            for pdf in rows:
                batch_n += len(pdf)
                n += len(pdf)
                total_scaled += _scaled_sum(pdf["value"])
            self._totals.update((n, total_scaled))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total_scaled / 10000.0, 6)],
                    "batch_events": [batch_n],
                }
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
        """``running_user_totals`` on the transformWithStateInPandas API —
        must produce identical emissions (pinned by
        tests/test_stateful_and_formats.py)."""
        return events_stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningUserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - older Spark
    running_user_totals_tws = None  # type: ignore[assignment]
