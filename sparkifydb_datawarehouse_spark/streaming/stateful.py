"""Custom stateful streaming operator via applyInPandasWithState —
per-user running totals that survive across micro-batches.

This is the engine's escape hatch for stateful semantics the built-in
windows can't express (B15 note in SURVEY): arbitrary per-key state
(here: cumulative count + sum) updated batch-by-batch with Arrow
exchange, GroupState handling timeouts/eviction.

Scale notes:
- State lives in the state store partitioned by key — the same shuffle
  boundary as a streaming aggregation. Key cardinality bounds memory;
  add state TTL (GroupStateTimeout) for unbounded key spaces.
- The pandas function receives per-key batch iterators — O(batch)
  memory, not O(history).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..registry import query
from ..tables import load_table

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate (count, sum) for one user across micro-batches and
    emit the cumulative totals after each batch."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming: cumulative per-user totals, one output row per user
    per micro-batch (update semantics)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# Batch equivalent — the oracle handle on the stateful operator's
# final answer (rounded: the stateful path accumulates in per-batch
# partial sums whose float order differs from a single-pass SUM).
_ORACLE_USER_TOTALS = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("q_stateful_user_totals", oracle=_ORACLE_USER_TOTALS)
def user_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state API) — the successor
# surface to applyInPandasWithState: an object-oriented
# StatefulProcessor with named state variables (value/list/map state),
# timers, and TTL, backed by the RocksDB state store. Same semantics
# implemented twice on purpose: the engine exposes BOTH stateful APIs,
# and the test asserts they agree with the batch aggregation.
# Runtime dependency note: executing a TWS query needs the python
# `protobuf` package (the state-server wire protocol); the test gates
# on its presence with importorskip. Plans build without it.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user cumulative (count, sum) with a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):  # noqa: D102
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user totals via transformWithStateInPandas.

    Requires the RocksDB state store provider (set by the caller):
    spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
