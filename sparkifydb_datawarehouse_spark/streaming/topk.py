"""Streaming heavy hitters: a Space-Saving top-k summary maintained
across micro-batches with applyInPandasWithState (Metwally, Agrawal &
El Abbadi 2005, "Efficient Computation of Frequent and Top-k Elements
in Data Streams" — public literature), round 11.

The second custom stateful operator next to stateful.py's running
totals: per event_type, a BOUNDED m-counter summary of user activity.
Space-Saving's guarantees (both pinned by tests/test_stream_topk.py
against the exact batch counts on the same fixture):

  (1) est(x) ≥ true(x) ≥ est(x) − err(x) for every tracked x, and
  (2) every x with true(x) > N/m is in the summary

so the state is O(m) per key regardless of user cardinality — the
property that makes streaming top-k viable when the exact per-user
streaming aggregation (whose state grows with distinct users) is not.

The REGISTERED query (q_stream_heavy_hitters) is the exact batch
top-k per event_type — the ground truth the streaming summary
approximates, deterministic (count desc, user_id asc) and
DuckDB-oracled; the streaming operator itself is exercised by the
two-micro-batch pytest, the same split as the other streaming ==
batch equivalences (B15/B16).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..tables import load_table

M_COUNTERS = 8  # summary capacity per event_type
TOP_K = 5

_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("err", LongType()),
        # which micro-batch emitted the row — update-mode sinks keep
        # every emission, and Space-Saving's bounds only hold for the
        # LATEST summary (an evicted pair's stale row can read below
        # the pair's final true count), so consumers filter to the max
        StructField("batch_seq", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("users", StringType()),   # comma-joined ids
        StructField("counts", StringType()),
        StructField("errs", StringType()),
        StructField("seq", LongType()),
    ]
)


def _space_saving_update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold one micro-batch of user ids into the per-event_type
    Space-Saving summary; emit the full summary after the batch.
    Eviction is deterministic: smallest count, ties by LARGEST
    user_id (so re-runs and the pytest see one canonical state)."""
    (event_type,) = key
    if state.exists:
        u_s, c_s, e_s, seq = state.get
        summary = {
            int(u): [int(c), int(e)]
            for u, c, e in zip(u_s.split(","), c_s.split(","), e_s.split(","))
        }
    else:
        summary, seq = {}, 0
    seq = int(seq) + 1
    for pdf in batches:
        for uid in pdf["user_id"]:
            if pd.isna(uid):  # ADVICE r11 #4: int(NaN) would kill the query
                continue
            uid = int(uid)
            if uid in summary:
                summary[uid][0] += 1
            elif len(summary) < M_COUNTERS:
                summary[uid] = [1, 0]
            else:
                evict = min(summary, key=lambda u: (summary[u][0], -u))
                floor = summary[evict][0]
                del summary[evict]
                summary[uid] = [floor + 1, floor]
    items = sorted(summary.items())
    state.update(
        (
            ",".join(str(u) for u, _ in items),
            ",".join(str(v[0]) for _, v in items),
            ",".join(str(v[1]) for _, v in items),
            seq,
        )
    )
    yield pd.DataFrame(
        {
            "event_type": [event_type] * len(items),
            "user_id": [u for u, _ in items],
            "est_count": [v[0] for _, v in items],
            "err": [v[1] for _, v in items],
            "batch_seq": [seq] * len(items),
        }
    )


def stream_heavy_hitters(events: DataFrame) -> DataFrame:
    """Streaming: per-event_type Space-Saving summary, re-emitted
    after every micro-batch (update semantics). State is O(M_COUNTERS)
    per key — independent of user cardinality."""
    return (
        # ADVICE r11 #4: null user_ids arrive as NaN in the pandas
        # batch — filter them plan-side (the batch ground truth counts
        # per-user events, so a null uid is outside the summary's
        # domain; the fold also skips NaN defensively).
        events.select("event_type", "user_id")
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .applyInPandasWithState(
            _space_saving_update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ORACLE_HEAVY_HITTERS = """
SELECT event_type, user_id, n_events, rank
FROM (
    SELECT event_type, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY COUNT(*) DESC, user_id
           ) AS INTEGER) AS rank
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type, user_id
)
WHERE rank <= 5
ORDER BY event_type, rank
"""


@query("q_stream_heavy_hitters", oracle=_ORACLE_HEAVY_HITTERS)
def stream_heavy_hitters_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event_type top-5 users by event count (count desc,
    user_id asc — dense deterministic ranking): the ground truth the
    bounded streaming Space-Saving summary approximates, and a plain
    two-exchange plan (partial-agg'd groupBy + rank window over
    per-type aggregates, never raw events)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("user_id")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("event_type", "rank")
    )
