"""Point-in-time-correct join — fact rows decorated with the
dimension VERSION that was in effect when the fact happened.

This is the feature-store primitive: training examples must see the
feature value as of example time, never a later one (feature
leakage). The reference's star schema joins facts to a single
current-state dimension row (/root/reference/sql_queries.py:128-131)
— correct only because its dimensions are never updated; any
slowly-changing dimension needs this operator instead.

Composition: `q_scd2_intervals` builds the versioned dimension
(validity ranges per user state); this operator joins each purchase
event to the version in effect immediately BEFORE the event
(valid_from < ts <= valid_to, open-ended current version) — strict
inequality on the start so an event that itself opens a new version
sees the PRIOR state, not its own.

Three formulations of temporal matching now coexist, on purpose:
- as-of join (q_asof_join): nearest preceding quote via window —
  right when the dimension is a raw event stream;
- interval overlap (q_join_interval_overlap): interval × interval;
- PIT containment (this): point ∈ interval against materialized SCD2
  ranges — right when versions are already materialized (the
  warehouse case) because it needs no window over the fact side.

Scale: equi-key (user_id) hash join + residual range predicate — the
same no-nested-loop shape as the other temporal joins; version
tables are orders of magnitude smaller than facts and broadcast when
they fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .timeseries import _ORACLE_SCD2, scd2_intervals

_ORACLE_PIT = f"""
WITH iv AS ({_ORACLE_SCD2.replace("ORDER BY user_id, run_id", "")})
SELECT f.event_id,
       f.user_id,
       f.ts,
       i.event_type AS state_before,
       i.run_id AS state_run_id
FROM events f
LEFT JOIN iv i
  ON i.user_id = f.user_id
 AND i.valid_from < f.ts
 AND (i.valid_to IS NULL OR f.ts <= i.valid_to)
WHERE f.event_type = 'purchase'
ORDER BY f.event_id
"""


@query("q_pit_join", oracle=_ORACLE_PIT)
def pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    iv = scd2_intervals(spark, sf_dir).select(
        F.col("user_id").alias("iv_user"),
        F.col("event_type").alias("state_before"),
        F.col("run_id").alias("state_run_id"),
        "valid_from",
        "valid_to",
    )
    cond = (
        (F.col("iv_user") == F.col("user_id"))
        & (F.col("valid_from") < F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") <= F.col("valid_to")))
    )
    # NOT checkpointed before the sort (optimization r13): unlike the
    # sibling overlap join, the sampling re-run here is one pushdown
    # scan + broadcast probe — A/B measured the checkpoint of the
    # fact-sized join output SLOWER (0.87 -> 1.08 s at sf0.1), so the
    # recompute is the cheaper side of the store-vs-recompute trade
    return (
        facts.join(iv, cond, "left")
        .select("event_id", "user_id", "ts", "state_before", "state_run_id")
        .orderBy("event_id")
    )
