"""Grouped-map Pandas operator (applyInPandas) — per-group model
fitting, the "custom aggregate you can't express in SQL" shape.

Demonstrated with a closed-form OLS trend (slope of value over time
per user), which deliberately IS SQL-expressible (regr_slope), so the
Arrow round-trip and grouping semantics are value-checked against the
DuckDB oracle — the same pattern then carries to genuinely
non-SQL-able fits (changepoint detection, per-group sklearn, etc.).

Scale notes: applyInPandas shuffles each group to one task and
materializes the GROUP (not the partition) in memory — bound group
size (here: events per user) or pre-aggregate. Output is one small
row per group.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..registry import query
from ..tables import load_table

_TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("slope_per_hour", DoubleType()),
    ]
)


def _fit_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """Closed-form OLS slope of value against event time (per hour)."""
    x = pdf["ts"].astype("int64") / 1e9 / 3600.0  # epoch hours
    y = pdf["value"]
    n = len(pdf)
    if n < 2 or x.nunique() == 1:
        slope = float("nan")
    else:
        x_c = x - x.mean()
        slope = float((x_c * (y - y.mean())).sum() / (x_c * x_c).sum())
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [n],
            "slope_per_hour": [round(slope, 6)],
        }
    )


_ORACLE_TREND = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(regr_slope(value, epoch(ts) / 3600), 6) AS slope_per_hour
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("q_grouped_trend", oracle=_ORACLE_TREND)
def grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Python cost is per CALL, not per row — and AQE
    coalesces the applyInPandas shuffle to ONE partition when the
    byte volume is small, serializing tens of thousands of pandas
    calls into a single task (measured 11.2 s at sf0.1). The explicit
    hash repartition on the group key already satisfies the required
    distribution, so no further exchange is added, AQE leaves the
    user-specified partition count alone, and the groups fan across
    all cores: 11.2 → 0.6 s. At 100 TB the same line is what pins
    Python-call parallelism when group payloads are small."""
    ev = load_table(spark, sf_dir, "events")
    k = spark.sparkContext.defaultParallelism
    return (
        ev.select("user_id", "ts", "value")
        .repartition(k, "user_id")
        .groupBy("user_id")
        .applyInPandas(_fit_trend, schema=_TREND_SCHEMA)
        .orderBy("user_id")
    )
