"""Distribution drift — Population Stability Index between two time
slices of the event stream.

The training-pipeline question behind it: "is this week's data still
distributed like the data the model/filters were tuned on?" PSI is
the standard scorecard: bin the reference period, compare bin shares,
Σ (p−q)·ln(p/q). Rule of thumb: <0.1 stable, 0.1-0.25 drifting,
>0.25 shifted.

Scale design (100 TB): two scans collapse to ONE — the slice label is
a projection, the bin is a projection, and the whole comparison is a
single (slice, bin) hash aggregation followed by a tiny pivot of
n_bins rows on the driver side of the plan. Bins are FIXED-WIDTH over
the known value domain, so binning is stateless arithmetic; for
unknown domains the cut points would come from approx_percentile on
the reference slice broadcast back (the binning.bin_by_quantiles
path). No shuffle carries more than (slice × bins) partial rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_NBINS = 10
_SPLIT = "2024-01-15"  # reference = before, current = on/after


_ORACLE_PSI = f"""
WITH binned AS (
    SELECT CASE WHEN ts < TIMESTAMP '{_SPLIT} 00:00:00' THEN 'ref' ELSE 'cur' END AS slice,
           LEAST(FLOOR(value / 10.0), {_NBINS - 1}) AS bin
    FROM events
), counts AS (
    SELECT bin,
           CAST(SUM(CASE WHEN slice = 'ref' THEN 1 ELSE 0 END) AS DOUBLE) AS n_ref,
           CAST(SUM(CASE WHEN slice = 'cur' THEN 1 ELSE 0 END) AS DOUBLE) AS n_cur
    FROM binned GROUP BY bin
), shares AS (
    SELECT bin,
           n_ref / SUM(n_ref) OVER () AS p,
           n_cur / SUM(n_cur) OVER () AS q
    FROM counts
)
SELECT CAST(bin AS BIGINT) AS bin,
       ROUND(p, 6) AS share_ref,
       ROUND(q, 6) AS share_cur,
       -- zero-share floor (standard PSI practice): a bin present in
       -- one slice only would otherwise be ln(0) / division by zero
       ROUND((p - q) * LN(GREATEST(p, 0.000001) / GREATEST(q, 0.000001)), 6)
           AS psi_term
FROM shares
ORDER BY bin
"""


@query("q_drift_psi", oracle=_ORACLE_PSI)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin PSI terms for `events.value` (domain [0,100), 10 fixed
    bins), week-1 reference vs the rest. The total PSI is the sum of
    `psi_term` — emitted per-bin so the report shows WHERE the mass
    moved, not just that it did."""
    ev = load_table(spark, sf_dir, "events")
    slice_ = F.when(F.col("ts") < _SPLIT, "ref").otherwise("cur")
    bin_ = F.least(F.floor(F.col("value") / 10.0), F.lit(_NBINS - 1))
    counts = (
        ev.select(slice_.alias("slice"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("slice") == "ref", 1).otherwise(0))
            .cast("double")
            .alias("n_ref"),
            F.sum(F.when(F.col("slice") == "cur", 1).otherwise(0))
            .cast("double")
            .alias("n_cur"),
        )
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    # try_divide: a slice with an empty ref or cur period (single-row
    # fixture) has a zero normalizer -> NULL shares, not a crash
    p = F.try_divide(F.col("n_ref"), F.sum("n_ref").over(tot))
    q = F.try_divide(F.col("n_cur"), F.sum("n_cur").over(tot))
    return (
        counts.select(
            F.col("bin").cast("long").alias("bin"),
            F.round(p, 6).alias("share_ref"),
            F.round(q, 6).alias("share_cur"),
            F.round(
                (p - q)
                * F.log(
                    F.greatest(p, F.lit(0.000001))
                    / F.greatest(q, F.lit(0.000001))
                ),
                6,
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )
