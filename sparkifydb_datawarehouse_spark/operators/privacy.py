"""Privacy auditing: k-anonymity over quasi-identifiers — "how many
individuals are re-identifiable because their attribute combination is
too rare?" The release-gating check that runs BEFORE the masked view
(`operators/masking.py`) ships data out.

Scale shape: one map-side-combined groupBy on the quasi-identifier
tuple (the equivalence classes), then a groups-sized rollup of the
class-size histogram. Counts are integers; rates are integer ratios —
cross-engine exact. At 100 TB the QI groupBy is the same shuffle as
any aggregation; the audit output is O(distinct QI combos), which is
the quantity k-anonymity is ABOUT, so it cannot blow up without the
release itself being unsafe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_K = 5

_ORACLE_KANON = f"""
WITH classes AS (
    SELECT c.c_mktsegment AS segment, n.n_name AS nation, COUNT(*) AS class_size
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY segment, nation
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) FILTER (WHERE class_size < {_K}) AS BIGINT) AS n_unsafe_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN class_size < {_K} THEN class_size ELSE 0 END) AS BIGINT)
           AS n_rows_suppressed,
       ROUND(SUM(CASE WHEN class_size < {_K} THEN class_size ELSE 0 END) * 1.0
             / SUM(class_size), 6) AS suppression_rate,
       CAST(MIN(class_size) AS BIGINT) AS k_achieved
FROM classes
"""


@query("q_k_anonymity", oracle=_ORACLE_KANON)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (market segment, nation) quasi-
    identifier: equivalence-class census, rows needing suppression to
    reach k={_K}, and the k actually achieved (the minimum class
    size)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    classes = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("n_name").alias("nation")
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    unsafe = F.when(F.col("class_size") < _K, F.col("class_size")).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.count(F.when(F.col("class_size") < _K, 1)).cast("long").alias(
            "n_unsafe_classes"
        ),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.sum(unsafe).cast("long").alias("n_rows_suppressed"),
        F.round(F.sum(unsafe) / F.sum("class_size"), 6).alias("suppression_rate"),
        F.min("class_size").cast("long").alias("k_achieved"),
    )
