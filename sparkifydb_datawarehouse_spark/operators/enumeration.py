"""Global row enumeration without a single-partition sort.

The reference generates surrogate keys with Redshift IDENTITY
(/root/reference/sql_queries.py:88) — non-contiguous under parallel
load. `q_surrogate_key` mirrors that (monotonically_increasing_id,
rows-only). This module is the DENSE contract: a true global
1..N row_number in a total order, built the way it must be built at
100 TB.

The naive `row_number().over(Window.orderBy(...))` is the canonical
scale bug: an empty PARTITION BY collapses every row into ONE task —
a 100 TB sort on a single executor. The scalable form is the same
two-phase scheme Spark's own `sortWithinPartitions`+range exchange
uses:

1. `repartitionByRange` on the total-order key — a sampled range
   exchange into K balanced partitions (equal keys land together;
   the key includes a unique tiebreaker so the order is total).
2. Per-partition counts (K rows to the driver side of the plan,
   never the data) -> exclusive prefix-sum offsets.
3. Within each range partition, a window row_number ordered by the
   key + the partition's offset = the exact global rank.

Every stage is bounded: the widest shuffle is the range exchange
(linear, balanced by sampling), the offset table is K rows, and the
per-partition sort fits executor memory by construction (K scales
with data volume). This is also how you'd assign stable contiguous
ids to a 100 TB training corpus after a deterministic shuffle
(llm/packing.py composes with it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_ORACLE_GLOBAL_RN = """
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
FROM orders
ORDER BY rn
"""


@query("q_global_rownumber", oracle=_ORACLE_GLOBAL_RN)
def global_rownumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbers over (o_orderdate, o_orderkey)
    via range-partition + per-partition offsets (see module docstring).

    Correctness requires the pid assignment seen by the count pass and
    the enumeration pass to be THE SAME physical partitioning —
    repartitionByRange samples its boundaries, so two executions of
    the plan could legally disagree. localCheckpoint pins one
    materialization (checkpoint() on a real cluster), the same
    lineage-truncation discipline as connected components / PageRank.

    The result is identical to ROW_NUMBER() OVER (ORDER BY ...) for
    ANY boundary choice: boundaries only decide which partition a key
    range lands in; offset + local rank re-links them into one global
    sequence.
    """
    orders = load_table(spark, sf_dir, "orders")
    # K follows the session's shuffle parallelism (AQE/conf-tuned per
    # deployment) rather than a literal — at 100 TB the operator scales
    # with the cluster's configured width, keeping per-partition sorts
    # memory-bounded
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        orders.select("o_orderkey", "o_orderdate")
        .repartitionByRange(k, "o_orderdate", "o_orderkey")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offsets = (
        ranged.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    w_local = Window.partitionBy("pid").orderBy("o_orderdate", "o_orderkey")
    return (
        ranged.withColumn("rn_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            (F.col("offset") + F.col("rn_local")).alias("rn"),
        )
        .orderBy("rn")
    )
