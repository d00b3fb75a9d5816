"""CDC apply — collapse a change-data-capture log (I/U/D ops) into
final table state.

The reference's pipeline is pure full-reload ELT (truncate-and-copy,
/root/reference/etl.py:10-50); a warehouse ingesting the same data
incrementally receives a change log instead and must fold it: for
each key keep the LATEST change, and drop the key entirely if that
latest change is a delete. This is the canonical "apply CDC to a
snapshot" operator (Debezium/DMS-shaped input).

The fixture has no op-coded table, so the change log is DERIVED
deterministically from `orders`: key = o_custkey, change-ordering =
(o_orderdate, o_orderkey), op = a fixed function of o_orderkey. That
keeps the operator oracle-checkable — DuckDB derives the identical
log and folds it with window functions.

Scale design (100 TB): implemented as ONE hash aggregation with
`max_by(payload_struct, seq_struct)` — partial aggregation collapses
each map partition to one candidate row per key before the shuffle,
so the shuffle carries |keys| rows, not |changes|. The window-function
formulation (row_number + filter rn=1) the oracle uses would shuffle
EVERY change row and sort within key — correct, but strictly worse;
max_by is the form that survives a billion-row daily change feed.
Deletes must be folded AFTER picking the latest change (a delete
followed by re-insert resurrects the key), which is why op rides
inside the max_by payload rather than being pre-filtered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def _change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → deterministic CDC stream: (key, seq, op, payload)."""
    o = load_table(spark, sf_dir, "orders")
    op = (
        F.when(F.col("o_orderkey") % 11 == 0, "D")
        .when(F.col("o_orderkey") % 3 == 0, "I")
        .otherwise("U")
    )
    return o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("seq_ts"),
        F.col("o_orderkey").alias("seq_id"),
        op.alias("op"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )


def apply_cdc(changes: DataFrame) -> DataFrame:
    """Fold a keyed change log into final state: latest change wins;
    a latest-change delete removes the key. One shuffle, partial-agg
    combined (see module docstring)."""
    latest = F.max_by(
        F.struct("op", "price", "status"), F.struct("seq_ts", "seq_id")
    ).alias("last")
    return (
        changes.groupBy("key")
        .agg(latest, F.count(F.lit(1)).alias("n_changes"))
        .filter(F.col("last.op") != "D")
        .select(
            "key",
            F.col("last.op").alias("last_op"),
            F.col("last.price").alias("last_price"),
            F.col("last.status").alias("last_status"),
            "n_changes",
        )
    )


_ORACLE_CDC = """
WITH changes AS (
    SELECT o_custkey AS key,
           o_orderdate AS seq_ts,
           o_orderkey AS seq_id,
           CASE WHEN o_orderkey % 11 = 0 THEN 'D'
                WHEN o_orderkey % 3 = 0 THEN 'I'
                ELSE 'U' END AS op,
           o_totalprice AS price,
           o_orderstatus AS status
    FROM orders
), ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY key
                              ORDER BY seq_ts DESC, seq_id DESC) AS rn,
           COUNT(*) OVER (PARTITION BY key) AS n_changes
    FROM changes
)
SELECT key, op AS last_op, price AS last_price, status AS last_status,
       n_changes
FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY key
"""


@query("q_cdc_apply", oracle=_ORACLE_CDC)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return apply_cdc(_change_log(spark, sf_dir)).orderBy("key")
