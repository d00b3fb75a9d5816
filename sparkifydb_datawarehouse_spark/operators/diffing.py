"""Snapshot diff — classify every key between two table versions as
added / removed / changed.

The reference's pipeline is drop-and-reload
(/root/reference/create_tables.py:12-44 + etl.py): it can never say
WHAT changed between loads. A warehouse operating incrementally needs
exactly that — the diff drives incremental publication, cache
invalidation, and reconciliation reports. (The companion operator
`q_merge_upsert` APPLIES changes; this one DETECTS them.)

The second snapshot is derived deterministically from `orders` (drop
keys ≡ 0 mod 13, bump price on keys ≡ 1 mod 7, add shifted-key rows)
so the diff is oracle-checkable.

Scale design (100 TB): one full-outer join on the key — the minimal
information-complete comparison. The `changed` test compares a single
xxhash64 over the value columns computed BEFORE the join (map-side),
so the join carries (key, 64-bit hash) per side, never the wide rows;
at 100 TB the shuffle is keys+hashes only. With both snapshots
bucketed on the key the join is shuffle-free. (Cross-engine note: the
hash must only be EQUAL-OR-NOT per engine, so each side may use its
own hash function — the oracle compares the value columns directly.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    old = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = (
        old.filter(F.col("o_orderkey") % 13 != 0)  # deletions
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 1, F.round(F.col("o_totalprice") * 1.1, 2)
            ).otherwise(F.col("o_totalprice")),  # updates
        )
        .unionAll(
            old.filter(F.col("o_orderkey") % 17 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )  # insertions
        )
    )
    return old, new


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """(key, change) for every key whose state differs; change in
    {'added','removed','changed'}. Unchanged keys produce no row."""
    vals = [c for c in old.columns if c != key]
    o = old.select(key, F.xxhash64(*vals).alias("h_old"))
    n = new.select(key, F.xxhash64(*vals).alias("h_new"))
    j = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
    )
    return (
        j.select(F.col(key), change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


_ORACLE_DIFF = """
WITH old AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
), new AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 1 THEN ROUND(o_totalprice * 1.1, 2)
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % 13 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 17 = 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_totalprice <> n.o_totalprice
              OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
       END AS change
FROM old o FULL OUTER JOIN new n USING (o_orderkey)
WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
           WHEN n.o_orderkey IS NULL THEN 'removed'
           WHEN o.o_totalprice <> n.o_totalprice
             OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
      END IS NOT NULL
ORDER BY o_orderkey
"""


@query("q_table_diff", oracle=_ORACLE_DIFF)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _snapshots(spark, sf_dir)
    return snapshot_diff(old, new, "o_orderkey").orderBy("o_orderkey")
