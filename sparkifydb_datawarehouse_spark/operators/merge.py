"""MERGE / upsert — the warehouse maintenance pattern the reference
sidesteps (its ELT is drop-and-rebuild: create_tables.py drops all 7
tables every run). Without a transactional table format, upsert on
parquet is re-materialization: full-outer-join target with source and
coalesce per column — the engine-level semantics of MERGE WHEN
MATCHED UPDATE / WHEN NOT MATCHED INSERT.

Scale notes: this is one shuffle join on the merge key; with a Delta/
Iceberg table format the same logical MERGE prunes to touched files.
The pattern here is format-agnostic and what a 100 TB rebuild-style
pipeline actually executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def merge_upsert(target: DataFrame, source: DataFrame, key: str, columns: list[str]) -> DataFrame:
    """Rows from source win on key collision; target rows without a
    source match survive; source rows without a target match insert."""
    t = target.select(F.col(key).alias("_t_key"), *[F.col(c).alias(f"_t_{c}") for c in columns])
    s = source.select(F.col(key).alias("_s_key"), *[F.col(c).alias(f"_s_{c}") for c in columns])
    joined = t.join(s, t._t_key == s._s_key, "full")
    return joined.select(
        F.coalesce(s._s_key, t._t_key).alias(key),
        *[
            F.coalesce(F.col(f"_s_{c}"), F.col(f"_t_{c}")).alias(c)
            for c in columns
        ],
    )


_ORACLE_MERGE = """
WITH source AS (
    SELECT c_custkey, c_name, ROUND(c_acctbal * 1.1, 2) AS c_acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 9000000 + c_custkey AS c_custkey, 'new customer' AS c_name, 0.0 AS c_acctbal
    FROM customer WHERE c_custkey <= 5
)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS cust_key,
       COALESCE(s.c_name, t.c_name) AS cust_name,
       ROUND(COALESCE(s.c_acctbal, t.c_acctbal), 2) AS acct_bal
FROM customer t
FULL JOIN source s ON t.c_custkey = s.c_custkey
ORDER BY cust_key
"""


@query("q_merge_upsert", oracle=_ORACLE_MERGE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target: customer. Source: +10% balances for the BUILDING segment
    (updates) plus five synthetic new customers (inserts)."""
    customer = load_table(spark, sf_dir, "customer")
    updates = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 1.1, 2).alias("c_acctbal"),
    )
    inserts = customer.filter(F.col("c_custkey") <= 5).select(
        (F.col("c_custkey") + 9000000).alias("c_custkey"),
        F.lit("new customer").alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    source = updates.unionAll(inserts)
    merged = merge_upsert(customer, source, "c_custkey", ["c_name", "c_acctbal"])
    return merged.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.round("c_acctbal", 2).alias("acct_bal"),
    ).orderBy("cust_key")
