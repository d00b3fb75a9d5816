"""Column masking + row-level security — the governed-view operator.

The reference exposes raw tables to every consumer (no GRANTs beyond
cluster login, /root/reference/sql_queries.py has no ACL DDL); any
shared warehouse adds a governed layer: deterministic pseudonyms for
identifiers (joinable but not reversible), generalized quantities
(bucketed balances), suppressed quasi-identifiers, and row-level
filters per consumer scope. This operator materializes that view for
the `customer` table; the text-side counterpart is
`q_text_pii_scrub` (regex redaction inside documents).

Design rules it encodes:
- Pseudonym = md5(key + salt): DETERMINISTIC so downstream joins on
  the masked key still work across tables masked with the same salt,
  non-invertible without the salt. (Portable md5 keeps the oracle
  exact; production swaps in SHA-2/HMAC — same plan.)
- Generalization, not noise, for numerics: balances collapse to
  500-wide buckets so aggregates stay meaningful.
- Row-level security is a pushed-down predicate (scan-level filter,
  prunes at the source) — not post-hoc deletion.
- Map-only: zero shuffles; masking never becomes the bottleneck of
  whatever query consumes the view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_SALT = "governance-salt-v1"
_SCOPE_SEGMENT = "BUILDING"  # the consumer's row-level entitlement


_ORACLE_MASKED = f"""
SELECT md5(c_custkey::VARCHAR || '{_SALT}') AS cust_pseudo,
       c_mktsegment AS segment,
       CAST(FLOOR(c_acctbal / 500.0) * 500 AS BIGINT) AS acctbal_bucket,
       c_nationkey AS nation_key
FROM customer
WHERE c_mktsegment = '{_SCOPE_SEGMENT}'
ORDER BY cust_pseudo
"""


@query("q_masked_view", oracle=_ORACLE_MASKED)
def masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pseudo = F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(_SALT)))
    bucket = (F.floor(F.col("c_acctbal") / 500.0) * 500).cast("long")
    return (
        c.filter(F.col("c_mktsegment") == _SCOPE_SEGMENT)  # RLS predicate
        .select(
            pseudo.alias("cust_pseudo"),
            F.col("c_mktsegment").alias("segment"),
            bucket.alias("acctbal_bucket"),
            F.col("c_nationkey").alias("nation_key"),
            # c_name deliberately absent: suppression of the direct
            # identifier is part of the view contract
        )
        .orderBy("cust_pseudo")
    )
