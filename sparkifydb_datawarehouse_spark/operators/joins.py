"""B6-B7: outer / semi / anti / broadcast / range joins.

The reference only uses inner equi-joins (/root/reference/
sql_queries.py:128-130,147-149); the engine provides the full join
surface (SURVEY §2 B6-B7).

Scale notes:
- left/full outer: same shuffle plan as inner; AQE skew-join splits
  hot keys. A full outer cannot broadcast either side.
- left_semi/left_anti: the Spark-native forms of EXISTS / NOT EXISTS —
  build side holds only the key set (much smaller than a join+distinct).
- broadcast: explicit F.broadcast pins the strategy for dims known to
  be small (nation: 25 rows — at ANY scale factor); without the hint,
  AQE decides from runtime stats.
- range/theta: expressed as equi-join + residual range predicate, so
  the hash join still applies and the range term is evaluated as a
  post-join filter — the scalable form of a theta join. A pure
  (no-equi-key) range join degenerates to broadcast-nested-loop;
  avoid at scale or bucketize the range into an equi key first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# B6 — left outer join (customers keep rows with no orders; null fill).
# ---------------------------------------------------------------------------

_ORACLE_LEFT = """
SELECT c.c_custkey AS cust_key,
       c.c_mktsegment AS segment,
       o.o_orderkey AS order_key,
       o.o_totalprice AS total_price
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
ORDER BY cust_key, order_key
"""


@query("q_join_left", oracle=_ORACLE_LEFT)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left")
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
        )
        # no trailing sort: full-result parity query, the driver/oracle
        # compare is order-insensitive — a global sort of a join-sized
        # result would be paid cost with no consumer (VERDICT r3).
    )


# ---------------------------------------------------------------------------
# B6 — full outer join between two derived key-sets.
# ---------------------------------------------------------------------------

_ORACLE_FULL = """
SELECT f.cust_key AS f_cust, r.cust_key AS r_cust
FROM (SELECT DISTINCT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'F') f
FULL OUTER JOIN
     (SELECT DISTINCT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'O') r
ON f.cust_key = r.cust_key
ORDER BY f_cust NULLS FIRST, r_cust NULLS FIRST
"""


@query("q_join_full", oracle=_ORACLE_FULL)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    finished = (
        o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("cust_key")).distinct()
    )
    open_ = (
        o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("cust_key")).distinct()
    )
    return (
        finished.alias("f")
        .join(open_.alias("r"), F.col("f.cust_key") == F.col("r.cust_key"), "full")
        .select(F.col("f.cust_key").alias("f_cust"), F.col("r.cust_key").alias("r_cust"))
        # no trailing sort: order-insensitive parity compare (VERDICT r3)
    )


# ---------------------------------------------------------------------------
# B6 — left semi (EXISTS) / left anti (NOT EXISTS).
# ---------------------------------------------------------------------------

_ORACLE_SEMI = """
SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acct_bal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
ORDER BY cust_key
"""


@query("q_join_semi", oracle=_ORACLE_SEMI)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acct_bal"),
        )
        # no trailing sort: order-insensitive parity compare (VERDICT r3)
    )


_ORACLE_ANTI = """
SELECT c_custkey AS cust_key, c_name AS cust_name
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
)
ORDER BY cust_key
"""


@query("q_join_anti", oracle=_ORACLE_ANTI)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # 'P' (in-progress) is the rare status → the anti set is non-empty at
    # every SF, unlike "customers with no orders at all" (empty even at sf0.001)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name"))
        # no trailing sort: order-insensitive parity compare (VERDICT r3)
    )


# ---------------------------------------------------------------------------
# B7 — explicit broadcast join (nation is 25 rows at every SF — broadcast
# is correct at 100 TB, not just in tests).
# ---------------------------------------------------------------------------

_ORACLE_BROADCAST = """
SELECT n.n_name AS nation_name,
       COUNT(*) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation_name
"""


@query("q_join_broadcast", oracle=_ORACLE_BROADCAST)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------------------
# B7 — range predicate riding on an equi-join (theta join, scalable form:
# hash join on the equi key + residual range filter).
# ---------------------------------------------------------------------------

_ORACLE_RANGE = """
SELECT l.l_orderkey AS order_key,
       l.l_linenumber AS line_number,
       p.p_partkey AS part_key,
       l.l_quantity AS quantity,
       p.p_size AS part_size
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
ORDER BY order_key, line_number
"""


@query("q_join_range", oracle=_ORACLE_RANGE)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size))
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("p_partkey").alias("part_key"),
            F.col("l_quantity").alias("quantity"),
            F.col("p_size").alias("part_size"),
        )
        # no trailing sort: order-insensitive parity compare (VERDICT r3)
    )


# ---------------------------------------------------------------------------
# NULL-safe equality join (<=> / IS NOT DISTINCT FROM): standard
# equality drops every NULL key pair (NULL = NULL is NULL); entity
# resolution and CDC key matching usually want NULLs to MATCH EACH
# OTHER instead. The semantic corner matters at scale for a second
# reason: a null-heavy key under null-safe semantics concentrates ALL
# null rows into one hash bucket — the canonical skew key — so
# production plans pre-split or filter the null class explicitly.
# ---------------------------------------------------------------------------

_ORACLE_NULL_SAFE = """
WITH a AS (
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
    FROM customer WHERE c_custkey % 2 = 0
), b AS (
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer WHERE c_custkey % 3 = 0
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       COALESCE(a.seg, '<null>') AS seg
FROM a JOIN b
  ON a.seg IS NOT DISTINCT FROM b.seg
 AND a.c_custkey < b.c_custkey
 AND b.c_custkey - a.c_custkey <= 4
ORDER BY cust_a, cust_b
"""


@query("q_join_null_safe", oracle=_ORACLE_NULL_SAFE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe segment match between two customer slices (BUILDING
    nulled out to create a NULL key class); the key-distance residual
    keeps the output bounded. eqNullSafe is Spark's <=>."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    a = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("cust_a"), seg.alias("seg_a")
    )
    b = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("cust_b"), seg.alias("seg_b")
    )
    return (
        a.join(
            b,
            F.col("seg_a").eqNullSafe(F.col("seg_b"))
            & (F.col("cust_a") < F.col("cust_b"))
            & (F.col("cust_b") - F.col("cust_a") <= 4),
        )
        .select(
            "cust_a",
            "cust_b",
            F.coalesce("seg_a", F.lit("<null>")).alias("seg"),
        )
        .orderBy("cust_a", "cust_b")
    )
