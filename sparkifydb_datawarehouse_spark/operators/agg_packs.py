"""Aggregate-function packs: boolean, bitwise, and ordered-string
aggregation — the long tail of the SQL aggregate surface beyond the
SUM/COUNT/MIN/MAX the reference's README explicitly designs around
avoiding (/root/reference/README.md:13-15).

All three are single hash aggregations (one shuffle, map-side
combined); the only scale consideration is in the string pack, where
collect_set is bounded by the tiny status/priority domain — an
unbounded-domain listagg would instead need a capped
slice(sort_array(...)) to keep per-group state finite at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# Boolean aggregates: bool_and / bool_or / count_if per group.
# ---------------------------------------------------------------------------

_ORACLE_BOOL = """
SELECT l_returnflag AS return_flag,
       bool_and(l_discount < 0.10) AS all_small_discount,
       bool_or(l_quantity > 45)    AS any_bulk,
       CAST(count_if(l_tax = 0)  AS BIGINT) AS n_tax_free,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY return_flag
"""


@query("q_agg_boolean", oracle=_ORACLE_BOOL)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.bool_and(F.col("l_discount") < 0.10).alias("all_small_discount"),
            F.bool_or(F.col("l_quantity") > 45).alias("any_bulk"),
            F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("return_flag")
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates: bit_and / bit_or / bit_xor per group. The xor
# aggregate is the interesting one operationally — it's the classic
# "find the unpaired element" / set-reconciliation primitive, and all
# three are order-independent, so they combine map-side like any sum.
# ---------------------------------------------------------------------------

_ORACLE_BITS = """
SELECT l_linestatus AS line_status,
       bit_and(l_partkey) AS key_bits_and,
       bit_or(l_partkey)  AS key_bits_or,
       bit_xor(l_partkey) AS key_bits_xor
FROM lineitem
GROUP BY l_linestatus
ORDER BY line_status
"""


@query("q_agg_bitwise", oracle=_ORACLE_BITS)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(
            F.bit_and("l_partkey").alias("key_bits_and"),
            F.bit_or("l_partkey").alias("key_bits_or"),
            F.bit_xor("l_partkey").alias("key_bits_xor"),
        )
        .orderBy("line_status")
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg): the distinct
# statuses seen per order priority, sorted then joined — sorting
# before concatenation is what makes the result deterministic and
# engine-portable (plain listagg order is execution-dependent in
# every engine).
# ---------------------------------------------------------------------------

_ORACLE_STRAGG = """
SELECT o_orderpriority AS priority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@query("q_agg_string", oracle=_ORACLE_STRAGG)
def agg_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("o_orderstatus"))
            ).alias("statuses"),
            F.count_distinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Percent-of-total contribution: each nation's share of global
# revenue. The altitude rule this encodes: compute the window over
# the AGGREGATED result (25 rows), never over raw lineitem — a
# global window frame on the fact table would funnel 100 TB through
# one partition.
# ---------------------------------------------------------------------------

_ORACLE_PCT_TOTAL = """
WITH rev AS (
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
SELECT nation, revenue,
       ROUND(100 * revenue / SUM(revenue) OVER (), 4) AS pct_of_total
FROM rev
ORDER BY revenue DESC, nation
"""


@query("q_percent_of_total", oracle=_ORACLE_PCT_TOTAL)
def percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by supplier nation with each nation's share of the
    grand total.

    The empty-partition window (`SUM() OVER ()`) IS a single-partition
    sort-free exchange — harmless here because its input is the
    25-row aggregate, catastrophic if applied to the fact table.
    Shares are computed from the ROUNDED per-group revenues so both
    engines divide identical doubles (ORACLES.md ROUND discipline).
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "nation",
        "revenue",
        F.round(F.lit(100) * F.col("revenue") / F.sum("revenue").over(w), 4).alias(
            "pct_of_total"
        ),
    ).orderBy(F.col("revenue").desc(), "nation")


# ---------------------------------------------------------------------------
# Arg-extrema pack — "WHICH row achieves the group's max/min": the
# lexicographic struct-extremum (C69's OHLC pattern generalized).
# Engines' native arg_max/max_by leave tie-breaking unspecified, so
# both sides take MIN/MAX over a (key, tiebreak, payload) struct —
# mergeable partial agg, deterministic under ties, one exchange.
# ---------------------------------------------------------------------------

_ORACLE_ARG_EXTREMA = """
SELECT n.n_name AS nation,
       (MAX({'b': s.s_acctbal, 'k': s.s_suppkey, 'nm': s.s_name})).nm AS richest_supplier,
       ROUND((MAX({'b': s.s_acctbal, 'k': s.s_suppkey, 'nm': s.s_name})).b, 2) AS richest_balance,
       (MIN({'b': s.s_acctbal, 'k': s.s_suppkey, 'nm': s.s_name})).nm AS poorest_supplier,
       ROUND((MIN({'b': s.s_acctbal, 'k': s.s_suppkey, 'nm': s.s_name})).b, 2) AS poorest_balance,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
"""


@query("q_agg_arg_extrema", oracle=_ORACLE_ARG_EXTREMA)
def agg_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    key = F.struct(
        F.col("s_acctbal").alias("b"),
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("nm"),
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max(key).alias("mx"),
            F.min(key).alias("mn"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .select(
            "nation",
            F.col("mx.nm").alias("richest_supplier"),
            F.round(F.col("mx.b"), 2).alias("richest_balance"),
            F.col("mn.nm").alias("poorest_supplier"),
            F.round(F.col("mn.b"), 2).alias("poorest_balance"),
            "n_suppliers",
        )
        .orderBy("nation")
    )
