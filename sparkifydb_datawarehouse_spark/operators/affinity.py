"""Market-basket affinity: brand co-occurrence, support / confidence /
lift — the association-rule layer over the order facts ("customers who
buy Brand#12 also buy Brand#34").

The reference (drpdr/sparkifydb-datawarehouse) carries the same
order/line-item star this analysis classically runs on; these are the
standard affinity rollups expressed warehouse-side.

100 TB shape — the classic trap here is the pair self-join on the fact
table (lineitem ⋈ lineitem ON same order = quadratic fan-out through a
shuffle). Instead:

1. collapse to DISTINCT (order, brand) — one map-side-combined shuffle,
   output bounded by |orders| × brands-per-order;
2. collect each order's brand set (sorted, bounded: an order touches at
   most |brands| ≈ 25 brands, by construction of the dimension);
3. generate unordered pairs INSIDE the array expression (flatten ∘
   transform — zero extra shuffle, codegen'd), then one pair-count
   aggregation.

The pair stream is Σ C(brands_per_order, 2) ≤ C(25,2)·|orders| — linear
in orders with a small constant, never quadratic in lineitems. Brand
marginals and the order total are tiny aggregates broadcast into the
final lift expression. All counts are integers; support/confidence/lift
are integer ratios → cross-engine deterministic doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_ORACLE_BASKET = """
WITH ob AS (
    SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_orders
    FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
    GROUP BY a.brand, b.brand
), marg AS (
    SELECT brand, COUNT(*) AS n_brand FROM ob GROUP BY brand
), tot AS (
    SELECT COUNT(DISTINCT okey) AS n_orders FROM ob
)
SELECT brand_a,
       brand_b,
       pair_orders,
       ROUND(pair_orders * 1.0 / n_orders, 6) AS support,
       ROUND(pair_orders * 1.0 / ma.n_brand, 6) AS confidence_a_to_b,
       ROUND(pair_orders * 1.0 * n_orders / (ma.n_brand * mb.n_brand), 4) AS lift
FROM pairs
JOIN marg ma ON ma.brand = pairs.brand_a
JOIN marg mb ON mb.brand = pairs.brand_b
CROSS JOIN tot
ORDER BY lift DESC, brand_a, brand_b
LIMIT 25
"""


@query("q_basket_pairs", oracle=_ORACLE_BASKET)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top brand pairs by lift across orders (support, confidence,
    lift). Pair generation is in-expression over each order's sorted
    distinct-brand array — one shuffle to collapse (order, brand), one
    to count pairs; the oracle's equivalent self-join spelling proves
    the arithmetic, the array spelling is the plan that survives 100 TB
    (see module docstring).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # (order, brand) is consumed FOUR times (pairs, both marginals, the
    # order total) — pin one materialization so the fact scan + distinct
    # shuffle run once, not per consumer (checkpoint() on a real cluster)
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        ob.groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("brands"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(brands, (x, i) -> "
                    "transform(slice(brands, i + 2, size(brands)), "
                    "y -> struct(x AS brand_a, y AS brand_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.brand_a", "p.brand_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    marg = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n_brand"))
    tot = ob.agg(F.countDistinct("okey").alias("n_orders"))
    ma = marg.select(F.col("brand").alias("brand_a"), F.col("n_brand").alias("na"))
    mb = marg.select(F.col("brand").alias("brand_b"), F.col("n_brand").alias("nb"))
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(F.col("pair_orders") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("pair_orders") / F.col("na"), 6).alias("confidence_a_to_b"),
            F.round(
                F.col("pair_orders") * F.col("n_orders") / (F.col("na") * F.col("nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(25)
    )
