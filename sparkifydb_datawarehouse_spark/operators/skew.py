"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py); salting is the explicit, planner-independent
form — required when a single key's rows exceed one executor's memory
or when AQE can't see the skew (e.g. skew introduced by an upstream
expression). Both operators here produce results IDENTICAL to their
unsalted forms (oracle-checked) — salting changes the shuffle layout,
never the semantics.

How it scales: a hot key that would send 10^9 rows to ONE reduce task
is spread over N_SALTS tasks; the small side is replicated N_SALTS
times (broadcast-sized dims make this replication free in practice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

N_SALTS = 8


def _salt(col: Column) -> Column:
    """Deterministic salt in [0, N_SALTS) derived from a row-unique
    column (hash-based, stable across runs)."""
    return F.pmod(F.xxhash64(col), F.lit(N_SALTS))


def salted_aggregate(
    df: DataFrame, key: str, salt_source: str, aggs: dict[str, str]
) -> DataFrame:
    """Two-stage aggregation: partial agg on (key, salt), final merge
    on key. Exact for algebraic aggregates (sum/count/min/max)."""
    partial = df.withColumn("_salt", _salt(F.col(salt_source))).groupBy(key, "_salt")
    partial_df = partial.agg(
        F.sum(aggs["sum"]).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial_df.groupBy(key).agg(
        F.sum("_psum").alias("total_value"), F.sum("_pcnt").alias("n_rows")
    )


_ORACLE_SALTED_AGG = """
SELECT event_type,
       ROUND(SUM(value), 2) AS total_value,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_agg_salted", oracle=_ORACLE_SALTED_AGG)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-cardinality group key (5 event types over every row — the
    classic reduce-skew shape), aggregated via the two-stage salted
    pattern; result must equal the plain GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(ev, "event_type", "event_id", {"sum": "value"})
    return out.select(
        "event_type", F.round("total_value", 2).alias("total_value"), "n_rows"
    ).orderBy("event_type")


def salted_join(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str, salt_source: str
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    N_SALTS times, joining on (key, salt). Semantics identical to the
    plain join."""
    big_salted = big.withColumn("_salt", _salt(F.col(salt_source)))
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return big_salted.join(
        small_replicated,
        (F.col(big_key) == F.col(small_key)) & (big_salted._salt == small_replicated._salt),
    ).drop("_salt")


_ORACLE_SALTED_JOIN = """
SELECT e.event_id,
       e.event_type,
       t.type_code
FROM events e
JOIN (
    SELECT event_type AS t_event_type,
           CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS type_code
    FROM (SELECT DISTINCT event_type FROM events)
) t ON e.event_type = t.t_event_type
ORDER BY event_id
"""


@query("q_join_salted", oracle=_ORACLE_SALTED_JOIN)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ 5-row dim on the maximally-skewed event_type key (each
    key ~20% of all rows), via the salted pattern."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct()
        .select(
            F.col("event_type").alias("t_event_type"),
            F.row_number()
            .over(Window.orderBy("event_type"))
            .cast("long")
            .alias("type_code"),
        )
    )
    return (
        salted_join(ev, dim, "event_type", "t_event_type", "event_id")
        .select("event_id", "event_type", "type_code")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# AQE skew-join demo (VERDICT r4 #6): the PLANNER-side complement to
# the manual salting above. The join key is planted maximally skewed —
# every even l_orderkey collapses onto k = 0, so one shuffle partition
# carries ~half the fact table — and the merge hint pins a sort-merge
# join (the shape AQE's OptimizeSkewedJoin acts on; a 97-row dim would
# otherwise broadcast and there'd be no skew to split). Under AQE with
# realistic thresholds the hot partition is split into advisory-sized
# sub-partitions with the dim side replicated per split — the
# runtime-replan equivalent of salted_join, with zero query rewrite.
# tests/test_plan_quality.py executes this query with the skew
# thresholds scaled down to fixture size and asserts `skew=true` is in
# the final adaptive plan; the value oracle holds under ANY session.
# The downstream aggregate groups on k_name (not the join key), so the
# join output's partitioning is never reused and the skew split costs
# no extra shuffle.
# ---------------------------------------------------------------------------

_N_SKEW_KEYS = 97

_ORACLE_SKEW_AQE = f"""
WITH big AS (
    SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0
                ELSE l_orderkey % {_N_SKEW_KEYS} END AS k,
           l_extendedprice
    FROM lineitem
),
dim AS (SELECT UNNEST(generate_series(0, {_N_SKEW_KEYS - 1})) AS k)
SELECT 'K' || CAST(d.k AS VARCHAR) AS k_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(b.l_extendedprice), 2) AS total_price
FROM big b JOIN dim d ON b.k = d.k
GROUP BY d.k
ORDER BY k_name
"""


@query("q_join_skew_aqe", oracle=_ORACLE_SKEW_AQE)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("l_orderkey") % _N_SKEW_KEYS)
        .alias("k"),
        "l_extendedprice",
    )
    dim = spark.range(0, _N_SKEW_KEYS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("K"), F.col("id").cast("string")).alias("k_name"),
    )
    return (
        big.join(dim.hint("merge"), "k")
        .groupBy("k_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("k_name")
    )
