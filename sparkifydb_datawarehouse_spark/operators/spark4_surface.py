"""Spark 4 API surface: native Arrow UDFs, SQL scripting
(BEGIN...END procedural blocks), and parameterized SQL.

These complete the UDF/SQL matrix next to row UDFs, pandas UDFs,
UDAFs, and UDTFs (operators/udfs.py, udtfs.py): the Arrow UDF is the
newest vectorized-Python tier (pyarrow arrays in/out — no pandas
conversion layer), SQL scripting is the multi-statement procedural
form the reference drives from Python loops (etl.py's statement
lists), and parameterized SQL is the injection-safe way to template
the SQL strings the reference interpolates at import time
(/root/reference/sql_queries.py:105-114 interpolates config into COPY
statements with % formatting — named parameters are the hardened
analog).

Scale posture: Arrow UDFs batch through the same Arrow channel as
pandas UDFs (vectorized, JVM<->Python per batch, still the slow path
vs built-ins); SQL scripting executes statement-at-a-time on the
driver like any multi-action pipeline; parameterized SQL is pure
plan-build sugar with zero runtime cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

import itertools

_VIEW_SEQ = itertools.count()  # unique temp-view name per call (a
# shared name could be redirected by a second call before collection)

# ---------------------------------------------------------------------------
# Native Arrow UDF — pyarrow in, pyarrow out.
# ---------------------------------------------------------------------------

_ORACLE_ARROW_UDF = """
SELECT l_orderkey AS order_key,
       l_linenumber AS line_number,
       CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)
           AS charge_cents
FROM lineitem
WHERE l_returnflag = 'R'
ORDER BY order_key, line_number
"""


@query("q_udf_arrow", oracle=_ORACLE_ARROW_UDF)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H charge formula as a native Arrow UDF: pyarrow.compute
    kernels on pa.Array batches — the same IEEE multiply chain as the
    SQL. Output is FLOOR-of-cents, not ROUND: engines' ROUND
    implementations disagree at exact half-boundaries (observed
    101226.8121 vs 101226.812 on identical doubles) while
    floor(double) is unambiguous. (A built-in expression is still the
    right production form — this registers the API tier and proves
    its numeric fidelity.)"""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    def _charge(price, discount, tax):
        return pc.multiply(
            pc.multiply(price, pc.subtract(pa.scalar(1.0), discount)),
            pc.add(pa.scalar(1.0), tax),
        )

    # real type objects, not strings: this module's `from __future__
    # import annotations` would stringify inline hints and arrow_udf
    # resolves hints at decoration time
    _charge.__annotations__ = {
        "price": pa.Array,
        "discount": pa.Array,
        "tax": pa.Array,
        "return": pa.Array,
    }
    charge = arrow_udf(_charge, "double")

    # range-first + sortWithinPartitions (optimization r13): the final
    # orderBy's bound sampling re-evaluated the Arrow UDF over every
    # surviving row a second time; equal l_orderkey values land in one
    # range partition, so the within-partition sort preserves the
    # declared (order_key, line_number) order globally
    li = load_table(spark, sf_dir, "lineitem").repartitionByRange(
        spark.sparkContext.defaultParallelism, "l_orderkey"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.floor(
                charge("l_extendedprice", "l_discount", "l_tax") * 100
            ).alias("charge_cents"),
        )
        .sortWithinPartitions("order_key", "line_number")
    )


# ---------------------------------------------------------------------------
# SQL scripting — BEGIN ... END with DECLAREd variables.
# ---------------------------------------------------------------------------

_ORACLE_SCRIPTING = """
SELECT o_orderstatus AS order_status,
       CAST(COUNT(*) AS BIGINT) AS n_big_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_totalprice > (SELECT 1.5 * AVG(o_totalprice) FROM orders)
GROUP BY o_orderstatus
ORDER BY order_status
"""


@query("q_sql_scripting", oracle=_ORACLE_SCRIPTING)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL: DECLARE a threshold from one statement, use it
    in the next — the scalar-subquery plan split into explicit steps
    (what the reference does from Python, expressed in SQL itself).
    The script's last statement is the returned result."""
    view = f"_script_orders_{next(_VIEW_SEQ)}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        BEGIN
          DECLARE big_threshold DOUBLE DEFAULT 0;
          SET big_threshold = (SELECT 1.5 * AVG(o_totalprice) FROM {view});
          SELECT o_orderstatus AS order_status,
                 COUNT(*) AS n_big_orders,
                 ROUND(SUM(o_totalprice), 2) AS total_price
          FROM {view}
          WHERE o_totalprice > big_threshold
          GROUP BY o_orderstatus
          ORDER BY order_status;
        END
        """
    )


# ---------------------------------------------------------------------------
# Parameterized SQL — named parameters instead of string interpolation.
# ---------------------------------------------------------------------------

_ORACLE_PARAMETERIZED = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
WHERE event_type IN ('click', 'purchase') AND value >= 10.0
GROUP BY event_type
ORDER BY event_type
"""


@query("q_sql_parameterized", oracle=_ORACLE_PARAMETERIZED)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"_param_events_{next(_VIEW_SEQ)}"
    load_table(spark, sf_dir, "events").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM {view}
        WHERE event_type IN (:a, :b) AND value >= :minv
        GROUP BY event_type
        ORDER BY event_type
        """,
        args={"a": "click", "b": "purchase", "minv": 10.0},
    )


# ---------------------------------------------------------------------------
# SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr) — the LAST row of
# the UDF matrix (row-Python, pandas, Arrow, UDAF, UDTF, SQL). Unlike
# every Python tier, a SQL UDF INLINES into the plan: the body lands
# in the Project as a plain CASE expression, stays in whole-stage
# codegen, and keeps column pruning — the physical plan is identical
# to hand-written SQL, making this the zero-cost abstraction tier.
# ---------------------------------------------------------------------------

_ORACLE_SQL_UDF = """
SELECT CASE WHEN o_totalprice > 100000 THEN 'high'
            WHEN o_totalprice > 10000 THEN 'mid'
            ELSE 'low' END AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY tier
ORDER BY tier
"""


@query("q_sql_udf", oracle=_ORACLE_SQL_UDF)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value tiering through a declared SQL scalar function.

    The function body inlines at plan time (verified: the Project
    carries the CASE directly and the scan reads the single column) —
    so unlike q_udf_scalar/q_udf_pandas/q_udf_arrow there is no
    serialization boundary at any scale; this is the tier to reach
    for FIRST when the logic is expressible in SQL.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_sql_udf_orders"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_tier(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p > 100000 THEN 'high' "
        "WHEN p > 10000 THEN 'mid' ELSE 'low' END"
    )
    return spark.sql(
        """
        SELECT order_tier(o_totalprice) AS tier,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue_cents
        FROM _sql_udf_orders
        GROUP BY order_tier(o_totalprice)
        ORDER BY tier
        """
    )


# ---------------------------------------------------------------------------
# SQL TABLE function (CREATE FUNCTION ... RETURNS TABLE) — a declared
# date-spine generator used FROM-position, the SQL-native way to
# densify a calendar (every reporting stack needs one; the reference's
# time dimension at sql_queries.py:161-173 is this spine's
# materialized cousin). Like the scalar SQL UDF, the body inlines:
# the plan shows the explode(sequence(...)) directly.
# ---------------------------------------------------------------------------

_ORACLE_SQL_TABLE_FN = """
WITH bounds AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS s,
           MAX(CAST(o_orderdate AS DATE)) AS e
    FROM orders
), spine AS (
    SELECT UNNEST(generate_series(s, e, INTERVAL 1 DAY))::DATE AS day
    FROM bounds
), daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS cents
    FROM orders GROUP BY day
)
SELECT date_trunc('month', sp.day)::DATE AS month,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN d.cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_days,
       CAST(COALESCE(SUM(d.cents), 0) AS BIGINT) AS revenue_cents
FROM spine sp LEFT JOIN daily d ON d.day = sp.day
GROUP BY month
ORDER BY month
"""


@query("q_sql_table_function", oracle=_ORACLE_SQL_TABLE_FN)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue over a DENSE calendar from a declared SQL
    table function — days with no orders are counted, not silently
    absent (the q_rolling_distinct_users contract gap, closed the
    SQL-native way).

    The spine is calendar-sized (thousands of rows at any data
    scale), broadcast onto the daily aggregate; the fact table folds
    to per-day cents BEFORE the join, so the left join and the month
    rollup never see fact-volume rows.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_sql_tfn_orders"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION date_spine(s DATE, e DATE) "
        "RETURNS TABLE(day DATE) "
        "RETURN SELECT explode(sequence(s, e)) AS day"
    )
    return spark.sql(
        """
        WITH bounds AS (
            SELECT MIN(CAST(o_orderdate AS DATE)) AS s,
                   MAX(CAST(o_orderdate AS DATE)) AS e
            FROM _sql_tfn_orders
        ),
        spine AS (
            SELECT day FROM bounds, LATERAL date_spine(bounds.s, bounds.e)
        ),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS cents
            FROM _sql_tfn_orders GROUP BY day
        )
        SELECT CAST(date_trunc('month', sp.day) AS DATE) AS month,
               COUNT(*) AS n_days,
               SUM(CASE WHEN d.cents IS NULL THEN 1 ELSE 0 END) AS n_zero_days,
               CAST(COALESCE(SUM(d.cents), 0) AS BIGINT) AS revenue_cents
        FROM spine sp LEFT JOIN daily d ON d.day = sp.day
        GROUP BY CAST(date_trunc('month', sp.day) AS DATE)
        ORDER BY month
        """
    )


# ---------------------------------------------------------------------------
# mapInArrow (round 4) — the last cell of the Python-execution matrix
# (row UDF → pandas UDF → arrow_udf scalar → UDAF → UDTF →
# mapInPandas/applyInPandas → mapInArrow): a partition-level iterator
# of pyarrow RecordBatches, zero pandas materialization — the lowest-
# overhead Python tier for batch-shaped work (no index, no block
# consolidation, columns stay Arrow buffers end to end). Same
# discipline as q_udf_arrow: integer-cents output so the cross-engine
# compare is exact.
# ---------------------------------------------------------------------------

_ORACLE_MAP_IN_ARROW = """
SELECT l_returnflag AS return_flag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS net_cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY return_flag
"""


@query("q_map_in_arrow", oracle=_ORACLE_MAP_IN_ARROW)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-price cents via mapInArrow: pyarrow.compute kernels over
    RecordBatch iterators (floor-of-cents — unambiguous across
    engines, the q_udf_arrow rule), then a plain hash agg. The
    per-batch transform emits only (return_flag, net_cents) — the
    Arrow tier's analog of 'shuffle features, not payloads'."""
    from ..tables import load_table

    def _net(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            net = pc.floor(
                pc.multiply(
                    pc.multiply(
                        batch.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                    ),
                    pa.scalar(100.0),
                )
            ).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_returnflag"), net],
                names=["return_flag", "net_cents"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    per_row = li.mapInArrow(_net, "return_flag string, net_cents long")
    return (
        per_row.groupBy("return_flag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("net_cents").cast("long").alias("net_cents"),
        )
        .orderBy("return_flag")
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4.0 `|>` operators, public SQL-pipe proposal
# adopted from GoogleSQL): the linear FROM -> WHERE -> AGGREGATE ->
# ORDER BY form of the classic pricing-summary aggregation. Pure
# syntax — the optimizer sees the identical logical plan, so the
# oracle is the ANSI formulation and the value hash proves the two
# parse to the same computation.
# ---------------------------------------------------------------------------

_ORACLE_SQL_PIPE = """
SELECT l_returnflag AS return_flag,
       l_linestatus AS line_status,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY return_flag, line_status
"""


@query("q_sql_pipe", oracle=_ORACLE_SQL_PIPE)
def sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"_pipe_lineitem_{next(_VIEW_SEQ)}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        FROM {view}
        |> WHERE l_shipdate <= DATE '1998-09-01'
        |> AGGREGATE COUNT(*) AS n_lines,
                     ROUND(SUM(l_quantity), 2) AS sum_qty,
                     ROUND(SUM(l_extendedprice), 2) AS sum_price
           GROUP BY l_returnflag AS return_flag, l_linestatus AS line_status
        |> ORDER BY return_flag, line_status
        """
    )


# ---------------------------------------------------------------------------
# String collation (Spark 4.0): case-insensitive grouping via
# COLLATE UTF8_LCASE instead of the LOWER()-wrapping idiom. The
# fixture's lang codes are case-uniform, so even doc_ids are
# upper-cased in-query to plant guaranteed case collisions; the
# collated GROUP BY must merge them. Output labels go through LOWER()
# — every member of an LCASE group lowercases to the same string, so
# the emitted value is deterministic even though which member the
# engine picks as group representative is not. Oracle: the LOWER()
# formulation (UTF8_LCASE equality IS lowercase equality).
# ---------------------------------------------------------------------------

_ORACLE_COLLATION = """
SELECT LOWER(CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END) AS lang_ci,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY 1
ORDER BY lang_ci
"""


@query("q_collation_groupby", oracle=_ORACLE_COLLATION)
def collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"_collate_docs_{next(_VIEW_SEQ)}"
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT LOWER(k) AS lang_ci,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS first_doc
        FROM (
            SELECT CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END
                       COLLATE UTF8_LCASE AS k,
                   doc_id
            FROM {view}
        )
        GROUP BY k
        ORDER BY lang_ci
        """
    )
