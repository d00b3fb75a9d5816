"""Cost-based-optimizer posture: table + column statistics collection
(ANALYZE TABLE) and their visibility to planning.

At 100 TB, statistics are what let Catalyst choose broadcast vs
sort-merge and reorder multi-way joins; a warehouse without ANALYZE is
planning blind. The reference's analog is Redshift's automatic table
statistics (it runs ANALYZE implicitly after COPY); here the contract
is explicit and tested: stats are collected per table/column, survive
in the catalog, and the optimizer's cardinality estimates pick them up
when CBO is enabled.
"""

from __future__ import annotations

import shutil

import pytest

from sparkifydb_datawarehouse_spark.tables import load_table

TABLES = ("cbo_orders", "cbo_customer")


def _cleanup(spark):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_analyze_statistics_feed_cbo(spark, sf_dir):
    _cleanup(spark)
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
        "cbo_orders"
    )
    load_table(spark, sf_dir, "customer").write.mode("overwrite").saveAsTable(
        "cbo_customer"
    )
    try:
        for t in TABLES:
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")

        # table-level stats in the catalog (row count + size)
        stat_row = (
            spark.sql("DESCRIBE TABLE EXTENDED cbo_orders")
            .filter("col_name = 'Statistics'")
            .collect()
        )
        assert stat_row and "rows" in stat_row[0]["data_type"], stat_row

        # column-level stats: distinct count for the join key
        col_stats = {
            r["info_name"]: r["info_value"]
            for r in spark.sql("DESCRIBE EXTENDED cbo_orders o_custkey").collect()
        }
        assert col_stats.get("distinct_count") not in (None, "NULL"), col_stats

        # with CBO on, the optimizer's estimate for the analyzed scan
        # is the EXACT analyzed row count, not a size-based guess
        old = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            plan_stats = (
                spark.table("cbo_orders")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert plan_stats.rowCount().isDefined()
            expected = spark.table("cbo_orders").count()
            assert int(str(plan_stats.rowCount().get())) == expected
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        _cleanup(spark)
