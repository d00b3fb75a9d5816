"""B2 — warehouse sinks: partitioned parquet writes (with partition
pruning on read-back) and bucketed tables (shuffle-free joins).
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.tables import load_table


def test_partitioned_write_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    # partition pruning happens at planning (inputFiles() is pre-pruning):
    # the executed scan must carry the partition filter
    pruned = back.filter(F.col("o_orderstatus") == "F")
    n_f = pruned.count()
    assert 0 < n_f < back.count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200], (
        plan[:1500]
    )


def _recreate_bucketed(spark, name: str, df, key: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous crashed run can leave the managed location behind with
    # no catalog entry — remove it or saveAsTable fails LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)


def test_bucketed_table_join_no_shuffle(spark, sf_dir):
    """Bucketed tables co-locate join keys at write time: a join of two
    tables bucketed on the same key by the same count needs NO exchange
    — at 100 TB this converts every repeated join into a local zip."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # at fixture scale the planner would rightly broadcast the small side;
    # disable auto-broadcast so the bucket-aware sort-merge path is exercised
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _recreate_bucketed(
            spark, "b_orders", load_table(spark, sf_dir, "orders"), "o_custkey"
        )
        _recreate_bucketed(
            spark, "b_customer", load_table(spark, sf_dir, "customer"), "c_custkey"
        )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:2000]}"
        assert "Bucketed: true" in plan, plan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_orc_scan_pushes_filter(spark, sf_dir):
    """The ORC roundtrip query must push its predicate into the scan
    (stripe-level skipping), not filter after a full read."""
    from sparkifydb_datawarehouse_spark import registry

    registry.load_all_modules()
    df = registry.QUERIES["q_scan_orc"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(s_acctbal,0" in plan, plan[:1200]
