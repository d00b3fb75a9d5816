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


def test_json_roundtrip_matches_origin(spark, sf_dir):
    from sparkifydb_datawarehouse_spark.sources.json_source import scan_json

    got = scan_json(spark, sf_dir)
    origin = load_table(spark, sf_dir, "orders").filter("o_orderstatus = 'F'")
    assert got.count() == origin.count()
    # timestamps survive the ISO-8601 string roundtrip to the microsecond
    a = {r.o_orderkey: r.o_orderdate for r in got.collect()}
    b = {r.o_orderkey: r.o_orderdate for r in origin.collect()}
    assert a == b


def test_zorder_tightens_rowgroup_stats_on_both_dims(spark, sf_dir, tmp_path):
    """Z-order by (user_id, value): every row group's min/max span on
    EACH dimension must be a small fraction of the global span — the
    property that makes parquet row-group skipping work for filters on
    either column. A single-column sort would tighten only one."""
    import pyarrow.parquet as pq

    from sparkifydb_datawarehouse_spark.sources.layout import zorder_by

    from conftest import SF_ORACLE

    ev = load_table(spark, SF_ORACLE, "events").select("user_id", "value", "event_id")
    out = str(tmp_path / "zorder")
    # force several row groups so there are stats to compare
    zorder_by(ev, ["user_id", "value"], num_partitions=1).write.option(
        "parquet.block.size", 16 * 1024
    ).mode("overwrite").parquet(out)

    import glob

    spans = {"user_id": [], "value": []}
    globals_ = {
        "user_id": (0.0, 0.0),
        "value": (0.0, 0.0),
    }
    gmin: dict[str, float] = {}
    gmax: dict[str, float] = {}
    n_groups = 0
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            n_groups += 1
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in spans:
                    continue
                st = col.statistics
                spans[name].append(float(st.max) - float(st.min))
                gmin[name] = min(gmin.get(name, float(st.min)), float(st.min))
                gmax[name] = max(gmax.get(name, float(st.max)), float(st.max))
    assert n_groups >= 4, f"only {n_groups} row groups; shrink block size"
    for name, sp in spans.items():
        global_span = gmax[name] - gmin[name]
        avg_frac = sum(sp) / len(sp) / global_span
        # unsorted data gives ~1.0 on both; single-column sort gives
        # ~1/n_groups on one and ~1.0 on the other; z-order must be
        # clearly clustered on BOTH
        assert avg_frac < 0.7, f"{name}: avg row-group span frac {avg_frac:.2f}"


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A fact table partitioned by order year + a selective dim filter:
    the partition filter must arrive at runtime via DPP (dynamicpruning
    subquery in the scan), so only matching year directories are read."""
    out = str(tmp_path / "orders_by_year")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    o.write.partitionBy("order_year").mode("overwrite").parquet(out)

    fact = spark.read.parquet(out)
    # the filter is on a NON-join column, so the qualifying years are
    # only known at runtime — a literal year filter would be folded
    # into a static partition filter instead (no DPP involved)
    years = (
        o.select(F.col("order_year").alias("y"))
        .distinct()
        .filter(F.col("y") % 3 == 0)
    )
    j = fact.join(years, fact.order_year == F.col("y"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appended files may carry NEW columns (warehouse schema
    evolution); mergeSchema reads the union, with nulls where old
    files lack the column — the contract an append-only 100 TB
    dataset depends on."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(base)
    (
        spark.range(5, 8)
        .select(F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2"))
        .write.mode("append").parquet(base)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "v1", "v2"}
    assert merged.count() == 8
    assert merged.filter(F.col("v2").isNull()).count() == 5
    # without mergeSchema, footer-of-one-file schema wins — the trap
    plain = spark.read.parquet(base)
    assert plain.count() == 8


def test_ignore_corrupt_files_read(spark, tmp_path):
    """A torn/corrupt parquet file in a 100 TB dataset must not kill
    the scan when the pipeline opts into ignoreCorruptFiles."""
    import os

    import pyspark.sql.functions as F

    d = str(tmp_path / "with_corrupt")
    spark.range(10).select(F.col("id")).write.parquet(d)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")
    ok = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(d).count()
    )
    assert ok == 10
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(d).count()  # default: fail loudly
