"""df.observe(): audit metrics must ride the production query's single
pass (accumulators), matching a standalone aggregation exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.operators.quality import (
    orders_with_observed_audit,
)
from sparkifydb_datawarehouse_spark.tables import load_table


def test_observed_metrics_match_standalone_agg(spark, sf_dir):
    df, obs = orders_with_observed_audit(spark, sf_dir)
    rows = df.collect()  # the production action fills the observation
    got = obs.get

    o = load_table(spark, sf_dir, "orders")
    want = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_price"
        ),
        F.max("o_totalprice").alias("max_price"),
    ).collect()[0]

    assert got["n_rows"] == want["n_rows"] == len(rows)
    assert got["null_custkey"] == want["null_custkey"]
    assert got["nonpositive_price"] == want["nonpositive_price"]
    assert got["max_price"] == want["max_price"]
    # and the production output is untouched by the instrumentation
    assert set(df.columns) == {"o_orderkey", "o_totalprice"}
