"""Incremental materialized-view maintenance: N-slice incremental
refresh must equal the one-shot full aggregation, bit for bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.operators.matview import IncrementalAggView
from sparkifydb_datawarehouse_spark.tables import load_table

MEASURES = {
    "revenue_sum": ("sum", "o_totalprice"),
    "n_orders": ("count", "o_orderkey"),
    "first_order": ("min", "o_orderdate"),
    "last_order": ("max", "o_orderdate"),
}


def _full_expected(orders):
    return orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.sum("o_totalprice").alias("revenue_sum"),
        F.count("o_orderkey").alias("n_orders"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


def _as_set(df):
    return {
        (r.o_custkey, r.o_orderstatus, round(r.revenue_sum, 6), r.n_orders,
         r.first_order, r.last_order)
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    view = IncrementalAggView(
        str(tmp_path / "mv"), keys=["o_custkey", "o_orderstatus"], measures=MEASURES
    )
    # three disjoint "ingest days" by orderkey ranges
    for part in range(3):
        view.refresh(orders.filter(F.col("o_orderkey") % 3 == part))
    got = view.read(spark, derived={"avg_price": ("revenue_sum", "n_orders")})
    expected = _full_expected(orders).withColumn(
        "avg_price", F.col("revenue_sum") / F.col("n_orders")
    )
    assert _as_set(got.drop("avg_price")) == _as_set(expected.drop("avg_price"))
    ge = {(r.o_custkey, r.o_orderstatus): r.avg_price for r in got.collect()}
    ee = {(r.o_custkey, r.o_orderstatus): r.avg_price for r in expected.collect()}
    assert ge.keys() == ee.keys()
    assert all(ge[k] == pytest.approx(ee[k], rel=1e-12) for k in ge)


def test_refresh_touches_only_delta_groups_plus_state(spark, sf_dir, tmp_path):
    """A delta containing ONE customer's orders must not change any
    other group's stored values (merge passes them through)."""
    orders = load_table(spark, sf_dir, "orders")
    view = IncrementalAggView(
        str(tmp_path / "mv"), keys=["o_custkey", "o_orderstatus"], measures=MEASURES
    )
    some_key = orders.select("o_custkey").first().o_custkey
    view.refresh(orders.filter(F.col("o_custkey") != some_key))
    before = _as_set(view.read(spark))
    view.refresh(orders.filter(F.col("o_custkey") == some_key))
    after = _as_set(view.read(spark))
    assert before < after  # old groups unchanged, new groups added
    assert after == _as_set(_full_expected(orders))


def test_unmergeable_measure_rejected(tmp_path):
    with pytest.raises(ValueError, match="unmergeable"):
        IncrementalAggView(
            str(tmp_path / "mv"), keys=["k"], measures={"m": ("median", "x")}
        )


def test_streaming_continuous_aggregate_equals_batch(spark, sf_dir, tmp_path):
    """The hypertable continuous-aggregate loop end to end: a real
    readStream drives foreachBatch refreshes of the incremental view,
    and the final state equals the one-shot batch rollup. Micro-batches
    are exactly the append-only deltas the view contract wants, so the
    streaming and batch views of the same data agree value-for-value."""
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark.operators.matview import IncrementalAggView
    from sparkifydb_datawarehouse_spark.streaming import windows as sw
    from sparkifydb_datawarehouse_spark.tables import load_table

    view = IncrementalAggView(
        str(tmp_path / "state"),
        keys=["event_type", "bucket_hour"],
        measures={"sum_value": ("sum", "value"), "n_events": ("count", "value")},
    )
    stream = sw.event_stream(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_hour"), "value"
    )
    q = (
        stream.writeStream.foreachBatch(lambda b, _i: view.refresh(b))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        (r["event_type"], r["bucket_hour"]): (round(r["sum_value"], 6), r["n_events"])
        for r in view.read(spark).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    expected = {
        (r["event_type"], r["bucket_hour"]): (round(r["sum_value"], 6), r["n_events"])
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_hour")
        )
        .agg(F.sum("value").alias("sum_value"), F.count("value").alias("n_events"))
        .collect()
    }
    assert got == expected
