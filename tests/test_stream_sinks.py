"""foreachBatch incremental upsert sink: latest-version-per-key wins,
idempotent under batch replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.streaming import sinks, windows as sw


def test_foreach_batch_upsert_keeps_latest_per_user(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "user_latest")
    ckpt = str(tmp_path / "ckpt")
    stream = sw.event_stream(spark, sf_dir).select("user_id", "ts", "event_type", "value")
    sinks.run_upsert_stream(
        spark, stream, sink, ckpt, key_cols=["user_id"], order_col="ts"
    )
    got = spark.read.parquet(sink)
    from sparkifydb_datawarehouse_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    expected = (
        ev.groupBy("user_id").agg(F.max("ts").alias("ts")).join(ev, ["user_id", "ts"])
    )
    assert got.count() == ev.select("user_id").distinct().count()
    g = {(r["user_id"], r["ts"]) for r in got.select("user_id", "ts").collect()}
    e = {(r["user_id"], r["ts"]) for r in expected.select("user_id", "ts").collect()}
    assert g == e


def test_foreach_batch_merge_is_idempotent(spark, tmp_path):
    sink = str(tmp_path / "sink")
    merge = sinks.upsert_batch(sink, key_cols=["k"], order_col="v")
    b1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    merge(b1, 0)
    merge(b1, 0)  # replay after simulated crash
    state = {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert state == {(1, 10), (2, 20)}
    b2 = spark.createDataFrame([(1, 30)], "k int, v int")
    merge(b2, 1)
    state = {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert state == {(1, 30), (2, 20)}


def test_available_now_ingest_is_incremental_across_runs(spark, sf_dir, tmp_path):
    """The nightly-ingest pattern: run an availableNow stream over a
    landing dir, land more files, run again with the SAME checkpoint.
    The second run must process ONLY the new files (no duplicates) —
    the checkpoint's file log, not file mtimes, decides what is new."""
    from sparkifydb_datawarehouse_spark.tables import load_table

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    chunk1 = ev.filter(F.col("event_id") % 2 == 0)
    chunk2 = ev.filter(F.col("event_id") % 2 == 1)
    chunk1.write.mode("overwrite").parquet(landing)

    def drain():
        q = (
            spark.readStream.schema(chunk1.schema)
            .parquet(landing)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(sink).count()
    assert n1 == chunk1.count()

    chunk2.write.mode("append").parquet(landing)
    drain()
    got = spark.read.parquet(sink)
    assert got.count() == ev.count()  # chunk1 exactly once + chunk2
    assert got.select("event_id").distinct().count() == ev.count()


def test_crash_restart_from_checkpoint_converges(spark, sf_dir, tmp_path):
    """VERDICT r6 #7: end-to-end crash recovery. A running stream
    (maxFilesPerTrigger=1 → one micro-batch per landed file) is killed
    by a crash injected in batch 2 AFTER the sink merge but BEFORE the
    checkpoint commit — the nastiest window: output written, offset
    not. A restart from the SAME checkpointLocation must re-deliver
    the uncommitted batch (idempotent merge absorbs the replay), drain
    the rest, and end in exactly the state of an uninterrupted run."""
    import pyspark.sql.utils as _u

    from sparkifydb_datawarehouse_spark.tables import load_table

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sink_ref = str(tmp_path / "sink_ref")
    ckpt_ref = str(tmp_path / "ckpt_ref")

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .limit(400)
        .localCheckpoint(eager=True)
    )
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    schema = spark.read.parquet(landing).schema

    def source():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

    inner = sinks.upsert_batch(sink, key_cols=["user_id"], order_col="ts")
    crashed = {"done": False}

    def crashy(batch_df, batch_id):
        inner(batch_df, batch_id)  # sink write SUCCEEDS...
        if batch_id == 2 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after merge, before commit")

    q = (
        source()
        .writeStream.foreachBatch(crashy)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        raise AssertionError("injected crash did not surface")
    except (_u.StreamingQueryException, Exception) as e:  # noqa: BLE001
        assert "injected crash" in str(e), e
    assert crashed["done"], "stream never reached the crash batch"

    # restart from the SAME checkpoint: batch 2 is re-delivered (its
    # offset never committed) and the stream drains to the end
    q2 = (
        source()
        .writeStream.foreachBatch(inner)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    # uninterrupted reference run
    sinks.run_upsert_stream(
        spark, source(), sink_ref, ckpt_ref, key_cols=["user_id"], order_col="ts"
    )
    got = {
        (r["user_id"], r["ts"], r["value"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["user_id"], r["ts"], r["value"])
        for r in spark.read.parquet(sink_ref).collect()
    }
    assert got == want and got, (len(got), len(want))
