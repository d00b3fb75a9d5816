"""Python DataSource connector: partitioned parallel reads, filter
pushdown contract, and read-path determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.sources import pysource


def _read(spark, n):
    pysource.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark.read.format("synthetic_rows").option("n", n).load()


def test_source_parallelism_scales_with_rows(spark):
    df = _read(spark, 250_000)
    assert df.rdd.getNumPartitions() == 3  # ceil(250k / 100k)
    assert df.count() == 250_000


def test_pushed_bucket_filter_generates_only_matches(spark):
    """The source jumps along the arithmetic progression instead of
    generate-and-drop; results must be identical either way."""
    df = _read(spark, 50_000).filter(F.col("bucket") == 7)
    ids = [r.id for r in df.select("id").collect()]
    assert len(ids) == 5_000
    assert all(i % 10 == 7 for i in ids)
    # residual filters the source did NOT accept still apply
    df2 = _read(spark, 50_000).filter(
        (F.col("bucket") == 7) & (F.col("category") == "D")
    )
    assert all(r.category == "D" for r in df2.collect())


def test_reader_pushdown_unit():
    """pushFilters contract: accepted filters are consumed, the rest
    are yielded back for Spark to apply."""
    from pyspark.sql.datasource import EqualTo

    r = pysource.SyntheticRowsReader({"n": "100"})
    leftover = list(r.pushFilters([EqualTo(("bucket",), 3), EqualTo(("category",), "A")]))
    assert r.bucket_eq == 3
    assert leftover == [EqualTo(("category",), "A")]
    rows = list(r.read(pysource.RangePartition(0, 100)))
    assert [t[0] for t in rows] == list(range(3, 100, 10))


def test_stream_reader_drains_feed_exactly_once(spark, tmp_path):
    """The custom streaming source under repeated availableNow runs:
    each run resumes from the checkpointed offset (one prefetched
    batch per run with the simple reader), the feed drains without
    loss or duplication, and a post-exhaustion run is a clean no-op.
    The final sink must equal the batch read of the same feed."""
    pysource.register(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain_once():
        q = (
            spark.readStream.format("synthetic_rows")
            .option("n", 1000)
            .option("rows_per_batch", 300)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    counts = [drain_once() for _ in range(5)]
    assert counts == [300, 600, 900, 1000, 1000]
    got = spark.read.parquet(sink)
    assert got.select("id").distinct().count() == 1000
    batch = _read(spark, 1000)
    import pytest

    assert got.agg(F.sum("amount")).first()[0] == pytest.approx(
        batch.agg(F.sum("amount")).first()[0], rel=1e-12
    )


def test_pysink_two_phase_commit_roundtrip(spark, tmp_path, sf_dir):
    """Writer protocol: per-task temp files, driver-side rename
    commit, _SUCCESS manifest; content roundtrips through the JSONL."""
    import json
    import os

    from sparkifydb_datawarehouse_spark.sources import pysink
    from sparkifydb_datawarehouse_spark.tables import load_table

    pysink.register(spark)
    out = str(tmp_path / "jsonl_out")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.repartition(4).write.format("jsonl_dir").option("path", out).mode(
        "append"
    ).save()

    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 4
    assert not [f for f in files if f.startswith("_tmp_")], "uncommitted temps"
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["n_rows"] == docs.count()
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in docs.collect()
    }
