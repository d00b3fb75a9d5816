"""Real Structured Streaming runs (availableNow → memory sink),
checked against the batch plan of the SAME transformation — the
batch==stream unification is the point under test.
"""

from __future__ import annotations

import pytest

from sparkifydb_datawarehouse_spark.streaming import windows as sw
from sparkifydb_datawarehouse_spark.tables import load_table


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _as_sorted_tuples(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_stream_tumbling_matches_batch(spark, sf_dir, batch_events):
    stream_result = sw.run_stream_to_memory(
        spark, sw.tumbling_counts(sw.event_stream(spark, sf_dir)), "t_tumbling"
    )
    batch_result = sw.tumbling_counts(batch_events)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _as_sorted_tuples(stream_result, cols) == _as_sorted_tuples(batch_result, cols)


def test_stream_session_matches_batch(spark, sf_dir, batch_events):
    stream_result = sw.run_stream_to_memory(
        spark, sw.session_counts(sw.event_stream(spark, sf_dir)), "t_session"
    )
    batch_result = sw.session_counts(batch_events)
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert _as_sorted_tuples(stream_result, cols) == _as_sorted_tuples(batch_result, cols)


def test_stream_dedup_runs(spark, sf_dir):
    stream_result = sw.run_stream_to_memory(
        spark, sw.dedup_stream(sw.event_stream(spark, sf_dir)), "t_dedup"
    )
    n = stream_result.count()
    n_batch = sw.dedup_stream(load_table(spark, sf_dir, "events")).count()
    assert n == n_batch > 0


def test_stream_sliding_matches_batch(spark, sf_dir, batch_events):
    stream_result = sw.run_stream_to_memory(
        spark, sw.sliding_counts(sw.event_stream(spark, sf_dir)), "t_sliding"
    )
    batch_result = sw.sliding_counts(batch_events)
    cols = ["window_start", "n_events"]
    assert _as_sorted_tuples(stream_result, cols) == _as_sorted_tuples(batch_result, cols)


def test_stream_stream_join_matches_batch(spark, sf_dir, batch_events):
    from sparkifydb_datawarehouse_spark.streaming import joins as sj

    sv, sp = sj.split_events(sw.event_stream(spark, sf_dir))
    stream_result = sw.run_stream_to_memory(
        spark, sj.view_purchase_join(sv, sp), "t_ss_join"
    )
    bv, bp = sj.split_events(batch_events)
    batch_result = sj.view_purchase_join(bv, bp)
    cols = ["user_id", "view_id", "purchase_id", "purchase_ts", "purchase_value"]
    got = _as_sorted_tuples(stream_result, cols)
    assert got == _as_sorted_tuples(batch_result, cols)
    assert len(got) > 0


def test_late_rows_dropped_by_watermark_are_observed(spark, tmp_path):
    """The late-data contract, ASSERTED from StreamingQueryProgress
    (VERDICT r4 #8): plant an on-time file that advances the watermark,
    a one-row keep-alive file, then a file 2 hours older. With
    maxFilesPerTrigger=1 under availableNow each file is its own
    micro-batch.

    Two measured semantics this test PINS (found by running it, not in
    the guide's headline): (1) late-event FILTERING uses the PREVIOUS
    batch's watermark while eviction uses the current one — so the
    late batch must be the third, not the second, or nothing drops;
    (2) numRowsDroppedByWatermark counts rows entering the STATE
    operator, i.e. post-partial-aggregation GROUPS (late windows), not
    raw input rows — 7 late events spanning 2 windows report 2."""
    import time

    import pandas as pd

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 12:00:00")
    on_time = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(seconds=36 * i) for i in range(100)],
            "value": [1.0] * 100,
        }
    )
    on_time.to_parquet(src / "a.parquet", coerce_timestamps="us")
    time.sleep(1.1)  # distinct mtime: file source orders by timestamp
    keep_alive = pd.DataFrame({"ts": [base + pd.Timedelta(hours=1)], "value": [1.0]})
    keep_alive.to_parquet(src / "b.parquet", coerce_timestamps="us")
    time.sleep(1.1)
    # 7 late events spanning exactly TWO 1-hour windows: 6 rows in
    # [09:00, 10:00) and 1 row at 10:00:00
    late = pd.DataFrame(
        {
            "ts": [base - pd.Timedelta(hours=2, seconds=i) for i in range(7)],
            "value": [1.0] * 7,
        }
    )
    late.to_parquet(src / "c.parquet", coerce_timestamps="us")

    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sink, progress = sw.run_stream_with_progress(spark, agg, "t_late", mode="append")

    dropped, marks = sw.watermark_drop_counts(progress)
    assert dropped == 2, (dropped, progress)  # 2 late WINDOWS (see docstring)
    # the watermark line must have advanced past the late rows before
    # the late batch ran (batch-0 max event time minus the 10m delay)
    assert marks and max(marks) >= "2024-01-01T12:49", marks
    # and the dropped windows must NOT have leaked into the output
    emitted = {r["w"]["start"].hour for r in sink.collect()}
    assert not ({9, 10} & emitted), emitted


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    """Stream-static broadcast enrichment: the real readStream run
    must produce exactly the batch join's rows."""
    from sparkifydb_datawarehouse_spark.streaming import joins as sj

    streamed = sw.run_stream_to_memory(
        spark,
        sj.enrich_events(sw.event_stream(spark, sf_dir), sj.user_dim(spark, sf_dir)),
        "t_enrich",
    )
    batch = sj.stream_enrich_batch(spark, sf_dir)
    got = {(r["event_id"], r["segment"], r["value"]) for r in streamed.collect()}
    want = {(r["event_id"], r["segment"], r["value"]) for r in batch.collect()}
    assert got == want
