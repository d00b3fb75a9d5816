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
