"""Snapshot-versioned table mechanics (round 12): immutable shared
data files, copy-on-write scope, manifest/HEAD planning metadata,
time-travel equality, and the file-pruned diff."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.sources import snapshots as snap
from sparkifydb_datawarehouse_spark.tables import load_table


@pytest.fixture(scope="module")
def table_dir(spark, sf_dir):
    return snap.events_snapshot_table(spark, sf_dir)


def test_manifests_share_untouched_buckets(table_dir):
    m1 = snap.snapshot_manifest(table_dir, 1)
    m2 = snap.snapshot_manifest(table_dir, 2)
    shared = set(m1["files"]) & set(m2["files"])
    # COW scope: exactly buckets 1-3 are shared BY REFERENCE; bucket 0
    # was rewritten and one append file added
    assert shared == {"b1-v1.parquet", "b2-v1.parquet", "b3-v1.parquet"}
    assert set(m2["files"]) - shared == {"b0-v2.parquet", "append-v2.parquet"}
    assert m1["op"] == "create" and m1["parent"] is None
    assert m2["op"] == "merge" and m2["parent"] == 1
    head = json.load(open(os.path.join(table_dir, "HEAD.json")))
    assert head == {"current": 3}  # v3 = the compaction snapshot
    # every referenced file exists; no staging leftovers
    m3 = snap.snapshot_manifest(table_dir, 3)
    for f in set(m1["files"]) | set(m2["files"]) | set(m3["files"]):
        assert os.path.exists(os.path.join(table_dir, f))
    assert not [f for f in os.listdir(table_dir) if f.startswith("_stage_")]


def test_time_travel_v1_equals_base_table(spark, sf_dir, table_dir):
    base = load_table(spark, sf_dir, "events").select(*snap._COLS)
    v1 = snap.read_snapshot(spark, table_dir, 1).select(*snap._COLS)
    assert v1.exceptAll(base).count() == 0 and base.exceptAll(v1).count() == 0


def test_head_read_reflects_merge(spark, sf_dir, table_dir):
    cur = snap.read_snapshot(spark, table_dir).select(*snap._COLS)
    base = load_table(spark, sf_dir, "events")
    n_base = base.count()
    n_appended = base.filter(F.col("event_id") < snap._APPEND_KEY_LIMIT).count()
    assert cur.count() == n_base + n_appended
    # modified keys carry the +100; a probe key from an untouched
    # bucket is byte-identical to v1
    mod = cur.filter(F.col("event_id") % snap._N_BUCKETS == 0)
    v1_mod = (
        snap.read_snapshot(spark, table_dir, 1)
        .filter(F.col("event_id") % snap._N_BUCKETS == 0)
        .select(*snap._COLS)
    )
    joined = mod.alias("c").join(v1_mod.alias("o"), "event_id").select(
        (F.col("c.value") - F.col("o.value")).alias("d")
    )
    assert joined.filter(F.abs(F.col("d") - 100) > 1e-9).count() == 0


def test_diff_reads_only_nonshared_files(spark, sf_dir, table_dir):
    # the diff plan must reference exactly the 3 non-shared files
    df = snap.snapshot_diff(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "b0-v2.parquet" in plan or "b0-v2" in plan
    for shared in ("b1-v1", "b2-v1", "b3-v1"):
        assert shared not in plan, f"diff scanned shared file {shared}"


def test_pruned_read_scans_only_intersecting_file(spark, sf_dir, table_dir):
    df = snap.snapshot_pruned_read(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "r0-v3" in plan
    for other in ("r1-v3", "r2-v3", "r3-v3", "b0-v2", "append-v2", "b1-v1"):
        assert other not in plan, f"pruned read scanned {other}"
    # and the compaction preserved the merge's logical content
    cur = snap.read_snapshot(spark, table_dir, 3).select(*snap._COLS)
    v2 = snap.read_snapshot(spark, table_dir, 2).select(*snap._COLS)
    assert cur.exceptAll(v2).count() == 0 and v2.exceptAll(cur).count() == 0


def test_v3_stats_cover_ranges(table_dir):
    m = snap.snapshot_manifest(table_dir, 3)
    assert m["op"] == "compact" and m["parent"] == 2
    quarter = m["properties"]["quarter"]
    st = m["stats"]
    # range files are disjoint and ordered; the top file holds the
    # appended offset keys
    assert st["r0-v3.parquet"]["min_event_id"] >= 0
    assert st["r0-v3.parquet"]["max_event_id"] <= quarter - 1
    assert st["r3-v3.parquet"]["max_event_id"] >= snap._APPEND_OFFSET
    for a, b in (("r0-v3.parquet", "r1-v3.parquet"),
                 ("r1-v3.parquet", "r2-v3.parquet"),
                 ("r2-v3.parquet", "r3-v3.parquet")):
        assert st[a]["max_event_id"] < st[b]["min_event_id"]


def test_changes_feed_ops_and_pruning(spark, sf_dir, table_dir):
    df = snap.snapshot_changes(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for shared in ("b1-v1", "b2-v1", "b3-v1", "r0-v3"):
        assert shared not in plan, f"change feed scanned {shared}"
    ops = dict(
        df.groupBy("op").count().collect() and
        [(r["op"], r["count"]) for r in df.groupBy("op").count().collect()]
    )
    base = load_table(spark, sf_dir, "events")
    n_ins = base.filter(F.col("event_id") < snap._APPEND_KEY_LIMIT).count()
    n_upd = base.filter(
        (F.col("event_id") % snap._N_BUCKETS == 0)
        & F.col("value").isNotNull()
    ).count()
    assert ops.get("insert", 0) == n_ins and ops.get("update", 0) == n_upd


def test_expire_and_vacuum_lifecycle(spark, sf_dir, table_dir, tmp_path):
    # work on a throwaway COPY — the cached fixture keeps all versions
    import shutil

    d = str(tmp_path / "table_copy")
    shutil.copytree(table_dir, d)
    assert snap.live_versions(d) == [1, 2, 3]
    # HEAD is protected
    with pytest.raises(ValueError, match="HEAD"):
        snap.expire_snapshot(d, 3)
    # nothing is orphaned while all three manifests live
    assert snap.vacuum(d) == []
    # expire v1: its exclusive bucket-0 file becomes garbage, the
    # shared b1-b3 stay referenced by v2
    snap.expire_snapshot(d, 1)
    assert snap.vacuum(d) == ["b0-v1.parquet"]
    assert os.path.exists(os.path.join(d, "b0-v1.parquet")), "dry run deleted"
    # expire v2 too: only v3's range files remain referenced
    snap.expire_snapshot(d, 2)
    orphans = snap.vacuum(d, dry_run=False)
    assert orphans == sorted(
        ["b0-v1.parquet", "b0-v2.parquet", "append-v2.parquet",
         "b1-v1.parquet", "b2-v1.parquet", "b3-v1.parquet"]
    )
    for f in orphans:
        assert not os.path.exists(os.path.join(d, f))
    # the surviving snapshot still reads whole
    cur = snap.read_snapshot(spark, d).select(*snap._COLS)
    v3 = snap.read_snapshot(spark, table_dir, 3).select(*snap._COLS)
    assert cur.exceptAll(v3).count() == 0 and v3.exceptAll(cur).count() == 0
