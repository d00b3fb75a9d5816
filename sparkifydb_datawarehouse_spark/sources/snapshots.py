"""Snapshot-versioned table layout (round 12): the table-format
mechanics an Iceberg/Delta-class lakehouse table is made of — an
immutable-data-file + manifest-list design (both formats' specs are
public: iceberg.apache.org/spec, the Delta PROTOCOL.md), re-expressed
minimally over plain parquet:

- data files are IMMUTABLE parquet files bucketed by key
  (``pmod(event_id, 4)``);
- a SNAPSHOT is a JSON manifest naming the exact data files visible
  at that version (plus parent pointer and the operation that made
  it); ``HEAD.json`` names the current version;
- an UPDATE is COPY-ON-WRITE: only the bucket files containing
  modified keys are rewritten, untouched buckets are SHARED between
  snapshots by reference;
- time travel = read an old manifest; diff = read only the files the
  two manifests DON'T share.

Scale shape (100 TB): manifests are metadata (file lists — KB per
snapshot, driver-side like every table format's planning phase);
data reads are ``spark.read.parquet(*files)`` — splittable columnar
scans of exactly the files the snapshot names, so time travel costs
the same as a current read, and the snapshot diff below reads 2 of 5
files instead of both full table versions. The COW update rewrites
1 of 4 buckets — the fraction a real partition-aligned MERGE touches.

Fixture history (deterministic, so DuckDB recomputes both versions
from the base ``events`` parquet):
- v1: CREATE — 4 bucket files of the events table.
- v2: MERGE — bucket 0 rewritten with ``value + 100`` for rows whose
  ``event_id % 4 = 0`` (exactly bucket 0's non-null keys), plus an
  appended file of new rows (``event_id < 50`` clones offset by
  1,000,000). Null-keyed rows live in bucket 0 (coalesced) and pass
  through unmodified.
- v3: COMPACT — the same logical content re-CLUSTERED into 4
  event_id RANGE files (fixed quarter boundaries off the base key
  max; appended offset keys land in the top file, null keys in the
  bottom), with per-file min/max key STATS in the manifest. A
  predicate read consults the stats and scans only intersecting
  files — Iceberg/Delta data-skipping, demonstrated by a plan test.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .layout import _source_fingerprint

_N_BUCKETS = 4
_APPEND_KEY_LIMIT = 50
_APPEND_OFFSET = 1_000_000

_COLS = ("event_id", "user_id", "event_type", "value", "ts")


def _write_one_file(df: DataFrame, table_dir: str, name: str) -> None:
    """One deterministic parquet data file (immutable once written)."""
    staging = os.path.join(table_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    os.replace(os.path.join(staging, part), os.path.join(table_dir, name))
    shutil.rmtree(staging)


def events_snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, cached by source fingerprint) the three-snapshot
    events table described in the module docstring."""
    fp = _source_fingerprint(sf_dir, "events")
    tz = spark.conf.get("spark.sql.session.timeZone", "local")
    tag = hashlib.md5(f"{sf_dir}|{fp}|{tz}|snapshots-v3".encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"sparkifydb_snap_{tag}")
    head = os.path.join(d, "HEAD.json")
    if os.path.exists(head):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    ev = load_table(spark, sf_dir, "events").select(*_COLS)
    bucket = F.coalesce(F.pmod(F.col("event_id"), F.lit(_N_BUCKETS)), F.lit(0))
    ev = ev.withColumn("_b", bucket).localCheckpoint()
    v1_files = []
    for b in range(_N_BUCKETS):
        name = f"b{b}-v1.parquet"
        _write_one_file(ev.filter(F.col("_b") == b).drop("_b"), d, name)
        v1_files.append(name)
    _manifest(d, version=1, files=v1_files, parent=None, op="create")
    # v2: COW-rewrite bucket 0 (value + 100 on its non-null keys) ...
    b0 = ev.filter(F.col("_b") == 0).drop("_b")
    b0_new = b0.withColumn(
        "value",
        F.when(F.col("event_id") % _N_BUCKETS == 0, F.col("value") + 100).otherwise(
            F.col("value")
        ),
    )
    _write_one_file(b0_new, d, "b0-v2.parquet")
    # ... plus an append file of cloned rows with offset keys
    appended = (
        ev.drop("_b")
        .filter(F.col("event_id") < _APPEND_KEY_LIMIT)
        .withColumn("event_id", F.col("event_id") + _APPEND_OFFSET)
    )
    _write_one_file(appended, d, "append-v2.parquet")
    _manifest(
        d,
        version=2,
        files=["b0-v2.parquet"] + v1_files[1:] + ["append-v2.parquet"],
        parent=1,
        op="merge",
    )
    # v3: compaction — v2's logical content re-clustered into key-RANGE
    # files with min/max stats (the data-skipping layout)
    v2_full = b0_new.unionByName(
        ev.filter(F.col("_b") != 0).drop("_b")
    ).unionByName(appended)
    base_max = ev.agg(F.max("event_id")).first()[0]
    quarter = (int(base_max) + _N_BUCKETS) // _N_BUCKETS if base_max is not None else 1
    v3_files = []
    stats = {}
    for k in range(_N_BUCKETS):
        lo = k * quarter
        hi = (k + 1) * quarter - 1
        name = f"r{k}-v3.parquet"
        if k == 0:
            part = v2_full.filter(
                F.col("event_id").isNull() | (F.col("event_id") <= hi)
            )
        elif k == _N_BUCKETS - 1:
            part = v2_full.filter(F.col("event_id") >= lo)  # incl. appended
        else:
            part = v2_full.filter(F.col("event_id").between(lo, hi))
        _write_one_file(part, d, name)
        mm = part.agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).first()
        stats[name] = {
            "min_event_id": None if mm["lo"] is None else int(mm["lo"]),
            "max_event_id": None if mm["hi"] is None else int(mm["hi"]),
        }
        v3_files.append(name)
    _manifest(
        d,
        version=3,
        files=v3_files,
        parent=2,
        op="compact",
        stats=stats,
        properties={
            "base_max_event_id": None if base_max is None else int(base_max),
            "quarter": quarter,
        },
    )
    with open(head, "w") as fh:
        json.dump({"current": 3}, fh)
    return d


def _manifest(
    table_dir: str,
    version: int,
    files,
    parent,
    op: str,
    stats: dict | None = None,
    properties: dict | None = None,
) -> None:
    m = {"version": version, "files": files, "parent": parent, "op": op}
    if stats is not None:
        m["stats"] = stats
    if properties is not None:
        m["properties"] = properties
    with open(os.path.join(table_dir, f"manifest-v{version}.json"), "w") as fh:
        json.dump(m, fh)


def snapshot_manifest(table_dir: str, version: int | None = None) -> dict:
    """Planning-phase metadata read (driver-side, KB-sized — the same
    split every table format makes)."""
    if version is None:
        with open(os.path.join(table_dir, "HEAD.json")) as fh:
            version = json.load(fh)["current"]
    with open(os.path.join(table_dir, f"manifest-v{version}.json")) as fh:
        return json.load(fh)


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: exactly the files the snapshot names."""
    m = snapshot_manifest(table_dir, version)
    paths = [os.path.join(table_dir, f) for f in m["files"]]
    return spark.read.parquet(*paths)


_ORACLE_SNAP_V1 = """
SELECT event_id, user_id, event_type, value, ts
FROM events
ORDER BY event_id
"""


@query("q_snapshot_read_v1", oracle=_ORACLE_SNAP_V1)
def snapshot_read_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: read snapshot v1 of the versioned events table —
    the pre-merge state, served from the ORIGINAL immutable bucket
    files even though HEAD has moved on. Value-identical to the base
    table (the create snapshot)."""
    d = events_snapshot_table(spark, sf_dir)
    return read_snapshot(spark, d, version=1).select(*_COLS).orderBy("event_id")


_ORACLE_SNAP_CURRENT = f"""
SELECT event_id, user_id, event_type,
       CASE WHEN event_id % {_N_BUCKETS} = 0 THEN value + 100 ELSE value END
           AS value,
       ts
FROM events
UNION ALL
SELECT event_id + {_APPEND_OFFSET}, user_id, event_type, value, ts
FROM events WHERE event_id < {_APPEND_KEY_LIMIT}
ORDER BY event_id
"""


@query("q_snapshot_read_current", oracle=_ORACLE_SNAP_CURRENT)
def snapshot_read_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAD read of the versioned events table: the copy-on-write
    merge's effects (bucket-0 values bumped, appended clone rows) are
    visible through whatever layout HEAD points at (the v3 compaction
    here — logically identical to v2, pinned by pytest); time travel
    to v2 still serves buckets 1-3 from the v1 files the two
    snapshots share by reference."""
    d = events_snapshot_table(spark, sf_dir)
    return read_snapshot(spark, d).select(*_COLS).orderBy("event_id")


_ORACLE_SNAP_DIFF = f"""
SELECT event_id, user_id, event_type, value + 100 AS value, ts
FROM events
WHERE event_id % {_N_BUCKETS} = 0
UNION ALL
SELECT event_id + {_APPEND_OFFSET}, user_id, event_type, value, ts
FROM events WHERE event_id < {_APPEND_KEY_LIMIT}
ORDER BY event_id
"""


@query("q_snapshot_diff", oracle=_ORACLE_SNAP_DIFF)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot diff (rows in v2 that are not in v1),
    computed the table-format way: compare the two MANIFESTS and read
    only the files they don't share — here 2 new files against 1
    retired file, never the two full table versions. exceptAll does
    the multiset difference on that pruned slice (null-keyed rows,
    which pass through the merge unmodified, cancel out exactly)."""
    d = events_snapshot_table(spark, sf_dir)
    m1 = snapshot_manifest(d, 1)
    m2 = snapshot_manifest(d, 2)
    added = [f for f in m2["files"] if f not in m1["files"]]
    retired = [f for f in m1["files"] if f not in m2["files"]]
    new_rows = spark.read.parquet(*[os.path.join(d, f) for f in added]).select(
        *_COLS
    )
    old_rows = spark.read.parquet(*[os.path.join(d, f) for f in retired]).select(
        *_COLS
    )
    return new_rows.exceptAll(old_rows).orderBy("event_id")


_ORACLE_SNAP_PRUNED = f"""
WITH q AS (SELECT (MAX(event_id) + {_N_BUCKETS}) // {_N_BUCKETS} AS quarter
           FROM events)
SELECT event_id, user_id, event_type,
       CASE WHEN event_id % {_N_BUCKETS} = 0 THEN value + 100 ELSE value END
           AS value,
       ts
FROM events, q
WHERE event_id <= q.quarter - 1
ORDER BY event_id
"""


@query("q_snapshot_pruned_read", oracle=_ORACLE_SNAP_PRUNED)
def snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping read of the compacted v3 snapshot: the predicate
    (first key quarter) is resolved against the manifest's per-file
    min/max stats at PLANNING time, so only the intersecting range
    file(s) are scanned — 1 of 4 here (the plan test pins it). A file
    whose stats are null is empty or all-null-keyed; a key predicate
    cannot match it, so skipping is safe. The appended offset keys and
    the untouched quarters never enter the plan."""
    d = events_snapshot_table(spark, sf_dir)
    m = snapshot_manifest(d, 3)
    quarter = (m.get("properties") or {}).get("quarter")
    if quarter is None:
        bound = None
        paths = []
    else:
        bound = int(quarter) - 1
        paths = [
            os.path.join(d, f)
            for f in m["files"]
            if (st := m["stats"].get(f, {})).get("min_event_id") is not None
            and st["min_event_id"] <= bound
        ]
    if not paths:  # nothing intersects: schema-only empty frame
        return (
            read_snapshot(spark, d, 3)
            .select(*_COLS)
            .filter(F.lit(False))
            .orderBy("event_id")
        )
    return (
        spark.read.parquet(*paths)
        .select(*_COLS)
        .filter(F.col("event_id") <= bound)
        .orderBy("event_id")
    )


_ORACLE_SNAP_CHANGES = f"""
SELECT 'insert' AS op, event_id + {_APPEND_OFFSET} AS event_id, user_id,
       event_type, value, ts
FROM events WHERE event_id < {_APPEND_KEY_LIMIT}
UNION ALL
SELECT 'update' AS op, event_id, user_id, event_type, value + 100 AS value, ts
FROM events
WHERE event_id % {_N_BUCKETS} = 0 AND value IS NOT NULL
ORDER BY op, event_id
"""


@query("q_snapshot_changes", oracle=_ORACLE_SNAP_CHANGES)
def snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style change feed between snapshots v1 → v2 (the Delta
    ``table_changes`` / Iceberg incremental-read shape): op-tagged
    post-image rows, derived the table-format way — INSERTS are the
    append file read whole (no comparison needed: a file new to the
    manifest with no retired counterpart is pure insert), UPDATES are
    the multiset difference of the one rewritten bucket against its
    retired predecessor. Null-valued modified rows cancel in the
    difference (null + 100 is null), so the oracle carries the same
    value IS NOT NULL guard. Never reads the 3 shared bucket files."""
    d = events_snapshot_table(spark, sf_dir)
    inserts = (
        spark.read.parquet(os.path.join(d, "append-v2.parquet"))
        .select(*_COLS)
        .withColumn("op", F.lit("insert"))
    )
    updates = (
        spark.read.parquet(os.path.join(d, "b0-v2.parquet"))
        .select(*_COLS)
        .exceptAll(
            spark.read.parquet(os.path.join(d, "b0-v1.parquet")).select(*_COLS)
        )
        .withColumn("op", F.lit("update"))
    )
    return (
        inserts.unionByName(updates)
        .select("op", *_COLS)
        .orderBy("op", "event_id")
    )


# ---------------------------------------------------------------------------
# lifecycle: snapshot expiration + vacuum (round 12, second half) —
# the retention half of every table format. Expiration deletes
# MANIFESTS only (metadata operation); vacuum then removes data files
# no live manifest references. Two-step by design: a file shared with
# any surviving snapshot is untouchable, and vacuum defaults to a
# dry run listing what WOULD go.
# ---------------------------------------------------------------------------


def live_versions(table_dir: str) -> list[int]:
    out = []
    for f in os.listdir(table_dir):
        if f.startswith("manifest-v") and f.endswith(".json"):
            out.append(int(f[len("manifest-v") : -len(".json")]))
    return sorted(out)


def expire_snapshot(table_dir: str, version: int) -> None:
    """Drop one snapshot's manifest (metadata-only; data files stay
    until vacuum). Refuses to expire HEAD."""
    with open(os.path.join(table_dir, "HEAD.json")) as fh:
        current = json.load(fh)["current"]
    if version == current:
        raise ValueError(f"cannot expire HEAD snapshot v{version}")
    path = os.path.join(table_dir, f"manifest-v{version}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no manifest-v{version}.json")
    os.remove(path)


def vacuum(table_dir: str, dry_run: bool = True) -> list[str]:
    """Data files referenced by NO live manifest, sorted. With
    dry_run=False they are deleted; the default only reports."""
    referenced: set[str] = set()
    for v in live_versions(table_dir):
        referenced.update(snapshot_manifest(table_dir, v)["files"])
    orphans = sorted(
        f
        for f in os.listdir(table_dir)
        if f.endswith(".parquet") and f not in referenced
    )
    if not dry_run:
        for f in orphans:
            os.remove(os.path.join(table_dir, f))
    return orphans
