#!/usr/bin/env python
"""Registry-wide single-run timing sweep at sf0.1 — the scale-bomb
detector the curated bench misses (it caught a 27.6 s query and an
AQE-serialized applyInPandas in round 3). Times EVERY registered query
once with a noop write and prints the sorted table; streaming queries
run like any other (they are batch-equivalent registrations).

    python tools/sweep_sf01.py [sf_dir] [threshold_sec]

Exit 0 always; eyeball (or grep) the SLOW markers (> threshold, default
5 s single-run — generous vs the bench's per-query ≤2.4 s steady-state
because this sweep includes first-run codegen per query).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0

registry.load_all_modules()
spark = get_spark("sweep-sf01")

rows = []
for qid in sorted(registry.QUERIES):
    t0 = time.monotonic()
    err = ""
    try:
        registry.QUERIES[qid](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as e:  # noqa: BLE001 — report and keep sweeping
        err = f" ERROR {type(e).__name__}: {str(e)[:120]}"
    dt = time.monotonic() - t0
    rows.append((dt, qid, err))
    print(f"{dt:7.2f}s {qid}{' SLOW' if dt > threshold else ''}{err}", flush=True)

rows.sort(reverse=True)
print("\n=== slowest 15 ===")
for dt, qid, err in rows[:15]:
    print(f"{dt:7.2f}s {qid}{err}")
total = sum(r[0] for r in rows)
errs = [r for r in rows if r[2]]
print(f"\ntotal {total:.1f}s over {len(rows)} queries; {len(errs)} errors")
