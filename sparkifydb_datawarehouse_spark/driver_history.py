"""Driver-checked history: per-id latest CORRECTNESS round.

The harness driver samples ~50 queries per round from the front of
``queries()``. The queue tiers (``__spark_entry__._coverage_order``):

1. ``RECHECK_FIRST`` — ids whose LATEST driver row is non-green
   (VERDICT r8 #3). Empty as of round 11: every registered id's latest
   driver row is green (cross-round union 349/349).
2. never-driver-checked ids with a DuckDB oracle.
3. never-checked rows-only ids — empty (registry has 0 rows-only).
4. already-green ids, OLDEST-CHECKED-FIRST (VERDICT r9 #6): with full
   coverage reached, each round's ~50 slots rotate to the stalest
   green rows, ordered by ``LAST_CHECKED_ROUND`` ascending, stable
   registry order within a round.

VERDICT r10 #1: ``LAST_CHECKED_ROUND`` is GENERATED at import time by
scanning the driver's own ``CORRECTNESS_r*.json`` artifacts in the
repo root — the queue self-updates the moment the driver drops a new
artifact, so there is no hand-frozen dict to go stale and no
round-start regeneration ritual. ``tests/test_driver_queue.py``
cross-checks the scan with an independent implementation.
"""

from __future__ import annotations

import glob
import json
import os

# VERDICT r8 #3 tier: non-green-latest ids outrank everything. Empty
# since round 10 — every id's latest driver row is green.
RECHECK_FIRST: frozenset[str] = frozenset()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scan_artifacts(repo_root: str = _REPO_ROOT) -> dict[str, int]:
    """Latest driver CORRECTNESS round per id, from the artifacts.

    Reads every ``CORRECTNESS_r{N}.json`` the harness driver has ever
    written into the repo root and keeps, per query id, the highest
    round number in which the driver checked it. Unreadable files are
    skipped (a partially-written artifact must not take the whole
    package import down mid-round).
    """
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base.split("_r")[1].split(".")[0])
            with open(path) as fh:
                ids = json.load(fh)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for qid in ids:
            last[qid] = max(last.get(qid, 0), rnd)
    return last


LAST_CHECKED_ROUND: dict[str, int] = _scan_artifacts()

DRIVER_CHECKED: frozenset[str] = frozenset(LAST_CHECKED_ROUND)
