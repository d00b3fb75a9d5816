"""Driver-queue hygiene (VERDICT r9 #1/#6, r10 #1).

``driver_history.LAST_CHECKED_ROUND`` is GENERATED at import time from
the driver's CORRECTNESS_r{N}.json artifacts (VERDICT r10 #1 — the
hand-frozen dict left a red tripwire every time the driver dropped an
artifact after the final commit). These tests regenerate the same map
with an independent scan and fail if the two drift, and assert the
queue ordering contract: stale-green ids surface first once full
coverage is reached.
"""

from __future__ import annotations

import glob
import json
import os

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.driver_history import (
    DRIVER_CHECKED,
    LAST_CHECKED_ROUND,
    RECHECK_FIRST,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_last_checked() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for qid in json.load(fh):
                last[qid] = max(last.get(qid, 0), rnd)
    return last


def test_last_checked_matches_artifacts():
    expected = _artifact_last_checked()
    assert LAST_CHECKED_ROUND == expected, (
        "driver_history.LAST_CHECKED_ROUND is stale — regenerate it from "
        "the CORRECTNESS_r*.json artifacts (round-start ritual)"
    )
    assert DRIVER_CHECKED == frozenset(expected)


def test_recheck_tier_only_holds_nongreen_latest():
    # Every id in RECHECK_FIRST must have a non-green latest driver row;
    # ids whose latest row is green must be cleared at round start.
    latest_row: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for qid, row in json.load(fh).items():
                if qid not in latest_row or latest_row[qid][0] < rnd:
                    latest_row[qid] = (rnd, row)
    for qid in RECHECK_FIRST:
        rnd, row = latest_row.get(qid, (0, None))
        assert row is None or not (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match") is not False
        ), f"{qid} is green in its latest driver row (r{rnd}) — clear it"


def test_coverage_order_rotates_stalest_first():
    import __spark_entry__ as entrymod

    registry.load_all_modules()
    order = entrymod._coverage_order(registry.QUERIES)
    assert len(order) == len(registry.QUERIES)
    # never-checked ids (if any) come before any checked id
    first_checked = next(
        (k for k, i in enumerate(order) if i in DRIVER_CHECKED), len(order)
    )
    assert all(
        i not in DRIVER_CHECKED or i in RECHECK_FIRST
        for i in order[:first_checked]
    )
    # within the checked tier, last-checked round is non-decreasing
    checked = [i for i in order if i in DRIVER_CHECKED and i not in RECHECK_FIRST]
    rounds = [LAST_CHECKED_ROUND[i] for i in checked]
    assert rounds == sorted(rounds)
    # VERDICT r9 #6: the front ~50 slots must be exactly the 50
    # stalest checked rows (data-driven — the stale tier's round
    # boundary moves every time the driver absorbs a new artifact).
    if not any(i not in DRIVER_CHECKED for i in registry.QUERIES):
        stalest_50 = sorted(LAST_CHECKED_ROUND[i] for i in registry.QUERIES)[:50]
        assert [LAST_CHECKED_ROUND[i] for i in order[:50]] == stalest_50
