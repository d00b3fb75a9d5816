#!/usr/bin/env python
"""Full-corpus sketch-audit probe — the round ritual closing ADVICE r9
item #3.

The four registered sketch-audit contracts (fuzzy_minhash, simhash,
lsh_verified_stages, lsh_cap_profile) score recall against the FIXED
doc_id < 500 anchor slice since round 9 (constant audit cost at any
corpus scale). A full-corpus sketch regression confined to docs
OUTSIDE the anchor is invisible to those driver rows — this probe is
the periodic full-corpus check: exact prefix-filter truth over the
whole corpus at the given SF, sketch recall measured against it.

    python tools/anchor_audit.py [sf_dir]      # default /root/testdata/sf0.1

Prints one line per audit and exits nonzero if any floor is violated:
  minhash band recall >= 0.90  (contract floor)
  simhash recall      >= 0.85  (contract floor; measured 0.879 sf0.1 r8)
  stages: every stage retains every full-corpus truth pair (recall 1.0
  on the fixtures; on self-similar replicas the banding curve's
  residual miss shows here first)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkifydb_datawarehouse_spark.llm.dedup import (  # noqa: E402
    dedup_lsh_verified_stages_detail,
    dedup_prefix_filter,
    minhash_band_pairs,
    simhash_pairs,
)
from sparkifydb_datawarehouse_spark.session import get_spark  # noqa: E402
from sparkifydb_datawarehouse_spark.tables import load_table  # noqa: E402

MINHASH_FLOOR = 0.90
SIMHASH_FLOOR = 0.85


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    t0 = time.time()
    truth = (
        dedup_prefix_filter(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_true = truth.count()
    print(f"full-corpus truth: {n_true} pairs in {time.time() - t0:.1f}s")
    docs = load_table(spark, sf_dir, "documents")
    failures = []

    for name, pairs, floor in (
        ("minhash_band", minhash_band_pairs(docs), MINHASH_FLOOR),
        ("simhash", simhash_pairs(docs), SIMHASH_FLOOR),
    ):
        t0 = time.time()
        hit = truth.join(
            pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi"
        ).count()
        recall = hit / n_true if n_true else 1.0
        ok = recall >= floor
        print(
            f"{name}: recall {recall:.4f} ({hit}/{n_true}) floor {floor} "
            f"{'OK' if ok else 'FAIL'} in {time.time() - t0:.1f}s"
        )
        if not ok:
            failures.append(name)

    t0 = time.time()
    stages = dedup_lsh_verified_stages_detail(spark, sf_dir, truth=truth).collect()
    for row in stages:
        flag = "OK" if row["n_true_recalled"] == row["n_true"] else "FAIL"
        print(
            f"stages/{row['stage']}: {row['n_true_recalled']}/{row['n_true']} "
            f"recall {row['recall']} {flag}"
        )
        if row["n_true_recalled"] != row["n_true"]:
            failures.append(f"stages/{row['stage']}")
    print(f"stages detail in {time.time() - t0:.1f}s")

    if failures:
        print(f"FULL-CORPUS AUDIT FAILURES: {failures}")
        return 1
    print("full-corpus sketch audits: all floors hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
