#!/usr/bin/env python
"""Candidate-degree-cap sensitivity probe for the two-tier LSH-verified
dedup join (VERDICT r5 #3).

    python tools/degree_cap_probe.py [sf_dir] [cap ...]
    # default: data/scaled_10x with caps 64 (registered default) and 16

For each cap: wall seconds (noop-write, min-of-2 after a warmup),
verified-pair count, and recall vs the exact prefix-filter truth on
the same corpus. Pass a 100x dir and a single cap for the wall-only
worst-case point (truth there costs more than the experiment).
Pair-level recall understates what dedup preserves: the cap keeps
every node's best edges (either-endpoint voting), so duplicate
CLUSTERS stay connected even when redundant intra-cluster edges are
shed — tests/test_llm_ops.py pins that on a 12-clique.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkifydb_datawarehouse_spark.session import get_spark
from sparkifydb_datawarehouse_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/scaled_10x"
    caps = [int(c) for c in sys.argv[2:]] or [64, 16]
    with_truth = os.environ.get("CAP_PROBE_TRUTH", "1") == "1"

    spark = get_spark("degree-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from sparkifydb_datawarehouse_spark.llm.dedup import (
        _lsh_verified_tiers,
        dedup_prefix_filter,
    )

    docs = load_table(spark, sf_dir, "documents")

    truth = None
    if with_truth:
        t0 = time.perf_counter()
        truth = (
            dedup_prefix_filter(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        n_true = truth.count()
        print(f"truth: {n_true} exact pairs in {time.perf_counter() - t0:.1f}s",
              flush=True)

    print("| cap | wall s (min-of-2) | verified pairs | recall vs exact |")
    print("|---|---|---|---|")
    for cap in caps:
        def run():
            t0 = time.perf_counter()
            *_, verified = _lsh_verified_tiers(docs, max_degree=cap)
            verified.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        if os.environ.get("CAP_PROBE_RUNS", "2") == "1":
            wall = run()  # single run: the 100x worst-case point
        else:
            run()  # warmup (codegen)
            wall = min(run(), run())
        *_, verified = _lsh_verified_tiers(docs, max_degree=cap)
        v = verified.select("doc_a", "doc_b").localCheckpoint(eager=True)
        n_pairs = v.count()
        if truth is not None:
            rec = truth.join(v, ["doc_a", "doc_b"], "left_semi").count() / max(
                1, n_true
            )
            rec_s = f"{rec:.4f}"
        else:
            rec_s = "(skipped)"
        print(f"| {cap} | {wall:.2f} | {n_pairs} | {rec_s} |", flush=True)


if __name__ == "__main__":
    main()
