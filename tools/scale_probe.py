#!/usr/bin/env python
"""1x/10x/100x scale probe for the shuffle-carrying headline queries
(VERDICT r4 #4).

    python tools/scale_probe.py [query ...]

Runs each query at /root/testdata/sf0.1 (1x), data/scaled_10x (10x),
and data/scaled_100x (100x) — fixtures produced by tools/make_scaled.py,
which offsets keys so join relationships hold and perturbs documents so
near-dup structure stays within-replica (pair output grows ~K, not K^2).

Timing protocol matches bench.py: noop-format write forces full
execution without sink cost; one untimed 1x warmup run per query pays
the codegen-compile cost, then min-of-2 at every scale. Emits one
markdown table row per query with the 10x/1x and 100x/10x wall ratios —
the numbers SCALING.md section (s) records. Run on a quiet host (the
probe prints the bench's synthetic-control load index first).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.session import get_spark

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "data/scaled_10x"),
    ("100x", "data/scaled_100x"),
]

DEFAULT = [
    "q_dedup_exact",
    "q_dedup_fuzzy_minhash",
    "q_dedup_lsh_verified",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_containment",
    "q_dq_referential",
    "q_corpus_funnel",
    "q_basket_pairs",
    "q_text_tfidf",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    registry.load_all_modules()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    (
        spark.range(0, 1_000_000_000, 1, 32)
        .selectExpr("sum(xxhash64(id) % 1000003) as s")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    print(f"control_sec={time.perf_counter() - t0:.2f}", flush=True)

    print("| query | 1x s | 10x s | 100x s | 10x/1x | 100x/10x |")
    print("|---|---|---|---|---|---|")
    for name in names:
        run(name, SCALES[0][1])  # warmup: codegen compile at 1x
        t = {}
        for label, sf_dir in SCALES:
            t[label] = min(run(name, sf_dir), run(name, sf_dir))
        print(
            f"| {name} | {t['1x']:.2f} | {t['10x']:.2f} | {t['100x']:.2f} "
            f"| {t['10x'] / t['1x']:.1f} | {t['100x'] / t['10x']:.1f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
