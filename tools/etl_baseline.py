#!/usr/bin/env python
"""Measured end-to-end run of the reference-parity ETL (VERDICT r5 #7):
`create` + `process` with per-stage wall timings and output row counts,
printed as the BASELINE.md row source.

    python tools/etl_baseline.py [--warehouse data/etl_baseline_wh]

The reference's etl.py logs per-statement (2 COPY + 5 INSERT...SELECT,
/root/reference/etl.py:22-47); this prints the same shape for the
Spark replica so the parity claim has a pipeline-level number, not
just per-query oracle checks. Row counts must match the oracled
q_sparkify_* totals (the driver re-proves those per round).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkifydb_datawarehouse_spark.__main__ import create
from sparkifydb_datawarehouse_spark.pipelines.sparkify import run_pipeline
from sparkifydb_datawarehouse_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", default="data/etl_baseline_wh")
    ap.add_argument(
        "--scale",
        type=int,
        default=1,
        help="K-times reference-shaped corpus (VERDICT r6 #6): 12K songs, "
        "300K events over 8K users, events split across min(K,32) files; "
        "1 = the committed fixture",
    )
    args = ap.parse_args()

    log_dir = song_dir = None
    if args.scale > 1:
        from sparkifydb_datawarehouse_spark.pipelines.sparkify import (
            generate_scaled_corpus,
        )

        log_dir, song_dir = generate_scaled_corpus(
            f"data/sparkify_scaled_{args.scale}x", args.scale
        )

    t_session = time.perf_counter()
    spark = get_spark("etl-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    session_sec = time.perf_counter() - t_session

    t0 = time.perf_counter()
    create(args.warehouse)
    create_sec = time.perf_counter() - t0

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    counts = run_pipeline(
        spark, args.warehouse, timings=timings, log_dir=log_dir, song_dir=song_dir
    )
    process_sec = time.perf_counter() - t0
    print(f"scale={args.scale}x")

    print("| stage | wall s | rows out |")
    print("|---|---|---|")
    print(f"| session start | {session_sec:.2f} | — |")
    print(f"| create (drop-then-create) | {create_sec:.2f} | — |")
    for stage, sec in timings.items():
        table = stage.removeprefix("insert_")
        rows = counts.get(table, "—")
        print(f"| {stage} | {sec:.2f} | {rows} |")
    print(f"| **process total** | **{process_sec:.2f}** | — |")
    print(f"counts={counts}", flush=True)


if __name__ == "__main__":
    main()
