#!/usr/bin/env python
"""Build data/scaled_part10x: the DIMENSION-growth probe fixture.

    python tools/make_part_scaled.py [K] [src_sf_dir] [dst_dir]
    # defaults: 10 /root/testdata/sf0.1 data/scaled_part10x

make_scaled.py holds dimensions fixed while scaling facts (the
realistic fact-growth shape); this one does the opposite — part is
replicated K× with offset keys while every other table symlinks to
the source — so dimension-blocked queries (Jaro-Winkler / Levenshtein
linkage, min-cost-supplier style joins) can be probed where their
cost actually lives: block DEPTH. Blocked pair volume grows K², so
expect quadratic-family numbers (SCALING.md, round-5 JW entry).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.session import get_spark


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "data/scaled_part10x"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("make-part-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    for t in (
        "region", "nation", "customer", "supplier",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(os.path.join(src, f"{t}.parquet")), link)
    part = spark.read.parquet(os.path.join(src, "part.parquet"))
    mx = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    out = None
    for i in range(k):
        rep = part.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * mx))
        out = rep if out is None else out.unionByName(rep)
    out.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(dst, "part.parquet")
    )
    print(f"wrote {dst}: part x{k}, other tables symlinked to {src}")


if __name__ == "__main__":
    main()
