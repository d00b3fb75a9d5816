#!/usr/bin/env python
"""Build a DIMENSION-growth probe fixture for any dimension table(s)
(VERDICT r5 #5 — make_part_scaled.py generalized; the JW/Levenshtein
finding showed the blind-spot class: dimension-blocked queries stay
flat when only facts scale).

    python tools/make_dim_scaled.py <dims_csv> [K] [src_sf_dir] [dst_dir]
    # e.g.: python tools/make_dim_scaled.py customer,supplier 10 \
    #           /root/testdata/sf0.1 data/scaled_custsupp10x

Each named dimension is replicated K× with its primary key offset so
rows stay distinct; every other table symlinks to the source.
Replicated dim rows are NOT referenced by facts — the point is block
DEPTH for dimension-blocked operators (linkage joins, geo grid,
scorecard broadcast), whose candidate volume grows K² per block.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.session import get_spark

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

PRIMARY_KEY = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}


def main() -> None:
    dims = [d for d in sys.argv[1].split(",") if d]
    for d in dims:
        assert d in PRIMARY_KEY, f"not a dimension table: {d}"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[4]
        if len(sys.argv) > 4
        else f"data/scaled_{''.join(d[0] for d in dims)}dim{k}x"
    )
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("make-dim-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ALL_TABLES:
        if t in dims:
            continue
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(os.path.join(src, f"{t}.parquet")), link)
    for t in dims:
        key = PRIMARY_KEY[t]
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        mx = df.agg(F.max(key)).collect()[0][0] + 1
        out = None
        for i in range(k):
            rep = df.withColumn(key, F.col(key) + F.lit(i * mx))
            out = rep if out is None else out.unionByName(rep)
        out.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
        print(f"{t}: x{k} with {key} offset -> {dst}", flush=True)
    print(f"wrote {dst}; other tables symlinked to {src}")


if __name__ == "__main__":
    main()
