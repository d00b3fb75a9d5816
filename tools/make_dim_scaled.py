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
    perturb = os.environ.get("DIM_PERTURB_NAMES") == "1"
    for t in dims:
        key = PRIMARY_KEY[t]
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        mx = df.agg(F.max(key)).collect()[0][0] + 1
        out = None
        for i in range(k):
            rep = df.withColumn(key, F.col(key) + F.lit(i * mx))
            if perturb and t == "part" and i > 0:
                # Natural-shape variant for the round-7 linkage probe:
                # every replica's p_name gets 3 deterministic interior
                # substitutions (positions i, i+3, i+6 mod len —
                # distinct for len ≥ 7; chars x/y/z, w when equal), so
                # DISTINCT names scale ×K while cross-replica pairs
                # stay OUT of both metrics (lev = 3 > 2; JW: m ≤
                # len−3 ⟹ jaro ≤ 0.8 < 5/6 ⟹ jw < 0.9) — the probe
                # stresses the signature candidate stages, not the
                # distinct-name dedup.
                rep = rep.withColumn("p_name", _perturb_name(i))
            out = rep if out is None else out.unionByName(rep)
        out.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
        tag = " (perturbed names)" if perturb and t == "part" else ""
        print(f"{t}: x{k} with {key} offset{tag} -> {dst}", flush=True)
    print(f"wrote {dst}; other tables symlinked to {src}")


def _perturb_name(i: int):
    """3 deterministic single-char substitutions at 1-indexed positions
    (i, i+3, i+6) mod len; the replacement char is REPLICA-dependent
    (cycles the alphabet with i) so every replica's variant is a
    distinct string — positions alone would collide mod len and
    saturate the distinct-name domain at ~len variants per base. One
    nested JVM expression, composed as SQL text."""
    expr = "p_name"
    for j in range(3):
        ch = chr(97 + (i + 5 * j) % 26)
        alt = chr(97 + (i + 5 * j + 13) % 26)
        pos = f"((({i} + {3 * j}) % length(p_name)) + 1)"
        expr = (
            f"concat(substring({expr}, 1, {pos} - 1), "
            f"if(substring(p_name, {pos}, 1) = '{ch}', '{alt}', '{ch}'), "
            f"substring({expr}, {pos} + 1, length(p_name)))"
        )
    return F.expr(expr)


if __name__ == "__main__":
    main()
