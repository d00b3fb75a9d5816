#!/usr/bin/env python
"""Generate a K×-scaled copy of a fixture dir for scaling experiments:

    python tools/make_scaled.py [K] [src_sf_dir] [dst_dir]
    # defaults: 10 /root/testdata/sf0.1 data/scaled_10x

Replication strategy (keys offset so join relationships hold):
- lineitem/orders: l_orderkey/o_orderkey += k*MAX_OK; o_custkey and
  customer.c_custkey += k*MAX_CK. part/supplier/nation/region stay
  single-copy dims (their keys are reused by every replica — the
  realistic shape: facts grow, dims don't).
- events: event_id += k*MAX_EV; ts += k*31 days so replicas are
  temporally disjoint (otherwise watermark/session/dedup queries
  would see K identical copies of every instant — an artifact, not
  scale). ts is written as int64 nanos to match the fixture format
  that tables.load_table expects.
- documents: doc_id += k*MAX_DOC, and every 5th token gets a
  replica-unique marker appended. Without the perturbation each doc
  would have K exact clones, LSH buckets would grow K-deep, and pair
  output would scale K² — a degenerate corpus, not a bigger one.
  With it, near-dup structure WITHIN a replica (the realistic signal)
  is preserved and cross-replica collisions vanish.
- embeddings: vec_id += k*MAX_VEC (the banded candidate joins are
  id-local, so replicas contribute independent neighborhoods).

Run the bench against the result with:
    SPARK_GRAFT_SF_DIR=data/scaled_10x python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from sparkifydb_datawarehouse_spark.session import get_spark
from sparkifydb_datawarehouse_spark.tables import TABLE_NAMES, load_table, table_path


def _replicate(df: DataFrame, k: int, build) -> DataFrame:
    out = build(df, 0)
    for i in range(1, k):
        out = out.unionByName(build(df, i))
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "data/scaled_10x"
    os.makedirs(dst, exist_ok=True)

    spark = get_spark("make-scaled")
    spark.sparkContext.setLogLevel("ERROR")

    t = {name: load_table(spark, src, name) for name in TABLE_NAMES}
    max_ok = t["orders"].agg(F.max("o_orderkey")).first()[0] + 1
    max_ck = t["customer"].agg(F.max("c_custkey")).first()[0] + 1
    max_ev = t["events"].agg(F.max("event_id")).first()[0] + 1
    max_doc = t["documents"].agg(F.max("doc_id")).first()[0] + 1
    max_vec = t["embeddings"].agg(F.max("vec_id")).first()[0] + 1

    plans: dict[str, DataFrame] = {}
    for dim in ("region", "nation", "supplier", "part"):
        plans[dim] = t[dim]

    plans["customer"] = _replicate(
        t["customer"], k,
        lambda df, i: df.withColumn("c_custkey", F.col("c_custkey") + i * max_ck),
    )
    plans["orders"] = _replicate(
        t["orders"], k,
        lambda df, i: df.withColumn("o_orderkey", F.col("o_orderkey") + i * max_ok)
        .withColumn("o_custkey", F.col("o_custkey") + i * max_ck),
    )
    plans["lineitem"] = _replicate(
        t["lineitem"], k,
        lambda df, i: df.withColumn("l_orderkey", F.col("l_orderkey") + i * max_ok),
    )
    # ts arrives as TimestampType (load_table normalizes every fixture
    # generation); unix_micros is the value-exact long form.
    # cast("long") would truncate to SECONDS and silently write
    # 1970-era garbage — caught when a calendar-split query found one
    # slice empty at 10×.
    plans["events"] = _replicate(
        t["events"], k,
        lambda df, i: df.withColumn("event_id", F.col("event_id") + i * max_ev)
        .withColumn(
            "ts",
            # int64 nanos, shifted k*31 days — matches the nanos
            # fixture format (load_table reads it back via
            # nanosAsLong)
            (F.unix_micros(F.col("ts")) + F.lit(i * 31 * 86400 * 10**6)) * 1000,
        ),
    )

    def perturb_docs(df: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return df
        marked = F.concat_ws(
            " ",
            F.expr(
                f"transform(split(text, ' '), (w, j) -> "
                f"IF(j % 5 = 4, concat(w, ' zz{i}zz'), w))"
            ),
        )
        return df.withColumn("doc_id", F.col("doc_id") + i * max_doc).withColumn(
            "text", marked
        ).withColumn("n_chars", F.length(marked))

    plans["documents"] = _replicate(t["documents"], k, perturb_docs)
    plans["embeddings"] = _replicate(
        t["embeddings"], k,
        lambda df, i: df.withColumn("vec_id", F.col("vec_id") + i * max_vec),
    )

    for name, df in plans.items():
        path = table_path(dst, name)
        df.coalesce(max(1, k // 2)).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows -> {path}", flush=True)


if __name__ == "__main__":
    main()
