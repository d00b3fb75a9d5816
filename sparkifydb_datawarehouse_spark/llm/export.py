"""Training-corpus export: sharded JSONL with a manifest — the hand-off
format between the warehouse and a training data loader.

The reference only ever LOADS JSON (COPY from S3,
/root/reference/sql_queries.py:102-114); a training pipeline also has
to hand data back OUT as line-delimited JSON shards of bounded size
with a manifest the loader can plan against (shard count, row counts,
byte sizes, content hash).

Scale design (100 TB):
- Shard count is computed from MEASURED input size (same discipline
  as sources/compaction.py), not guessed; rows are routed to shards
  by deterministic hash so the export is reproducible run-to-run and
  resumable per shard.
- The write is one `repartition(n, shard_key)` + `write.json` — each
  shard is written by exactly one task, in parallel, no driver
  involvement. (A pure `repartition(n)` round-robin would balance
  better but is not deterministic across retries — determinism wins
  for training data.)
- The manifest is built from a per-shard AGGREGATION of the exported
  frame (count + byte size + xxhash64 content hash per shard), not
  from listing output files — so it also works on object stores with
  eventual listing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_key: str,
    n_shards: int,
) -> dict:
    """Write df as n_shards JSONL shard directories under `path` plus
    a manifest.json; returns the manifest dict. Shard assignment is
    pmod(xxhash64(shard_key), n_shards) — deterministic per row."""
    shard = F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards)).alias("_shard")
    with_shard = df.withColumn("_shard", shard)
    payload_cols = [c for c in df.columns]
    (
        with_shard.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", shard_key)
        .write.mode("overwrite")
        .partitionBy("_shard")
        .json(path)
    )
    stats = (
        with_shard.select(
            "_shard",
            F.to_json(F.struct(*payload_cols)).alias("line"),
            F.col(shard_key).alias("_key"),
        )
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # +1/line: the newline the JSONL writer appends
            (F.sum(F.length("line")) + F.count(F.lit(1))).alias("approx_bytes"),
            # bit_xor, not sum: order-independent like sum but cannot
            # overflow ANSI long arithmetic
            F.bit_xor(F.xxhash64("line")).alias("content_hash"),
        )
        .orderBy("_shard")
        .collect()
    )
    manifest = {
        "format": "jsonl",
        "shard_key": shard_key,
        "n_shards": n_shards,
        "total_rows": int(sum(r["n_rows"] for r in stats)),
        "shards": [
            {
                "shard": int(r["_shard"]),
                "n_rows": int(r["n_rows"]),
                "approx_bytes": int(r["approx_bytes"]),
                "content_hash": int(r["content_hash"]),
            }
            for r in stats
        ],
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
