"""Binary-file source: Spark's built-in `binaryFile` format — the
ingestion path for opaque multimodal payloads (images, audio, video
frames) before the llm/multimodal.py plumbing takes over.

At 100 TB this is how raw media lands in the engine: one row per
object with (path, modificationTime, length, content BINARY), file
listing parallelized by the driver, content read lazily per task —
no shuffle at all (a pure scan). `pathGlobFilter` / recursive lookup
prune at the listing, and `spark.sql.files.maxPartitionBytes` governs
task granularity exactly as for parquet.

Here the fixture directory's own parquet files stand in as "opaque
binaries": the query proves the plumbing (schema, lazy content read,
deterministic projection) by fingerprinting each file's magic bytes.
Registered rows-only: no DuckDB analog reads raw files; the strong
check is the pytest asserting every content column starts with the
parquet magic PAR1 and the listing matches the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query


@query("q_scan_binaryfile")  # rows-only: raw-file scan has no SQL-view analog
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per file in the scale-factor directory: name, size, and
    the hex magic of the first 4 bytes (PAR1 for every fixture)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").cast("long").alias("n_bytes"),
            F.upper(F.hex(F.substring("content", 1, 4))).alias("magic_hex"),
        )
        .orderBy("file_name")
    )


@query("q_file_census")  # rows-only: the oracle needs a per-sf file path,
# which the static-oracle contract can't express; the value check runs in
# tests/test_new_ops_r3.py against DuckDB read_parquet(filename=true) at
# the SAME sf_dir.
def file_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout census: rows per physical input file via
    input_file_name() — the small-file / skewed-file detector every
    lakehouse compaction job starts from. The file identity flows
    through the scan for free (no shuffle beyond the per-file rollup);
    at 100 TB this is the report that decides OPTIMIZE/bin-packing."""
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("file_name")
    )
