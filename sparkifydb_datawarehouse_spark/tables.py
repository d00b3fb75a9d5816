"""Fixture-table catalog.

The harness corpus (TESTDATA.md / FIXTURES.md §A) is ten parquet
tables per scale factor. This module is the single place that knows
how to load them and expose them as temp views, mirroring the
reference's fixed-table catalog (create_tables.py drives DDL for 7
named tables; here the "DDL" is the parquet footer schema).

Scale note: `spark.read.parquet` on a directory of files gives
splittable columnar scans with predicate pushdown and column pruning
for free; at 100 TB the same call reads a partitioned layout
(`.../table/date=.../part-*.parquet`) and Catalyst prunes partitions
from WHERE clauses — no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from the parquet footer —
    the analog of the reference's CREATE TABLE DDL
    (/root/reference/sql_queries.py:19-97)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        # Fixture generations differ in how events.ts is encoded:
        # TIMESTAMP(NANOS) (which Spark 4 refuses — [PARQUET_TYPE_ILLEGAL]
        # — unless read as long) or plain TIMESTAMP(MICROS). Normalize
        # both to TimestampType so every downstream query and oracle
        # sees one semantic.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", normalize_event_ts(df))
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_event_ts(df: DataFrame, col: str = "ts"):
    """TimestampType `ts` from whichever physical type the fixture
    used: nanos-as-long → integer-div to micros (integer `div`, NOT
    `/1000` — float division loses precision at 1e18 ns, and
    truncation matches DuckDB's ns→us cast); TIMESTAMP_NTZ (parquet
    isAdjustedToUTC=false, the pandas writer default) → cast, which
    under the UTC session timezone is value-preserving."""
    from pyspark.sql.types import LongType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    return F.col(col).cast("timestamp")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view so `spark.sql`
    queries see the same catalog names DuckDB's oracle does."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
