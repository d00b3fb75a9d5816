"""Custom source connector via the Python DataSource API (Spark 4).

The reference's only "connector" is Redshift COPY FROM S3
(/root/reference/sql_queries.py:102-114). The modern PySpark-native
analog for a system Spark has no built-in reader for is a
`pyspark.sql.datasource.DataSource` subclass: the driver asks for a
partition list, then EXECUTORS call `read(partition)` in parallel —
a plan-integrated source, not a driver-side collect-and-parallelize.

This one generates deterministic synthetic rows (the shape of an API
/ billing-feed backfill). The row formula is pure arithmetic on the
row id, which makes the source oracle-checkable: DuckDB reproduces
it from range(). What's being verified is the CONNECTOR contract —
partitioned parallel reads, arrow-batch ingestion, filter pushdown —
not the generator.

Scale posture: `partitions()` splits the id space into fixed-size
ranges, so parallelism scales with data volume, each task streams
its range (no per-partition materialization), and `pushFilters`
accepts equality filters on `bucket`, so a filtered scan skips work
at the source instead of generating rows Spark immediately drops.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

ROWS_PER_PARTITION = 100_000


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row(i: int) -> tuple[int, int, float, str]:
    return (i, i % 10, round((i * 37 % 1000) / 10.0, 1), chr(65 + i % 4))


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.bucket_eq: int | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            # accept bucket equality — the source then generates only
            # matching ids; everything else is Spark's to re-check
            if isinstance(f, EqualTo) and f.attribute == ("bucket",):
                self.bucket_eq = int(f.value)
            else:
                yield f

    def partitions(self) -> Sequence[RangePartition]:
        return [
            RangePartition(s, min(s + ROWS_PER_PARTITION, self.n))
            for s in range(0, self.n, ROWS_PER_PARTITION)
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        rng = range(partition.start, partition.end)
        if self.bucket_eq is not None:
            # ids with i % 10 == b form an arithmetic progression:
            # jump straight to them instead of generate-and-drop
            first = partition.start + (self.bucket_eq - partition.start) % 10
            rng = range(first, partition.end, 10)
        for i in rng:
            yield _row(i)


class SyntheticRowsStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor of the same feed: the offset is the row id
    watermark. Each micro-batch advances by `rows_per_batch`, so the
    source is replayable from any committed offset — exactly-once
    under checkpoint recovery (readBetweenOffsets re-yields a range
    deterministically; commit() has nothing to clean up because the
    generator owns no external state)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.n)
        # iter(list), not a generator: the prefetched rows cross
        # process boundaries via pickle (generators don't pickle),
        # but Spark's prefetch cache also calls next() on it — a
        # pickleable list_iterator satisfies both
        return (iter([_row(i) for i in range(lo, hi)]), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["next"], end["next"])])


class SyntheticRowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "id long, bucket int, amount double, category string"

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticRowsStreamReader:
        return SyntheticRowsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticRowsDataSource)


# --------------------------------------------------------------------------
# Oracle-checked query over the connector
# --------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..registry import query  # noqa: E402

_N = 25_000

_ORACLE_PYSOURCE = f"""
SELECT category,
       COUNT(*) AS n_rows,
       ROUND(SUM(amount), 2) AS total_amount,
       MIN(id) AS first_id,
       MAX(id) AS last_id
FROM (
    SELECT i AS id,
           (i % 10) AS bucket,
           ROUND((i * 37 % 1000) / 10.0, 1) AS amount,
           chr(65 + CAST(i % 4 AS INT)) AS category
    FROM range({_N}) t(i)
)
WHERE bucket = 3
GROUP BY category
ORDER BY category
"""


@query("q_scan_pysource", oracle=_ORACLE_PYSOURCE)
def scan_pysource(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark)
    # implementing pushFilters() requires opting in (runtime conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return (
        spark.read.format("synthetic_rows")
        .option("n", _N)
        .load()
        .filter(F.col("bucket") == 3)
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
            F.min("id").alias("first_id"),
            F.max("id").alias("last_id"),
        )
        .orderBy("category")
    )
