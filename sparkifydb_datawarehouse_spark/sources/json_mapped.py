"""Schema-mapped JSON source — the Spark analog of Redshift COPY's
JSONPaths mapping (reference: staging_events_copy uses a JSONPaths
file to map camelCase JSON keys onto snake_case columns,
/root/reference/sql_queries.py:102-107 + /root/reference/dwh.cfg:13;
staging_songs_copy matches keys by name via JSON 'auto',
/root/reference/sql_queries.py:109-114).

Design: `spark.read.schema(S).json(path)` gives a parallel, splittable
scan with explicit types (never infer on production loads — schema
inference is a full extra pass over 100 TB); the mapping is a plain
select of aliases, which Catalyst folds into the scan's ReadSchema.
Epoch-millis columns (TIMEFORMAT 'epochmillisecs' analog) are declared
in `millis_columns` and converted with timestamp_millis after the
mapped select.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json_mapped(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mapping: Mapping[str, str] | None = None,
    millis_columns: Sequence[str] = (),
) -> DataFrame:
    """Read JSON-lines with an explicit schema, rename via `mapping`
    (source key → target column; identity for unlisted columns), then
    parse epoch-milliseconds columns into timestamps.

    `mapping=None` is the JSON 'auto' case: keys already match.
    """
    df = spark.read.schema(schema).json(path)
    if mapping:
        df = df.select(
            *[F.col(src).alias(dst) for src, dst in mapping.items()]
        )
    for col in millis_columns:
        # reference TIMEFORMAT 'epochmillisecs': numeric ms (possibly
        # float, e.g. registration) → TimestampType. cast('long')
        # truncates, matching DuckDB CAST(BIGINT) for integral floats.
        df = df.withColumn(col, F.timestamp_millis(F.col(col).cast("long")))
    return df
