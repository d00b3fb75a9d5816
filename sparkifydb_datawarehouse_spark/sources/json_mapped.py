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

import json
import re
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Redshift JSONPaths accepts two spellings for a top-level field:
# bracket form $['key'] / $["key"] and dot form $.key
_JSONPATH_RE = re.compile(
    r"^\$(?:\[(?P<q>['\"])(?P<bracket>[^'\"\[\]]+)(?P=q)\]|\.(?P<dot>[A-Za-z0-9_]+))$"
)


def mapping_from_jsonpaths(
    jsonpaths_path: str, columns: Sequence[str]
) -> dict[str, str]:
    """Parse a Redshift COPY JSONPaths document into a source-key →
    target-column mapping for `read_json_mapped`.

    The reference's events load maps columns through such a file
    (`COPY ... json 's3://.../log_json_path.json'`,
    /root/reference/sql_queries.py:102-107 + /root/reference/dwh.cfg:13).
    Redshift's semantics, reproduced here: the file is
    `{"jsonpaths": ["$['firstName']", ...]}` and each path is matched
    to the target table's columns BY POSITION in table-definition
    order — path names are never compared to column names
    (`sql_queries.py:20-37` is that column order for staging_events).

    Only top-level field paths are supported (all the reference uses);
    a nested path or a path-count/column-count mismatch raises — a
    mis-aligned positional mapping silently scrambles columns, the
    worst possible failure mode for a loader.
    """
    with open(jsonpaths_path) as f:
        doc = json.load(f)
    paths = doc.get("jsonpaths")
    if not isinstance(paths, list):
        raise ValueError(f"{jsonpaths_path}: expected a top-level 'jsonpaths' array")
    if len(paths) != len(columns):
        raise ValueError(
            f"{jsonpaths_path}: {len(paths)} jsonpaths vs {len(columns)} "
            f"target columns — positional mapping requires an exact match"
        )
    mapping: dict[str, str] = {}
    for path, col in zip(paths, columns):
        m = _JSONPATH_RE.match(path.strip())
        if not m:
            raise ValueError(
                f"{jsonpaths_path}: unsupported jsonpath {path!r} "
                f"(only top-level $['field'] / $.field forms)"
            )
        mapping[m.group("bracket") or m.group("dot")] = col
    return mapping


def read_json_mapped(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mapping: Mapping[str, str] | None = None,
    millis_columns: Sequence[str] = (),
    varchar_caps: Mapping[str, int] | None = None,
) -> DataFrame:
    """Read JSON-lines with an explicit schema, rename via `mapping`
    (source key → target column; identity for unlisted columns), then
    parse epoch-milliseconds columns into timestamps.

    `mapping=None` is the JSON 'auto' case: keys already match.

    `varchar_caps` (target column → max length) reproduces the
    reference DDL's VARCHAR(n) load semantics (sql_queries.py:20-37:
    first_name/last_name/page 30, level 10, method 3) as a substring
    clamp in the staging select. Off by default — Spark's StringType
    is unbounded and strict Redshift COPY would REJECT over-length
    rows rather than truncate (truncation requires TRUNCATECOLUMNS,
    which the reference does not set); the clamp is the closest
    non-failing analog, applied per CHARACTER (Redshift counts bytes;
    identical for the fixtures' ASCII data).
    """
    df = spark.read.schema(schema).json(path)
    if mapping:
        df = df.select(
            *[F.col(src).alias(dst) for src, dst in mapping.items()]
        )
    for col, cap in (varchar_caps or {}).items():
        df = df.withColumn(col, F.substring(F.col(col), 1, cap))
    for col in millis_columns:
        # reference TIMEFORMAT 'epochmillisecs': numeric ms (possibly
        # float, e.g. registration) → TimestampType. cast('long')
        # truncates, matching DuckDB CAST(BIGINT) for integral floats.
        df = df.withColumn(col, F.timestamp_millis(F.col(col).cast("long")))
    return df
