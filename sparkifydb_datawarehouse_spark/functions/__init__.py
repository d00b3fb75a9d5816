"""Public column-function surface — the reusable expression helpers
behind the registered queries, importable directly by engine users:

    from sparkifydb_datawarehouse_spark.functions import cosine, dow

Each is a pure Column-in/Column-out helper (JVM expression level, no
UDFs) defined next to the operator family that motivated it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..llm.dedup import _word_shingles as word_shingles  # noqa: F401
from ..llm.dedup import canonical_url, cosine  # noqa: F401
from ..llm.similarity import sign_bucket  # noqa: F401
from ..operators.sampling import hash_bucket  # noqa: F401


def dow(col: str | Column) -> Column:
    """Redshift/DuckDB-style day-of-week: 0=Sunday..6=Saturday.
    (Spark's dayofweek is 1..7 — SURVEY §2 A14 shim.)"""
    return (F.dayofweek(col) - 1).cast("long")


def epoch_millis_to_ts(col: str | Column) -> Column:
    """TIMEFORMAT 'epochmillisecs' analog: numeric epoch-ms (int or
    float) → TimestampType, truncating like Redshift COPY / DuckDB
    epoch_ms."""
    return F.timestamp_millis(F.col(col).cast("long") if isinstance(col, str) else col.cast("long"))


def nullif_sentinel(col: str | Column, sentinel) -> Column:
    """Sentinel-value → NULL (the reference's year-0 pattern,
    sql_queries.py:141-143)."""
    return F.nullif(F.col(col) if isinstance(col, str) else col, F.lit(sentinel))


__all__ = [
    "canonical_url",
    "cosine",
    "dow",
    "epoch_millis_to_ts",
    "hash_bucket",
    "nullif_sentinel",
    "sign_bucket",
    "word_shingles",
]
