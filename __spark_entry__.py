"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``sparkifydb_datawarehouse_spark/``; this
module is a thin adapter over its registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkifydb_datawarehouse_spark import registry


def _loaded_registry() -> tuple[dict, dict]:
    registry.load_all_modules()
    return registry.QUERIES, registry.ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries_map, _ = _loaded_registry()
    return queries_map["q_flagship_revenue_by_region"](spark, "/root/testdata/sf0.001")


def _coverage_order(ids) -> list[str]:
    """Never-driver-checked ids first (VERDICT r3 #2); inside that
    group, ids WITH a DuckDB oracle before declared rows-only ids
    (VERDICT r6 #1 — round 6 burned 3 of its ~50 slots on ``no_oracle``
    rows because rows-only ids sat ahead of oracled unchecked ones).
    Stable registry order within each group — ids themselves stay
    byte-stable across rounds."""
    from sparkifydb_datawarehouse_spark.driver_history import DRIVER_CHECKED

    oracled = registry.ORACLE
    unchecked_oracled = [
        i for i in ids if i not in DRIVER_CHECKED and i in oracled
    ]
    unchecked_rows_only = [
        i for i in ids if i not in DRIVER_CHECKED and i not in oracled
    ]
    checked = [i for i in ids if i in DRIVER_CHECKED]
    return unchecked_oracled + unchecked_rows_only + checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    queries_map, _ = _loaded_registry()
    return {i: queries_map[i] for i in _coverage_order(queries_map)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (rows-only ops omitted)."""
    _, oracle_map = _loaded_registry()
    return {i: oracle_map[i] for i in _coverage_order(oracle_map)}
