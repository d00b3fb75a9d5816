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
    """Four tiers (the driver samples ~50 ids from the front):

    1. RECHECK_FIRST — ids whose latest driver row is non-green
       (VERDICT r8 #3: a fix shipped this round must get its driver
       re-verification THIS round, not after the unchecked tail
       drains; round 8's decode-oracle fix would otherwise have sat
       behind 16 never-checked ids).
    2. never-driver-checked ids WITH a DuckDB oracle (VERDICT r3 #2 —
       grow the cross-round union),
    3. never-driver-checked rows-only ids (VERDICT r6 #1 — these earn
       only a weaker rows-only row, so they queue after oracled ones),
    4. everything already green, OLDEST-CHECKED-FIRST (VERDICT r9 #6:
       with the cross-round union at 345/345, each round's ~50 slots
       rotate to the stalest green rows instead of re-spending on
       recently-verified ones) — sorted by LAST_CHECKED_ROUND
       ascending, stable registry order within a round.

    Stable registry order within each tier — ids themselves stay
    byte-stable across rounds."""
    from sparkifydb_datawarehouse_spark.driver_history import (
        DRIVER_CHECKED,
        LAST_CHECKED_ROUND,
        RECHECK_FIRST,
    )

    oracled = registry.ORACLE
    recheck = [i for i in ids if i in RECHECK_FIRST]
    unchecked_oracled = [
        i
        for i in ids
        if i not in RECHECK_FIRST and i not in DRIVER_CHECKED and i in oracled
    ]
    unchecked_rows_only = [
        i
        for i in ids
        if i not in RECHECK_FIRST and i not in DRIVER_CHECKED and i not in oracled
    ]
    checked = [
        i for i in ids if i not in RECHECK_FIRST and i in DRIVER_CHECKED
    ]
    checked.sort(key=lambda i: LAST_CHECKED_ROUND[i])  # stable: ties keep registry order
    return recheck + unchecked_oracled + unchecked_rows_only + checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    queries_map, _ = _loaded_registry()
    return {i: queries_map[i] for i in _coverage_order(queries_map)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (rows-only ops omitted)."""
    _, oracle_map = _loaded_registry()
    return {i: oracle_map[i] for i in _coverage_order(oracle_map)}
