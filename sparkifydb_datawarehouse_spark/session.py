"""SparkSession factory with scale-aware defaults.

The reference delegates all physical tuning to Redshift defaults
(no DISTKEY/SORTKEY anywhere in /root/reference/sql_queries.py:19-97);
our analog is "let Catalyst + AQE pick the plan" with a small set of
explicit knobs that matter at 100 TB:

- AQE on: runtime partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion replace hand-scheduling.
- shuffle.partitions sized for the test harness (local[32]); on a
  real 1000-executor cluster this should be ~2-3x total cores or
  left to AQE's coalescing with a high initial value.
- Arrow enabled: every Pandas UDF / applyInPandas / mapInPandas path
  (LLM ops, multimodal) moves data via Arrow batches, not pickle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sparkifydb-datawarehouse-spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] for the harness; on a cluster the same
    builder works unchanged — master/deploy-mode come from spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Runtime re-planning: partition coalescing, skew splits,
        # broadcast switch — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        # Arrow for all pandas-UDF exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Timestamps: keep session in UTC so epoch-millis round-trips
        # and DuckDB-oracle comparisons are timezone-stable.
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver JVM hosts all executor threads — size it
        # for 32-way parallelism (interpreted higher-order functions in the
        # sketch ops allocate heavily; a small heap turns into GC thrash)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
