"""Query + oracle registries.

Every operator the engine claims is registered here as
    name -> (spark, sf_dir) -> DataFrame
optionally paired with a DuckDB-runnable ANSI-SQL oracle string.
__spark_entry__.queries() / oracle_sql() read these dicts.

Contract (driver): column names of the Spark result and the oracle
result must match exactly — alias every computed column on BOTH
sides. Queries whose output is inherently nondeterministic
(surrogate keys, approx sketches, LSH buckets) register without an
oracle and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries (import side effects
    populate QUERIES/ORACLE). Called once by __spark_entry__."""
    from .operators import (  # noqa: F401
        affinity,
        agg_packs,
        allocation,
        aggregates,
        asof,
        binning,
        cdc,
        composites,
        decomposition,
        composites_tpch,
        diffing,
        drift,
        enumeration,
        experiments,
        flagship,
        forecast,
        functions_pack,
        fuzzy,
        geo,
        graph,
        intervals,
        joins,
        masking,
        merge,
        parity,
        pit,
        pivots,
        privacy,
        resample,
        skew,
        sorts,
        spark4_surface,
        stats,
        stats_tests,
        subqueries,
        survival,
        ts_advanced,
        profiling,
        quality,
        regression,
        sampling,
        segmentation,
        sequences,
        timeseries,
        udfs,
        udtfs,
        windows,
    )
    from .llm import (  # noqa: F401
        bpe,
        chunking,
        clustering,
        containment,
        corpus,
        dedup,
        lm_quality,
        grouped,
        multimodal,
        packing,
        prep_pipeline,
        pipeline,
        retrieval,
        similarity,
        textstats,
        tokenizer_unigram,
        tokenizer_wordpiece,
    )
    from .sources import (  # noqa: F401
        arrow_ipc,
        avro_source,
        binaryfile_source,
        csv_source,
        json_source,
        layout,
        orc_source,
        pysource,
        snapshots,
        text_source,
        xml_source,
    )
    from .streaming import joins as stream_joins  # noqa: F401
    from .streaming import stateful, topk as stream_topk  # noqa: F401
    from .streaming import windows as stream_windows  # noqa: F401
    from .pipelines import sparkify  # noqa: F401
