"""Sequence packing — assign documents to fixed token-budget training
bins (the Megatron-style contiguous packing pass that turns a corpus
into equal-budget samples).

Semantics: within each source (the pack stream), documents are taken
in doc_id order; a document starts a new bin when the running token
total before it has crossed another multiple of the budget. This is
CONTIGUOUS packing — the deterministic, shuffle-light form used by
real pretraining pipelines — not NP-hard bin packing (first-fit
variants need per-bin state and buy a few % fill at the cost of
determinism and parallelism).

Plan shape: one window cumsum per source partition + arithmetic.
One shuffle on source; no state, no UDF, fully oracle-checkable.
At 100 TB the window partitions by (source, day-bucket) so no single
partition holds a whole source's corpus.

Token counts: whitespace tokenization (llm/textstats.py owns the
richer tokenizers); budget 512 tokens keeps fixture bins small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table

_BUDGET = 512

_ORACLE_PACK = f"""
WITH toks AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
               AS n_tokens
    FROM documents
),
runs AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS tokens_before
    FROM toks
)
SELECT source,
       CAST(FLOOR(tokens_before / {_BUDGET}) AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM runs
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


@query("q_pack_sequences", oracle=_ORACLE_PACK)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = docs.select("doc_id", "source", n_tokens.alias("n_tokens")).withColumn(
        "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        runs.groupBy(
            "source",
            F.floor(F.col("tokens_before") / _BUDGET).alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin_id")
    )
