"""Document chunking — sliding token windows with overlap, the
context-window preparation step between cleaning and embedding/packing
in a training or RAG pipeline (each chunk becomes an embedding row /
training sample; llm/packing.py then packs them to a token budget).

Reference has no text ops at all (its surface is 7 SQL statements,
/root/reference/sql_queries.py) — this is Part-B LLM-pipeline surface
mandated by BASELINE.json.

Scale design (100 TB): chunking is MAP-ONLY — one codegen pass
(tokenize, sequence of starts, slice per start) and a generator
explode; no shuffle at all, so it composes with whatever partitioning
the downstream stage needs. Chunk fan-out is bounded by
ceil(n_tokens/stride) per document; the stride guard below never
emits a chunk whose tokens are fully contained in its predecessor, so
output volume is <= input tokens x (chunk/stride) with no degenerate
tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

CHUNK_TOKENS = 16
STRIDE = 12  # 4-token overlap between consecutive chunks

# start positions: 0, STRIDE, 2*STRIDE, ... bounded so a start whose
# window adds no new token (fully covered by the previous chunk, i.e.
# s >= n - CHUNK + STRIDE) is never generated; the bound stays >= 0 so
# short docs still get their single chunk 0
_STARTS = (
    f"sequence(0, greatest(size(toks) - {CHUNK_TOKENS} + {STRIDE} - 1, 0), {STRIDE})"
)

_ORACLE_CHUNKING = f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS toks
    FROM documents
), s AS (
    SELECT doc_id, toks, len(toks) AS n,
           UNNEST(generate_series(0, GREATEST(len(toks) - {CHUNK_TOKENS} + {STRIDE} - 1, 0), {STRIDE})) AS start
    FROM t
    WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start / {STRIDE} AS BIGINT) AS chunk_idx,
       CAST(LEAST({CHUNK_TOKENS}, n - start) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, start + 1, start + {CHUNK_TOKENS}), ' ') AS chunk_text
FROM s
ORDER BY doc_id, chunk_idx
"""


@query("q_text_chunking", oracle=_ORACLE_CHUNKING)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunks of CHUNK_TOKENS tokens at STRIDE spacing
    per document (overlap = CHUNK_TOKENS - STRIDE), with per-chunk
    token counts. chunk_idx is dense per doc; the final chunk may be
    short but always contributes at least one new token."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    return (
        base.select(
            "doc_id",
            F.size("toks").alias("n"),
            "toks",
            F.explode(F.expr(_STARTS)).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / STRIDE).cast("long").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("start"))
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("toks", F.col("start") + 1, CHUNK_TOKENS)
            ).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
