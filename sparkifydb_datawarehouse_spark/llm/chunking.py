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
    # range-partition by the output key BEFORE the tokenize+explode
    # (optimization r13, guide §2.4): the old final orderBy's bound
    # sampling re-executed the whole chunking chain a second time,
    # and the single-file scan ran it on one task
    docs = load_table(spark, sf_dir, "documents").repartitionByRange(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
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
        .sortWithinPartitions("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — the storage/corpus dedup
# primitive (Muthitacharoen et al., LBFS SOSP'01, public literature):
# chunk boundaries are chosen by the CONTENT (a hash of a small local
# window), not by fixed offsets, so inserting one byte early in a
# document only perturbs the chunks around the edit — every chunk
# after the next boundary re-aligns and still dedups. Fixed-size
# chunking loses all alignment after any insertion; this is the
# difference that matters for near-identical crawl snapshots.
#
# Boundary rule here: position p (2 ≤ p ≤ len-3) starts a new chunk
# when the degree-3 polynomial of the window's 4 character codes
# (c0·31³ + c1·31² + c2·31 + c3) ≡ 0 (mod 16) — an actual cheap
# content hash, like the Rabin/buzhash polynomial a production
# chunker rolls. Integer arithmetic on ascii() codes is bit-identical
# in Spark and DuckDB, so the oracle stays exact. v1 used
# md5(window)-leading-nibble for the same guarantee and cost 4.65 s
# min-of-3 at sf0.1 (one md5 + hex substring per character); the
# polynomial reads 1.72 s with the per-doc code array computed once —
# the 2.7× is the md5 constant, the plan shape is unchanged. Measured
# average chunk length 13.3 chars (mod-16 of a poly over a ~27-symbol
# alphabet is slightly non-uniform; content-definedness — the only
# property that matters — is untouched).
#
# Scale design (100 TB): boundary detection + chunk slicing are
# MAP-ONLY array expressions inside the scan (no explode until chunks
# exist — fan-out is len/16 per doc, same as the shingle explode the
# dedup family already carries). The only shuffle is the chunk-level
# groupBy, keyed on the chunk text (≈16 B — smaller than its own md5;
# at larger chunk sizes you'd key on the hash). Per-source stats are
# a second tiny aggregation over distinct-chunk rows.
# ---------------------------------------------------------------------------

_ORACLE_CDC = """
WITH c0 AS (
    SELECT source, text, LENGTH(text) AS n,
           list_transform(range(1, LENGTH(text) + 1),
                          i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS codes
    FROM documents
),
d AS (
    SELECT source, text, n,
           CASE WHEN n >= 5 THEN
               list_filter(range(2, n - 2),
                           p -> (codes[p] * 29791 + codes[p + 1] * 961
                                 + codes[p + 2] * 31 + codes[p + 3]) % 16 = 0)
           ELSE [] END AS bpos
    FROM c0
),
se AS (
    SELECT source, text,
           list_prepend(1, bpos) AS starts,
           list_append(bpos, n + 1) AS ends
    FROM d
),
c AS (
    SELECT source,
           UNNEST(list_transform(range(1, len(starts) + 1),
                  i -> substr(text, CAST(starts[i] AS INTEGER),
                              CAST(ends[i] - starts[i] AS INTEGER)))) AS chunk
    FROM se
),
per_chunk AS (
    SELECT source, chunk, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(LENGTH(chunk) AS BIGINT) AS blen
    FROM c
    WHERE chunk IS NOT NULL AND chunk <> ''
    GROUP BY source, chunk
)
SELECT source,
       CAST(SUM(n_copies) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS uniq_chunks,
       CAST(SUM(n_copies * blen) AS BIGINT) AS total_bytes,
       CAST(SUM(blen) AS BIGINT) AS uniq_bytes,
       ROUND(1.0 - CAST(SUM(blen) AS DOUBLE) / SUM(n_copies * blen), 6) AS dedup_ratio,
       ROUND(CAST(SUM(n_copies * blen) AS DOUBLE) / SUM(n_copies), 6) AS avg_chunk_len
FROM per_chunk
GROUP BY source
ORDER BY source
"""


def cdc_chunk_array(text):
    """Array-of-chunks column for a text column: boundary at p when
    the degree-3 polynomial of the window's character codes is
    divisible by 16 (see module comment). The code array is computed
    ONCE per document (one HOF pass); the boundary filter is then
    pure integer arithmetic. Map-only; reused by the behavioral
    shift-robustness test."""
    n = F.length(text)
    codes = F.transform(F.split(text, "(?!^)"), lambda c: F.ascii(c))

    def bpos_given(arr):
        # arr is a BOUND lambda variable: the code array evaluates
        # once per document, not once per element_at reference
        def key(p):
            def g(i):
                return F.element_at(arr, p + F.lit(i))

            return (
                g(0) * F.lit(29791) + g(1) * F.lit(961) + g(2) * F.lit(31) + g(3)
            ) % 16

        return F.filter(F.sequence(F.lit(2), n - 3), lambda p: key(p) == 0)

    bpos = F.when(
        n >= 5,
        F.element_at(F.transform(F.array(codes), bpos_given), 1),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), bpos)
    ends = F.concat(bpos, F.array(n + 1))
    return F.zip_with(starts, ends, lambda s, e: text.substr(s, e - s))


@query("q_text_cdc_chunks", oracle=_ORACLE_CDC)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup accounting per
    source. Boundary = window-code polynomial ≡ 0 mod 16 (avg chunk
    ~13 chars); chunks between boundaries; dedup_ratio = bytes saved
    by storing each distinct chunk once."""
    docs = load_table(spark, sf_dir, "documents")
    per_chunk = (
        docs.select("source", F.explode(cdc_chunk_array(F.col("text"))).alias("chunk"))
        .filter(F.col("chunk").isNotNull() & (F.col("chunk") != ""))
        .groupBy("source", "chunk")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .select(
            "source", "n_copies", F.length("chunk").cast("long").alias("blen")
        )
    )
    return (
        per_chunk.groupBy("source")
        .agg(
            F.sum("n_copies").alias("total_chunks"),
            F.count(F.lit(1)).alias("uniq_chunks"),
            F.sum(F.col("n_copies") * F.col("blen")).alias("total_bytes"),
            F.sum("blen").alias("uniq_bytes"),
            F.round(
                F.lit(1.0)
                - F.sum("blen").cast("double")
                / F.sum(F.col("n_copies") * F.col("blen")),
                6,
            ).alias("dedup_ratio"),
            F.round(
                F.sum(F.col("n_copies") * F.col("blen")).cast("double")
                / F.sum("n_copies"),
                6,
            ).alias("avg_chunk_len"),
        )
        .orderBy("source")
    )
