"""The composed training-data preparation pipeline as ONE accounted
operator: URL dedup → exact dedup (keep-rule) → quality filter →
temperature sampling → chunking, with per-stage document/char
accounting — the end-to-end journey a web corpus takes from crawl to
training shards. Each stage is an operator proven individually
elsewhere (q_dedup_url_canonical, q_dedup_representative,
q_text_quality-family, q_sample_temperature, q_text_chunking); this
query chains the same algebra and the oracle replays the identical
CTE chain, so the COMPOSITION is value-checked end to end (the
q_corpus_funnel discipline, minus the graph stage it already covers).

Scale design (100 TB): every stage is either map-side (canonical-url
algebra, quality predicates, hash-sample membership, chunk generation)
or a hash agg whose shuffle carries keys/fingerprints — never
document text; the per-stage accounting rows are a UNION of
stage-sized aggregates. Nothing in the chain introduces a shape that
its standalone operator did not already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from ..operators.sampling import hash_bucket, _duck_bucket
from .dedup import canonical_url, _synth_url

_MIN_CHARS = 120
_MIN_TOKENS = 25
_TARGET_FRAC = 0.5
_CHUNK, _STRIDE = 16, 12

_ORACLE_PREP = f"""
WITH raw AS (
    SELECT doc_id, text, lang, source, n_chars,
           CASE doc_id % 4
             WHEN 1 THEN 'https://' || source || '.example.com/' || lang || '/item/'
                         || (doc_id % 50) || '?utm_source=news&ref=tw&page=2'
             WHEN 2 THEN UPPER('https://' || source || '.example.com')
                         || '/' || lang || '/item/' || (doc_id % 50)
             WHEN 3 THEN 'https://' || source || '.example.com/' || lang || '/item/'
                         || (doc_id % 50) || '/#section'
             ELSE 'https://' || source || '.example.com/' || lang || '/item/'
                  || (doc_id % 50)
           END AS url
    FROM documents
), canon AS (
    SELECT *,
           LOWER(regexp_extract(regexp_replace(url, '#.*$', ''), '(?i)^(https?://[^/?]+)', 1))
           || regexp_replace(regexp_replace(regexp_replace(regexp_replace(url, '#.*$', ''), '(?i)^https?://[^/?]+', ''), '\\?.*$', ''), '/+$', '')
           AS canonical
    FROM raw
), s1 AS (  -- URL dedup: smallest doc_id per canonical URL survives
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY doc_id) AS rn
        FROM canon
    ) WHERE rn = 1
), s2 AS (  -- exact dedup keep-rule: best copy per normalized-text fingerprint
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY md5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g'))
            ORDER BY n_chars DESC, doc_id
        ) AS rn2
        FROM s1
    ) WHERE rn2 = 1
), s3 AS (  -- quality filter
    SELECT * FROM s2
    WHERE n_chars >= {_MIN_CHARS}
      AND len(list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '')) >= {_MIN_TOKENS}
), counts AS (
    SELECT source, COUNT(*) AS n_source FROM s3 GROUP BY source
), tot AS (
    SELECT SUM(SQRT(n_source)) AS w_total, SUM(n_source) AS n_total FROM counts
), rates AS (
    SELECT source, LEAST(1.0, {_TARGET_FRAC} * n_total * SQRT(n_source) / w_total / n_source) AS rate
    FROM counts, tot
), s4 AS (  -- temperature sample
    SELECT s3.* FROM s3 JOIN rates ON s3.source = rates.source
    WHERE {_duck_bucket("s3.doc_id::VARCHAR")} < CAST(FLOOR(rates.rate * 1000) AS BIGINT)
), s5 AS (  -- chunking
    SELECT doc_id, LEAST({_CHUNK}, n - start) AS chunk_tokens
    FROM (
        SELECT doc_id, len(toks) AS n,
               UNNEST(generate_series(0, GREATEST(len(toks) - {_CHUNK} + {_STRIDE} - 1, 0), {_STRIDE})) AS start
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS toks
            FROM s4
        ) WHERE len(toks) > 0
    )
)
SELECT stage, ord, n_docs, n_units FROM (
    SELECT 'raw' AS stage, 1 AS ord, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_units FROM raw
    UNION ALL
    SELECT 'url_dedup', 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT) FROM s1
    UNION ALL
    SELECT 'exact_dedup', 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT) FROM s2
    UNION ALL
    SELECT 'quality', 4, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT) FROM s3
    UNION ALL
    SELECT 'sampled', 5, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT) FROM s4
    UNION ALL
    SELECT 'chunked', 6, CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(SUM(chunk_tokens) AS BIGINT) FROM s5
) ORDER BY ord
"""


@query("q_prep_pipeline", oracle=_ORACLE_PREP)
def prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage accounting rows (stage, ord, n_docs, n_units):
    n_units is characters through stage 5 and chunk TOKENS at the
    final chunked stage (n_docs there = surviving documents)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id", "text", "lang", "source", "n_chars", _synth_url().alias("url")
    )
    # dedup key = the PARAM-FREE canonical (refetch collapse should
    # merge ?page= variants too); canonical_url keeps real params for
    # the standalone q_dedup_url_canonical contract, so strip them here
    # — mirrored in the oracle's canonical expression
    canon = raw.withColumn(
        "canonical",
        F.regexp_replace(canonical_url(F.col("url")), r"\?.*$", ""),
    )
    s1 = (
        canon.withColumn(
            "rn", F.row_number().over(Window.partitionBy("canonical").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    s2 = (
        s1.withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy(fp).orderBy(F.desc("n_chars"), "doc_id")
            ),
        )
        .filter(F.col("rn2") == 1)
        .drop("rn2")
    )
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    s3 = s2.filter(
        (F.col("n_chars") >= _MIN_CHARS) & (F.size(toks) >= _MIN_TOKENS)
    )
    counts = s3.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    tot = counts.agg(
        F.sum(F.sqrt("n_source")).alias("w_total"),
        F.sum("n_source").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(_TARGET_FRAC)
            * F.col("n_total")
            * F.sqrt("n_source")
            / F.col("w_total")
            / F.col("n_source"),
        ).alias("rate"),
    )
    s4 = s3.join(F.broadcast(rates), "source").filter(
        hash_bucket(F.col("doc_id").cast("string"))
        < F.floor(F.col("rate") * 1000).cast("long")
    )
    starts = (
        f"sequence(0, greatest(size(toks) - {_CHUNK} + {_STRIDE} - 1, 0), {_STRIDE})"
    )
    s5 = (
        s4.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").alias("n"),
            F.explode(F.expr(starts)).alias("start"),
        )
        .select(
            "doc_id",
            F.least(F.lit(_CHUNK), F.col("n") - F.col("start")).alias("chunk_tokens"),
        )
    )

    def acct(df: DataFrame, stage: str, ord_: int) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(ord_).alias("ord"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_units"),
        ).select("stage", "ord", "n_docs", "n_units")

    chunk_acct = s5.agg(
        F.lit("chunked").alias("stage"),
        F.lit(6).alias("ord"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("chunk_tokens").alias("n_units"),
    ).select("stage", "ord", "n_docs", "n_units")

    out = (
        acct(raw, "raw", 1)
        .unionByName(acct(s1, "url_dedup", 2))
        .unionByName(acct(s2, "exact_dedup", 3))
        .unionByName(acct(s3, "quality", 4))
        .unionByName(acct(s4, "sampled", 5))
        .unionByName(chunk_acct)
    )
    return out.orderBy("ord")
