"""Corpus-preparation operators a training-data pipeline needs beyond
per-document stats: benchmark decontamination and vocabulary
construction. Both are expression-level (whole-stage codegen, no
Python UDFs) and oracle-checked against DuckDB.

Scale notes:
- Decontamination joins TRAIN n-grams against EVAL n-grams. Eval sets
  (benchmarks) are tiny relative to a 100 TB corpus, so the distinct
  eval-gram side is broadcast — the train side never shuffles for the
  join, only for the per-doc aggregation keyed on doc_id. At larger
  eval sets, hash grams to 8-byte keys (xxhash64) before the join to
  shrink the broadcast; kept as exact strings here so DuckDB can
  verify values.
- N-gram construction follows the minhash lesson (SURVEY.md §4):
  posexplode + window leads (codegen) rather than higher-order array
  lambdas (CodegenFallback, interpreted per element).
- Vocabulary build is a word count plus a single top-k sort on the
  (already tiny) distinct-term aggregate; the Zipf skew lives in the
  map-side combiner, not the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"
_NGRAM = 5

# ---------------------------------------------------------------------------
# Benchmark decontamination: fraction of each training document's
# distinct 5-gram shingles that appear in ANY eval document (the
# doc_id % 50 == 0 slice stands in for a benchmark set). Documents
# over the integer threshold 10*hits >= 3*grams (i.e. >=30% overlap —
# integer comparison, no float-threshold flip risk) are flagged.
# ---------------------------------------------------------------------------

_ORACLE_DECONTAM = """
WITH toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
    FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
),
eval_grams AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0
),
train_grams AS (
    SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 50 <> 0
),
stats AS (
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit
    FROM train_grams t
    LEFT JOIN eval_grams e ON t.gram = e.gram
    GROUP BY t.doc_id
)
SELECT doc_id, n_grams, n_hit,
       ROUND(CAST(n_hit AS DOUBLE) / n_grams, 4) AS contamination
FROM stats
WHERE n_hit * 10 >= n_grams * 3
ORDER BY contamination DESC, doc_id
"""


@query("q_text_decontaminate", oracle=_ORACLE_DECONTAM)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), _TOKEN_SPLIT).alias("t")
    )
    # 5-gram shingles via posexplode + 4 leads: one doc_id shuffle,
    # everything codegen (HOF slice-in-transform would be interpreted).
    w = Window.partitionBy("doc_id").orderBy("pos")
    exploded = toks.select("doc_id", F.posexplode("t").alias("pos", "w0"))
    for i in range(1, _NGRAM):
        exploded = exploded.withColumn(f"w{i}", F.lead("w0", i).over(w))
    grams = exploded.filter(F.col(f"w{_NGRAM - 1}").isNotNull()).select(
        "doc_id",
        F.concat_ws(" ", *[f"w{i}" for i in range(_NGRAM)]).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
        .withColumnRenamed("gram", "eval_gram")
    )
    train_grams = grams.filter(F.col("doc_id") % 50 != 0).distinct()
    hit = F.when(F.col("eval_gram").isNotNull(), 1).otherwise(0)
    stats = (
        train_grams.join(
            F.broadcast(eval_grams),
            train_grams.gram == F.col("eval_gram"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(hit).cast("long").alias("n_hit"),
        )
    )
    return (
        stats.filter(F.col("n_hit") * 10 >= F.col("n_grams") * 3)
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("contamination"),
        )
        .orderBy(F.col("contamination").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# Vocabulary construction: top-1000 terms by frequency with dense,
# deterministic token ids (rank order: count desc, term asc — the
# conventional frequency-sorted BPE/WordPiece id assignment).
# ---------------------------------------------------------------------------

_ORACLE_VOCAB = """
WITH counts AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT UNNEST(string_split_regex(LOWER(text), '\\s+')) AS term
        FROM documents
    )
    WHERE term <> ''
    GROUP BY term
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) - 1 AS BIGINT)
           AS token_id,
       term, n
FROM counts
ORDER BY token_id
LIMIT 1000
"""


@query("q_text_vocabulary", oracle=_ORACLE_VOCAB)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Global row_number over the distinct-term aggregate: single
    # partition, but the input is vocabulary-sized (≤ a few million
    # terms at any corpus scale), not corpus-sized — acceptable by the
    # same argument as any driver-side model state.
    order = Window.orderBy(F.col("n").desc(), F.col("term"))
    return (
        counts.withColumn(
            "token_id", (F.row_number().over(order) - 1).cast("long")
        )
        .select("token_id", "term", "n")
        .orderBy("token_id")
        .limit(1000)
    )
