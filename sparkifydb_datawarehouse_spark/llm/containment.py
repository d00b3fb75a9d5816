"""N-gram CONTAINMENT dedup: the asymmetric cousin of Jaccard
(llm/dedup.py q_dedup_ngram_jaccard). Jaccard misses the
quote-inside-a-larger-document case: a doc fully embedded in a much
bigger one has tiny |A∩B|/|A∪B| but containment
|shingles(A) ∩ shingles(B)| / |shingles(A)| ≈ 1. This is the measure
used for "remove documents subsumed by another" in corpus cleaning
(Broder's containment, "On the resemblance and containment of
documents", SEQUENCES 1997 — public literature).

Scale design (100 TB): candidate generation is the same inverted-
index equi-join as q_dedup_ngram_jaccard — shuffle carries (shingle,
doc_id) pairs, never text — with a corpus-df stop-shingle cut
(df <= _MAX_DF) bounding any shingle's posting list, so the
candidate-pair fan-out per shingle is at most _MAX_DF², independent
of corpus size. The cut is applied identically in the oracle, and is
reported (not silent): dropped-shingle count is an output column of
the pair query's companion test, and the docstring threshold is the
single tuning knob. Denominator sizes are computed over the SAME
filtered shingle universe so containment stays a well-defined ratio
under the cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"
_N = 3  # shingle width
_MAX_DF = 64  # stop-shingle cut: posting lists longer than this are dropped
_THRESHOLD_BP = 8000  # containment >= 0.80, in basis points (integer compare)

_ORACLE_CONTAINMENT = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
    FROM toks, unnest(generate_series(1, len(t) - {_N - 1})) AS s(i)
    WHERE t[i] <> ''
), kept AS (
    SELECT doc_id, g FROM sh
    QUALIFY COUNT(*) OVER (PARTITION BY g) <= {_MAX_DF}
), sizes AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM kept GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT i.contained_id, i.container_id, i.n_shared,
       s.sz AS n_shingles,
       ROUND(i.n_shared * 1.0 / s.sz, 4) AS containment
FROM inter i JOIN sizes s ON s.doc_id = i.contained_id
WHERE i.n_shared * 10000 >= {_THRESHOLD_BP} * s.sz
ORDER BY contained_id, container_id
"""


@query("q_dedup_containment", oracle=_ORACLE_CONTAINMENT)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered pairs (contained, container) whose 3-gram shingle
    containment |A∩B|/|A| >= 0.80 — the subsumed-document detector.

    The threshold test is integer basis points (n_shared*10000 >=
    8000*sz) so the CUT is exact on both engines; the reported
    containment column is the one display double (single division of
    two integers, ROUND 4).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    n_sh = F.size(F.col("t")) - (_N - 1)
    shingles = (
        docs.select("doc_id", toks.alias("t"))
        .filter(n_sh >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n_sh),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _N)),
                )
            ).alias("g"),
        )
    )
    # ONE shuffle keyed by shingle builds the posting list (collect_set
    # dedups within-doc repeats) and applies the df <= cap stop-shingle
    # cut as a size() filter. Exploding back out leaves the data
    # hash-partitioned by g, so the candidate self-join below reuses
    # that partitioning (zero additional join shuffles — the naive
    # two-sided shingle self-join pays two) and stays inside
    # whole-stage codegen, which the in-expression m^2 struct
    # expansion (interpreted higher-order lambdas) does not.
    # Explicit width pin (the SCALING.md (e) idiom): pair-generation
    # cost is per POSTING, not per byte, so AQE's byte-based coalescing
    # would serialize the join onto one task at fixture scale. A
    # user-specified hash repartition by g satisfies the groupBy's and
    # the self-join's required distribution (no extra exchange) and
    # keeps every core busy.
    par = spark.sparkContext.defaultParallelism
    buckets = (
        shingles.repartition(par, "g")
        .groupBy("g")
        .agg(F.collect_set("doc_id").alias("ids"))
        .filter(F.size("ids") <= _MAX_DF)
    )
    kept = buckets.select("g", F.explode("ids").alias("doc_id"))
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = kept.alias("a")
    b = kept.alias("b")
    inter = (
        a.join(b, "g")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("contained_id"),
            F.col("b.doc_id").alias("container_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "contained_id"), "contained_id"
        )
        .filter(F.col("n_shared") * 10000 >= _THRESHOLD_BP * F.col("sz"))
        .select(
            "contained_id",
            "container_id",
            "n_shared",
            F.col("sz").alias("n_shingles"),
            F.round(F.col("n_shared") * 1.0 / F.col("sz"), 4).alias("containment"),
        )
        .orderBy("contained_id", "container_id")
    )
