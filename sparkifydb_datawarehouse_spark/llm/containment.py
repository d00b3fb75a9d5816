"""N-gram CONTAINMENT dedup: the asymmetric cousin of Jaccard
(llm/dedup.py q_dedup_ngram_jaccard). Jaccard misses the
quote-inside-a-larger-document case: a doc fully embedded in a much
bigger one has tiny |A∩B|/|A∪B| but containment
|shingles(A) ∩ shingles(B)| / |shingles(A)| ≈ 1. This is the measure
used for "remove documents subsumed by another" in corpus cleaning
(Broder's containment, "On the resemblance and containment of
documents", SEQUENCES 1997 — public literature).

Scale design (100 TB): candidate generation is the inverted-index
equi-join (shuffle carries (shingle, doc_id) pairs, never text) whose
total pair volume is bounded by a WORK-BOUNDED stop-shingle cut: the
df cap is not a fixed constant but the largest posting depth whose
cumulative pair volume Σ n_buckets(d)·d·(d−1) stays within
_PAIR_BUDGET. On a healthy corpus (vocabulary grows with data) the
budget never binds and the cap rests at the absolute _MAX_DF guard;
on a density-saturated corpus (the 10x synthetic fixture: fixed tiny
vocabulary, so trigram space saturates and exact pair volume grew
37x) the cap tightens itself and total join work stays ≤ budget at
ANY scale. The cap rule is pure integer arithmetic over the df
histogram (≤ _MAX_DF rows), applied IDENTICALLY in the DuckDB oracle,
so results stay value-matched at every SF; at the driver's sf0.01/0.1
the budget is slack (max df 7 / 25 vs volumes 28k / 2.5M) and the cut
is a no-op. Denominator sizes are computed over the SAME capped
universe so containment stays a well-defined ratio under the cut.
Not silent: tests/test_new_ops_r3b.py reports the selected cap and
SCALING.md records the budget decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"
_N = 3  # shingle width
_MAX_DF = 64  # absolute stop-shingle guard (posting lists never exceed this)
_PAIR_BUDGET = 5_000_000  # max total candidate-pair volume per run
_THRESHOLD_BP = 8000  # containment >= 0.80, in basis points (integer compare)

_ORACLE_CONTAINMENT = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
    FROM toks, unnest(generate_series(1, len(t) - {_N - 1})) AS s(i)
    WHERE t[i] <> ''
), dfs AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS d FROM sh GROUP BY g
), hist AS (
    SELECT d, d * (d - 1) * COUNT(*) AS vol
    FROM dfs WHERE d <= {_MAX_DF} GROUP BY d
), cum AS (
    SELECT d, SUM(vol) OVER (ORDER BY d) AS cumvol FROM hist
), cap AS (
    SELECT COALESCE(MAX(CASE WHEN cumvol <= {_PAIR_BUDGET} THEN d END), 1) AS c
    FROM cum
), kept AS (
    SELECT sh.doc_id, sh.g
    FROM sh JOIN dfs ON dfs.g = sh.g CROSS JOIN cap
    WHERE dfs.d <= cap.c
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


def containment_cap(spark: SparkSession, sf_dir: str) -> int:
    """The work-bounded df cap the query will select for this corpus
    (exposed for tests/observability — 'no silent caps')."""
    row = _capped_buckets(spark, sf_dir).limit(1).select("cap").collect()
    return int(row[0]["cap"]) if row else 1


def _capped_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(g, ids, cap) posting lists surviving the work-bounded cut."""
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
                    # r11: element_at reads tokens in place; the old
                    # per-shingle F.slice copied the array per shingle
                    # (t is a resolved column here, so re-referencing
                    # it is free — cf. the _word_shingles let-binding)
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(F.col("t"), i + k) for k in range(_N)]
                    ),
                )
            ).alias("g"),
        )
    )
    # ONE shuffle keyed by shingle builds the posting lists. The
    # explicit width pin (SCALING.md (e) idiom) stops AQE's byte-based
    # coalescing from serializing per-posting pair generation onto one
    # task at fixture scale; the groupBy and the later self-join both
    # reuse this partitioning.
    par = spark.sparkContext.defaultParallelism
    buckets = (
        shingles.repartition(par, "g")
        .groupBy("g")
        .agg(F.collect_set("doc_id").alias("ids"))
        .withColumn("d", F.size("ids"))
        .filter(F.col("d") <= _MAX_DF)
    )
    # Work-bounded cap from the df histogram: <= _MAX_DF rows, so the
    # unpartitioned cumulative window is driver-trivial at any scale.
    hist = buckets.groupBy("d").agg(
        (F.col("d") * (F.col("d") - 1) * F.count(F.lit(1))).alias("vol")
    )
    cum = hist.select(
        "d",
        F.sum("vol")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cumvol"),
    )
    cap = cum.agg(
        F.coalesce(
            F.max(F.when(F.col("cumvol") <= _PAIR_BUDGET, F.col("d"))), F.lit(1)
        ).alias("cap")
    )
    return buckets.crossJoin(F.broadcast(cap)).filter(F.col("d") <= F.col("cap"))


@query("q_dedup_containment", oracle=_ORACLE_CONTAINMENT)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered pairs (contained, container) whose 3-gram shingle
    containment |A∩B|/|A| >= 0.80 over the work-bounded shingle
    universe — the subsumed-document detector.

    Plan shape: posting lists from one g-keyed shuffle; the candidate
    self-join runs on the exploded postings in the partitioning they
    already have (no extra join shuffle) and inside whole-stage
    codegen; |A∩B| is a codegen AGGREGATION over joined rows (the
    q_dedup_ngram_jaccard lesson — no per-pair interpreted array
    ops). The threshold test is integer basis points (n_shared*10000
    >= 8000*sz) so the cut is exact on both engines; the reported
    containment column is the one display double (single division of
    two integers, ROUND 4).
    """
    kept = _capped_buckets(spark, sf_dir).select(
        "g", F.explode("ids").alias("doc_id")
    )
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


# ---------------------------------------------------------------------------
# Bottom-k containment SKETCH — the constant-size scale path for the
# exact query above (Broder's bottom-k sampling): each document
# carries only its k smallest shingle hashes (k=32), and
# containment(A in B) is estimated by the fraction of A's sample
# found in B's (df-capped) shingle-hash index. Shuffle volume per doc
# drops from ~|shingles| strings to k int64s, independent of document
# length — this is the candidate generator you run at 100 TB, with
# the exact query as the verify stage on its survivors.
# xxhash64 sketches have no DuckDB equivalent; the registered query
# is the r8 contract form below, and the recall test in
# tests/test_new_ops_r3b.py pins the generator against the exact op.
# ---------------------------------------------------------------------------

_SKETCH_K = 32
_SKETCH_THRESHOLD_BP = 7500  # estimate >= 0.75 (exact op cuts at 0.80)


def containment_sketch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate (contained, container) pairs whose bottom-32
    containment estimate >= 0.75. The production candidate generator;
    the REGISTERED q_dedup_containment_sketch below is its contract
    form (r8 conversion).

    Plan: one codegen projection hashes every shingle (xxhash64 over
    the three token columns — the llm/dedup.py idiom, no string
    concat); bottom-k per doc is sort_array(collect_set)[:k]; the
    membership join runs k sampled hashes per doc against the
    work-bounded hash index and counts matches per (A, B) — a codegen
    aggregation, no per-pair set ops. The estimate denominator is
    |sample(A)| (short docs sample fewer than k), so the ratio is
    unbiased for every length.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    par = spark.sparkContext.defaultParallelism
    hashed = (
        docs.repartition(par)
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {_N}), "
                    "i -> xxhash64(t[i], t[i+1], t[i+2]))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    # df-capped hash index (flat absolute guard; the exact op's
    # work-bounded cut applies to its own verify pass)
    idx = (
        hashed.repartition(par, "h")
        .groupBy("h")
        .agg(F.collect_set("doc_id").alias("ids"))
        .filter(F.size("ids") <= _MAX_DF)
        .select("h", F.explode("ids").alias("container_id"))
    )
    sample = (
        hashed.groupBy("doc_id")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, _SKETCH_K).alias("s"))
        .select(
            F.col("doc_id").alias("contained_id"),
            F.size("s").alias("k_eff"),
            F.explode("s").alias("h"),
        )
    )
    hits = (
        sample.join(idx, "h")
        .filter(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id", "k_eff")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.filter(F.col("n_hits") * 10000 >= _SKETCH_THRESHOLD_BP * F.col("k_eff"))
        .select(
            "contained_id",
            "container_id",
            "n_hits",
            F.col("k_eff").alias("sample_size"),
            F.round(F.col("n_hits") * 1.0 / F.col("k_eff"), 4).alias("est_containment"),
        )
        .orderBy("contained_id", "container_id")
    )


# Contract-oracle form (VERDICT r7 #3, round 8): the bottom-k hashes
# are engine-specific (xxhash64), but the sketch's CLAIMS are
# checkable against the exact containment truth the sibling oracle
# already recomputes:
#   sketch_recalled      — per exact pair: the sketch surfaced it at
#                          its looser 0.75 cut (50/50 at sf0.01,
#                          56/56 at sf0.001 — the 0.05 threshold gap
#                          absorbs the estimator's ~0.08-std noise);
#   mae_within_bound /   — corpus-level: mean / max |est − exact|
#   max_err_within_bound   over the recalled pairs within 0.05 / 0.15
#                          (measured 0.005 / 0.027 at both SFs;
#                          Binomial(32, c) std is ≤ 0.09). Vacuously
#                          1 when no pairs overlap (zero rows then).
_CONT_MAE_BOUND = 0.05
_CONT_MAX_BOUND = 0.15

_ORACLE_CONTAINMENT_SKETCH = _ORACLE_CONTAINMENT.replace(
    "SELECT i.contained_id, i.container_id, i.n_shared,",
    "SELECT i.contained_id, i.container_id,\n"
    "       CAST(1 AS INTEGER) AS sketch_recalled,\n"
    "       CAST(1 AS INTEGER) AS mae_within_bound,\n"
    "       CAST(1 AS INTEGER) AS max_err_within_bound,\n"
    "       i.n_shared,",
    1,
)


@query("q_dedup_containment_sketch", oracle=_ORACLE_CONTAINMENT_SKETCH)
def dedup_containment_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact containment pairs (the sibling oracle's values) plus the
    bottom-32 sketch's contract flags (see banner above)."""
    exact = dedup_containment(spark, sf_dir).localCheckpoint(eager=True)
    sketch = containment_sketch_pairs(spark, sf_dir)
    joined = exact.join(
        sketch.select(
            "contained_id",
            "container_id",
            F.col("est_containment").alias("est"),
        ),
        ["contained_id", "container_id"],
        "left",
    ).localCheckpoint(eager=True)  # two consumers: rows + error agg
    err = F.abs(F.col("containment") - F.col("est"))
    claims = joined.agg(
        F.coalesce(F.avg(err) <= _CONT_MAE_BOUND, F.lit(True))
        .cast("int")
        .alias("mae_within_bound"),
        F.coalesce(F.max(err) <= _CONT_MAX_BOUND, F.lit(True))
        .cast("int")
        .alias("max_err_within_bound"),
    )
    return (
        joined.crossJoin(F.broadcast(claims))
        .select(
            "contained_id",
            "container_id",
            F.col("est").isNotNull().cast("int").alias("sketch_recalled"),
            "mae_within_bound",
            "max_err_within_bound",
            "n_shared",
            "n_shingles",
            "containment",
        )
        .orderBy("contained_id", "container_id")
    )
