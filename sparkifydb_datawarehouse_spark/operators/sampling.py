"""Deterministic sampling & dataset splitting — the selection ops a
training-data pipeline runs before anything else: carve a reproducible
sample for eyeballing/evals, split a corpus into train/val/test, and
sample per-stratum at controlled rates.

Why HASH-based, not rand()-based: `df.sample()` draws from a seeded
RNG per partition, so membership depends on partitioning and row
order — rerun after a repartition and the sample changes. Hashing a
stable business key makes membership a pure function of the ROW:
reproducible across runs, engines, cluster sizes, and data layout
changes, and it never needs a shuffle — the sample predicate is a
scan-level filter that whole-stage codegen evaluates inline. That is
the only sampling discipline that survives a 100 TB corpus rebuilt
weekly (and it's what makes an exact DuckDB oracle possible at all).

Portable hash: both engines compute md5 identically; the first 15 hex
chars (60 bits) parsed as an integer give a uniform bucket id that
Spark (`conv(substr(md5(k),1,15),16,10)`) and DuckDB
(`('0x' || substr(md5(k),1,15))::BIGINT`) agree on bit-for-bit.
In production you'd swap md5 for xxhash64 (cheaper, JVM-side) — the
plan shape is identical; md5 here buys the cross-engine oracle.

Reference has no sampling anywhere (its whole surface is 7 SQL DDL +
7 queries, /root/reference/sql_queries.py) — this is Part-B surface
mandated by BASELINE.json's training-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_BUCKETS = 1000


def hash_bucket(key: Column) -> Column:
    """Deterministic uniform bucket in [0, 1000) from a string key —
    identical in Spark and DuckDB (see module docstring)."""
    return (F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % _BUCKETS)


def _duck_bucket(key_sql: str) -> str:
    return f"(('0x' || substr(md5({key_sql}), 1, 15))::BIGINT % {_BUCKETS})"


# ---------------------------------------------------------------------------
# Deterministic row sample: 5% of lineitem by composite business key.
# ---------------------------------------------------------------------------

_ORACLE_SAMPLE = f"""
SELECT l_orderkey AS order_key,
       l_linenumber AS line_number,
       l_quantity AS quantity
FROM lineitem
WHERE {_duck_bucket("l_orderkey::VARCHAR || '#' || l_linenumber::VARCHAR")} < 50
ORDER BY order_key, line_number
"""


@query("q_sample_hash", oracle=_ORACLE_SAMPLE)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% deterministic sample. The predicate sits directly on the
    scan (no shuffle, no RNG state); the same rows come back on every
    run at every scale."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.filter(hash_bucket(key) < 50)
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_quantity").alias("quantity"),
        )
        # hash the scan once (optimization r13, guide §2.4): the final
        # sort's range sampling re-ran the full scan + hash predicate a
        # second time; materializing the 5% sample (the predicate stays
        # ON the scan — the contract) costs 1/20th of the re-scan
        .localCheckpoint(eager=False)
        .orderBy("order_key", "line_number")
    )


# ---------------------------------------------------------------------------
# Train/val/test split: 80/10/10 by document key, plus a split audit.
# Assignment must be per-row deterministic so that regenerating the
# corpus never migrates a document between splits (train-on-test
# contamination). Returns the per-split, per-language audit counts —
# the thing you actually look at before training.
# ---------------------------------------------------------------------------

_ORACLE_SPLIT = f"""
WITH assigned AS (
    SELECT lang,
           CASE
             WHEN {_duck_bucket("doc_id::VARCHAR")} < 800 THEN 'train'
             WHEN {_duck_bucket("doc_id::VARCHAR")} < 900 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM assigned
GROUP BY split, lang
ORDER BY split, lang
"""


@query("q_train_test_split", oracle=_ORACLE_SPLIT)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id").cast("string"))
    split = (
        F.when(b < 800, "train").when(b < 900, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# Stratified sampling: per-language rates (downsample the dominant
# language, keep the tail). The rate table is a broadcast map — at
# 100 TB this is the standard "rebalance the language mix" pass, and
# it stays a pure scan-side filter: no shuffle, no per-group state.
# ---------------------------------------------------------------------------

_RATES = {"en": 200, "de": 1000, "es": 1000, "fr": 1000, "zh": 500}  # per-1000
_DEFAULT_RATE = 1000

_ORACLE_STRATIFIED = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE {_duck_bucket("doc_id::VARCHAR")} <
      CASE lang WHEN 'en' THEN 200 WHEN 'zh' THEN 500 ELSE 1000 END
GROUP BY lang
ORDER BY lang
"""


@query("q_sample_stratified", oracle=_ORACLE_STRATIFIED)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    return (
        docs.filter(hash_bucket(F.col("doc_id").cast("string")) < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle: a stable pseudorandom permutation by
# ordering on the portable hash. Training pipelines need the corpus
# order decorrelated from ingest order (source/time clumping biases
# batches) but REPRODUCIBLE across reruns — exactly the rand()-vs-hash
# trade again. At scale this is a range-partitioned sort on a uniform
# key: balanced partitions for free, and epoch N uses salt=N for a
# fresh-but-reproducible order.
# ---------------------------------------------------------------------------

_ORACLE_SHUFFLE = f"""
SELECT shuffle_pos, doc_id, source
FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               ORDER BY {_duck_bucket("'epoch1#' || doc_id::VARCHAR")}, doc_id
           ) AS shuffle_pos
    FROM documents
)
WHERE shuffle_pos <= 100
ORDER BY shuffle_pos
"""


@query("q_shuffle_deterministic", oracle=_ORACLE_SHUFFLE)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 positions of the epoch-1 shuffled corpus order.
    doc_id tiebreak makes the order total (hash collisions across
    1000 buckets are routine)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("epoch1#"), F.col("doc_id").cast("string"))
    from pyspark.sql.window import Window

    w = Window.orderBy(hash_bucket(key), F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).alias("shuffle_pos"),
        )
        .filter(F.col("shuffle_pos") <= 100)
        .select("shuffle_pos", "doc_id", "source")
        .orderBy("shuffle_pos")
    )


# ---------------------------------------------------------------------------
# Quality-weighted sampling: per-ROW keep probability proportional to
# a quality score, still hash-deterministic. The standard curriculum /
# quality-upweighting pass: keep probability = clamp(score, 0, 1),
# membership decided by comparing the row's hash bucket against its
# OWN threshold. Same scan-side no-shuffle discipline as the other
# samplers — the weight just varies the threshold per row.
# ---------------------------------------------------------------------------

_ORACLE_WEIGHTED = f"""
WITH scored AS (
    SELECT doc_id, lang, n_chars,
           LEAST(n_chars / 400.0, 1.0) AS keep_p
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       ROUND(AVG(n_chars), 4) AS mean_chars_kept
FROM scored
WHERE {_duck_bucket("'w#' || doc_id::VARCHAR")} < CAST(FLOOR(keep_p * 1000) AS BIGINT)
GROUP BY lang
ORDER BY lang
"""


@query("q_sample_weighted", oracle=_ORACLE_WEIGHTED)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample (longer docs kept at higher
    rate, capped at 1.0) — deterministic per row, zero shuffle before
    the audit agg. keep_p*1000 is truncated to BIGINT on both engines
    (Spark long cast truncates; DuckDB CAST rounds, so the oracle's
    expression and this one must agree — n_chars/400*1000 is always
    an exact multiple of 2.5, never a rounding boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    keep_p = F.least(F.col("n_chars") / 400.0, F.lit(1.0))
    thresh = (keep_p * 1000).cast("long")
    key = F.concat(F.lit("w#"), F.col("doc_id").cast("string"))
    return (
        docs.filter(hash_bucket(key) < thresh)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_chars"), 4).alias("mean_chars_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Temperature-weighted multi-source sampling — the standard mixing
# rule for imbalanced corpora (multilingual / multi-domain training
# sets): sample source s with probability proportional to n_s^alpha,
# alpha in (0,1), so small sources are UP-weighted relative to their
# share and giant sources stop dominating the mix. alpha=0.5 here
# (sqrt, not pow: sqrt is IEEE-correctly-rounded in both engines,
# pow's libm may differ in the last ulp — the q_agg_skew_kurt lesson).
#
# Scale design (100 TB): per-source counts are one hash agg (sources
# are few); the rates table broadcasts; membership is the same
# hash-bucket scan filter as q_sample_hash — deterministic, layout-
# independent, zero extra shuffle. Fixture sources are uniform
# (src{doc_id % 20}), so the float rate algebra is summation-order-
# independent; for skewed real corpora, compute w_total from the
# sorted counts (driver-side, model-state discipline) if bit-exact
# reproducibility across engines is required at the rate boundary.
# ---------------------------------------------------------------------------

_ALPHA_TARGET_FRAC = 0.3  # expected overall sample share


_ORACLE_TEMPERATURE = f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n_source FROM documents GROUP BY source
), tot AS (
    SELECT SUM(SQRT(n_source)) AS w_total, SUM(n_source) AS n_total FROM counts
), rates AS (
    SELECT source, n_source,
           LEAST(1.0, {_ALPHA_TARGET_FRAC} * n_total * SQRT(n_source) / w_total / n_source) AS rate
    FROM counts, tot
)
SELECT d.source,
       CAST(ANY_VALUE(r.n_source) AS BIGINT) AS n_source,
       ROUND(ANY_VALUE(r.rate), 6) AS rate,
       CAST(COUNT(*) AS BIGINT) AS n_sampled
FROM documents d JOIN rates r ON d.source = r.source
WHERE {_duck_bucket("d.doc_id::VARCHAR")} < CAST(FLOOR(r.rate * 1000) AS BIGINT)
GROUP BY d.source
ORDER BY d.source
"""


@query("q_sample_temperature", oracle=_ORACLE_TEMPERATURE)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source accounting of a temperature-balanced (alpha=0.5)
    deterministic sample targeting ~30% of the corpus. FLOOR is spelled
    explicitly on both sides of the rate->bucket threshold (the
    q_sample_weighted lesson: Spark's long cast truncates, DuckDB's
    rounds)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    tot = counts.agg(
        F.sum(F.sqrt("n_source")).alias("w_total"),
        F.sum("n_source").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_source",
        F.least(
            F.lit(1.0),
            F.lit(_ALPHA_TARGET_FRAC)
            * F.col("n_total")
            * F.sqrt("n_source")
            / F.col("w_total")
            / F.col("n_source"),
        ).alias("rate"),
    )
    sampled = docs.join(F.broadcast(rates), "source").filter(
        hash_bucket(F.col("doc_id").cast("string"))
        < F.floor(F.col("rate") * 1000).cast("long")
    )
    return (
        sampled.groupBy("source")
        .agg(
            F.any_value("n_source").alias("n_source"),
            F.round(F.any_value("rate"), 6).alias("rate"),
            F.count(F.lit(1)).alias("n_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Exact-k per-group sampling — "give me exactly 5 eval docs per
# source", the fixed-budget counterpart to fractional stratified
# sampling (q_sample_stratified). Selection order is the md5 hash of
# the row key: uniform, deterministic, layout-independent, identical
# in both engines — so the k winners per group are stable across
# runs/engines/cluster sizes. One window shuffle on the group key;
# per-group state is the sort, bounded by group size (for huge groups
# the scale form is rank-within-hash-prefix: filter to buckets < t
# first, then window only the survivors — documented, same contract).
# ---------------------------------------------------------------------------

_K_PER_GROUP = 5

_ORACLE_SAMPLE_K = f"""
SELECT source, doc_id, lang
FROM (
    SELECT source, doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id
           ) AS rk
    FROM documents
)
WHERE rk <= {_K_PER_GROUP}
ORDER BY source, doc_id
"""


@query("q_sample_k_per_group", oracle=_ORACLE_SAMPLE_K)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _K_PER_GROUP)
        .drop("rk")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement: Efraimidis–Spirakis A-ES keys.
# ---------------------------------------------------------------------------

_ORACLE_AES = f"""
WITH keyed AS (
    SELECT o_orderkey, o_totalprice,
           CAST(ROUND(-LN(({_duck_bucket("o_orderkey::VARCHAR")} + 0.5) / 1000.0)
                      * 1000000000) AS BIGINT) AS a,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS wc,
           POWER(({_duck_bucket("o_orderkey::VARCHAR")} + 0.5) / 1000.0,
                 1.0 / o_totalprice) AS k
    FROM orders
    WHERE ROUND(o_totalprice * 100) >= 1
)
SELECT o_orderkey AS order_key,
       ROUND(o_totalprice, 2) AS weight,
       ROUND(k, 6) AS es_key
FROM keyed
ORDER BY CAST(a AS DOUBLE) / CAST(wc AS DOUBLE) ASC, o_orderkey
LIMIT 100
"""


@query("q_sample_weighted_noreplace", oracle=_ORACLE_AES)
def sample_weighted_noreplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    (2006, public literature): assign each row key uᵢ^(1/wᵢ) with
    uᵢ ~ U(0,1) and take the top-k keys — provably equivalent to
    sequential weighted draws without replacement, and embarrassingly
    parallel: keying is map-side, selection is one TakeOrdered (a
    per-partition top-k + driver merge of k·P candidates, never a
    global sort). The u here is the PORTABLE md5 bucket (+0.5)/1000 —
    deterministic across engines and runs, which is exactly what a
    reproducible training-data sampler wants. Complements
    q_sample_weighted (rate-based, with-replacement flavor): this is
    the exact-k no-replacement form.
    """
    # Cross-engine-deterministic ordering WITHOUT collapsing the key:
    # maximizing u^(1/w) == minimizing (-ln u)/w. pow/ln are libm
    # transcendentals (no cross-engine rounding guarantee), so the
    # naive fix — sorting on round(pow,6) — is deterministic but
    # DEGENERATE: near the top, u^(1/w) -> 1 for every large weight
    # and thousands of rows tie at 1.000000, making the "weighted"
    # cutoff an order_key lottery (caught by the round-4 10x audit).
    # Instead: (a) -ln(u) is rounded ONCE per md5 bucket to integer
    # nano-units — a fixed 1000-value table verified bit-identical
    # across Spark/DuckDB/libm; (b) weight becomes exact integer
    # cents; (c) the rank key a/wc is then a SINGLE IEEE-754 division
    # of two exact integers — correctly rounded by the standard, hence
    # bit-identical on both engines (the _dot_fold argument), and
    # DENSE: no tie plateau, the top-100 stays genuinely
    # weight-driven. es_key stays the classic E-S key for display.
    orders = load_table(spark, sf_dir, "orders")
    b = hash_bucket(F.col("o_orderkey").cast("string"))
    u = (b + 0.5) / 1000.0
    a = F.round(-F.log(u) * 1e9).cast("long")
    wc = F.round(F.col("o_totalprice") * 100).cast("long")
    k = F.pow(u, 1.0 / F.col("o_totalprice"))
    return (
        orders.filter(F.round(F.col("o_totalprice") * 100) >= 1)
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.round("o_totalprice", 2).alias("weight"),
            F.round(k, 6).alias("es_key"),
            (a.cast("double") / wc.cast("double")).alias("_rank_key"),
        )
        .orderBy(F.col("_rank_key").asc(), "order_key")
        .limit(100)
        .drop("_rank_key")
    )


# ---------------------------------------------------------------------------
# Domain-matched (balanced) resampling: downsample every source to the
# minority source's count so the training mix is uniform across
# domains — the "target distribution matching" step of corpus
# assembly. Acceptance is per-source hash thresholding, so the sample
# is deterministic, scan-side, and reproducible at any scale.
# ---------------------------------------------------------------------------

_ORACLE_DOMAIN_MATCH = f"""
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before
    FROM documents GROUP BY source
), target AS (
    SELECT MIN(n_before) AS m FROM counts
), kept AS (
    SELECT d.source
    FROM documents d
    JOIN counts c ON c.source = d.source
    CROSS JOIN target t
    WHERE {_duck_bucket("d.doc_id::VARCHAR")} < FLOOR(1000.0 * t.m / c.n_before)
)
SELECT c.source, c.n_before,
       CAST(COALESCE(k.n_after, 0) AS BIGINT) AS n_after
FROM counts c
LEFT JOIN (SELECT source, COUNT(*) AS n_after FROM kept GROUP BY source) k
       ON k.source = c.source
ORDER BY c.source
"""


@query("q_sample_domain_match", oracle=_ORACLE_DOMAIN_MATCH)
def sample_domain_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced-domain downsample audit: accept each document iff its
    portable hash bucket clears FLOOR(1000*m/n_source) where m is the
    minority source's count — every source lands within quantization
    error of m kept docs, deterministically (regenerating the corpus
    never flips membership, the q_train_test_split discipline).

    Plan shape: per-source counts are a tiny agg broadcast back onto
    the scan (two narrow joins against a sources-cardinality dim);
    the acceptance predicate then runs MAP-SIDE on the fact scan —
    no shuffle of documents at all. The FLOOR-of-integer-ratio
    threshold is the ORACLES.md fixed-point rule, exact on both
    engines.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    target = counts.agg(F.min("n_before").alias("m"))
    rate = F.floor(1000.0 * F.col("m") / F.col("n_before"))
    kept = (
        docs.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(target))
        .filter(hash_bucket(F.col("doc_id").cast("string")) < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        counts.join(kept, "source", "left")
        .select(
            "source",
            "n_before",
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Group-aware leakage-safe split (round 6): q_train_test_split hashes
# ROW ids, so near-duplicate documents from the same source can (and
# do) straddle the train/eval boundary — the classic leakage bug the
# public dedup literature warns about (Lee et al. 2021 §6: train/test
# overlap inflates eval). The group split assigns each SOURCE wholly
# to one side by hashing the GROUP key; any within-source duplication
# then can't leak. Scale shape: pure map-side expression on a scan —
# no shuffle for the assignment itself (the summary agg is the only
# exchange), and adding corpus does not move existing groups
# (hash-deterministic, the q_train_test_split discipline).
# ---------------------------------------------------------------------------

_GROUP_TEST_BUCKETS = 200  # 20% of sources to the eval side

_ORACLE_GROUP_SPLIT = f"""
WITH assigned AS (
    SELECT source,
           CASE WHEN {_duck_bucket("source")} < {_GROUP_TEST_BUCKETS}
                THEN 'test' ELSE 'train' END AS split,
           doc_id
    FROM documents
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM assigned
GROUP BY split
ORDER BY split
"""


@query("q_sample_group_split", oracle=_ORACLE_GROUP_SPLIT)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        hash_bucket(F.col("source")) < _GROUP_TEST_BUCKETS, F.lit("test")
    ).otherwise(F.lit("train"))
    return (
        docs.select("doc_id", "source", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_groups"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("split")
    )
