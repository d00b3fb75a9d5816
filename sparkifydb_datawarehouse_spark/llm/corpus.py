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

from ..operators.sampling import _BUCKETS as SAMPLING_BUCKETS
from ..operators.sampling import _duck_bucket, hash_bucket
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
    # 5-gram shingles map-side via an indexed element_at transform
    # (r11: replaced posexplode + 4 window leads — no token shuffle,
    # identical gram stream)
    rest = ", ".join(f"element_at(t, i + {k})" for k in range(2, _NGRAM + 1))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(slice(t, 1, greatest(size(t) - {_NGRAM - 1}, 0)),"
                f" (x, i) -> concat_ws(' ', x, {rest}))"
            )
        ).alias("gram"),
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


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al.,
# NeurIPS 2023, public literature): pick raw-pool documents whose
# hashed-n-gram distribution looks like a TARGET domain. Features are
# unigrams + bigrams hashed into B buckets; two bag-of-buckets unigram
# models (target vs pool, add-one smoothing) give a per-bucket
# log-likelihood ratio; a document's importance weight is the sum of
# its grams' ratios. The fixture's `source = 'src0'` slice stands in
# for the target domain; the paper then Gumbel-resamples by weight —
# here the selection is the top-k by weight (the deterministic
# operating point; q_sample_temperature / q_sample_weighted_noreplace
# already cover randomized selection given weights).
#
# Determinism (ORACLES.md discipline): per-bucket ratios are
# integerized to MICRO-units (FLOOR(lr*1e6 + 0.5)) before the per-doc
# sum, so the variable-order float summation that differs between
# Spark partial aggregation and DuckDB can never drift an ulp — doc
# scores are exact BIGINT sums (the tabulated-integer pattern from the
# E-S sampler). Bucket hashing reuses the md5-conv pairing that
# q_sample_hash pinned bit-for-bit across engines. LN parity at the
# per-bucket level is the same contract q_text_bm25 relies on.
#
# Scale design (100 TB): both bucket-count models are ≤B-row
# aggregations with map-side partial combine (the shuffle carries
# (bucket, count) pairs, never grams); the ratio table (≤B rows)
# broadcasts into the scoring scan, so scoring shuffles only
# (doc_id, bucket) ints for the per-doc sum. Bigram construction is
# posexplode + lead (codegen) per the minhash lesson, not a
# higher-order array lambda.
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"
_DSIR_TOP = 25
_DSIR_B = float(SAMPLING_BUCKETS)  # add-one smoothing mass = #buckets


def _dsir_gram_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, source, is_tgt, bucket) for every unigram AND bigram —
    both built MAP-SIDE from the filtered token array (r11: replaced
    posexplode + lead window; no token shuffle, identical gram
    multiset)."""
    t = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda x: x != "")
    grams = F.concat(
        F.col("t"),
        F.expr(
            "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
            " (x, i) -> concat_ws(' ', x, element_at(t, i + 2)))"
        ),
    )
    return (
        docs.select("doc_id", "source", t.alias("t"))
        .select("doc_id", "source", F.explode(grams).alias("gram"))
        .select(
            "doc_id",
            "source",
            F.col("source").eqNullSafe(F.lit(_DSIR_TARGET)).alias("is_tgt"),
            hash_bucket(F.col("gram")).alias("b"),
        )
    )


_ORACLE_DSIR = f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, source, gram FROM (
        SELECT doc_id, source, UNNEST(t) AS gram FROM toks
        UNION ALL
        SELECT doc_id, source,
               UNNEST(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS gram
        FROM toks
    )
),
bkt AS (
    SELECT doc_id, source,
           (source IS NOT DISTINCT FROM '{_DSIR_TARGET}') AS is_tgt,
           {_duck_bucket('gram')} AS b
    FROM grams
),
counts AS (
    SELECT b,
           SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct,
           SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS cs
    FROM bkt GROUP BY b
),
tot AS (SELECT SUM(ct) AS nt, SUM(cs) AS ns FROM counts),
lr AS (
    SELECT b,
           CAST(FLOOR((LN((ct + 1.0) / (nt + {_DSIR_B}))
                       - LN((cs + 1.0) / (ns + {_DSIR_B}))) * 1e6 + 0.5)
                AS BIGINT) AS lr_micro
    FROM counts CROSS JOIN tot
)
SELECT p.doc_id, p.source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(lr.lr_micro) AS BIGINT) AS score_micro,
       ROUND(CAST(SUM(lr.lr_micro) AS DOUBLE) / 1e6, 6) AS score
FROM bkt p JOIN lr USING (b)
WHERE NOT p.is_tgt
GROUP BY p.doc_id, p.source
ORDER BY score_micro DESC, doc_id
LIMIT {_DSIR_TOP}
"""


@query("q_sample_dsir", oracle=_ORACLE_DSIR)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k pool documents by DSIR importance weight toward the
    `src0` target domain (hashed unigram+bigram models, add-one
    smoothing, integer micro-unit log-ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    # The gram pipeline (posexplode + bigram window + hashing) feeds
    # BOTH the bucket-count models and the scoring scan; without
    # truncation it executes twice. localCheckpoint materializes the
    # (doc_id, source, is_tgt, bucket) rows once — measured at 100×:
    # 14.05 → 8.08 s (1×/10× unchanged/−13%), and the materialized
    # form is the narrow int projection, never gram text.
    grams = _dsir_gram_buckets(docs).localCheckpoint()
    counts = grams.groupBy("b").agg(
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("is_tgt"), 0).otherwise(1)).cast("long").alias("cs"),
    )
    tot = counts.agg(F.sum("ct").alias("nt"), F.sum("cs").alias("ns"))
    lr = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(_DSIR_B)))
                - F.log((F.col("cs") + F.lit(1.0)) / (F.col("ns") + F.lit(_DSIR_B)))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr_micro"),
    )
    return (
        grams.filter(~F.col("is_tgt"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr_micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "score_micro",
            F.round(F.col("score_micro").cast("double") / F.lit(1e6), 6).alias(
                "score"
            ),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(_DSIR_TOP)
    )


# ---------------------------------------------------------------------------
# Cross-document novelty (round 5): for each document, the share of
# its DISTINCT 3-word shingles that appear in at least one OTHER
# document — the memorization/duplication rate a generation-diversity
# or dedup-effectiveness report tracks (self-BLEU's set-precision
# core, inverted). Complements q_text_decontaminate (train-vs-eval
# overlap) with train-vs-train overlap.
#
# Shingles reduce to 60-bit md5-conv keys BEFORE any shuffle (the
# q_sample_hash cross-engine pairing), and the oracle groups on the
# SAME key so a (negligible-probability) collision cannot split the
# engines. Plan: one exchange keyed on the gram key for the
# per-gram window count, one for the per-doc aggregation — gram text
# never shuffles.
# ---------------------------------------------------------------------------

def _gram_key(col):
    """Full 60-bit md5-conv key (NO bucket mod — join/count identity,
    not a bucket): same cross-engine pairing as operators/sampling."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _duck_gram_key(sql: str) -> str:
    return f"(('0x' || substr(md5({sql}), 1, 15))::BIGINT)"


_ORACLE_NOVELTY = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS t
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           {_duck_gram_key("array_to_string(t[i:i+2], ' ')")} AS gk
    FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
counted AS (
    SELECT doc_id, gk,
           COUNT(*) OVER (PARTITION BY gk) AS n_docs_with
    FROM grams
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared,
       ROUND(1.0 - CAST(SUM(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*), 6) AS novelty_ratio
FROM counted
GROUP BY doc_id
ORDER BY doc_id
"""


@query("q_text_novelty", oracle=_ORACLE_NOVELTY)
def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    # r11: trigram keys via an INDEXED element_at transform — the
    # previous index-explode + per-gram F.slice carried the whole
    # token array into every gram row and re-sliced it (O(n²) bytes
    # per doc); this form emits the 60-bit key directly. Measured
    # 4.8 → 1.07 s at sf0.1 for the gram+distinct stage, identical
    # key stream (exceptAll both ways = 0).
    grams = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 2, 0)),"
                    " (x, i) -> cast(conv(substring(md5(concat_ws(' ',"
                    " x, element_at(t, i + 2), element_at(t, i + 3))),"
                    " 1, 15), 16, 10) as bigint))"
                )
            ).alias("gk"),
        )
        .distinct()
    )
    counted = grams.withColumn(
        "n_docs_with", F.count(F.lit(1)).over(Window.partitionBy("gk"))
    )
    shared = F.sum((F.col("n_docs_with") >= 2).cast("long"))
    return (
        counted.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            shared.alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            F.round(
                F.lit(1.0) - F.col("n_shared").cast("double") / F.col("n_grams"), 6
            ).alias("novelty_ratio"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Token-budget allocation (round 5): given a total training-token
# budget, allocate per-source quotas by temperature-flattened shares
# (w_s ∝ n_s^0.5 — the standard alpha-sampling flattening) capped at
# each source's available tokens. Single-pass capped semantics (no
# leftover redistribution) — the report shows exactly which sources
# saturate, which is the decision input for a second pass. All
# arithmetic is SQRT + one product + FLOOR on identical doubles, so
# the allocation is bit-deterministic cross-engine.
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 50_000


def _tok_count_col():
    return F.size(F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != ""))


_ORACLE_BUDGET = f"""
WITH n AS (
    SELECT source,
           CAST(SUM(len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                     t -> t <> ''))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source
),
tot AS (SELECT SUM(SQRT(CAST(n_tokens AS DOUBLE))) AS z FROM n)
SELECT source, n_tokens,
       ROUND(SQRT(CAST(n_tokens AS DOUBLE)) / z, 6) AS weight,
       LEAST(CAST(FLOOR({_BUDGET_TOKENS} * (SQRT(CAST(n_tokens AS DOUBLE)) / z))
                  AS BIGINT), n_tokens) AS alloc_tokens,
       CAST(CASE WHEN CAST(FLOOR({_BUDGET_TOKENS}
                 * (SQRT(CAST(n_tokens AS DOUBLE)) / z)) AS BIGINT) >= n_tokens
            THEN 1 ELSE 0 END AS INTEGER) AS at_capacity
FROM n CROSS JOIN tot
ORDER BY source
"""


@query("q_corpus_budget_alloc", oracle=_ORACLE_BUDGET)
def corpus_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(_tok_count_col().cast("long")).alias("n_tokens")
    )
    tot = n.agg(F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z"))
    w = F.sqrt(F.col("n_tokens").cast("double")) / F.col("z")
    raw = F.floor(F.lit(float(_BUDGET_TOKENS)) * w).cast("long")
    return (
        n.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(w, 6).alias("weight"),
            F.least(raw, F.col("n_tokens")).alias("alloc_tokens"),
            (raw >= F.col("n_tokens")).cast("int").alias("at_capacity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Cross-document exact-substring dedup (round 6) — the span-level
# dedup from the public "Deduplicating Training Data Makes Language
# Models Better" recipe (Lee et al. 2021): whole-doc dedup misses the
# boilerplate/license/quote spans that repeat ACROSS otherwise-unique
# documents, and those repeated spans are what a trained model
# memorizes. Per document: how many of its tokens are covered by any
# _SPAN_N-token window that also occurs verbatim in a DIFFERENT
# document.
#
# Spark shape (100 TB posture): windows are built with posexplode +
# N-1 window leads (codegen, the decontamination pattern — no
# interpreted HOF slices); each window becomes ONE 8-byte xxhash64
# key, so the cross-doc self-semi-join shuffles (hash, doc_id, start)
# triples — text never shuffles. Coverage is an explode of the ≤ N
# positions of surviving windows + a distinct — bounded at N× the
# repeated-window count, never N× the corpus. The oracle replays the
# same windows as exact strings (DuckDB has no xxhash64; a 64-bit
# collision would need ~2^32 distinct spans in one fixture to matter).
# ---------------------------------------------------------------------------

_SPAN_N = 8  # tokens per span (Lee et al. use 50 BPE tokens; the
# fixture docs are ~10-60 WORDS, so 8 words keeps the same "long
# verbatim span" semantics at fixture scale)

# Shared CTE prefix for both span queries — ONE definition of the
# tokenization + window construction, so the measure and scrub oracles
# cannot drift apart.
_SPAN_SQL_PREFIX = f"""toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
),
w AS (
    SELECT doc_id, i AS start,
           array_to_string(t[i:i+{_SPAN_N - 1}], ' ') AS gram
    FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_N - 1})) AS u(i)
)"""

_ORACLE_SUBSTRING_DEDUP = f"""
WITH {_SPAN_SQL_PREFIX},
rep AS (
    SELECT a.doc_id, a.start
    FROM w a
    WHERE EXISTS (SELECT 1 FROM w b
                  WHERE b.gram = a.gram AND b.doc_id <> a.doc_id)
),
cov AS (
    SELECT DISTINCT doc_id, start + o AS pos
    FROM rep, UNNEST(generate_series(0, {_SPAN_N - 1})) AS v(o)
),
n AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS dup_tokens,
       ROUND(COUNT(*) * 1.0 / n.n_tokens, 6) AS dup_fraction
FROM cov JOIN n ON n.doc_id = cov.doc_id
GROUP BY n.doc_id, n.n_tokens
ORDER BY n.doc_id
"""


def _span_windows(docs: DataFrame):
    """Shared Spark-side window plumbing for the two span queries:
    returns (toks, exploded, grams) where toks = (doc_id, t array),
    exploded = (doc_id, pos, tok) and grams = (doc_id, start, h) — one
    64-bit xxhash per _SPAN_N-token window, built MAP-SIDE by an
    indexed element_at transform (r11: replaced posexplode + N−1
    window leads — the lead form shuffles every token by doc_id; the
    indexed form emits (start, hash) directly with no token exchange
    and the same hash stream). grams is localCheckpointed: both
    queries feed it to TWO consumers (the cross-doc join side and the
    per-doc side), and without the cut the heaviest stage executes
    twice."""
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), _TOKEN_SPLIT).alias("t")
    )
    exploded = toks.select("doc_id", F.posexplode("t").alias("pos", "tok"))
    rest = ", ".join(f"element_at(t, i + {k})" for k in range(2, _SPAN_N + 1))
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(slice(t, 1, greatest(size(t) - {_SPAN_N - 1}, 0)),"
                    f" (x, i) -> struct(i AS start,"
                    f" xxhash64(concat_ws(' ', x, {rest})) AS h))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.start", "g.h")
        .localCheckpoint(eager=True)
    )
    return toks, exploded, grams


@query("q_text_substring_dedup", oracle=_ORACLE_SUBSTRING_DEDUP)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks, _, grams = _span_windows(docs)
    n_tokens = toks.select("doc_id", F.size("t").alias("n_tokens"))
    # windows that occur verbatim in a DIFFERENT document: semi join
    # against the distinct (hash, doc) set with a doc-inequality
    # residual — (doc_id, start) rows survive, so coverage stays exact
    other = grams.select(
        F.col("h").alias("oh"), F.col("doc_id").alias("odoc")
    ).distinct()
    rep = grams.join(
        other,
        (F.col("h") == F.col("oh")) & (F.col("doc_id") != F.col("odoc")),
        "left_semi",
    )
    cov = (
        rep.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (_SPAN_N - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_tokens"))
    )
    return (
        cov.join(n_tokens, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "dup_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias(
                "dup_fraction"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring SCRUB (round 6) — the transform half of the Lee et
# al. recipe: q_text_substring_dedup MEASURES cross-doc span
# duplication; this one REMOVES it, first-occurrence-wins (a span is
# dropped from every doc except the lowest doc_id containing it — a
# deterministic rule both engines can replay). Same window plumbing;
# the reconstruction is a per-doc ordered reassembly of the kept
# tokens (collect_list of (pos, token) structs + array_sort —
# deterministic, no string shuffle beyond the per-doc group).
# ---------------------------------------------------------------------------

_ORACLE_SUBSTRING_SCRUB = f"""
WITH {_SPAN_SQL_PREFIX},
rep AS (
    SELECT a.doc_id, a.start
    FROM w a
    WHERE EXISTS (SELECT 1 FROM w b
                  WHERE b.gram = a.gram AND b.doc_id < a.doc_id)
),
cov AS (
    SELECT DISTINCT doc_id, start + o AS pos
    FROM rep, UNNEST(generate_series(0, {_SPAN_N - 1})) AS v(o)
),
pos_tok AS (
    SELECT doc_id, i AS pos, t[i] AS tok
    FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
),
kept AS (
    SELECT p.doc_id, p.pos, p.tok
    FROM pos_tok p
    ANTI JOIN cov c ON c.doc_id = p.doc_id AND c.pos = p.pos
)
SELECT cov_docs.doc_id,
       CAST(cov_docs.n_removed AS BIGINT) AS n_removed,
       COALESCE(k.text_clean, '') AS text_clean
FROM (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id)
     AS cov_docs
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean
           FROM kept GROUP BY doc_id) AS k
  ON k.doc_id = cov_docs.doc_id
ORDER BY cov_docs.doc_id
"""


@query("q_text_substring_scrub", oracle=_ORACLE_SUBSTRING_SCRUB)
def text_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    _, exploded, grams = _span_windows(docs)
    # first-occurrence-wins: a window dies iff the same gram exists in
    # a LOWER doc_id (min-doc per hash, broadcastable fingerprints)
    first = grams.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    rep = grams.join(first, "h").filter(F.col("doc_id") > F.col("first_doc"))
    cov = (
        rep.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (_SPAN_N - 1))
            ).alias("pos"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed by count AND anti join
    )
    n_removed = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_removed")
    )
    kept = exploded.join(cov, ["doc_id", "pos"], "left_anti")
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("text_clean")
        )
    )
    return (
        n_removed.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_removed",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
        .orderBy("doc_id")
    )
