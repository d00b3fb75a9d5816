"""Language-model quality scoring beyond unigrams: bigram
log-probability (the next rung of the perplexity-filter ladder after
q_text_unigram_logprob) and a Gopher-style hard-rule quality filter
(Rae et al. 2021, "Scaling Language Models: ... Gopher", public
literature — the rule FAMILY, with thresholds recalibrated to the
synthetic corpus).

Scale design (100 TB): both queries keep the model-vs-data split that
every corpus-scoring operator here uses (textstats.py TF-IDF,
unigram LM, clustering.py k-means): the MODEL side (bigram counts,
vocabulary size) is vocabulary-bounded — it shuffles n-gram keys,
never documents — and joins back to per-doc n-grams by n-gram key.
The rule filter is pure per-row codegen arithmetic: zero shuffles
besides the final per-source rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"

# Bigram LM: p(w2 | w1) = (c(w1 w2) + 1) / (ctx(w1) + V)   [add-one]
# ctx(w1) = number of bigrams whose first token is w1 (so the
# distribution over w2 sums to 1 exactly), V = corpus vocabulary size.
_ORACLE_BIGRAM_LP = """
WITH toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
), pos AS (
    SELECT doc_id, i, t[i] AS w0, t[i + 1] AS w1
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
    WHERE t[i] <> '' AND t[i + 1] <> ''
), vocab AS (
    SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
    FROM (SELECT UNNEST(string_split_regex(LOWER(text), '\\s+')) AS term
          FROM documents) WHERE term <> ''
), big AS (
    SELECT w0, w1, CAST(COUNT(*) AS BIGINT) AS c12 FROM pos GROUP BY w0, w1
), ctx AS (
    SELECT w0, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY w0
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(LN((b.c12 + 1.0) / (x.c1 + v.v))), 4) AS mean_logprob
FROM pos p
JOIN big b ON p.w0 = b.w0 AND p.w1 = b.w1
JOIN ctx x ON p.w0 = x.w0
CROSS JOIN vocab v
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


@query("q_text_bigram_logprob", oracle=_ORACLE_BIGRAM_LP)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-one-smoothed bigram log-probability per document under
    the corpus' own bigram distribution — the standard cheap stand-in
    for LM perplexity filtering, one order above q_text_unigram_logprob
    (docs that score far below the unigram baseline are word-salad;
    docs that score high on unigrams but low on bigrams are shuffled
    boilerplate).

    Plan: adjacent pairs are built MAP-SIDE with an indexed transform
    over the token array (r11 — this replaced a posexplode + lead
    window that shuffled every token by doc_id: measured 1.7× faster
    at sf0.1 and pair-for-pair identical; the corpus.py HOF caution is
    about 5-gram shingling, where stacked leads win); bigram counts
    and context counts are two hash aggs whose shuffle carries N-GRAM
    KEYS (vocab², bounded), not documents; the model joins back by
    bigram key. V is a 1-row broadcast. FP: the only double is ln of
    an integer ratio, averaged then ROUND(.,4) — the ORACLES.md
    aggregated-double margin.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    pos = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w0, element_at(t, i + 2) AS w1))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w0", "p.w1")
    )
    big = pos.groupBy("w0", "w1").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w0").agg(F.sum("c12").alias("c1"))
    vocab = (
        docs.select(F.explode(toks).alias("term"))
        .agg(F.count_distinct("term").alias("v"))
    )
    scored = (
        pos.join(big, ["w0", "w1"])
        .join(F.broadcast(ctx), "w0")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


# Gopher-style hard rules, thresholds calibrated to the synthetic
# corpus (docs are 20-200 whitespace tokens over a small vocabulary):
#   R1 token count within [20, 500]
#   R2 mean token length within [2, 10]
#   R3 contains >= 2 stopword occurrences ('the'/'a' here)
#   R4 type-token ratio >= 0.2 (distinct/total — mirrors the Gopher
#      repetition family without re-running the trigram pass)
# All four are integer/ratio predicates -> exact cross-engine.
_ORACLE_GOPHER = """
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(LOWER(text), '\\s+'),
                       t -> t <> '') AS t
    FROM documents
), feat AS (
    SELECT doc_id, source,
           CAST(len(t) AS BIGINT) AS n_tok,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
           CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS n_chars,
           CAST(len(list_filter(t, x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
    FROM toks
), flags AS (
    SELECT source,
           CASE WHEN n_tok BETWEEN 20 AND 500 THEN 1 ELSE 0 END AS r1,
           CASE WHEN n_chars >= 2 * n_tok AND n_chars <= 10 * n_tok
                THEN 1 ELSE 0 END AS r2,
           CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r3,
           CASE WHEN 5 * n_distinct >= n_tok THEN 1 ELSE 0 END AS r4
    FROM feat
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r1 * r2 * r3 * r4) AS BIGINT) AS n_pass,
       CAST(SUM(1 - r1) AS BIGINT) AS fail_len,
       CAST(SUM(1 - r2) AS BIGINT) AS fail_wordlen,
       CAST(SUM(1 - r3) AS BIGINT) AS fail_stopword,
       CAST(SUM(1 - r4) AS BIGINT) AS fail_ttr
FROM flags
GROUP BY source
ORDER BY source
"""


@query("q_text_gopher_rules", oracle=_ORACLE_GOPHER)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family hard-rule quality filter, rolled up per source:
    token-count bounds, mean-token-length bounds, minimum stopword
    occurrences, and a type-token-ratio floor, each reported as a
    per-rule failure count beside the all-rules pass count (the
    dashboard a corpus-cleaning run actually reviews).

    Every predicate is integer algebra computed in ONE projection, so
    the whole query is a narrow map plus one tiny per-source rollup.
    Rule R2 is stated multiplicatively (2*n <= chars <= 10*n) and R4
    as 5*distinct >= n to stay division-free and exact. Two scale
    notes: n_chars is length(regexp_replace(text, '\\s', '')) —
    identical to summing token lengths but pure codegen instead of an
    interpreted aggregate-HOF (the per-row hot path at corpus scale);
    and the docs are spread across defaultParallelism up front (the
    llm/dedup.py idiom) because the 10x experiment showed a single
    fixture file otherwise feeds ONE scan task doing all the per-row
    array work — on a real multi-file corpus the scan parallelism is
    free and the spread is a no-op safety net.
    """
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    feat = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("long").alias(
            "n_chars"
        ),
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast("long").alias(
            "n_stop"
        ),
    )
    r1 = F.col("n_tok").between(20, 500).cast("long")
    r2 = (
        (F.col("n_chars") >= 2 * F.col("n_tok"))
        & (F.col("n_chars") <= 10 * F.col("n_tok"))
    ).cast("long")
    r3 = (F.col("n_stop") >= 2).cast("long")
    r4 = (5 * F.col("n_distinct") >= F.col("n_tok")).cast("long")
    flags = feat.select(
        "source",
        r1.alias("r1"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("r1") * F.col("r2") * F.col("r3") * F.col("r4")).alias(
                "n_pass"
            ),
            F.sum(1 - F.col("r1")).alias("fail_len"),
            F.sum(1 - F.col("r2")).alias("fail_wordlen"),
            F.sum(1 - F.col("r3")).alias("fail_stopword"),
            F.sum(1 - F.col("r4")).alias("fail_ttr"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PMI collocations: which adjacent word pairs co-occur far more than
# chance (Church & Hanks 1990, public literature) — the phrase-mining
# primitive behind tokenizer vocab curation and stopword discovery.
# ---------------------------------------------------------------------------

_MIN_PAIR = 5  # support floor: PMI is unstable below a handful of counts

_ORACLE_PMI = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
), pos AS (
    SELECT t[i] AS w0, t[i + 1] AS w1
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
    WHERE t[i] <> '' AND t[i + 1] <> ''
), uni AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT UNNEST(string_split_regex(LOWER(text), '\\s+')) AS term
          FROM documents) WHERE term <> ''
    GROUP BY term
), totals AS (
    SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni
), big AS (
    SELECT w0, w1, CAST(COUNT(*) AS BIGINT) AS c12 FROM pos GROUP BY w0, w1
), nb AS (
    SELECT CAST(SUM(c12) AS DOUBLE) AS m FROM big
)
SELECT b.w0 || ' ' || b.w1 AS gram,
       b.c12 AS n_pair,
       ROUND(LN((b.c12 / nb.m) / ((u0.c / t.n) * (u1.c / t.n))), 4) AS pmi
FROM big b
JOIN uni u0 ON u0.term = b.w0
JOIN uni u1 ON u1.term = b.w1
CROSS JOIN totals t CROSS JOIN nb
WHERE b.c12 >= {_MIN_PAIR}
ORDER BY pmi DESC, gram
LIMIT 20
"""


@query("q_text_pmi_collocations", oracle=_ORACLE_PMI)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-pair collocations by pointwise mutual
    information, support >= 5: PMI = ln( p(w0 w1) / (p(w0) p(w1)) )
    with pair probability under the bigram total and word
    probabilities under the token total.

    Plan: bigram + unigram count aggs (n-gram-key shuffles, the
    q_text_bigram_logprob shape — adjacent pairs built MAP-SIDE by the
    same r11 indexed transform, no token-level shuffle), two broadcast
    joins of the unigram model onto the bigram table, two 1-row
    broadcast totals, TakeOrdered top-20. PMI is one double expression
    over exact integers, written identically on both engines; ties
    sort by gram string.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    pairs = (
        docs.select(toks.alias("t"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w0, element_at(t, i + 2) AS w1))"
                )
            ).alias("p")
        )
        .select("p.w0", "p.w1")
        .groupBy("w0", "w1")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = uni.agg(F.sum("c").cast("double").alias("n"))
    nb = pairs.agg(F.sum("c12").cast("double").alias("m"))
    pmi = F.log(
        (F.col("c12") / F.col("m"))
        / ((F.col("c0") / F.col("n")) * (F.col("c1") / F.col("n")))
    )
    return (
        pairs.filter(F.col("c12") >= _MIN_PAIR)
        .join(F.broadcast(uni.withColumnRenamed("term", "w0")
                          .withColumnRenamed("c", "c0")), "w0")
        .join(F.broadcast(uni.withColumnRenamed("term", "w1")
                          .withColumnRenamed("c", "c1")), "w1")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(nb))
        .select(
            F.concat_ws(" ", "w0", "w1").alias("gram"),
            F.col("c12").alias("n_pair"),
            F.round(pmi, 4).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "gram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring (round 11): the production
# smoothing for perplexity filters (Kneser & Ney 1995; Chen & Goodman
# 1999, public literature), one rung above q_text_bigram_logprob's
# add-one. Absolute discount D = 0.75 (exactly representable: 3/4):
#
#   P_KN(w1|w0) = max(c(w0 w1) - D, 0) / c(w0 ·)
#               + (D · N1+(w0 ·) / c(w0 ·)) · P_cont(w1)
#   P_cont(w1)  = N1+(· w1) / N1+(· ·)
#
# where c(w0 ·) is the left-context total, N1+(w0 ·) the distinct
# continuations of w0, N1+(· w1) the distinct left contexts of w1, and
# N1+(· ·) the number of distinct bigram types. Scoring the corpus
# under its own model means every bigram is seen, so the max() never
# clips — kept anyway for the formula's integrity.
# ---------------------------------------------------------------------------

_ORACLE_KNESER_NEY = """
WITH toks AS (
    SELECT doc_id, string_split_regex(LOWER(text), '\\s+') AS t
    FROM documents
), pos AS (
    SELECT doc_id, t[i] AS w0, t[i + 1] AS w1
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
    WHERE t[i] <> '' AND t[i + 1] <> ''
), big AS (
    SELECT w0, w1, CAST(COUNT(*) AS BIGINT) AS c12 FROM pos GROUP BY w0, w1
), ctx AS (
    SELECT w0, CAST(SUM(c12) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS n_follow
    FROM big GROUP BY w0
), cont AS (
    SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_left FROM big GROUP BY w1
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(LN(
           GREATEST(b.c12 - 0.75, 0) / x.c1
           + (0.75 * x.n_follow / x.c1) * (co.n_left / (1.0 * t.n_types))
       )), 4) AS mean_kn_logprob
FROM pos p
JOIN big b ON p.w0 = b.w0 AND p.w1 = b.w1
JOIN ctx x ON p.w0 = x.w0
JOIN cont co ON p.w1 = co.w1
CROSS JOIN tot t
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


@query("q_text_kneser_ney", oracle=_ORACLE_KNESER_NEY)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean interpolated-Kneser-Ney bigram log-probability per document
    under the corpus' own bigram distribution — the smoothing real
    perplexity filters ship (add-one over-penalizes rare-but-real
    continuations; KN backs off to how PROMISCUOUS a word's left
    contexts are, not how frequent the word is).

    Plan shape IMPROVES on q_text_bigram_logprob's: adjacent pairs are
    built MAP-SIDE with an indexed transform over the token array (the
    bigram query's posexplode + lead window shuffles every token by
    doc_id — a corpus-sized exchange this query never pays); the model
    side is three hash aggs over N-GRAM KEYS (vocab-bounded —
    documents never shuffle); ctx / cont / types join back broadcast.
    FP discipline: D = 0.75 is exactly representable, every count is
    integer, the expression tree is parenthesized identically in both
    engines, and the only aggregated double is ROUND(AVG(ln ...), 4) —
    the ORACLES.md aggregated-double margin."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    pos = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w0, element_at(t, i + 2) AS w1))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w0", "p.w1")
    )
    big = pos.groupBy("w0", "w1").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w0").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n_left"))
    tot = big.agg(F.count(F.lit(1)).alias("n_types"))
    lp = F.log(
        F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
        + (0.75 * F.col("n_follow") / F.col("c1"))
        * (F.col("n_left") / (1.0 * F.col("n_types")))
    )
    scored = (
        pos.join(big, ["w0", "w1"])
        .join(F.broadcast(ctx), "w0")
        .join(F.broadcast(cont), "w1")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("mean_kn_logprob"),
        )
        .orderBy("doc_id")
    )
