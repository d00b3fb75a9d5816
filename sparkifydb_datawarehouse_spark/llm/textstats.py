"""B20 — text analysis over the `documents` corpus: term frequency,
quality scoring, language ID, token counting, fingerprinting.

Everything here is expression-level (whole-stage codegen, no Python
UDFs): tokenization is split/regexp, counts are size/regexp_count,
fingerprints are md5 — all with exact DuckDB equivalents, so every
query is oracle-checked.

Scale notes:
- Per-document expressions are embarrassingly parallel — no shuffle
  at all except the term-frequency groupBy (shuffle keyed on term;
  Zipf-skewed terms are handled by partial aggregation map-side, the
  classic word-count combiner).
- At 100 TB, term frequency over raw text should additionally cap
  per-doc token explosion (slice long docs) — documents here are
  short; noted rather than implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"

# ---------------------------------------------------------------------------
# Term frequency (the canonical word count, Zipf-skew-aware).
# ---------------------------------------------------------------------------

_ORACLE_TERMFREQ = """
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT UNNEST(string_split_regex(LOWER(text), '\\s+')) AS term
    FROM documents
)
WHERE term <> ''
GROUP BY term
ORDER BY n DESC, term
LIMIT 100
"""


@query("q_text_termfreq", oracle=_ORACLE_TERMFREQ)
def text_termfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword-ratio heuristics
# (the C4/Gopher-style filters, reduced to deterministic arithmetic).
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

_ORACLE_QUALITY = f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS text_len,
       CAST(len(list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '')) AS BIGINT)
           AS n_tokens,
       ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
       ROUND(CAST(len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                  t -> t IN {_STOPWORDS!r})) AS DOUBLE)
             / GREATEST(len(list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '')), 1),
             6) AS stopword_ratio
FROM documents
ORDER BY doc_id
"""


@query("q_text_quality", oracle=_ORACLE_QUALITY)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct = F.length("text") - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct.cast("double") / F.greatest(F.length("text"), F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
        # score once before the sort (same range-sampling
        # double-execution cut as text_readability below)
    ).localCheckpoint(eager=False).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language ID: marker-word n-gram heuristic with a deterministic
# argmax tie-break (en > de > es > fr). The `lang` label column stays
# untouched — this classifies from text alone.
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": r"\b(the|and|is)\b",
    "de": r"\b(der|und|ist)\b",
    "es": r"\b(el|que|es)\b",
    "fr": r"\b(le|et|est)\b",
}


def _duck_marker(pattern: str) -> str:
    return f"array_length(regexp_extract_all(LOWER(text), '{pattern}'))"


_ORACLE_LANGID = f"""
SELECT doc_id,
       CAST({_duck_marker(_LANG_MARKERS["en"])} AS BIGINT) AS score_en,
       CAST({_duck_marker(_LANG_MARKERS["de"])} AS BIGINT) AS score_de,
       CASE
           WHEN {_duck_marker(_LANG_MARKERS["en"])} >= {_duck_marker(_LANG_MARKERS["de"])}
            AND {_duck_marker(_LANG_MARKERS["en"])} >= {_duck_marker(_LANG_MARKERS["es"])}
            AND {_duck_marker(_LANG_MARKERS["en"])} >= {_duck_marker(_LANG_MARKERS["fr"])}
               THEN 'en'
           WHEN {_duck_marker(_LANG_MARKERS["de"])} >= {_duck_marker(_LANG_MARKERS["es"])}
            AND {_duck_marker(_LANG_MARKERS["de"])} >= {_duck_marker(_LANG_MARKERS["fr"])}
               THEN 'de'
           WHEN {_duck_marker(_LANG_MARKERS["es"])} >= {_duck_marker(_LANG_MARKERS["fr"])}
               THEN 'es'
           ELSE 'fr'
       END AS lang_pred
FROM documents
ORDER BY doc_id
"""


@query("q_text_langid", oracle=_ORACLE_LANGID)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = {
        lang: F.regexp_count(F.lower("text"), F.lit(pat))
        for lang, pat in _LANG_MARKERS.items()
    }
    en, de, es, fr = scores["en"], scores["de"], scores["es"], scores["fr"]
    pred = (
        F.when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        en.cast("long").alias("score_en"),
        de.cast("long").alias("score_de"),
        pred.alias("lang_pred"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish regex segmentation
# (alpha runs | digit runs | single non-space symbols — the usual
# pre-tokenizer shape).
# ---------------------------------------------------------------------------

_BPEISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

_ORACLE_TOKENS = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)
           AS ws_tokens,
       CAST(array_length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
           AS bpeish_tokens,
       CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_estimate_tokens
FROM documents
ORDER BY doc_id
"""


@query("q_text_tokens", oracle=_ORACLE_TOKENS)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", _TOKEN_SPLIT), lambda t: t != ""))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        F.regexp_count("text", F.lit(_BPEISH)).cast("long").alias("bpeish_tokens"),
        F.ceil(F.length("text") / 4.0).alias("byte_estimate_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 over whitespace-normalized lowercase
# text — the exact-dedup key. (A rolling/shingled variant lives in
# llm/dedup.py as the minhash pipeline.)
# ---------------------------------------------------------------------------

_ORACLE_FINGERPRINT = """
SELECT doc_id,
       md5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
ORDER BY doc_id
"""


@query("q_text_fingerprint", oracle=_ORACLE_FINGERPRINT)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# TF-IDF: per-document term weights — tf(term, doc) * ln(N / df(term)).
# One tokenize+explode pass, one groupBy for document frequencies
# (broadcast back), one for term frequencies. All shuffles carry
# (term, doc_id, counts), never documents.
# ---------------------------------------------------------------------------

_ORACLE_TFIDF = """
WITH toks AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '\\s+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE term <> '' GROUP BY doc_id, term
),
df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks WHERE term <> '' GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.term AS term, tf.tf AS tf,
       ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
WHERE tf.tf >= 3
ORDER BY doc_id, term
"""


@query("q_text_tfidf", oracle=_ORACLE_TFIDF)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar, one job; at scale reuse a cached stat
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.filter(F.col("tf") >= 3)
        .join(F.broadcast(df_), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "term")
    )


# ---------------------------------------------------------------------------
# PII scrubbing — redact emails / phone-shaped numbers / long digit
# runs before a corpus is trainable. Pure regexp_replace chain: stays
# in whole-stage codegen, no shuffle at all (a map-only pass at any
# scale). The fixture corpus carries no PII, so the query INJECTS
# deterministic PII into a slice of documents first (doc_id % 7 == 0)
# and then scrubs everything — proving both the detector hit-rate
# accounting and the redaction. The regex subset used ([A-Za-z0-9._%+-]
# classes, {m,n} counts, word boundaries via explicit delimiters) is
# identical in Java regex (Spark) and RE2-ish DuckDB syntax.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"

_ORACLE_SCRUB = f"""
WITH seeded AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' contact me at user' || doc_id
                     || '@example.com or +1 555-867-530' || (doc_id % 10)
                ELSE text END AS text
    FROM documents
),
scrubbed AS (
    SELECT doc_id, text,
           regexp_matches(text, '{_EMAIL_RE}') AS has_email,
           regexp_matches(text, '{_PHONE_RE}') AS has_phone,
           regexp_replace(
               regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS clean
    FROM seeded
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN has_email THEN 1 ELSE 0 END) AS BIGINT) AS n_email_docs,
       CAST(SUM(CASE WHEN has_phone THEN 1 ELSE 0 END) AS BIGINT) AS n_phone_docs,
       CAST(SUM(CASE WHEN regexp_matches(clean, '{_EMAIL_RE}')
                      OR regexp_matches(clean, '{_PHONE_RE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_leaks_after,
       CAST(SUM(LENGTH(text) - LENGTH(clean)) AS BIGINT) AS chars_removed
FROM scrubbed
"""


@query("q_text_pii_scrub", oracle=_ORACLE_SCRUB)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded_text = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-867-530"),
            (F.col("doc_id") % 10).cast("string"),
        ),
    ).otherwise(F.col("text"))
    seeded = docs.select("doc_id", seeded_text.alias("text"))
    clean = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    scrubbed = seeded.select(
        "doc_id",
        "text",
        F.col("text").rlike(_EMAIL_RE).alias("has_email"),
        F.col("text").rlike(_PHONE_RE).alias("has_phone"),
        clean.alias("clean"),
    )
    leak = F.col("clean").rlike(_EMAIL_RE) | F.col("clean").rlike(_PHONE_RE)
    return scrubbed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("has_email").cast("long")).alias("n_email_docs"),
        F.sum(F.col("has_phone").cast("long")).alias("n_phone_docs"),
        F.sum(leak.cast("long")).alias("n_leaks_after"),
        F.sum(F.length("text") - F.length("clean")).alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Repetition scoring (Gopher-style quality rule): the share of a
# document's 3-grams that are repeats of an earlier 3-gram in the
# same document. High repetition = boilerplate/spam/generation loops;
# the standard corpus filter thresholds on exactly this ratio.
#
# Shape (r11): 3-grams built MAP-SIDE by an indexed element_at
# transform — no token shuffle at all (replaced posexplode + 2 window
# leads, same stream; the llm/corpus.py shingle sites moved the same
# round) — then repetition = 1 - distinct/total per doc. The only
# exchange is the per-doc count agg. At 100 TB: identical plan, plus
# the long-doc token cap noted in the module docstring.
# ---------------------------------------------------------------------------

_ORACLE_REPETITION = """
WITH toks AS (
    SELECT doc_id, t
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(LOWER(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    )
    WHERE len(t) >= 3
), grams AS (
    SELECT doc_id,
           t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
    FROM toks, LATERAL (
        SELECT UNNEST(generate_series(1, len(t) - 2)) AS i
    ) g
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
       ROUND(1.0 - COUNT(DISTINCT gram) / COUNT(*)::DOUBLE, 6) AS repetition
FROM grams
GROUP BY doc_id
ORDER BY doc_id
"""


@query("q_text_repetition", oracle=_ORACLE_REPETITION)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    grams = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 2, 0)),"
                    " (x, i) -> concat_ws(' ', x, element_at(t, i + 2),"
                    " element_at(t, i + 3)))"
                )
            ).alias("gram"),
        )
    )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_distinct("gram").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_grams").cast("double"), 6
            ).alias("repetition"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Unigram log-probability scoring — the language-model quality filter
# (the cheap stand-in for perplexity filtering in corpus cleaning:
# docs whose tokens are collectively improbable under the corpus'
# own unigram distribution are boilerplate/garbage candidates).
# ---------------------------------------------------------------------------

_ORACLE_UNIGRAM_LP = """
WITH toks AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '\\s+')) AS term
    FROM documents
),
clean AS (SELECT doc_id, term FROM toks WHERE term <> ''),
freq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM clean GROUP BY term),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM freq)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(LN(f.cnt / t.total)), 4) AS mean_logprob
FROM clean c JOIN freq f ON c.term = f.term CROSS JOIN tot t
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


@query("q_text_unigram_logprob", oracle=_ORACLE_UNIGRAM_LP)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus'
    own empirical unigram distribution.

    Two hash aggregations and a broadcast join: (1) vocabulary counts
    (shuffle carries terms, not documents), (2) per-doc token count +
    mean of ln(p). The vocabulary with its scalar total is broadcast —
    at 100 TB the model side is vocab-sized (millions of rows, MBs),
    never corpus-sized, the same model-vs-data split as TF-IDF above
    and k-means (llm/clustering.py). A real LM perplexity filter has
    exactly this plan shape with the n-gram table swapped in.

    FP note: AVG over doubles is partitioning-ordered; ROUND(.,4)
    sits ~7 orders of magnitude above double ulp at these magnitudes,
    the same margin every aggregated-double oracle here relies on
    (ORACLES.md).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("term")
    ).filter(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("double").alias("total"))
    model = freq.crossJoin(F.broadcast(tot))
    return (
        toks.join(F.broadcast(model), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 4).alias(
                "mean_logprob"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Intra-document segment dedup accounting (RefinedWeb/Falcon-style
# line dedup): how much of each document is made of repeated segments,
# and which segments the corpus repeats across documents (boilerplate:
# headers, disclaimers). The fixture corpus has no sentence
# punctuation, so a "line" is a fixed non-overlapping 3-token segment
# — the same accounting, a degenerate segmenter; a punctuated corpus
# swaps the segment expression for a split on newline/period.
#
# Scale design (100 TB): segmenting is a map-side generator; the
# per-doc accounting aggregates (doc_id, segment) with map-side
# combine; the cross-doc boilerplate agg keys on md5(segment) so the
# wide shuffle carries hashes, never text.
# ---------------------------------------------------------------------------

_SEG_TOKENS = 3

_DUCK_SEGMENTS = f"""
    SELECT doc_id,
           array_to_string(list_slice(toks, s * {_SEG_TOKENS} + 1,
                                      s * {_SEG_TOKENS} + {_SEG_TOKENS}), ' ') AS segment
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS toks
        FROM documents
    ) t,
    UNNEST(generate_series(0, CAST(len(toks) / {_SEG_TOKENS} AS BIGINT))) AS u(s)
    WHERE s * {_SEG_TOKENS} + {_SEG_TOKENS} <= len(toks)
"""

_ORACLE_SEGMENT_DEDUP = f"""
WITH seg AS ({_DUCK_SEGMENTS}),
per_doc AS (
    SELECT doc_id, segment, COUNT(*) AS m FROM seg GROUP BY doc_id, segment
)
SELECT doc_id,
       CAST(SUM(m) AS BIGINT) AS n_segments,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       ROUND(SUM(m - 1) * 1.0 / SUM(m), 6) AS intra_dup_share
FROM per_doc
GROUP BY doc_id
ORDER BY doc_id
"""


def _segments(docs: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n"),
            F.explode(
                F.expr(f"sequence(0, size(toks) div {_SEG_TOKENS})")
            ).alias("s"),
            "toks",
        )
        .filter(F.col("s") * _SEG_TOKENS + _SEG_TOKENS <= F.col("n"))
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.slice("toks", F.col("s") * _SEG_TOKENS + 1, _SEG_TOKENS)
            ).alias("segment"),
        )
    )


@query("q_text_segment_dedup", oracle=_ORACLE_SEGMENT_DEDUP)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _segments(docs).groupBy("doc_id", "segment").agg(
        F.count(F.lit(1)).alias("m")
    )
    return (
        per_doc.groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_segments"),
            F.count(F.lit(1)).alias("n_unique"),
            F.round(F.sum(F.col("m") - 1) * F.lit(1.0) / F.sum("m"), 6).alias(
                "intra_dup_share"
            ),
        )
        .orderBy("doc_id")
    )


_ORACLE_BOILERPLATE = f"""
WITH seg AS ({_DUCK_SEGMENTS}),
norm AS (SELECT DISTINCT doc_id, segment FROM seg)
SELECT md5(segment) AS segment_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS example_doc_id
FROM norm
GROUP BY md5(segment)
HAVING COUNT(*) >= 3
ORDER BY n_docs DESC, segment_hash
"""


@query("q_text_boilerplate", oracle=_ORACLE_BOILERPLATE)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated segments (>= 3 docs) — the boilerplate
    table a cleaning pass subtracts. DISTINCT per (doc, segment)
    first so a doc's internal repetition can't inflate doc counts."""
    docs = load_table(spark, sf_dir, "documents")
    norm = _segments(docs).distinct()
    return (
        norm.groupBy(F.md5("segment").alias("segment_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), "segment_hash")
    )


# ---------------------------------------------------------------------------
# Keyword extraction — top-3 TF-IDF terms per document (the cheap
# content tagger / index-term generator). Composition of the TF-IDF
# pieces with a per-doc ranking window; document frequencies stay a
# vocabulary-sized broadcast; the window partitions by doc_id, so the
# sort is per-document-vocabulary-bounded at any corpus size. Ties
# pinned by (tfidf DESC, term ASC) on both engines.
# ---------------------------------------------------------------------------

_ORACLE_KEYWORDS = """
WITH toks AS (
    SELECT doc_id, UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                      x -> x <> '')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * LN(n.n_docs * 1.0 / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk
FROM (
    SELECT doc_id, term, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
    FROM scored
)
WHERE rk <= 3
ORDER BY doc_id, rk
"""


@query("q_text_keywords", oracle=_ORACLE_KEYWORDS)
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


_ORACLE_INVERTED = """
WITH td AS (
    SELECT DISTINCT
        UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> ''))
            AS term,
        doc_id
    FROM documents
), postings AS (
    SELECT term,
           COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id))[1:10], ',') AS posting_head
    FROM td
    GROUP BY term
)
SELECT term, df, posting_head
FROM postings
ORDER BY df DESC, term
LIMIT 20
"""


@query("q_text_inverted_index", oracle=_ORACLE_INVERTED)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + the head of
    the sorted posting list (top-20 terms by df shown).

    The index IS the groupBy: distinct (term, doc) pairs — one
    map-side-combined shuffle on term — then df = count and the
    posting list collects doc ids sorted inside the agg buffer. At
    100 TB the only watch item is posting-list skew on stopword-grade
    terms, which is why the registered output carries a SLICED head
    (the full-list variant would cap or bucket hot terms before
    collect, the same cap discipline as the minhash buckets). This is
    the candidate-generation backbone the corpus-funnel join already
    uses inline (llm/corpus.py); registered standalone so the
    structure itself is value-checked.
    """
    docs = load_table(spark, sf_dir, "documents")
    td = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
            ).alias("term"),
            "doc_id",
        )
        .distinct()
    )
    return (
        td.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # comma-joined head, not a raw array: the cross-engine value
            # compare needs one canonical serialization (q_collect_set rule)
            F.concat_ws(
                ",", F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10)
            ).alias("posting_head"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(20)
    )


_ORACLE_ZIPF = """
WITH tf AS (
    SELECT term, COUNT(*) AS freq
    FROM (
        SELECT UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                  t -> t <> '')) AS term
        FROM documents
    )
    GROUP BY term
), ranked AS (
    SELECT ROUND(LN(ROW_NUMBER() OVER (ORDER BY freq DESC, term)), 6) AS x,
           ROUND(LN(freq), 6) AS y
    FROM tf
), s AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
       ROUND(POWER(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
FROM s
"""


@query("q_text_zipf", oracle=_ORACLE_ZIPF)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ln(freq) on ln(rank) (a natural corpus should land near −1; a
    synthetic or template-heavy corpus drifts off — a cheap
    corpus-health fingerprint for training-data QA).

    Composes the engine's own primitives at the right altitudes: term
    frequencies are one explode+count shuffle; ranks order the TERM
    aggregate (vocabulary-sized — the rank window never sees token
    instances); the fit is the 5-sufficient-statistic OLS (mergeable
    partials, q_regression_slope). Log inputs rounded to 6 before
    summing, per the ORACLES.md transcendental rule.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "term")
    ranked = tf.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 6).alias("x"),
        F.round(F.log("freq"), 6).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(num / den, 4).alias("zipf_slope"),
        F.round(
            F.pow(num, 2)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            4,
        ).alias("r2"),
    )


_ORACLE_HEAPS = """
WITH first_seen AS (
    SELECT MIN(doc_id) AS first_doc
    FROM (
        SELECT doc_id,
               UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                  t -> t <> '')) AS term
        FROM documents
    )
    GROUP BY term
), new_terms AS (
    SELECT first_doc AS doc_id, COUNT(*) AS n_new
    FROM first_seen GROUP BY first_doc
), tokens_per_doc AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT t.doc_id,
       CAST(SUM(t.n_tokens) OVER (ORDER BY t.doc_id) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY t.doc_id) AS BIGINT) AS vocab_size
FROM tokens_per_doc t LEFT JOIN new_terms n ON n.doc_id = t.doc_id
ORDER BY t.doc_id
"""


@query("q_text_heaps", oracle=_ORACLE_HEAPS)
def text_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: vocabulary size vs cumulative tokens as the
    corpus is consumed in doc_id order — with Zipf (q_text_zipf) the
    second standard corpus-health fingerprint.

    The expanding-distinct is computed by FIRST-SEEN COLLAPSE (the
    q_cumulative_distinct_users identity): each term contributes +1
    exactly at its minimum doc — one term-keyed shuffle — so the
    cumulative never re-scans prefixes and the running sums ride the
    per-doc AGGREGATE grid. The naive per-prefix COUNT(DISTINCT) is
    quadratic; this is linear.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    exploded = docs.select("doc_id", F.explode(toks).alias("term"))
    new_terms = (
        exploded.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    tokens_per_doc = docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    from pyspark.sql import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tokens_per_doc.join(new_terms, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("vocab_size"),
        )
        .orderBy("doc_id")
    )


_ORACLE_BPE_MERGES = """
WITH toks AS (
    SELECT list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS l
    FROM documents
), grams AS (
    SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))
        AS pair
    FROM toks
)
SELECT pair AS merge_pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM grams
GROUP BY pair
ORDER BY n_occurrences DESC, merge_pair
LIMIT 25
"""


@query("q_text_bpe_merges", oracle=_ORACLE_BPE_MERGES)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE induction step at corpus scale: the most frequent
    ADJACENT token pairs — exactly the statistic a byte-pair/WordPiece
    trainer maximizes each merge round. Iterating (count → merge top
    pair → recount) is the full trainer; each round is this same
    count, so the warehouse-side cost model is one explode+groupBy per
    merge (batched in practice). The pair stream is in-expression
    (sliding index transform, < |tokens| rows), map-side combined —
    word-count economics regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    grams = docs.select(toks.alias("l")).select(
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 2 THEN transform(sequence(1, size(l) - 1), "
                "i -> concat(element_at(l, i), ' ', element_at(l, i + 1))) "
                "ELSE array() END"
            )
        ).alias("merge_pair")
    )
    return (
        grams.groupBy("merge_pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "merge_pair")
        .limit(25)
    )


_ORACLE_EMERGING = """
WITH med AS (
    SELECT quantile_disc(doc_id, 0.5) AS m FROM documents
), counts AS (
    SELECT term,
           COUNT(*) FILTER (WHERE doc_id > (SELECT m FROM med)) AS late,
           COUNT(*) FILTER (WHERE doc_id <= (SELECT m FROM med)) AS early
    FROM (
        SELECT doc_id,
               UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                  t -> t <> '')) AS term
        FROM documents
    )
    GROUP BY term
    HAVING late + early >= 20
)
SELECT term,
       CAST(late AS BIGINT) AS late_count,
       CAST(early AS BIGINT) AS early_count,
       ROUND(LN((late + 1.0) / (early + 1.0)), 6) AS log_odds
FROM counts
ORDER BY ROUND(LN((late + 1.0) / (early + 1.0)), 6) DESC, term
LIMIT 15
"""


@query("q_text_emerging_terms", oracle=_ORACLE_EMERGING)
def text_emerging_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift for TEXT: terms over-represented in the late half
    of the corpus vs the early half (add-one-smoothed log-odds) — the
    vocabulary-shift companion to the numeric PSI drift monitor,
    exactly what a training-data refresh review looks at.

    Term × half counts come from one explode + conditional-count
    shuffle; the smoothed ratio is an exact rational into one ln
    (rounded per the transcendental rule — the sort uses the ROUNDED
    score so top-k can't flip on a ulp). Split point = the discrete
    median doc_id, an actual id on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(
        F.percentile_approx("doc_id", 0.5, 2147483647).alias("m")
    )
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    counts = (
        docs.crossJoin(F.broadcast(med))
        .select("doc_id", "m", F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.when(F.col("doc_id") > F.col("m"), 1)).alias("late"),
            F.count(F.when(F.col("doc_id") <= F.col("m"), 1)).alias("early"),
        )
        .filter(F.col("late") + F.col("early") >= 20)
    )
    score = F.round(F.log((F.col("late") + 1.0) / (F.col("early") + 1.0)), 6)
    return (
        counts.select(
            "term",
            F.col("late").cast("long").alias("late_count"),
            F.col("early").cast("long").alias("early_count"),
            score.alias("log_odds"),
        )
        .orderBy(F.col("log_odds").desc(), "term")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Readability scores (round 5): Flesch reading ease + Flesch-Kincaid
# grade level (public formulas, Kincaid et al. 1975) — the classic
# additions to the quality-scoring family (q_text_quality /
# q_text_gopher_rules) that downstream corpus filters bucket on.
# Syllables use the standard vowel-group heuristic with a per-word
# floor of 1; sentences split on [.!?]+ runs with a floor of 1 (the
# fixture corpus has little punctuation — the floor makes the formula
# total-length-sensitive there, which is the documented behavior of
# these scores on fragment text).
#
# Scale: map-only per document (one HOF pass over the token array for
# the per-word syllable floor — same single-HOF budget as the shingle
# builders); the only shuffle is the final sort. try_divide keeps the
# degenerate empty-text rows NULL instead of crashing (empty-slice
# gate).
# ---------------------------------------------------------------------------

_ORACLE_READABILITY = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'), w -> w <> '') AS toks,
           GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent
    FROM documents
),
s AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(n_sent AS BIGINT) AS n_sent,
           CAST(COALESCE(list_sum(list_transform(toks,
                w -> GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1))), 0)
               AS BIGINT) AS n_syllables
    FROM t
)
SELECT doc_id, n_words, n_sent, n_syllables,
       ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
             - 84.6 * (CASE WHEN n_words = 0 THEN NULL
                            ELSE CAST(n_syllables AS DOUBLE) / n_words END), 4)
           AS flesch_ease,
       ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sent)
             + 11.8 * (CASE WHEN n_words = 0 THEN NULL
                            ELSE CAST(n_syllables AS DOUBLE) / n_words END)
             - 15.59, 4) AS fk_grade
FROM s
ORDER BY doc_id
"""


@query("q_text_readability", oracle=_ORACLE_READABILITY)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    syll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)).cast("long"),
    )
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.greatest(F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1))
        .cast("long")
        .alias("n_sent"),
        F.coalesce(syll, F.lit(0)).alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sent")
    spw = F.try_divide(F.col("n_syllables").cast("double"), F.col("n_words"))
    return base.select(
        "doc_id",
        "n_words",
        "n_sent",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch_ease"
        ),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
        ).alias("fk_grade"),
        # score once (optimization r13, guide §2.4): the final sort's
        # range sampling re-ran the regexp/HOF scoring over the full
        # text a second time; materializing the small per-doc rows
        # keeps compute at scan parallelism and sorts only results
    ).localCheckpoint(eager=False).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MATTR — moving-average type-token ratio (round 11; Covington &
# McFall 2010, public literature): plain TTR is length-confounded
# (longer docs always score lower), so corpus-quality pipelines use
# the mean TTR over a sliding token window. W = 25 here (docs are
# 20-200 tokens). Map-side only: per-window distinct counts come from
# one indexed transform over the projected token array (the r11
# n-gram discipline — t is a resolved column, so the per-window slice
# is the only copy and W bounds it); the lone exchange is the final
# sort. Integers until one double division, ROUND(.,6).
# ---------------------------------------------------------------------------

_MATTR_W = 25

_ORACLE_MATTR = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'),
                       x -> x <> '') AS t
    FROM documents
), eligible AS (
    SELECT doc_id, t, len(t) AS n_tokens
    FROM toks WHERE len(t) >= {_MATTR_W}
), wins AS (
    SELECT doc_id, n_tokens,
           len(list_distinct(t[i : i + {_MATTR_W - 1}])) AS d
    FROM eligible, UNNEST(generate_series(1, n_tokens - {_MATTR_W - 1})) AS s(i)
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(d) AS BIGINT) AS distinct_sum,
       ROUND(SUM(d) * 1.0 / (COUNT(*) * {_MATTR_W}), 6) AS mattr
FROM wins
GROUP BY doc_id, n_tokens
ORDER BY doc_id
"""


@query("q_text_mattr", oracle=_ORACLE_MATTR)
def text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio over a 25-token sliding window
    per document — the length-robust lexical-diversity score corpus
    filters threshold on (plain TTR penalizes long docs by Heaps' law;
    MATTR compares docs of any length on the same scale)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    wins = F.expr(
        f"transform(sequence(1, size(t) - {_MATTR_W - 1}),"
        f" i -> size(array_distinct(slice(t, i, {_MATTR_W}))))"
    )
    base = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _MATTR_W)
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            wins.alias("w"),
        )
    )
    return base.select(
        "doc_id",
        "n_tokens",
        F.size("w").cast("long").alias("n_windows"),
        F.aggregate("w", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "distinct_sum"
        ),
    ).select(
        "doc_id",
        "n_tokens",
        "n_windows",
        "distinct_sum",
        F.round(
            F.col("distinct_sum") * 1.0 / (F.col("n_windows") * _MATTR_W), 6
        ).alias("mattr"),
    ).orderBy("doc_id")
