"""B16/B18 — deduplication: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Design: the sketching math (minhash signatures, simhash bit votes)
is pure expression-level Spark — higher-order array functions over
the token array, computed per-document with ZERO shuffle. The only
shuffles are the final bucket-join / group-by steps, which carry
sketches (bytes), not documents. That is the property that makes
these runnable at 100 TB: the full text never crosses the network.

Sketch hash = xxhash64 (Spark built-in, JVM-side). DuckDB has no
xxhash64, so the sketch-based queries are rows-only; the set-exact
queries (exact dedup, n-gram Jaccard) are fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# Exact dedup: group by normalized-text fingerprint, keep min doc_id.
# The scalable exact-dedup shape: shuffle carries (hash, doc_id) only.
# ---------------------------------------------------------------------------

_ORACLE_EXACT = """
SELECT md5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')) AS fingerprint,
       MIN(doc_id) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY 1
ORDER BY fingerprint
"""


@query("q_dedup_exact", oracle=_ORACLE_EXACT)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("fingerprint")
    )


# ---------------------------------------------------------------------------
# Shared sketch helpers (expression-level, no UDFs).
# ---------------------------------------------------------------------------


def _word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles as an array<string>; empty array for
    docs shorter than n tokens (sequence() would otherwise run
    backwards on a negative stop)."""
    toks = F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")
    shingled = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, shingled).otherwise(F.array()))


_N_MINHASH = 32
_BAND_ROWS = 4  # 8 bands of 4 → LSH threshold ≈ (1/8)^(1/4) ≈ 0.59 Jaccard


def _minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → 32-value minhash signature.

    Perf-critical shape (this was a 230s → ~2s fix at sf0.1): hash
    each shingle STRING exactly once (xxhash64), then derive the k-th
    "permutation" arithmetically (h * (2k+1) + k — odd multiplier, a
    bijection mod 2^64) and take array_min per k. The three staged
    selects matter: CollapseProject declines to inline non-cheap
    expressions referenced many times, so shingling and base-hashing
    each run once per row instead of once per k."""
    # fixture tables arrive as ONE parquet file → one partition; fan the
    # compute-heavy sketching out to all cores first. (At 100 TB inputs
    # are many files and this repartition is a no-op to remove.)
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    # NOTE deliberately NO row filter here: a filter on a derived column
    # gets pushed below the repartition Exchange with the full shingle
    # expression substituted in, recomputing the sketch single-threaded
    # on the unsplit input (observed 5x slowdown). Docs with < n tokens
    # produce an all-null signature; consumers drop them expression-side.
    return (
        spread.select("doc_id", _word_shingles(text_col).alias("shingles"))
        .select("doc_id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs"))
        .select(
            "doc_id",
            # fold the 64-bit hash into 32 bits before multiplying so the
            # k-permutation (odd multiplier) can't overflow under ANSI mode
            F.expr(
                f"transform(sequence(0, {_N_MINHASH - 1}), "
                "k -> array_min(transform(hs, "
                "h -> ((shiftrightunsigned(h, 32) ^ h) & 4294967295) * (2 * k + 1) + k)))"
            ).alias("sig"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup: signature → band buckets → bucket self-join.
# rows-only (xxhash64 has no DuckDB equivalent).
# ---------------------------------------------------------------------------


@query("q_dedup_fuzzy_minhash")  # rows-only: Spark-internal hash function
def dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_sig = _minhash_signatures(docs)

    # Band signature = xxhash64 over the band's 4 minhash values — a
    # single hash call per band vs slice+transform+concat_ws string
    # building (which cost ~5x the signature computation itself when
    # interpreted). 64-bit collisions only add candidate pairs.
    n_bands = _N_MINHASH // _BAND_ROWS
    band_exprs = ", ".join(
        "struct({b} AS band, xxhash64({elems}) AS band_sig)".format(
            b=b,
            elems=", ".join(
                f"sig[{b * _BAND_ROWS + r}]" for r in range(_BAND_ROWS)
            ),
        )
        for b in range(n_bands)
    )
    banded = with_sig.select(
        "doc_id",
        # empty-shingle docs have sig = [null, ...]: give them zero bands
        # (exploding an empty array emits no rows) instead of letting
        # them all collide in a null-hash bucket
        F.explode(
            F.expr(f"IF(sig[0] IS NULL, array(), array({band_exprs}))")
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_sig")

    # Pairs via groupBy + in-expression combination generation — ONE
    # shuffle and one signature computation, vs a self-join that
    # recomputes the whole sketch pipeline per side. Production note:
    # cap bucket sizes (a degenerate all-identical corpus makes one
    # bucket quadratic) before exploding pairs.
    return (
        banded.groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash: 64-bit bit-vote sketch; candidates share one of four
# 16-bit chunks, verified with bit_count(xor) <= hamming threshold.
# rows-only (xxhash64).
# ---------------------------------------------------------------------------

_HAMMING_MAX = 12


@query("q_dedup_simhash")  # rows-only: Spark-internal hash function
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Bit votes need shiftleft/shiftrightunsigned with expression
    # (non-literal) shift amounts — pyspark's wrappers only take int
    # literals, so the sketch is one SQL expression (same codegen).
    simhash = F.expr(
        r"""
        aggregate(
            sequence(0, 63),
            0L,
            (acc, b) -> acc | IF(
                aggregate(
                    transform(filter(split(lower(text), '\\s+'), t -> t != ''),
                              t -> xxhash64(t)),
                    0L,
                    (v, h) -> v + IF((shiftrightunsigned(h, b) & 1) = 1, 1L, -1L)
                ) > 0,
                shiftleft(1L, b),
                0L
            )
        )
        """
    )
    spread = docs.repartition(spark.sparkContext.defaultParallelism)
    sketched = spread.filter(F.length("text") > 0).select("doc_id", simhash.alias("simhash"))

    chunks = sketched.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> struct("
                "c AS chunk, shiftrightunsigned(simhash, c * 16) & 65535 AS chunk_val))"
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.chunk_val")

    # one shuffle + expression-side pair generation (see minhash note)
    return (
        chunks.groupBy("chunk", "chunk_val")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("members")
        )
        .filter(F.size("members") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (x, i) -> "
                    "transform(slice(members, i + 2, size(members)), "
                    "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
                    "x.simhash AS sh_a, y.simhash AS sh_b))))"
                )
            ).alias("p")
        )
        .select(
            "p.doc_a",
            "p.doc_b",
            F.bit_count(F.col("p.sh_a").bitwiseXOR(F.col("p.sh_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard over neighbor candidate pairs (same source,
# doc_id within +5) — fully oracle-checked against DuckDB list ops.
# At scale the candidate generator would be the LSH bucket join above;
# the neighbor window here keeps the pair count linear for the oracle.
# ---------------------------------------------------------------------------

_ORACLE_JACCARD = """
WITH sh AS (
    SELECT doc_id, source,
           list_distinct(list_transform(
               range(len(toks) - 2),
               i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]
           )) AS shingles
    FROM (
        SELECT doc_id, source,
               list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS toks
        FROM documents
    )
    WHERE len(toks) >= 3
)
SELECT a.doc_id AS doc_a,
       b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
FROM sh a
JOIN sh b ON a.source = b.source
         AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 100
ORDER BY doc_a, doc_b
"""


@query("q_dedup_ngram_jaccard", oracle=_ORACLE_JACCARD)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", _word_shingles("text").alias("shingles")
    ).filter(F.size("shingles") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_distinct(F.concat(F.col("a.shingles"), F.col("b.shingles"))))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("b.doc_id") > F.col("a.doc_id"))
            # window of 100 ids: fixture sources are src{doc_id % 20}, so
            # same-source neighbors sit at id strides of 20 — a ±5 window
            # would never match and the candidate set would be empty
            & (F.col("b.doc_id") <= F.col("a.doc_id") + 100),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: neighbor pairs with cosine above
# threshold — oracle-checked (cosine spelled out identically in both
# engines: dot/(|a||b|) over double-cast components).
# ---------------------------------------------------------------------------

# random 64-dim embeddings: neighbor cosine tops out ≈0.47 at sf0.01
# (σ≈1/8) — 0.3 keeps the result non-empty-but-selective at every SF
_COS_THRESHOLD = 0.3


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns (double math)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_ORACLE_EMB_DUP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb)
             / (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))),
             6) AS cos_sim
FROM e a
JOIN e b ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 10
WHERE ROUND(list_dot_product(a.emb, b.emb)
            / (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))),
            6) > {_COS_THRESHOLD}
ORDER BY vec_a, vec_b
"""


@query("q_dedup_embedding_cosine", oracle=_ORACLE_EMB_DUP)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    cos = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6)
    return (
        a.join(
            b,
            (F.col("vec_b") > F.col("vec_a")) & (F.col("vec_b") <= F.col("vec_a") + 10),
        )
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") > _COS_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )
