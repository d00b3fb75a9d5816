"""BPE tokenizer: train (character-level byte-pair merges, Sennrich
2016, public literature) and APPLY — the step q_text_bpe_merges only
cost-modeled. Token counting under a LEARNED subword tokenizer is the
statistic LLM data pipelines actually bill by (tokens, not words), so
"apply the tokenizer at corpus scale" is a first-class operator.

Architecture (the k-means/centroid discipline for bounded driver
state):
- TRAIN on the word-TYPE histogram, not the corpus: distinct words +
  frequencies are vocabulary-bounded (Heaps' law), and the trainer
  only needs the top-V types (V=200 here) — a deterministic top-k
  (count desc, word asc) collected to the driver like k-means
  centroids or cut-point tables. The merge loop is pure Python over
  ≤V short strings — milliseconds, independent of corpus size.
- APPLY is map-side: the ≤N_MERGES merge table rides to executors in
  the UDF closure (broadcast-sized), encoding is a per-word greedy
  merge with a per-batch word→length memo (Zipf makes the memo hit
  rate high), and only fixed-width counts leave mapInPandas. No
  shuffle touches text; the final per-language rollup is a tiny agg.

Oracle posture (r8): the greedy iterative merge stays genuinely
non-SQL-expressible, but both registered queries are CONTRACT
ORACLES — exact anchors DuckDB recomputes (rank-1 merge, per-language
word/char counts) plus theorem flags; full outputs stay in the
*_detail helpers and behavioral correctness is pinned by
hand-computed classic examples in tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"
_N_TYPES = 200  # top word types fed to the trainer
_N_MERGES = 30
_EOW = "</w>"


def train_bpe(word_freqs: dict[str, int], n_merges: int = _N_MERGES) -> list[tuple[str, str]]:
    """Classic BPE trainer over a word-type histogram. Deterministic:
    ties on pair frequency break lexicographically (smallest pair)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy apply: repeatedly merge the lowest-rank adjacent pair
    (leftmost on rank ties) — the standard BPE inference loop."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def learn_corpus_merges(
    spark: SparkSession, sf_dir: str, n_types: int = _N_TYPES, n_merges: int = _N_MERGES
) -> list[tuple[str, str]]:
    """Deterministic top-V word-type histogram → driver-side trainer.
    The collect is bounded at n_types rows (the k-means-centroid rule
    for driver state)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    top = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(n_types)
        .collect()
    )
    return train_bpe({r["w"]: r["n"] for r in top}, n_merges)


_BPE_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_words", LongType()),
        StructField("n_subwords", LongType()),
        StructField("subwords_per_word", DoubleType()),
    ]
)


def text_bpe_apply_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus-learned BPE merges to every document and roll
    up token economics per language: words, subword tokens, and the
    fertility ratio (subwords/word) — the number that decides training
    cost under a given tokenizer. The REGISTERED q_text_bpe_apply
    below is its contract form (r8 conversion)."""
    merges = learn_corpus_merges(spark, sf_dir)
    ranks = {p: i for i, p in enumerate(merges)}

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            rows = []
            for lang, text in zip(pdf["lang"], pdf["text"]):
                if text is None:
                    rows.append((lang, 1, 0, 0))
                    continue
                n_words = 0
                n_sub = 0
                for w in str(text).lower().split():
                    n_words += 1
                    hit = memo.get(w)
                    if hit is None:
                        hit = len(bpe_encode(w, ranks))
                        memo[w] = hit
                    n_sub += hit
                rows.append((lang, 1, n_words, n_sub))
            yield pd.DataFrame(
                rows, columns=["lang", "n_docs", "n_words", "n_subwords"]
            )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    # per-row Python cost dominates → spread the single-file fixture
    # scan (the shingle-spread precondition HOLDS here, unlike the
    # reverted q_dedup_exact case: greedy BPE is ~100x a regexp+md5)
    spread = docs.repartition(spark.sparkContext.defaultParallelism)
    per_doc = spread.mapInPandas(
        encode_batches,
        StructType(
            [
                StructField("lang", StringType()),
                StructField("n_docs", LongType()),
                StructField("n_words", LongType()),
                StructField("n_subwords", LongType()),
            ]
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_subwords"),
            F.round(
                F.try_divide(F.sum("n_subwords"), F.sum("n_words")), 4
            ).alias("subwords_per_word"),
        )
        .orderBy("lang")
    )


# Contract oracle for the APPLY step (r8): the greedy merge loop's
# subword counts are algorithm-specific, but per-language n_docs and
# n_words are exact aggregates DuckDB recomputes, and the encoder
# output obeys two THEOREMS checkable against a second exact anchor
# (total word characters):
#   fertility_lower_ok — n_subwords ≥ n_words (every word encodes to
#                        ≥ 1 token; equality only when all words
#                        collapse to single tokens);
#   fertility_upper_ok — n_subwords ≤ n_word_chars + n_words (a word
#                        starts as len(w)+1 symbols including the
#                        </w> sentinel and merging never adds any).
_ORACLE_BPE_APPLY = """
WITH d AS (
    SELECT lang,
           CASE WHEN text IS NULL THEN []
                ELSE list_filter(string_split_regex(LOWER(text), '\\s+'),
                                 t -> t <> '') END AS ws
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(len(ws)), 0) AS BIGINT) AS n_words,
       CAST(COALESCE(SUM(list_sum(list_transform(ws, w -> length(w)))), 0)
            AS BIGINT) AS n_word_chars,
       CAST(1 AS INTEGER) AS fertility_lower_ok,
       CAST(1 AS INTEGER) AS fertility_upper_ok
FROM d
GROUP BY lang
ORDER BY lang
"""


@query("q_text_bpe_apply", oracle=_ORACLE_BPE_APPLY)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract form of the BPE apply rollup (see oracle banner): the
    exact per-language anchors plus the two encoder theorem flags;
    the full token economics stay in text_bpe_apply_detail."""
    detail = text_bpe_apply_detail(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    chars = docs.select(
        "lang",
        F.coalesce(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
            ),
            F.lit(0).cast("long"),
        ).alias("wc"),
    ).groupBy("lang").agg(F.sum("wc").cast("long").alias("n_word_chars"))
    chars = chars.withColumnRenamed("lang", "chars_lang")
    return (
        detail.join(
            chars,
            F.col("lang").eqNullSafe(F.col("chars_lang")),  # NULL lang is
            # a real group on both engines — a plain join would drop it
            "left",
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            F.coalesce("n_word_chars", F.lit(0)).alias("n_word_chars"),
            (F.col("n_subwords") >= F.col("n_words"))
            .cast("int")
            .alias("fertility_lower_ok"),
            (
                F.col("n_subwords")
                <= F.coalesce("n_word_chars", F.lit(0)) + F.col("n_words")
            )
            .cast("int")
            .alias("fertility_upper_ok"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# DISTRIBUTED trainer (VERDICT r4 #7): the driver-side trainer above
# is exact only over its top-_N_TYPES histogram slice. This loop
# removes that bound by keeping the FULL word-type table distributed
# and iterating the q_text_bpe_merges primitive: each round is one
# vocabulary-sized pair-count shuffle (freq-weighted, map-side
# combined) + a ONE-ROW collect (the argmax pair — the k-means-
# centroid rule for driver state), then the merge is applied
# DISTRIBUTEDLY as a codegen fold over the symbol arrays (greedy
# left-to-right non-overlapping, exactly the Sennrich rule). State is
# localCheckpointed per round (the pagerank iterative-lineage
# discipline). At 100 TB: the type table is vocabulary-bounded
# (Heaps' law), each round shuffles (symbol-pair, count) rows only —
# text never shuffles after the initial histogram.
# ---------------------------------------------------------------------------

_N_DIST_MERGES = 12


def _apply_merge(sym_col, a: str, b: str):
    """Greedy left-to-right non-overlapping replacement of the
    adjacent pair (a, b) with a+b inside a symbol array — as a pure
    expression fold (no UDF; literals ride as expression nodes, so
    arbitrary token text needs no escaping)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (s == lb),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe_distributed(
    docs: DataFrame, n_merges: int = _N_DIST_MERGES, min_pair_count: int = 2
) -> list[tuple[str, str, int]]:
    """Full-vocabulary BPE training loop over a documents frame.
    Returns [(left, right, pair_count), ...] in merge order. Stops
    early when the best pair's weighted count falls below
    min_pair_count (merging near-singletons adds no compression)."""
    return _train_bpe_with_totals(docs, n_merges, min_pair_count)[0]


def _train_bpe_with_totals(
    docs: DataFrame, n_merges: int = _N_DIST_MERGES, min_pair_count: int = 2
) -> tuple[list[tuple[str, str, int]], int, int, int]:
    """train_bpe_distributed plus the corpus totals the contract query
    anchors on: (merges, initial_symbols, final_symbols,
    n_word_tokens) — all freq-weighted over the type table, so the two
    extra aggs are vocabulary-sized."""
    spark = docs.sparkSession
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    types = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(F.split("w", ""), F.array(F.lit(_EOW))).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    pair_expr = F.expr(
        "CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r)) "
        "ELSE array() END"
    )

    def totals(t: DataFrame) -> tuple[int, int]:
        row = t.agg(
            F.coalesce(F.sum(F.col("freq") * F.size("syms")), F.lit(0)).alias("s"),
            F.coalesce(F.sum("freq"), F.lit(0)).alias("w"),
        ).first()
        return int(row["s"]), int(row["w"])

    initial_symbols, n_word_tokens = totals(types)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            types.select("freq", F.explode(pair_expr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        types = types.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        types = types.localCheckpoint(eager=True)
    final_symbols = totals(types)[0] if merges else initial_symbols
    return merges, initial_symbols, final_symbols, n_word_tokens


def text_bpe_train_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed BPE training loop's full merge table: one row
    per learned merge with its rank and weighted pair count —
    deterministic for fixed data (count desc, pair asc tie-break, the
    train_bpe convention). The REGISTERED query below is the contract
    form; this detail stays available (tests/test_bpe.py pins the
    trainer itself)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    merges = train_bpe_distributed(docs)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, left string, right string, merged string, pair_count long",
    )


# Contract oracle (VERDICT r7 #3 — "convergence/fertility anchors"):
# ranks ≥ 2 of the merge table depend on the iterative argmax (non-
# SQL-expressible), but rank 1 IS the plain freq-weighted argmax over
# char-bigram pairs of the word-type histogram — DuckDB recomputes it
# exactly (same count-desc / pair-asc tie-break; both engines compare
# ASCII strings bytewise). Corpus anchors n_word_tokens and
# initial_symbols are exact aggregates. The two flags are theorems:
#   counts_monotone    — merge pair counts are non-increasing in rank
#                        (any post-merge pair's count is bounded by
#                        the merged pair's count: pairs involving the
#                        new symbol occur at most once per replacement,
#                        all others could only lose occurrences);
#   fertility_in_bounds— n_word_tokens ≤ final_symbols ≤
#                        initial_symbols (every word keeps ≥ 1 symbol;
#                        merging never adds symbols).
# Zero learned merges (max pair count < min_pair_count, e.g. the
# one-row degenerate fixture) → zero rows on BOTH sides (the oracle's
# first-merge CTE is empty under WHERE cnt >= 2).
_ORACLE_BPE_TRAIN = """
WITH words AS (
    SELECT unnest(list_filter(string_split_regex(LOWER(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents
), types AS (
    SELECT w, COUNT(*) AS freq FROM words GROUP BY w
), syms AS (
    SELECT freq,
           list_append(list_transform(range(1, length(w) + 1), i -> w[i:i]),
                       '</w>') AS syms
    FROM types
), pr AS (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                                 i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms
), counts AS (
    SELECT p.l AS l, p.r AS r, SUM(freq) AS cnt FROM pr GROUP BY 1, 2
), first AS (
    SELECT l, r, cnt FROM counts WHERE cnt >= 2 ORDER BY cnt DESC, l, r LIMIT 1
), anchors AS (
    SELECT CAST((SELECT COUNT(*) FROM words) AS BIGINT) AS n_word_tokens,
           CAST((SELECT SUM(freq * (length(w) + 1)) FROM types) AS BIGINT)
               AS initial_symbols
)
SELECT first.l AS first_left,
       first.r AS first_right,
       CAST(first.cnt AS BIGINT) AS first_pair_count,
       anchors.n_word_tokens,
       anchors.initial_symbols,
       CAST(1 AS INTEGER) AS counts_monotone,
       CAST(1 AS INTEGER) AS fertility_in_bounds
FROM first CROSS JOIN anchors
"""

_BPE_CONTRACT_SCHEMA = (
    "first_left string, first_right string, first_pair_count long, "
    "n_word_tokens long, initial_symbols long, "
    "counts_monotone int, fertility_in_bounds int"
)


@query("q_text_bpe_train_distributed", oracle=_ORACLE_BPE_TRAIN)
def text_bpe_train_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract form of the distributed BPE trainer (see oracle banner
    above): the exact rank-1 merge + corpus anchors, plus the
    convergence/fertility theorem flags computed from the full run."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    merges, initial_symbols, final_symbols, n_word_tokens = (
        _train_bpe_with_totals(docs)
    )
    if not merges:
        return spark.createDataFrame([], _BPE_CONTRACT_SCHEMA)
    counts = [c for _, _, c in merges]
    monotone = int(all(a >= b for a, b in zip(counts, counts[1:])))
    in_bounds = int(n_word_tokens <= final_symbols <= initial_symbols)
    left, right, cnt = merges[0]
    return spark.createDataFrame(
        [
            (
                left,
                right,
                cnt,
                n_word_tokens,
                initial_symbols,
                monotone,
                in_bounds,
            )
        ],
        _BPE_CONTRACT_SCHEMA,
    )
