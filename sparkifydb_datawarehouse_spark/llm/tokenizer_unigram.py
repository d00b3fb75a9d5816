"""Unigram-LM tokenizer training (SentencePiece-style hard-EM; Kudo
2018, "Subword Regularization", public literature) — round 11. BPE
(llm/bpe.py) is the bottom-up tokenizer family; unigram-LM is the
top-down one production tokenizers ship (T5/Llama SentencePiece
mode): seed a large candidate-piece vocabulary, then alternate
Viterbi segmentation (E-step) and count re-estimation (M-step) while
pruning toward a target size.

Architecture (the k-means / BPE "model on driver, data in the plan"
discipline):
- The corpus reduces to the DISTINCT-WORD histogram first (explode →
  groupBy(word) → sum) — vocabulary-bounded by Heaps' law, the same
  reduction the BPE trainer and the Jaro-Winkler join use. Every EM
  pass runs over WORD TYPES weighted by frequency, never over
  documents; the histogram is localCheckpointed once (one scan of the
  corpus total, ~5 consumers).
- Seed vocabulary = every substring of length 1..4 with corpus
  frequency ≥ 5, plus ALL single characters (kept unconditionally so
  Viterbi coverage is total). Substring counting is one map-side
  indexed-transform explode + a hash agg over PIECE keys
  (vocab-bounded shuffle).
- E-step: Viterbi-best segmentation of each distinct word under the
  current piece log-probs — mapInPandas over the word histogram with
  the piece table in the closure (it is k-means-centroid-sized;
  pieces whose probability mass an executor needs, never data). Ties
  break deterministically (longer piece wins at equal log-prob).
- M-step on the driver: counts (vocab-bounded, collected like the
  k-means Gram partials) renormalize; pruning keeps single chars +
  the top ceil(0.8 · prev) multi-char pieces by (count desc, piece
  asc) — a deterministic schedule, so the per-iteration vocabulary
  size is a CLOSED FORM DuckDB recomputes.

Oracle posture (the r7+ contract-oracle discipline): hard-EM itself
is not SQL-expressible, so the registered query emits one row per EM
iteration with three exactly-recomputable values and one theorem
flag: vocab_size (singles + the ceil(0.8^i) chain off the seed count,
both recomputed by DuckDB from the same substring statistics),
covered_chars (the distributed segmentation's Σ len(piece)·count —
Viterbi coverage is total, so it must equal the corpus'
Σ len(word)·count, which DuckDB computes directly), and em_monotone
(Σ c·ln(c/total) ≥ Σ c·ln θ_old with θ_new the UNSMOOTHED MLE of the
M-step's counts — a theorem for any θ_old by the Gibbs inequality
(ADVICE r11 #2), which a broken normalization or count pass would
violate; the +1-smoothed probabilities are used only for the next
E-step's log-probs).
Piece-level detail stays in unigram_lm_detail for tests/probes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..tables import load_table

_TOKEN_SPLIT = r"\s+"
_MAX_PIECE = 4  # seed substring length cap
_MIN_FREQ = 5  # seed frequency floor for multi-char pieces
_N_ITER = 3
_PRUNE_KEEP = 0.8  # multi-char pieces kept per iteration
# VERDICT r11 #7: hard cap on the DRIVER-materialized multi-char seed
# table. The freq ≥ 5 / len ≤ 4 bounds make the seed vocab-bounded on
# natural text (Heaps' law; ~10k pieces at sf0.1), but the bound is
# data-dependent — a pathological character-diverse corpus could grow
# it without limit. Above the cap the trainer REFUSES loudly
# (VocabCapExceeded, ADVICE r12 #3): a truncated vocab the DuckDB
# oracle doesn't share would segment differently, so the cap is a
# declared contract limit, not a silent degradation. The cap count
# runs Spark-side before any collect, so the driver dict is bounded
# either way. Single characters are always kept (bounded by the
# charset; Viterbi coverage stays total).
_SEED_CAP = 500_000


class VocabCapExceeded(ValueError):
    """Seed vocab exceeds the driver-materialization cap; the trainer
    refuses rather than silently diverging from its DuckDB oracle
    (ADVICE r12 #3)."""


def _word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    return (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _seed_pieces(words: DataFrame) -> dict[str, int]:
    """Substring seed counts: every (start, len ≤ 4) occurrence of each
    word weighted by the word's corpus frequency — one map-side
    explode, one hash agg over piece keys."""
    subs = (
        words.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)), s ->"
                    " transform(sequence(1, least({m}, length(w) - s + 1)),"
                    " l -> substring(w, s, l))))".format(m=_MAX_PIECE)
                )
            ).alias("piece"),
            "cnt",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("pc"))
        .filter((F.length("piece") == 1) | (F.col("pc") >= _MIN_FREQ))
    )
    subs = subs.persist()  # 2 consumers: cap count, then one collect
    n_multi = subs.filter(F.length("piece") > 1).count()
    if n_multi > _SEED_CAP:
        # ADVICE r12 #3: refuse loudly (codec posture) instead of
        # warn-and-truncate — a capped vocab the DuckDB oracle doesn't
        # share would segment differently and surface as an
        # unexplained driver red rather than a declared contract
        # limit. The count() above runs BEFORE any collect, so the
        # driver dict is still cap-bounded on the refuse path.
        subs.unpersist()
        raise VocabCapExceeded(
            f"unigram-LM seed table has {n_multi} multi-char pieces "
            f"(cap {_SEED_CAP}); the oracle contract covers corpora "
            "whose freq>=5/len<=4 seed fits the cap — shrink "
            "_MAX_PIECE or raise _MIN_FREQ for this corpus"
        )
    # one collect for singles + multi (optimization r14: was two jobs;
    # both tiers are cap-bounded by the refuse above + the charset)
    rows = subs.collect()
    subs.unpersist()
    return {r["piece"]: int(r["pc"]) for r in rows}


def _viterbi_counts(words: DataFrame, logp: dict[str, float]) -> dict[str, int]:
    """E-step: Viterbi-segment every distinct word under ``logp``,
    return frequency-weighted piece counts. Runs distributed; the
    piece table rides in the closure (vocab-bounded).

    Optimization round 14 (guide §2.3/§4.2): piece counts are
    pre-aggregated INSIDE the Python worker (one dict per batch), so
    the rows leaving the Arrow boundary and entering the groupBy
    shuffle are vocabulary-bounded instead of one row per segmented
    piece occurrence; the DP inner loop hoists the lookup and keeps
    two flat lists instead of tuple cells (~1.5× on the E-step)."""
    max_len = max((len(p) for p in logp), default=1)

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        get = logp.get
        neg_inf = -math.inf
        for pdf in batches:
            acc: dict[str, int] = {}
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                n = len(w)
                cnt = int(cnt)
                # dp: best loglik of w[:i] + backpointer piece length
                best_ll = [neg_inf] * (n + 1)
                best_len = [0] * (n + 1)
                best_ll[0] = 0.0
                for i in range(1, n + 1):
                    lo = i - max_len if i > max_len else 0
                    bi = neg_inf
                    bl = 0
                    for j in range(lo, i):
                        lp = get(w[j:i])
                        if lp is None:
                            continue
                        cand = best_ll[j] + lp
                        # strictly-better OR equal-with-longer-piece
                        # (j smaller = longer piece): deterministic
                        # tie-break, same rule as before
                        L = i - j
                        if cand > bi or (cand == bi and L > bl):
                            bi = cand
                            bl = L
                    best_ll[i] = bi
                    best_len[i] = bl
                i = n
                while i > 0:
                    L = best_len[i]
                    p = w[i - L : i]
                    acc[p] = acc.get(p, 0) + cnt
                    i -= L
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "c": list(acc.values())}
            )

    out_schema = StructType(
        [StructField("piece", StringType()), StructField("c", LongType())]
    )
    agg = (
        words.mapInPandas(seg, out_schema)
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in agg}


def unigram_lm_detail(spark: SparkSession, sf_dir: str) -> dict:
    """Full EM trace: per-iteration vocab sizes, logliks, coverage,
    and the final piece table (for tests/probes)."""
    # lazy: the seed-substring job is the first (sequential) consumer
    # and materializes the histogram as a side effect — one fewer job
    # (optimization r14, guide §5)
    words = _word_histogram(spark, sf_dir).localCheckpoint(eager=False)
    counts = _seed_pieces(words)
    singles = sorted(p for p in counts if len(p) == 1)
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )
    iters = []
    for it in range(1, _N_ITER + 1):
        vocab = {p: counts.get(p, 0) for p in singles + multi}
        total = sum(vocab.values()) or 1
        # smoothed floor keeps never-seen-but-kept pieces finite
        logp = {
            p: math.log((c + 1) / (total + len(vocab))) for p, c in vocab.items()
        }
        new_counts = _viterbi_counts(words, logp)
        covered = sum(len(p) * c for p, c in new_counts.items())
        new_total = sum(new_counts.values()) or 1
        ll_old = sum(c * logp[p] for p, c in new_counts.items())
        # ADVICE r11 #2: ll_new from the UNSMOOTHED MLE θ = c/total —
        # Σ c·ln(c/total) ≥ Σ c·ln θ_old holds for ANY distribution
        # θ_old by the Gibbs inequality (θ_old sums to 1 over the
        # vocab, incl. the +1 smoothing). The smoothed probabilities
        # (computed from `counts` at the top of the next iteration)
        # are kept only for the next E-step's logp; the smoothed
        # Σ c·ln((c+1)/(total+|V|)) is NOT the argmax and the flag
        # could flip on a corpus where piece-usage totals are small
        # relative to vocab size.
        ll_new = sum(
            c * math.log(c / new_total) for c in new_counts.values() if c > 0
        )
        iters.append(
            {
                "iteration": it,
                "vocab_size": len(vocab),
                "covered_chars": covered,
                "em_monotone": int(ll_new >= ll_old - 1e-9),
                "loglik_old": ll_old,
                "loglik_new": ll_new,
            }
        )
        counts = {p: new_counts.get(p, 0) for p in vocab}
        keep = math.ceil(_PRUNE_KEEP * len(multi))
        multi = sorted(multi, key=lambda p: (-counts.get(p, 0), p))[:keep]
    final = {p: counts.get(p, 0) for p in singles + multi}
    return {"iterations": iters, "pieces": final, "singles": len(singles)}


_ORACLE_UNIGRAM_LM = """
WITH toks AS (
    SELECT UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents
), words AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY w
), chars AS (
    SELECT CAST(COALESCE(SUM(LENGTH(w) * cnt), 0) AS BIGINT) AS corpus_chars
    FROM words
), subs AS (
    SELECT substr(w, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece,
           SUM(cnt) AS pc
    FROM words,
         UNNEST(generate_series(1, LENGTH(w))) AS st(s),
         UNNEST(generate_series(1, 4)) AS ln(l)
    WHERE s + l - 1 <= LENGTH(w)
    GROUP BY piece
), seed AS (
    SELECT CAST(COUNT(*) FILTER (WHERE LENGTH(piece) = 1) AS BIGINT) AS singles,
           CAST(COUNT(*) FILTER (WHERE LENGTH(piece) > 1 AND pc >= 5) AS BIGINT)
               AS multi
    FROM subs
), chain AS (
    SELECT singles, multi AS m1,
           CAST(CEIL(0.8 * multi) AS BIGINT) AS m2,
           CAST(CEIL(0.8 * CEIL(0.8 * multi)) AS BIGINT) AS m3
    FROM seed
)
SELECT i.iteration,
       CAST(c.singles + CASE i.iteration
                WHEN 1 THEN c.m1 WHEN 2 THEN c.m2 ELSE c.m3 END AS BIGINT)
           AS vocab_size,
       ch.corpus_chars AS covered_chars,
       CAST(1 AS INTEGER) AS em_monotone
FROM (VALUES (1), (2), (3)) AS i(iteration)
CROSS JOIN chain c CROSS JOIN chars ch
WHERE ch.corpus_chars > 0
ORDER BY i.iteration
"""


@query("q_tokenizer_unigram_lm", oracle=_ORACLE_UNIGRAM_LM)
def tokenizer_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer training: 3 hard-EM
    iterations (distributed Viterbi E-step over the word-type
    histogram, driver M-step, deterministic 0.8-rank pruning), emitted
    as the per-iteration contract row DuckDB recomputes — exact
    vocabulary-size chain off the substring seed statistics, exact
    Viterbi coverage (Σ len(piece)·count must equal the corpus'
    character mass), and the Gibbs-inequality monotonicity flag (see
    module docstring for the full 100 TB architecture)."""
    detail = unigram_lm_detail(spark, sf_dir)
    rows = [
        (d["iteration"], d["vocab_size"], d["covered_chars"], d["em_monotone"])
        for d in detail["iterations"]
        if d["covered_chars"] > 0
    ]
    schema = StructType(
        [
            StructField("iteration", IntegerType(), False),
            StructField("vocab_size", LongType(), False),
            StructField("covered_chars", LongType(), False),
            StructField("em_monotone", IntegerType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("iteration")
