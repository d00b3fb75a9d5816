"""Fuzzy string-similarity join: edit-distance matching of part names
within a blocking key.

The reference's only string matching is exact 3-column equality
(/root/reference/sql_queries.py:128-130) — and its README's sample
data shows why fuzzy matching matters in that domain (free-text song
titles / artist names with punctuation variants). This operator is
the entity-resolution primitive: candidate pairs from cheap blocking,
exact Levenshtein on the survivors.

Parameters are calibrated to the data, not guessed: fixture part
names are 7-12 chars, so the match radius is typo-scale (<= 2 edits)
— a radius of half the string length would declare everything a
match and turn the join into a per-block cross product (measured:
23302 pairs at sf0.01 with radius 6 vs meaningful typo pairs at 2).

Scale design (100 TB): NEVER run edit distance across the cross
product.
- Blocking = equi-join on (p_brand, p_type, length band): hash join,
  per-block quadratic bounded by block size. The length-band
  predicate is sound because levenshtein(a,b) >= |len(a)-len(b)|,
  so a distance-<=N match can't sit more than N length units away
  (band width N + adjacent-band probe covers it — same pattern as
  the banded as-of / cosine joins). Skewed blocks would get a
  further blocking key (name prefix) — the blocking-refinement
  ladder.
- The residual uses THRESHOLD Levenshtein (Spark's 3-arg form):
  banded DP costs O(len·k) per pair and abandons early, vs O(len²)
  for the unbounded form — the difference between a usable and an
  unusable residual at millions of candidate pairs.
- Literature: the blocking-then-verify structure follows the
  filter/verification framework of compressed-index string-similarity
  joins (ICDE 2022, PAPERS.md); q-gram prefix filtering is the next
  refinement step if length-band blocks ever skew.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_MAX_DIST = 2
_BAND = _MAX_DIST  # length-band width; adjacent-band probe covers ±N


# ---------------------------------------------------------------------------
# Round-7 rework (VERDICT r6 #2): both linkage joins were quadratic in
# block DEPTH — at part×10 the (brand, type) blocks hold ~100× the
# pairs (134M blocked pairs, 53.7 s / 73.6 s). Two exact levers replace
# the all-pairs block join, both recall-1 BY CONSTRUCTION (no LSH
# gamble against the brute-force oracle):
#
# 1. DISTINCT-NAME DOMAIN. String distance is a function of the name
#    pair, not the part-key pair, so compute it once per distinct
#    (brand, type, name) pair and EXPAND to key pairs afterwards.
#    Real entity-linkage corpora have name multiplicity ≫ 1; the
#    dim-scaled fixture has ~24× (200k rows / 8372 distinct triples).
#    The expansion join is output-bound — unavoidable work.
# 2. SIGNATURE CANDIDATES instead of all distinct-name pairs per block:
#    - Levenshtein ≤ k: FastSS deletion neighborhoods (Bocek et al.
#      2007, public literature) — ed(a,b) ≤ k implies the ≤k-deletion
#      neighborhoods intersect (delete the script's touched chars from
#      each side), so an equi-join on xxhash64(variant) within the
#      block surfaces every true pair. Neighborhood size Σ C(L,i),
#      i ≤ 2 ≈ 79 for L = 12, built JVM-side with transform() — no
#      Python in the candidate stage.
#    - Jaro-Winkler ≥ 0.9: pigeonhole prefix filter on the character
#      multiset. Derivation (same algebra as the histogram prune
#      below): jw ≥ 0.9 ⟹ jaro ≥ 5/6 ⟹ m/len ≥ 0.5 on EACH side,
#      and the m one-to-one matched chars are a sub-multiset of both
#      names, so the multiset intersection B ≥ ceil(len/2) for any
#      admissible partner. Tokenize names as (char, occurrence-index)
#      pairs — token-set overlap ≡ multiset intersection — order the
#      token universe rarest-char-first, and keep each name's first
#      len − ceil(len/2) + 1 = floor(len/2)+1 tokens: any pair with
#      B ≥ ceil(len/2) must share a prefix token (classic
#      prefix-filter lemma, per-side thresholds each a valid lower
#      bound for every admissible partner). Join on (block, token).
#    Both signature joins run on the distinct-name domain; the
#    expensive metric (threshold-Levenshtein / python JW) runs only on
#    surviving candidate name pairs.
#
# Scale shape: candidate stage ~ distinct-name signature volume;
# verify ~ surviving name pairs; expansion ~ OUTPUT rows. Nothing is
# quadratic in block depth or in name multiplicity. Equivalence to the
# unfiltered blocked join is pinned in tests (the r4 prefix-filter
# discipline) and the DuckDB brute-force oracles stay bit-identical.
# ---------------------------------------------------------------------------

_DEL1 = (
    "transform(sequence(1, length({c})), i -> "
    "concat(substring({c}, 1, i-1), substring({c}, i+1, length({c}))))"
)


def _deletion_neighborhood() -> "F.Column":
    """All ≤2-deletion variants of `name` (incl. name itself), built
    entirely JVM-side: 1-deletions via transform over positions,
    2-deletions as 1-deletions of the 1-deletions (duplicates folded
    by array_distinct — C(L,2) survivors)."""
    del1 = _DEL1.format(c="name")
    del2 = f"flatten(transform({del1}, v -> {_DEL1.format(c='v')}))"
    return F.array_distinct(
        F.expr(f"concat(array(name), {del1}, {del2})")
    )


def _distinct_names(p: DataFrame) -> DataFrame:
    """The distinct (brand, ptype, name) domain with key multiplicity."""
    return (
        p.groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_name").alias("name"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.length("name"))
    )


def _expand_pairs(
    dpairs: DataFrame, p: DataFrame, val_col: str
) -> DataFrame:
    """Name-pair → part-key-pair expansion: join each (brand, ptype,
    name_a, name_b, val) row to the part rows carrying name_a and
    name_b in that block, keep part_a < part_b. Same-name pairs
    (name_a == name_b) expand to within-group key pairs directly; for
    distinct names both orientations are joined so the key inequality
    can land either way. dpairs is broadcast (bounded by true
    near-duplicate name-pair mass); the two probe joins are map-side."""
    flipped = dpairs.filter(F.col("name_a") != F.col("name_b")).select(
        "brand",
        "ptype",
        F.col("name_b").alias("name_a"),
        F.col("name_a").alias("name_b"),
        val_col,
    )
    alld = dpairs.unionByName(flipped)
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(F.broadcast(alld), ["brand", "ptype", "name_a"])
        .join(b, ["brand", "ptype", "name_b"])
        .filter(F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b", val_col)
    )


def _lev_candidates(names: DataFrame) -> DataFrame:
    """Deletion-neighborhood candidate name pairs (see module banner):
    distinct (brand, ptype, name_a < name_b) sharing a ≤2-deletion
    variant within the block."""
    sig = names.select(
        "brand",
        "ptype",
        "name",
        F.explode(_deletion_neighborhood()).alias("v"),
    ).select("brand", "ptype", "name", F.xxhash64("v").alias("sig"))
    # merge (sort-merge) hint: the ×~79 post-scan explode fools the
    # size estimator — Catalyst auto-broadcast the exploded frame and
    # OOMed the driver at names×100 (caught by the natural-shape
    # probe); shuffle-hash builds per-partition maps and OOMs on
    # low-memory sessions. SMJ on (block, sig) sorts and SPILLS —
    # the plan that survives any scale and any executor size.
    return (
        sig.alias("a")
        .hint("merge")
        .join(
            sig.alias("b"),
            (F.col("a.brand") == F.col("b.brand"))
            & (F.col("a.ptype") == F.col("b.ptype"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.brand").alias("brand"),
            F.col("a.ptype").alias("ptype"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )


def _lev_name_pairs(names: DataFrame) -> DataFrame:
    """Distinct-name pairs within a block at edit distance ≤ _MAX_DIST:
    deletion-neighborhood candidate join + threshold-Levenshtein
    verify. Returns (brand, ptype, name_a, name_b, edit_dist) with
    name_a < name_b; same-name pairs (dist 0) appended for groups with
    multiplicity ≥ 2."""
    cand = _lev_candidates(names)
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), _MAX_DIST)
    verified = cand.select(
        "brand", "ptype", "name_a", "name_b", dist.alias("edit_dist")
    ).filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _MAX_DIST))
    same = names.filter(F.col("cnt") >= 2).select(
        "brand",
        "ptype",
        F.col("name").alias("name_a"),
        F.col("name").alias("name_b"),
        F.lit(0).alias("edit_dist"),
    )
    return verified.unionByName(same)


_ORACLE_FUZZY = f"""
WITH p AS (
    SELECT p_partkey, p_brand, p_type, p_name, LENGTH(p_name) AS len
    FROM part
)
SELECT a.p_partkey AS part_a,
       b.p_partkey AS part_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM p a
JOIN p b
  ON a.p_brand = b.p_brand
 AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
 AND ABS(a.len - b.len) <= {_MAX_DIST}
WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
ORDER BY part_a, part_b
"""


@query("q_join_fuzzy_levenshtein", oracle=_ORACLE_FUZZY)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part names: same brand + type, edit distance
    <= 2 (typo radius for 7-12-char names).

    Round-7 shape (see module banner): distance runs once per distinct
    (brand, type, name) pair — candidates from a deletion-neighborhood
    equi-join (exact: ed ≤ k ⟹ ≤k-deletion variants intersect),
    threshold-Levenshtein verify on survivors — then name pairs expand
    to part-key pairs via two map-side broadcast joins. Nothing is
    quadratic in block depth or name multiplicity; equivalence to the
    unfiltered blocked join is pytest-pinned and the brute-force
    DuckDB oracle re-proves recall 1 on every driver run."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_name"
    )
    dpairs = _lev_name_pairs(_distinct_names(p))
    return _expand_pairs(dpairs, p, "edit_dist").orderBy("part_a", "part_b")


# ---------------------------------------------------------------------------
# Jaro-Winkler similarity join (round 5) — the OTHER classic record-
# linkage metric (Winkler 1990, public literature): position-tolerant
# and prefix-weighted where Levenshtein is strictly editwise, which is
# why census-style name matching uses it. Same blocking-then-verify
# shape as q_join_fuzzy_levenshtein; the verify stage is a pandas UDF
# (Jaro-Winkler has no Spark built-in) — Arrow-batched, pure-Python
# per pair, applied ONLY to the blocked candidate set, never the
# cross product. At 100 TB the UDF batch volume IS the blocked-pair
# volume; the blocking ladder (brand/type, then name-prefix) is what
# keeps it bounded.
#
# Determinism note (ORACLES.md discipline): the implementation was
# pinned to DuckDB's exact variant by an 8000-pair fuzz (0 mismatches,
# tests/test_retrieval_cdc.py::test_jaro_winkler_matches_duckdb):
# match window = max(len)//2 - 1, transposition count FLOORED
# (t = half//2 — the textbook keeps half/2 as a fraction; DuckDB
# floors), Winkler boost gated at jaro > 0.7 with prefix <= 4 and
# p = 0.1. Values are then bit-comparable and ROUND(6) is safe.
# ---------------------------------------------------------------------------

_JW_THRESHOLD = 0.9


def jaro_winkler(a: str, b: str) -> float:
    """DuckDB-compatible Jaro-Winkler (see determinism note above)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    half = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                half += 1
            k += 1
    t = half // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        l = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            l += 1
        jaro = jaro + l * 0.1 * (1.0 - jaro)
    return jaro


_ORACLE_JW = f"""
WITH p AS (
    SELECT p_partkey, p_brand, p_type, p_name FROM part
)
SELECT a.p_partkey AS part_a,
       b.p_partkey AS part_b,
       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
FROM p a
JOIN p b
  ON a.p_brand = b.p_brand
 AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= {_JW_THRESHOLD}
ORDER BY part_a, part_b
"""


def _make_jw_udf():
    """Arrow-batched pandas UDF computing exact DuckDB-compatible JW,
    gated by a batch-vectorized character-histogram upper bound.
    Derivation (sound, no recall loss): jw = jaro + l·0.1·(1−jaro)
    with l ≤ 4 ⟹ jw ≤ 0.6·jaro + 0.4, so jw ≥ 0.9 forces
    jaro ≥ 5/6; the jaro upper bound from the multiset intersection B
    is (B/la + B/lb + 1)/3 — only pairs whose bound clears the
    threshold reach python JW."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    _need = (_JW_THRESHOLD - 0.4) / 0.6

    def _hist(col: pd.Series):
        """(n,128) per-row character histograms + CHARACTER lengths,
        fully vectorized: one flat bincount over row*128+code —
        per-pair np.bincount calls were themselves the bottleneck.
        UTF-32-LE gives one uint32 CODE POINT per char, so lengths and
        bins match what jaro_winkler() sees — a UTF-8 byte histogram
        diluted the bound's denominators on multi-byte text and could
        prune a true match. The &127 fold only MERGES bins, which can
        only raise the multiset-intersection bound — recall-safe by
        construction."""
        enc = [s.encode("utf-32-le") for s in col]
        lens = np.fromiter((len(e) >> 2 for e in enc), np.int64, count=len(enc))
        # explicit little-endian dtype to match the utf-32-le encode —
        # native-endian np.uint32 would byteswap code points on a
        # big-endian host (recall-safe either way, but the documented
        # code-point/bin correspondence would silently break; ADVICE r6)
        flat = np.frombuffer(b"".join(enc), np.dtype("<u4")).astype(np.int64) & 127
        rows = np.repeat(np.arange(len(enc)), lens)
        h = np.bincount(rows * 128 + flat, minlength=len(enc) * 128)
        return h.reshape(len(enc), 128), lens

    @pandas_udf("double")
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series(np.zeros(0), dtype="float64")
        ha, la = _hist(a)
        hb, lb = _hist(b)
        bound = np.minimum(
            np.minimum(ha, hb).sum(axis=1), np.minimum(la, lb)
        ).astype(np.float64)
        ub = (bound / la + bound / lb + 1.0) / 3.0
        out = np.zeros(len(a))
        av, bv = a.to_numpy(), b.to_numpy()
        for i in np.nonzero(ub >= _need)[0]:
            out[i] = jaro_winkler(av[i], bv[i])
        return pd.Series(out, dtype="float64")

    return jw_udf


def _jw_candidates(names: DataFrame) -> DataFrame:
    """Pigeonhole prefix-filter candidate name pairs (see module
    banner): distinct (brand, ptype, name_a < name_b) sharing a
    rarest-prefix (char, occurrence) token within the block, gated by
    the sound 2·min(len) ≥ max(len) filter.

    The prefix computation is entirely map-side array math — token
    keys rank(char)·64 + occurrence-index built with transform/filter,
    sorted and sliced to the floor(len/2)+1 rarest per name — no
    windows, no per-token shuffle. The rarest-first character order is
    one bounded collect (alphabet-sized, the repo's documented
    bounded-driver-state pattern) inlined as a literal map; ANY fixed
    total order keeps the filter sound, rarity only buys selectivity."""
    chars = (
        names.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(name)), "
                    "i -> substring(name, i, 1))"
                )
            ).alias("ch")
        )
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    order = sorted(chars, key=lambda r: (r["n"], r["ch"]))
    rank_map = F.create_map(
        *[
            x
            for i, r in enumerate(order)
            for x in (F.lit(r["ch"]), F.lit(i + 1))
        ]
    )
    # Pair-length-dependent prefixes (round-7 tightening): the
    # worst-case per-side bound B ≥ ceil(len/2) made prefixes cover
    # most of a short name and pruned almost nothing (932k of ~1M
    # block pairs survived on the natural-shape ×10 corpus). The PAIR
    # bound is much stronger — m/la + m/lb ≥ 3·jaro − 1 ≥ 1.5 ⟹
    # B ≥ T(la, lb) = ceil(1.5·la·lb / (la + lb)) (= 0.75·L at equal
    # lengths) — so each name emits a SEPARATE prefix per admissible
    # partner length lb (distinct lens collected once, bounded like
    # the alphabet), of length la − T + 1 (≈ 0.25·L + 1 at equal
    # lengths), and the join matches a's lb-prefix against b's
    # la-prefix. Classic prefix theorem with the pair's own T on both
    # sides — sound; T is computed in pure integer arithmetic
    # ((3·la·lb + 2(la+lb) − 1) div 2(la+lb)) so no fp-ceil boundary
    # can shrink a prefix. Occurrence index = count of equal chars at
    # positions ≤ i (O(len²) array ops per name, len ≤ ~12, JVM-side).
    lens = sorted(
        r["len"] for r in names.select("len").distinct().collect()
    )
    if not lens:
        return names.select(
            "brand",
            "ptype",
            F.col("name").alias("name_a"),
            F.col("name").alias("name_b"),
        ).limit(0)
    lens_arr = f"array({', '.join(str(v) for v in lens)})"
    keys_expr = (
        "array_sort(transform(sequence(1, length(name)), "
        "i -> element_at(rank_map, substring(name, i, 1)) * 64 "
        "+ size(filter(sequence(1, i), "
        "j -> substring(name, j, 1) = substring(name, i, 1)))))"
    )
    # k=2 prefix keys (squared selectivity): the j-th smallest element
    # of A∩B sits within the first |A|−T+j tokens of A's sorted order
    # (≤ j−1 intersection tokens precede it and ≥ T−j follow it), so
    # for T ≥ 2 the TWO smallest intersection tokens lie inside both
    # sides' length-(len−T+2) prefixes — every true pair shares an
    # unordered token PAIR, and the join keys on packed pairs
    # (k_i·10^6 + k_j, i < j). Single-char collisions that passed the
    # k=1 filter half the time now need TWO shared rare tokens. T < 2
    # (degenerate tiny names) falls back to k=1 singletons packed as
    # (k, k) — same key space, no separate join.
    t_expr = "((3 * len * lb + 2 * (len + lb) - 1) div (2 * (len + lb)))"
    p2 = f"slice(keys, 1, greatest(0, cast(len - {t_expr} + 2 as int)))"
    p1 = f"slice(keys, 1, greatest(0, cast(len - {t_expr} + 1 as int)))"
    tok_expr = f"""
    flatten(transform(
        filter({lens_arr}, lb -> least(lb, len) * 2 >= greatest(lb, len)),
        lb -> if({t_expr} >= 2,
            flatten(transform({p2}, (x, i) ->
                transform(slice({p2}, i + 2, size({p2})),
                    y -> struct(lb AS partner_len,
                                cast(x as bigint) * 1000000 + y AS order_key)))),
            transform({p1}, k -> struct(lb AS partner_len,
                cast(k as bigint) * 1000000 + k AS order_key)))))
    """
    prefix = (
        names.withColumn("rank_map", rank_map)
        .withColumn("keys", F.expr(keys_expr))
        .select(
            "brand",
            "ptype",
            "name",
            "len",
            F.explode(F.expr(tok_expr)).alias("tk"),
        )
        .select(
            "brand",
            "ptype",
            "name",
            "len",
            F.col("tk.partner_len").alias("partner_len"),
            F.col("tk.order_key").alias("order_key"),
        )
    )
    # merge (sort-merge) for the same estimator-vs-explode reason as
    # the deletion-neighborhood join (see _lev_candidates)
    return (
        prefix.alias("a")
        .hint("merge")
        .join(
            prefix.alias("b"),
            (F.col("a.brand") == F.col("b.brand"))
            & (F.col("a.ptype") == F.col("b.ptype"))
            & (F.col("a.order_key") == F.col("b.order_key"))
            & (F.col("a.partner_len") == F.col("b.len"))
            & (F.col("b.partner_len") == F.col("a.len"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.brand").alias("brand"),
            F.col("a.ptype").alias("ptype"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )


def _jw_name_pairs(names: DataFrame) -> DataFrame:
    """Distinct-name pairs within a block with JW ≥ _JW_THRESHOLD:
    prefix-filter candidates + pandas UDF verify. Returns (brand,
    ptype, name_a, name_b, jw_sim) with name_a < name_b; same-name
    pairs (jw 1.0) appended for groups with multiplicity ≥ 2."""
    cand = _jw_candidates(names)
    jw_udf = _make_jw_udf()
    verified = (
        cand.withColumn("jw", jw_udf(F.col("name_a"), F.col("name_b")))
        .filter(F.col("jw") >= _JW_THRESHOLD)
        .select(
            "brand",
            "ptype",
            "name_a",
            "name_b",
            F.round("jw", 6).alias("jw_sim"),
        )
    )
    same = names.filter(F.col("cnt") >= 2).select(
        "brand",
        "ptype",
        F.col("name").alias("name_a"),
        F.col("name").alias("name_b"),
        F.lit(1.0).alias("jw_sim"),
    )
    return verified.unionByName(same)


@query("q_join_jaro_winkler", oracle=_ORACLE_JW)
def join_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part names by Jaro-Winkler >= 0.9 within
    (brand, type) blocks.

    Round-7 shape (see module banner): the metric runs once per
    distinct (brand, type, name) pair — candidates from the pigeonhole
    prefix filter on (char, occurrence) tokens (exact: jw ≥ 0.9 forces
    a character-multiset overlap ≥ ceil(len/2), so prefixes of the
    rarest floor(len/2)+1 tokens must intersect), python JW only on
    survivors — then name pairs expand to part-key pairs via map-side
    broadcast joins. Replaces the blocked all-pairs UDF scan that was
    quadratic in block depth (53.7 s at part×10); equivalence to the
    unfiltered blocked join is pytest-pinned and the brute-force
    DuckDB oracle re-proves recall 1 on every driver run."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_name"
    )
    dpairs = _jw_name_pairs(_distinct_names(p))
    return _expand_pairs(dpairs, p, "jw_sim").orderBy("part_a", "part_b")


# ---------------------------------------------------------------------------
# Stage accounting for the round-7 linkage rework (VERDICT r6 #2 asked
# for realized recall reported like q_dedup_lsh_verified_stages). Both
# candidate filters are sound BY CONSTRUCTION, so recall is a theorem,
# not a measurement — and therefore ORACLED, not rows-only: the truth
# counts are deterministic brute-force numbers DuckDB recomputes, and
# the coverage flags assert in-plan that the candidate sets contain
# every true name pair (left_anti count == 0). A broken signature
# scheme flips a flag and fails the driver's value-hash.
# ---------------------------------------------------------------------------

_ORACLE_LINKAGE_STAGES = f"""
WITH names AS (
    SELECT p_brand AS brand, p_type AS ptype, p_name AS name
    FROM part GROUP BY 1, 2, 3
),
lev_true AS (
    SELECT COUNT(*) AS n FROM names a JOIN names b
      ON a.brand = b.brand AND a.ptype = b.ptype AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {_MAX_DIST}
),
jw_true AS (
    SELECT COUNT(*) AS n FROM names a JOIN names b
      ON a.brand = b.brand AND a.ptype = b.ptype AND a.name < b.name
    WHERE jaro_winkler_similarity(a.name, b.name) >= {_JW_THRESHOLD}
),
lev_out AS (
    SELECT COUNT(*) AS n
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
     AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= {_MAX_DIST}
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
),
jw_out AS (
    SELECT COUNT(*) AS n
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= {_JW_THRESHOLD}
)
SELECT (SELECT COUNT(*) FROM names) AS n_distinct_names,
       (SELECT n FROM lev_true) AS lev_true_name_pairs,
       CAST(1 AS INTEGER) AS lev_candidates_cover_all_true,
       (SELECT n FROM lev_out) AS lev_expanded_pairs,
       (SELECT n FROM jw_true) AS jw_true_name_pairs,
       CAST(1 AS INTEGER) AS jw_candidates_cover_all_true,
       (SELECT n FROM jw_out) AS jw_expanded_pairs
"""


@query("q_join_linkage_stages", oracle=_ORACLE_LINKAGE_STAGES)
def join_linkage_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row accounting for the distinct-name linkage pipeline:
    distinct-name domain size, exact true name-pair counts per metric
    (recomputed brute-force on the names domain — affordable BY DESIGN:
    the names domain is the small domain), coverage flags proving the
    deletion-neighborhood / prefix-filter candidate sets contain every
    true pair (anti-join count == 0), and the expanded key-pair counts
    the main queries return."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_name"
    )
    names = _distinct_names(p).localCheckpoint(eager=True)  # many consumers
    pair_cols = ["brand", "ptype", "name_a", "name_b"]
    a = names.select(
        "brand", "ptype", F.col("name").alias("name_a"),
        F.col("len").alias("len_a"),
    )
    b = names.select(
        "brand", "ptype", F.col("name").alias("name_b"),
        F.col("len").alias("len_b"),
    )
    allpairs = a.join(b, ["brand", "ptype"]).filter(
        F.col("name_a") < F.col("name_b")
    )
    lev_true = allpairs.filter(
        (F.levenshtein("name_a", "name_b", _MAX_DIST) >= 0)
        & (F.levenshtein("name_a", "name_b", _MAX_DIST) <= _MAX_DIST)
    ).select(*pair_cols).localCheckpoint(eager=True)
    jw_udf = _make_jw_udf()
    jw_true = allpairs.filter(
        jw_udf(F.col("name_a"), F.col("name_b")) >= _JW_THRESHOLD
    ).select(*pair_cols).localCheckpoint(eager=True)

    s_names = names.agg(F.count(F.lit(1)).alias("n_distinct_names"))
    s_lev_true = lev_true.agg(F.count(F.lit(1)).alias("lev_true_name_pairs"))
    s_lev_cover = lev_true.join(
        _lev_candidates(names), pair_cols, "left_anti"
    ).agg(
        (F.count(F.lit(1)) == 0).cast("int").alias(
            "lev_candidates_cover_all_true"
        )
    )
    s_lev_out = _expand_pairs(_lev_name_pairs(names), p, "edit_dist").agg(
        F.count(F.lit(1)).alias("lev_expanded_pairs")
    )
    s_jw_true = jw_true.agg(F.count(F.lit(1)).alias("jw_true_name_pairs"))
    s_jw_cover = jw_true.join(
        _jw_candidates(names), pair_cols, "left_anti"
    ).agg(
        (F.count(F.lit(1)) == 0).cast("int").alias(
            "jw_candidates_cover_all_true"
        )
    )
    s_jw_out = _expand_pairs(_jw_name_pairs(names), p, "jw_sim").agg(
        F.count(F.lit(1)).alias("jw_expanded_pairs")
    )
    return (
        s_names.crossJoin(s_lev_true)
        .crossJoin(s_lev_cover)
        .crossJoin(s_lev_out)
        .crossJoin(s_jw_true)
        .crossJoin(s_jw_cover)
        .crossJoin(s_jw_out)
    )
