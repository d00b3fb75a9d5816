"""Behavioral tests for round-5 retrieval + CDC operators.

The oracle parity test already value-checks q_text_bm25,
q_search_rrf_fusion, and q_text_cdc_chunks; these tests pin the
PROPERTIES the operators exist for — chiefly CDC's insertion
re-alignment, which no fixed-size chunker has.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.llm.chunking import cdc_chunk_array
from sparkifydb_datawarehouse_spark.llm.retrieval import (
    _QUERY_TERMS,
    search_rrf_fusion,
    text_bm25,
)

from conftest import SF_SMOKE

_BASE_TEXT = (
    "key agg row scan slow fast table value part hash value table part "
    "a row fast merge batch part value fast spark a a the line sort table "
    "window table table key batch window spark order data column agg join "
    "small line customer query line value a table customer fast key scan "
    "query big table table part agg order scan stream fast order group"
)


def _chunk_set(spark, text: str) -> set[str]:
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(cdc_chunk_array(F.col("text")).alias("chunks"))
        .collect()[0]
    )
    return set(c for c in row["chunks"] if c)


def test_cdc_chunks_realign_after_insertion(spark):
    """Inserting a prefix shifts every byte, but chunks re-align at the
    first content boundary: most chunks must survive the edit. A
    fixed-offset chunker would share ~zero chunks here."""
    base = _chunk_set(spark, _BASE_TEXT)
    shifted = _chunk_set(spark, "zzq " + _BASE_TEXT)
    assert len(base) > 5  # the boundary rule actually fires
    shared = base & shifted
    # everything after the first boundary following the edit is identical
    assert len(shared) >= len(base) - 2
    # and chunk concatenation reconstructs the document exactly
    row = (
        spark.createDataFrame([(_BASE_TEXT,)], "text string")
        .select(F.concat_ws("", cdc_chunk_array(F.col("text"))).alias("joined"))
        .collect()[0]
    )
    assert row["joined"] == _BASE_TEXT


def test_cdc_short_and_empty_docs(spark):
    """Docs shorter than one hash window become a single whole-doc
    chunk; empty text yields no usable chunks (filtered downstream)."""
    assert _chunk_set(spark, "abc") == {"abc"}
    assert _chunk_set(spark, "") == set()


def test_bm25_top_docs_contain_query_terms(spark):
    rows = text_bm25(spark, SF_SMOKE).collect()
    assert rows, "bm25 returned no rows"
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    top = rows[0]
    assert top["bm25"] > 0
    assert any(top[f"tf_{t}"] > 0 for t in _QUERY_TERMS)


def test_rrf_fuses_both_rankers(spark):
    rows = search_rrf_fusion(spark, SF_SMOKE).collect()
    assert rows
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # fusion only ever adds two bounded reciprocal terms
    assert all(0 < r["rrf_score"] <= 2.0 / 61 + 1e-9 for r in rows)
    # at least one doc must carry BOTH a lexical and a vector rank at
    # fixture scale (candidate lists are 50 of 100 ids)
    assert any(r["rank_lex"] is not None and r["rank_vec"] is not None for r in rows)


def test_jaro_winkler_matches_duckdb():
    """Pin the exact DuckDB variant (floored transpositions, 0.7-gated
    Winkler boost): 2000 random pairs, zero tolerance."""
    import random

    import duckdb

    from sparkifydb_datawarehouse_spark.operators.fuzzy import jaro_winkler

    rng = random.Random(7)
    alpha = "abcdefgh"
    with duckdb.connect() as con:
        for _ in range(2000):
            a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
            (expected,) = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()
            assert abs(expected - jaro_winkler(a, b)) < 1e-12, (a, b)


def test_jaro_winkler_prunes_are_sound(spark):
    """The round-5 length + multiset-bound prunes are upper-bound
    arguments and must be output-INVISIBLE: the registered query and
    a filterless reimplementation must return identical pair sets
    (the r4 prefix-filter discipline for any new candidate filter)."""
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark.operators.fuzzy import (
        _JW_THRESHOLD,
        jaro_winkler,
        join_jaro_winkler,
    )

    got = {
        (r["part_a"], r["part_b"], r["jw_sim"])
        for r in join_jaro_winkler(spark, SF_SMOKE).collect()
    }
    p = (
        spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .select("p_partkey", "p_brand", "p_type", "p_name")
        .collect()
    )
    by_block = {}
    for r in p:
        by_block.setdefault((r["p_brand"], r["p_type"]), []).append(r)
    want = set()
    for rows in by_block.values():
        rows = sorted(rows, key=lambda r: r["p_partkey"])
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                s = jaro_winkler(rows[i]["p_name"], rows[j]["p_name"])
                if s >= _JW_THRESHOLD:
                    want.add(
                        (rows[i]["p_partkey"], rows[j]["p_partkey"], round(s, 6))
                    )
    assert got == want


def test_jaro_winkler_histogram_prune_sound_on_multibyte(spark, tmp_path):
    """ADVICE r5: the histogram prune must bound over CODE POINTS, not
    UTF-8 bytes. 'abcdefghi€' vs 'abcdefghi한' has true jw = 0.96
    (9 matched chars, 4-char prefix), but a byte histogram sees
    12-byte strings sharing only 9 bytes (€ = E2 82 AC and 한 =
    ED 95 9C are byte-disjoint) ⇒ ub = 2.5/3, a hair UNDER the
    jaro ≥ 5/6 gate — the true match got pruned. The code-point
    histogram must keep it."""
    from sparkifydb_datawarehouse_spark.operators.fuzzy import (
        jaro_winkler,
        join_jaro_winkler,
    )

    assert jaro_winkler("abcdefghi€", "abcdefghi한") >= 0.95
    spark.createDataFrame(
        [
            (1, "B1", "T1", "abcdefghi€"),
            (2, "B1", "T1", "abcdefghi한"),
        ],
        "p_partkey long, p_brand string, p_type string, p_name string",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    rows = join_jaro_winkler(spark, str(tmp_path)).collect()
    assert [(r["part_a"], r["part_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["jw_sim"] == round(jaro_winkler("abcdefghi€", "abcdefghi한"), 6)


def test_levenshtein_deletion_neighborhood_is_sound(spark):
    """Round-7 rework: the deletion-neighborhood candidate stage must
    be output-INVISIBLE — the registered query and a filterless
    per-block brute force must return identical (part_a, part_b,
    edit_dist) sets (the r4 prefix-filter discipline for any new
    candidate filter)."""
    from sparkifydb_datawarehouse_spark.operators.fuzzy import (
        _MAX_DIST,
        join_fuzzy_levenshtein,
    )

    got = {
        (r["part_a"], r["part_b"], r["edit_dist"])
        for r in join_fuzzy_levenshtein(spark, SF_SMOKE).collect()
    }
    p = (
        spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .select("p_partkey", "p_brand", "p_type", "p_name")
        .collect()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    by_block = {}
    for r in p:
        by_block.setdefault((r["p_brand"], r["p_type"]), []).append(r)
    want = set()
    for rows in by_block.values():
        for i in range(len(rows)):
            for j in range(len(rows)):
                x, y = rows[i], rows[j]
                if x["p_partkey"] >= y["p_partkey"]:
                    continue
                d = lev(x["p_name"], y["p_name"])
                if d <= _MAX_DIST:
                    want.add((x["p_partkey"], y["p_partkey"], d))
    assert got == want


def test_deletion_neighborhood_covers_edit_kinds(spark):
    """ed ≤ 2 pairs of every kind (sub+sub, ins+del at distant
    positions, ins+ins, del+del, transposition-as-2-subs) must meet in
    a deletion-neighborhood bucket — the FastSS intersection claim."""
    from sparkifydb_datawarehouse_spark.operators import fuzzy as FZ

    base = "abcdefghij"
    variants = [
        (2, "aXcdefghiY"),   # two substitutions, far apart
        (3, "bcdefghijk"),   # delete front, insert back
        (4, "XabcdefghijY"), # two insertions
        (5, "cdefghij"),     # two deletions
        (6, "bacdefghij"),   # transposition (= 2 subs)
    ]
    rows = [(1, "B", "T", base)] + [
        (k, "B", "T", v) for k, v in variants
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_type string, p_name string"
    )
    names = FZ._distinct_names(df)
    got = {
        (r["name_a"], r["name_b"])
        for r in FZ._lev_name_pairs(names).collect()
    }
    for _, v in variants:
        pair = (min(base, v), max(base, v))
        assert pair in got, pair


def test_linkage_joins_match_brute_force_on_random_corpora(spark, monkeypatch):
    """Adversarial corpus fuzz for the round-7 signature filters: a
    tiny alphabet (dense char collisions) with planted 1-2-char typo
    variants — both linkage joins must equal per-block brute force on
    both metrics (the strongest soundness check: random data, not the
    fixture's name distribution)."""
    import random

    from sparkifydb_datawarehouse_spark.operators import fuzzy as FZ
    from sparkifydb_datawarehouse_spark.operators.fuzzy import jaro_winkler

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(99)
    alpha = "abcdefg"
    for _trial in range(2):
        rows = []
        for k in range(60):
            name = "".join(
                rng.choice(alpha) for _ in range(rng.randint(3, 12))
            )
            if k and rng.random() < 0.5:
                base = rows[rng.randrange(len(rows))][3]
                chars = list(base)
                for _ in range(rng.randint(1, 2)):
                    chars[rng.randrange(len(chars))] = rng.choice(alpha)
                name = "".join(chars)
            rows.append((k, f"B{k % 2}", "T", name))
        df = spark.createDataFrame(
            rows, "p_partkey long, p_brand string, p_type string, p_name string"
        )
        monkeypatch.setattr(FZ, "load_table", lambda *_a, **_k: df)
        got_lev = {
            (r["part_a"], r["part_b"], r["edit_dist"])
            for r in FZ.join_fuzzy_levenshtein(spark, "x").collect()
        }
        got_jw = {
            (r["part_a"], r["part_b"], r["jw_sim"])
            for r in FZ.join_jaro_winkler(spark, "x").collect()
        }
        want_lev, want_jw = set(), set()
        by_block = {}
        for r in rows:
            by_block.setdefault((r[1], r[2]), []).append(r)
        for blk in by_block.values():
            for i in range(len(blk)):
                for j in range(i + 1, len(blk)):
                    a, b = blk[i], blk[j]
                    d = lev(a[3], b[3])
                    if d <= 2 and abs(len(a[3]) - len(b[3])) <= 2:
                        want_lev.add((a[0], b[0], d))
                    s = jaro_winkler(a[3], b[3])
                    if s >= 0.9:
                        want_jw.add((a[0], b[0], round(s, 6)))
        assert got_lev == want_lev
        assert got_jw == want_jw
