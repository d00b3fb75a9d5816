"""BPE trainer + greedy apply: hand-computed classic examples pin the
algorithm; the registered query is rows-only (non-SQL-expressible
merge loop), so behavior is gated here."""

from __future__ import annotations

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.llm.bpe import bpe_encode, train_bpe

registry.load_all_modules()

# the classic Sennrich-style toy corpus
FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_learns_the_classic_merges():
    merges = train_bpe(FREQS, n_merges=10)
    # 'es' (9), then 'est' (9), then 'est</w>' (9) dominate; 'lo' and
    # 'low' follow at 7 — the canonical sequence from the BPE paper
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert ("l", "o") in merges and ("lo", "w") in merges


def test_encode_segments_unseen_word_with_learned_units():
    merges = train_bpe(FREQS, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # 'lowest' was never a training word; BPE composes it from the
    # learned 'low' + 'est</w>' units
    assert bpe_encode("lowest", ranks) == ["low", "est</w>"]


def test_encode_no_merges_falls_back_to_characters():
    assert bpe_encode("xyz", {}) == ["x", "y", "z", "</w>"]


def test_trainer_is_deterministic_on_ties():
    a = train_bpe({"ab": 2, "cd": 2}, n_merges=2)
    b = train_bpe({"cd": 2, "ab": 2}, n_merges=2)
    assert a == b  # lexicographic tie-break, not dict order


def test_query_rollup_invariants(spark):
    from conftest import SF_ORACLE

    from sparkifydb_datawarehouse_spark.llm.bpe import text_bpe_apply_detail

    rows = text_bpe_apply_detail(spark, SF_ORACLE).collect()
    assert rows, "expected per-language rows"
    for r in rows:
        # every word yields >= 1 subword, <= len+1 symbols; fertility
        # must land in a sane band for natural-language fixtures
        assert r["n_subwords"] >= r["n_words"] > 0
        assert 1.0 <= r["subwords_per_word"] <= 12.0
    # the r8 registered contract form reads all-green on the fixture
    flagged = registry.QUERIES["q_text_bpe_apply"](spark, SF_ORACLE).collect()
    assert len(flagged) == len(rows)
    assert all(
        f["fertility_lower_ok"] == 1 and f["fertility_upper_ok"] == 1
        for f in flagged
    )


def test_query_is_deterministic(spark):
    from conftest import SF_ORACLE

    q = registry.QUERIES["q_text_bpe_apply"]
    a = [tuple(r) for r in q(spark, SF_ORACLE).collect()]
    b = [tuple(r) for r in q(spark, SF_ORACLE).collect()]
    assert a == b


def test_distributed_trainer_equals_classic_full_histogram(spark):
    """The distributed loop (VERDICT r4 #7) must learn EXACTLY the
    merges the classic driver-side trainer learns when that trainer is
    given the FULL word-type histogram (no top-200 cap) — same
    freq-weighted counts, same count-desc/pair-asc tie-break."""
    from conftest import SF_ORACLE

    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark.llm.bpe import (
        _N_DIST_MERGES,
        _TOKEN_SPLIT,
        train_bpe,
        train_bpe_distributed,
    )
    from sparkifydb_datawarehouse_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("text")
    toks = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != "")
    full_hist = {
        r["w"]: r["n"]
        for r in docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    classic = train_bpe(full_hist, n_merges=_N_DIST_MERGES)
    distributed = [(a, b) for a, b, _ in train_bpe_distributed(docs)]
    assert distributed == classic


def test_distributed_trainer_fertility_monotone_and_converges(spark):
    """Applying a longer prefix of the learned merge list can only
    merge more — per-corpus subword count must be non-increasing in
    the number of merges (the compression contract); and on a tiny
    convergent corpus the loop must stop early once no pair reaches
    min_pair_count."""
    from sparkifydb_datawarehouse_spark.llm.bpe import (
        bpe_encode,
        train_bpe_distributed,
    )

    docs = spark.createDataFrame(
        [("low low low lower lowest newer newest new",)], "text string"
    )
    merges = train_bpe_distributed(docs, n_merges=50)
    assert 0 < len(merges) < 50, "expected early convergence"
    # pair counts recorded are all >= the floor
    assert all(c >= 2 for _, _, c in merges)

    words = "low lower lowest newer newest new unseen".split()
    prev = None
    for m in range(len(merges) + 1):
        ranks = {(a, b): i for i, (a, b, _) in enumerate(merges[:m])}
        total = sum(len(bpe_encode(w, ranks)) for w in words)
        if prev is not None:
            assert total <= prev, (m, total, prev)
        prev = total


def test_apply_contract_null_lang_group_keeps_flags(spark, tmp_path):
    """NULL lang is a real group on both engines; the exact word-char
    anchor join must be null-safe or the fertility flags silently read
    0 for that group (caught in r8 self-review)."""
    rows = [(1, "hello world hello", None), (2, "a b c a b", "en"), (3, None, None)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from sparkifydb_datawarehouse_spark.llm.bpe import text_bpe_apply

    out = text_bpe_apply(spark, str(tmp_path)).collect()
    langs = {r["lang"] for r in out}
    assert langs == {None, "en"}
    assert all(
        r["fertility_lower_ok"] == 1 and r["fertility_upper_ok"] == 1
        for r in out
    )
