"""Unigram-LM tokenizer behavioral tests (round 11): seed statistics,
Viterbi segmentation preferences, EM coverage/monotonicity invariants,
and the deterministic pruning schedule — on a planted corpus where the
right answers are hand-checkable."""

from __future__ import annotations

import math

import pytest

from sparkifydb_datawarehouse_spark.llm.tokenizer_unigram import (
    _seed_pieces,
    _viterbi_counts,
    unigram_lm_detail,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("unigram_corpus")
    # 'abab' appears often -> 'ab' / 'abab' become high-count pieces;
    # 'zq' is rare (< MIN_FREQ) -> excluded from the multi-char seed
    rows = (
        [(i, "abab abab baby") for i in range(20)]
        + [(100 + i, "cddc cddc") for i in range(10)]
        + [(200, "zq")]
    )
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(base / "documents.parquet"))
    return str(base)


def test_seed_respects_frequency_floor_and_keeps_all_singles(spark, corpus_dir):
    from sparkifydb_datawarehouse_spark.llm.tokenizer_unigram import (
        _word_histogram,
    )

    words = _word_histogram(spark, corpus_dir)
    seed = _seed_pieces(words)
    # every char in the corpus is a single-char piece, even rare ones
    for ch in "abdcyzq":
        assert ch in seed
    # frequent substrings are in; the rare word's bigram is not
    assert "ab" in seed and "abab" in seed and "cddc" in seed
    assert "zq" not in seed  # corpus frequency 1 < floor 5
    # weighted occurrence counting: 'ab' occurs twice in 'abab' (x40)
    # and once in 'baby' (x20) -> 100
    assert seed["ab"] == 100


def test_viterbi_prefers_high_probability_long_pieces():
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    words = spark.createDataFrame([("abab", 1)], "w string, cnt long")
    # 'abab' overwhelmingly likely -> segment as one piece
    logp = {"a": math.log(0.01), "b": math.log(0.01), "abab": math.log(0.9)}
    counts = _viterbi_counts(words, logp)
    assert counts == {"abab": 1}
    # remove it -> falls back to singles
    counts = _viterbi_counts(words, {"a": math.log(0.5), "b": math.log(0.5)})
    assert counts == {"a": 2, "b": 2}


def test_em_trace_invariants_and_prune_schedule(spark, corpus_dir):
    detail = unigram_lm_detail(spark, corpus_dir)
    iters = detail["iterations"]
    assert [d["iteration"] for d in iters] == [1, 2, 3]
    # Viterbi coverage is total: covered == corpus character mass
    # corpus: 20*(4+4+4) + 10*(4+4) + 2 = 240 + 80 + 2 = 322
    assert all(d["covered_chars"] == 322 for d in iters)
    # Gibbs: the M-step may only improve the segmentation's loglik
    assert all(d["em_monotone"] == 1 for d in iters)
    assert all(d["loglik_new"] >= d["loglik_old"] - 1e-9 for d in iters)
    # deterministic 0.8-rank pruning chain on multi-char pieces
    singles = detail["singles"]
    m1 = iters[0]["vocab_size"] - singles
    m2 = iters[1]["vocab_size"] - singles
    m3 = iters[2]["vocab_size"] - singles
    assert m2 == math.ceil(0.8 * m1) and m3 == math.ceil(0.8 * m2)
    # the workhorse pieces survive every pruning round
    assert "abab" in detail["pieces"] and "cddc" in detail["pieces"]
    # single chars are never pruned, even with zero final count
    assert "z" in detail["pieces"] and "q" in detail["pieces"]


def test_seed_cap_refuses_loudly(spark, tmp_path, monkeypatch):
    # ADVICE r12 #3: over-cap seed inventories REFUSE (VocabCapExceeded)
    # instead of warn-and-truncate — a capped vocab the DuckDB oracle
    # doesn't share would silently diverge. Plant a corpus with 6
    # distinct frequent bigrams, cap at 3, expect the raise; at cap 6
    # the same corpus trains fine (the contract boundary is exact).
    from sparkifydb_datawarehouse_spark.llm import tokenizer_unigram as tu
    from sparkifydb_datawarehouse_spark.llm import tokenizer_wordpiece as tw

    pairs = [("aa", 9), ("bb", 9), ("cc", 8), ("dd", 7), ("ee", 6), ("ff", 5)]
    rows = [
        (1000 * i + j, w) for i, (w, n) in enumerate(pairs) for j in range(n)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    words = tu._word_histogram(spark, str(tmp_path))
    monkeypatch.setattr(tu, "_SEED_CAP", 3)
    with pytest.raises(tu.VocabCapExceeded, match="cap 3"):
        tu._seed_pieces(words)
    # wordpiece shares the contract (its tiered inventory here is
    # 6 initial bigrams + 0 continuation pieces >= freq 5... the 'aa'
    # continuation tier: 'a' at pos 2 is single-char, always kept)
    monkeypatch.setattr(tw, "_SEED_CAP", 3)
    with pytest.raises(tu.VocabCapExceeded, match="cap 3"):
        tw.wordpiece_vocab(words)
    # at-cap corpora still train: the boundary is exact
    monkeypatch.setattr(tu, "_SEED_CAP", 6)
    seed = tu._seed_pieces(words)
    assert sorted(p for p in seed if len(p) > 1) == [
        "aa", "bb", "cc", "dd", "ee", "ff"
    ]
    for ch in "abcdef":
        assert ch in seed
