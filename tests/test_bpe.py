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

    rows = registry.QUERIES["q_text_bpe_apply"](spark, SF_ORACLE).collect()
    assert rows, "expected per-language rows"
    for r in rows:
        # every word yields >= 1 subword, <= len+1 symbols; fertility
        # must land in a sane band for natural-language fixtures
        assert r["n_subwords"] >= r["n_words"] > 0
        assert 1.0 <= r["subwords_per_word"] <= 12.0


def test_query_is_deterministic(spark):
    from conftest import SF_ORACLE

    q = registry.QUERIES["q_text_bpe_apply"]
    a = [tuple(r) for r in q(spark, SF_ORACLE).collect()]
    b = [tuple(r) for r in q(spark, SF_ORACLE).collect()]
    assert a == b
