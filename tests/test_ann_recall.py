"""ANN retrieval-quality gates (VERDICT r3 #5): recall@k measured
against brute-force ground truth, with pinned floors at the oracle
fixture (sf0.01) and monotonicity along each method's quality dial
(IVF nprobe, multi-probe LSH radius)."""

from __future__ import annotations

import pytest

from sparkifydb_datawarehouse_spark import registry
from conftest import SF_ORACLE

from sparkifydb_datawarehouse_spark.llm.similarity import similarity_ivf_nprobe

registry.load_all_modules()


@pytest.fixture(scope="module")
def recall_table(spark):
    rows = registry.QUERIES["q_ann_recall"](spark, SF_ORACLE).collect()
    return {(r["method"], r["nprobe"]): r["recall"] for r in rows}


def test_recall_floors_at_fixture(recall_table):
    # floors pinned from the 2026-08-14 measurement at sf0.01:
    # ivf 0.9 / 1.0 / 1.0 over nprobe 1/2/4; lsh 0.0/0.1/0.5/0.7 over
    # radius 0-3. Floors sit one notch below so fixture regeneration
    # with the same generator doesn't flap the gate.
    assert recall_table[("ivf", 1)] >= 0.8
    assert recall_table[("ivf", 2)] >= 0.9
    assert recall_table[("ivf", 4)] >= 0.9
    assert recall_table[("sign_lsh", 3)] >= 0.6


def test_recall_monotone_in_probe_width(recall_table):
    assert (
        recall_table[("ivf", 1)]
        <= recall_table[("ivf", 2)]
        <= recall_table[("ivf", 4)]
    )
    assert (
        recall_table[("sign_lsh", 0)]
        <= recall_table[("sign_lsh", 1)]
        <= recall_table[("sign_lsh", 2)]
        <= recall_table[("sign_lsh", 3)]
    )


def test_single_bucket_lsh_weakness_is_documented(recall_table):
    # the harness EXISTS to expose this: 8 sign bits over near-random
    # fixture embeddings put the query's true neighbors in buckets at
    # Hamming distance 1-5, so the classic single-bucket probe recalls
    # ~nothing. If this ever rises above 0.5 the fixture changed
    # character and the pinned floors above should be re-measured.
    assert recall_table[("sign_lsh", 0)] <= 0.5


def test_ivf_nprobe1_matches_registered_single_cell_query(spark):
    """nprobe=1 must reproduce q_similarity_ivf exactly (the query's
    own cell IS its nearest centroid)."""
    got = {
        r["vec_id"]
        for r in similarity_ivf_nprobe(spark, SF_ORACLE, nprobe=1).collect()
    }
    want = {
        r["vec_id"]
        for r in registry.QUERIES["q_similarity_ivf"](spark, SF_ORACLE).collect()
    }
    assert got == want
