"""Duplicate-cluster resolution: connected components over a near-dup
pair graph — the step that turns pairwise dedup hits into "keep one
representative per cluster".

Algorithm (Spark side): iterative min-label propagation — every vertex
starts labeled with itself; each round every vertex takes the min of
its own and its neighbors' labels; fixpoint = min reachable id =
cluster id. The loop is driver-side but each round is one distributed
join+aggregate; rounds needed = graph diameter (near-dup clusters are
shallow — a handful of rounds). Each round persists its labels and
unpersists the previous round's (lineage would otherwise grow
exponentially — the standard iterative-algorithm discipline on Spark).

Oracle: the same fixpoint via DuckDB WITH RECURSIVE reachability —
an exact, engine-independent definition of the answer.

At 100 TB: this is the Hash-to-Min pattern; for graphs with huge
components switch to alternating large/small-star (GraphFrames'
connectedComponents) — same external contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from .dedup import dedup_embedding_cosine

_MAX_ROUNDS = 20

# Below this edge count the graph is collected and solved with
# union-find on the driver: the distributed loop costs ~0.5 s of job
# overhead PER ROUND regardless of size, which swamps small graphs
# (154 edges took 3.5 s distributed, <0.1 s on the driver). A million
# edges is ~tens of MB collected — safely inside driver memory. Past
# it, the distributed path is the only option and its per-round cost
# is amortized by real data volume. This mirrors AQE's philosophy:
# pick the physical strategy from the measured size, not the API.
DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(spark: SparkSession, pairs: list) -> DataFrame:
    """Exact union-find with path compression; cluster_id = min
    member id, matching the distributed fixpoint's contract."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    min_of_root: dict = {}
    for v in parent:
        r = find(v)
        if r not in min_of_root or v < min_of_root[r]:
            min_of_root[r] = v
    rows = [(v, min_of_root[find(v)]) for v in parent]
    return spark.createDataFrame(rows, "vertex long, cluster_id long")


def connected_components(
    edges: DataFrame, src: str, dst: str,
    max_driver_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Min-label propagation with pointer jumping, to fixpoint.
    Returns (vertex, cluster_id) for every vertex in `edges`.

    Adaptive strategy: a limit-probe collect decides between exact
    driver-side union-find (small graphs — avoids per-round job
    overhead) and the distributed loop (pass max_driver_edges=0 to
    force it).

    Lineage discipline: every round's labels are localCheckpoint-ed
    (eager). persist() alone is NOT enough for iterative plans — it
    truncates execution but the LOGICAL plan still nests one round
    inside the next, and driver-side analysis cost grows
    superlinearly (observed: 2s/round → 29s by round 3 without the
    checkpoint). localCheckpoint replaces the plan with the
    materialized partitions. (Cluster production note: checkpoint()
    to reliable storage instead — localCheckpoint pins lineage to
    executors and is not fault-tolerant.)

    Pointer jumping (label(v) ← label(label(v)) each round) halves
    the remaining path length per round on top of the one-hop
    neighbor min, giving O(log diameter) rounds — chain-shaped
    near-dup clusters would otherwise need diameter rounds."""
    if max_driver_edges > 0:
        # materialize the edge set once (fully parallel — a
        # CollectLimit probe would run the expensive edge join on one
        # partition first), then decide the strategy from its size
        pairs = edges.select(F.col(src), F.col(dst)).localCheckpoint()
        n_edges = pairs.count()
        if n_edges <= max_driver_edges:
            rows = pairs.collect()
            return _driver_union_find(
                edges.sparkSession, [(r[0], r[1]) for r in rows]
            )
        edges = pairs
        src, dst = pairs.columns[0], pairs.columns[1]
    bi = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        bi.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("cluster_id", F.col("vertex"))
        .localCheckpoint()
    )

    for _ in range(_MAX_ROUNDS):
        neighbor_min = (
            bi.join(labels, bi.v == labels.vertex)
            .groupBy(F.col("u").alias("vertex"))
            .agg(F.min("cluster_id").alias("neighbor_label"))
        )
        # carry the pre-round label alongside the new one: the
        # convergence check is then a filter on the checkpointed
        # output, not an extra join against the previous labels
        one_hop = labels.join(neighbor_min, "vertex", "left").select(
            "vertex",
            F.col("cluster_id").alias("old_label"),
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("neighbor_label"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # pointer jump: follow the label one more step (labels are
        # themselves vertex ids, so they can be looked up)
        parent = one_hop.select(
            F.col("vertex").alias("p_vertex"), F.col("cluster_id").alias("p_label")
        )
        jumped = (
            one_hop.join(parent, one_hop.cluster_id == parent.p_vertex, "left")
            .select(
                "vertex",
                "old_label",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("p_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = jumped.filter(F.col("cluster_id") != F.col("old_label")).count()
        labels = jumped.select("vertex", "cluster_id")
        if changed == 0:
            break
    return labels


_ORACLE_CLUSTERS = """
WITH RECURSIVE
 edges AS (
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS src, b.vec_id AS dst
    FROM e a
    JOIN e b ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 10
    WHERE ROUND(list_dot_product(a.emb, b.emb)
                / (SQRT(list_dot_product(a.emb, a.emb))
                   * SQRT(list_dot_product(b.emb, b.emb))), 6) > 0.3
 ),
 bi AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
 verts AS (SELECT DISTINCT src AS v FROM bi),
 reach(v, l) AS (
    SELECT v, v FROM verts
    UNION
    SELECT b.dst, r.l FROM reach r JOIN bi b ON b.src = r.v
 )
SELECT v AS vertex, MIN(l) AS cluster_id
FROM reach
GROUP BY v
ORDER BY vertex
"""


@query("q_dedup_clusters", oracle=_ORACLE_CLUSTERS)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusters over the embedding-cosine near-dup graph: every vertex
    labeled by the smallest vec_id reachable from it."""
    pairs = dedup_embedding_cosine(spark, sf_dir)
    return connected_components(pairs, "vec_a", "vec_b").orderBy("vertex")


# ---------------------------------------------------------------------------
# K-means (Lloyd) over the embeddings table — the iterative-algorithm
# archetype next to connected components: tiny model state on the
# driver, all data-parallel work in the plan.
#
# Scale design: the model (k×dim doubles) is the ONLY thing that
# crosses the driver boundary — once per iteration, k*dim values.
# Assignment evaluates argmin_c(-2·x·c + ||c||²) with the centroid
# coordinates folded in as literals, fully unrolled into whole-stage
# codegen (same rationale as dedup._dot: no interpreted HOFs in a
# per-row hot path). Centroid update is posexplode → (cluster, dim)
# hash agg — map-side combined, so the shuffle carries k*dim partial
# sums per input partition, never vectors. Initialization is the k
# lowest vec_ids: deterministic, so the whole operator is
# reproducible run-to-run (rows-only check; no SQL oracle for an
# iterative fixpoint).
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _assign(points: DataFrame, cents: list[list[float]], dim: int) -> DataFrame:
    """Add a `cluster` column: index of the nearest centroid.

    Arrow-vectorized numpy kernel, NOT an unrolled expression: the
    k*dim-term codegen argmin was measured at ~5 s/iteration of pure
    driver-side plan analysis (a 4k-node expression tree re-analyzed
    every round), swamping the actual math. A pandas_udf moves the
    dense matmul to numpy (b×d @ d×k per Arrow batch) with the k×d
    model broadcast in the closure — the same BLAS-kernel shape
    spark.ml uses JVM-side. Ties break to the lowest cluster index
    (np.argmin), matching the expression form's array_position(min).
    """
    C = np.asarray(cents, dtype=np.float64)  # k×d
    norms = (C * C).sum(axis=1)  # ||c||²

    @F.pandas_udf("int")
    def nearest(emb: pd.Series) -> pd.Series:
        X = np.vstack(emb.to_numpy()).astype(np.float64)  # b×d
        d2 = -2.0 * (X @ C.T) + norms  # b×k (‖x‖² constant per row)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return points.withColumn("cluster", nearest("embedding"))


def kmeans_fit(
    points: DataFrame,
    dim: int,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> list[list[float]]:
    """Lloyd's fit only: returns the k×dim centroid model (possibly
    fewer than k rows on a tiny slice, [] on an empty one). The model
    is the ONLY driver-side state — k·dim doubles per iteration."""
    init = (
        points.orderBy("vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    cents = [[float(v) for v in r.embedding] for r in init]
    # fewer rows than k (tiny slice): fit with the centroids we have
    k = min(k, len(cents))
    if not cents:
        return []
    for _ in range(iters):
        assigned = _assign(points, cents, dim)
        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        # empty clusters keep their previous centroid
        cents = [
            [by_cluster[c][i] for i in range(dim)] if c in by_cluster else cents[c]
            for c in range(k)
        ]
    return cents


def kmeans_fit_assign(
    points: DataFrame,
    dim: int,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    keep_embedding: bool = False,
) -> DataFrame:
    """Lloyd's algorithm; returns (vec_id, cluster) after `iters`
    rounds — plus the embedding column when `keep_embedding` (avoids a
    join for consumers that aggregate over the assigned vectors)."""
    cents = kmeans_fit(points, dim, k, iters)
    if not cents:
        # empty input slice: no centroids to fit — return the empty
        # assignment with the contract schema instead of letting the
        # numpy kernel see a 0-d model
        cols = (
            ["vec_id", "embedding"] if keep_embedding else ["vec_id"]
        )
        return points.select(
            *cols, F.lit(None).cast("int").alias("cluster")
        ).limit(0)
    assigned = _assign(points, cents, dim)
    if keep_embedding:
        return assigned.select("vec_id", "embedding", "cluster")
    return assigned.select("vec_id", "cluster")


# Contract-oracle (VERDICT r5 #6): DuckDB cannot replay Lloyd — AVG
# summation order differs between engines, centroid coordinates drift
# a ulp per round, and a near-tied argmin assignment would flip — so
# the oracled VALUES are the data anchors plus the algorithm's
# invariant CLAIMS (the same ones tests/test_llm_ops.py pins):
# within-cluster SS strictly below the single-centroid total SS, and
# more than one cluster in use. Deterministic init + fixed rounds make
# both flags stable run-to-run. total_ss is engine-independent data
# math (n·Σ_dim var_pop), rounded to 2 where ~1e-10 relative
# summation drift cannot straddle. The full (vec_id, cluster)
# assignment remains available via kmeans_fit_assign().
_ORACLE_KMEANS = f"""
WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings),
per AS (
    SELECT i, VAR_POP(emb[i]) AS vp
    FROM e, UNNEST(range(1, len(emb) + 1)) AS t(i)
    GROUP BY i
)
SELECT (SELECT COUNT(*) FROM e) AS n_points,
       CAST({KMEANS_K} AS INTEGER) AS k,
       ROUND((SELECT SUM(vp) FROM per) * (SELECT COUNT(*) FROM e), 2)
           AS total_ss,
       CAST(1 AS INTEGER) AS multiple_clusters_used,
       CAST(1 AS INTEGER) AS within_ss_below_total
WHERE EXISTS (SELECT 1 FROM e)
"""


@query("q_kmeans_embeddings", oracle=_ORACLE_KMEANS)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load_table
    from .dedup import EMBED_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    if emb.isEmpty():
        # Empty-in → empty-out (ADVICE r6): without this gate the two
        # groupless aggs cross-joined below always yield one all-NULL
        # row, diverging from both the repo policy and the oracle's
        # WHERE EXISTS guard.
        return spark.createDataFrame(
            [],
            "n_points long, k int, total_ss double, "
            "multiple_clusters_used int, within_ss_below_total int",
        )
    assigned = kmeans_fit_assign(emb, dim=EMBED_DIM, keep_embedding=True)
    # ONE explode + (cluster, dim) moments pass feeds everything:
    # within-cluster SS per cell = s2 − s1²/n; the per-dim TOTAL SS
    # folds the same k×d partials (S2 − S1²/N over clusters) — no
    # second pass over the exploded data, no join back to embeddings
    per = (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(
            F.count("v").cast("double").alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
        .localCheckpoint(eager=True)  # k×d rows; 2 consumers below
    )
    within = per.agg(
        F.sum(F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")).alias(
            "within_ss"
        ),
        F.countDistinct("cluster").alias("n_clusters"),
    )
    total = (
        per.groupBy("pos")
        .agg(
            (
                F.sum("s2")
                - F.pow(F.sum("s1"), 2) / F.sum("n")
            ).alias("ss"),
            F.sum("n").alias("n_pts"),
        )
        .agg(
            F.sum("ss").alias("total_ss_raw"),
            F.max("n_pts").cast("long").alias("n_points"),
        )
    )
    return within.crossJoin(total).select(
        "n_points",
        F.lit(KMEANS_K).cast("int").alias("k"),
        F.round("total_ss_raw", 2).alias("total_ss"),
        (F.col("n_clusters") > 1).cast("int").alias("multiple_clusters_used"),
        (F.col("within_ss") < F.col("total_ss_raw"))
        .cast("int")
        .alias("within_ss_below_total"),
    )


_ORACLE_GOLDEN = """
WITH RECURSIVE
 edges AS (
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS src, b.vec_id AS dst
    FROM e a
    JOIN e b ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 10
    WHERE ROUND(list_dot_product(a.emb, b.emb)
                / (SQRT(list_dot_product(a.emb, a.emb))
                   * SQRT(list_dot_product(b.emb, b.emb))), 6) > 0.3
 ),
 bi AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
 verts AS (SELECT DISTINCT src AS v FROM bi),
 reach(v, l) AS (
    SELECT v, v FROM verts
    UNION
    SELECT b.dst, r.l FROM reach r JOIN bi b ON b.src = r.v
 ),
 labels AS (
    SELECT v AS vertex, MIN(l) AS cluster_id FROM reach GROUP BY v
 ),
 members AS (
    SELECT lb.cluster_id, lb.vertex, em.label
    FROM labels lb JOIN embeddings em ON em.vec_id = lb.vertex
 ),
 label_votes AS (
    SELECT cluster_id, label, COUNT(*) AS votes,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY COUNT(*) DESC, label) AS rk
    FROM members
    GROUP BY cluster_id, label
 )
SELECT m.cluster_id,
       COUNT(*) AS n_members,
       MIN(m.vertex) AS representative_id,
       ANY_VALUE(v.label) AS majority_label,
       array_to_string(list_sort(list(m.vertex)), ',') AS member_ids
FROM members m
JOIN label_votes v ON v.cluster_id = m.cluster_id AND v.rk = 1
GROUP BY m.cluster_id
ORDER BY m.cluster_id
"""


@query("q_golden_record", oracle=_ORACLE_GOLDEN)
def golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record synthesis: after connected-component
    entity resolution, collapse each cluster to ONE canonical row —
    representative = smallest member id, majority vote for the
    categorical attribute (ties broken by label order, pinned), plus
    the full member roster (canonically serialized).

    Scale shape: the cluster labels come from the adaptive CC operator
    (driver union-find under 1M edges, distributed min-label +
    pointer-jumping above — llm/clustering.py:90-160); survivorship
    itself is two groupBys on the LABELED set (members, label votes)
    with a rank-1 filter — all mergeable, no fan-out. The roster
    column is the bounded-cluster-size analog of the posting-list
    head; entity clusters are small by construction (near-dup radius),
    so collect is per-cluster bounded. Oracle replays the identical
    fixpoint via RECURSIVE CTE plus the same vote/tiebreak.
    """
    from ..tables import load_table

    pairs = dedup_embedding_cosine(spark, sf_dir)
    labels = connected_components(pairs, "vec_a", "vec_b").localCheckpoint(eager=True)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    members = labels.join(emb, labels.vertex == emb.vec_id).select(
        "cluster_id", "vertex", "label"
    ).localCheckpoint(eager=True)  # consumed by roster agg AND label votes
    votes = (
        members.groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col("votes").desc(), "label"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("cluster_id", F.col("label").alias("majority_label"))
    )
    return (
        members.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vertex").alias("representative_id"),
            F.concat_ws(",", F.sort_array(F.collect_list("vertex"))).alias(
                "member_ids"
            ),
        )
        .join(F.broadcast(votes), "cluster_id")
        .select(
            "cluster_id",
            "n_members",
            "representative_id",
            "majority_label",
            "member_ids",
        )
        .orderBy("cluster_id")
    )


def kmeans_multiprobe_cells(
    points: DataFrame, cents: list[list[float]], nprobe: int
) -> DataFrame:
    """Add a `cells` column: the `nprobe` nearest centroid indices per
    vector (IVF multi-probe assignment). Same Arrow/numpy kernel shape
    as _assign; the k×d model rides the closure."""
    C = np.asarray(cents, dtype=np.float64)
    norms = (C * C).sum(axis=1)
    p = min(nprobe, C.shape[0])

    @F.pandas_udf("array<int>")
    def probes(emb: pd.Series) -> pd.Series:
        X = np.vstack(emb.to_numpy()).astype(np.float64)
        d2 = -2.0 * (X @ C.T) + norms
        idx = np.argsort(d2, axis=1, kind="stable")[:, :p]
        return pd.Series(list(idx.astype("int32")))

    return points.withColumn("cells", probes("embedding"))


# ---------------------------------------------------------------------------
# Semantic dedup (round 6) — the SemDeDup recipe (public: Abbas et al.
# 2023): cluster the embedding space with k-means, then search for
# near-duplicates only WITHIN cells, so the pair volume is
# Σ|cell|²/2 instead of n²/2 and k grows with the corpus (the IVF
# posture q_similarity_ivf already carries). Single-cell assignment
# measured only 0.25-0.34 recall of true cosine ≥ t pairs on the
# near-flat fixture spectrum, so assignment is MULTI-PROBE (each
# vector joins its 3 nearest cells — measured recall 0.961 at sf0.01,
# 0.940 at sf0.1; floor one notch below at 0.85).
#
# Contract-oracle (the ann_recall pattern): the kmeans cells can't
# replay in SQL, so the oracled VALUES are the exact ground truth
# DuckDB computes independently — the true cosine ≥ t pair count over
# a BOUNDED anchor slice (vec_id < 500, fixed size at any corpus
# scale) — plus the realized-recall claim as a flag. Cosines use the
# sequential-accumulation kernel that is bit-identical to DuckDB's
# list_dot_product, so the threshold cut agrees pair-for-pair.
# ---------------------------------------------------------------------------

_SEM_NPROBE = 3
_SEM_T = 0.3  # fixture cosine threshold (same as q_dedup_embedding_cosine)
_SEM_ANCHORS = 500
_SEM_RECALL_FLOOR = 0.85

_ORACLE_SEMANTIC = f"""
WITH s AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    WHERE vec_id < {_SEM_ANCHORS}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_anchor_true,
       CAST({_SEM_NPROBE} AS INTEGER) AS nprobe,
       CAST(1 AS INTEGER) AS recall_ge_floor
FROM s a JOIN s b ON b.vec_id > a.vec_id
WHERE list_dot_product(a.emb, b.emb)
      / (SQRT(list_dot_product(a.emb, a.emb))
         * SQRT(list_dot_product(b.emb, b.emb))) >= {_SEM_T}
"""


@query("q_dedup_semantic", oracle=_ORACLE_SEMANTIC)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load_table
    from .dedup import EMBED_DIM, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    schema = "n_anchor_true long, nprobe int, recall_ge_floor int"
    cents = kmeans_fit(emb, EMBED_DIM)
    if not cents:
        # empty corpus: zero true pairs means zero recall to lose —
        # trivially within contract, matching the oracle's (0, 3, 1)
        return spark.createDataFrame([(0, _SEM_NPROBE, 1)], schema)
    anch = kmeans_multiprobe_cells(
        emb.filter(F.col("vec_id") < _SEM_ANCHORS), cents, _SEM_NPROBE
    ).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "cells",
    )
    a, b = anch.alias("a"), anch.alias("b")
    true_pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            (
                F.size(F.array_intersect(F.col("a.cells"), F.col("b.cells")))
                > 0
            ).alias("co_cell"),
            # MEASURED choice (round-6 review follow-up): HOF fold
            # 4.8 s vs unrolled dim=64 form 13.9 s for this query —
            # at a bounded 125k-pair fan-out the unrolled tree's
            # driver-side analysis + codegen dominates (the r2 kmeans
            # finding), while the fold's ~µs/row interpretation is
            # amortized. The unrolled form wins only on multi-million
            # pair join conditions (see cosine() docstring).
            cosine(F.col("a.emb"), F.col("b.emb")).alias("cos"),
        )
        .filter(F.col("cos") >= _SEM_T)
    )
    return true_pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchor_true"),
        F.lit(_SEM_NPROBE).cast("int").alias("nprobe"),
        # coalesce: with ZERO true pairs the sum is NULL and the flag
        # would read NULL while the oracle asserts 1 — no pairs means
        # no recall to lose, so the contract is trivially met
        F.coalesce(
            (
                F.try_divide(
                    F.sum(F.col("co_cell").cast("long")), F.count(F.lit(1))
                )
                >= F.lit(_SEM_RECALL_FLOOR)
            ).cast("int"),
            F.lit(1),
        ).alias("recall_ge_floor"),
    )
