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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .dedup import dedup_embedding_cosine

_MAX_ROUNDS = 20


def connected_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Min-label propagation with pointer jumping, to fixpoint.
    Returns (vertex, cluster_id) for every vertex in `edges`.

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
        one_hop = labels.join(neighbor_min, "vertex", "left").select(
            "vertex",
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
        new_labels = (
            one_hop.join(parent, one_hop.cluster_id == parent.p_vertex, "left")
            .select(
                "vertex",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("p_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
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
    """Add a `cluster` column: index of the nearest centroid."""
    scores = []
    for c in cents:
        dot = None
        for i in range(dim):
            term = F.col("embedding")[i].cast("double") * F.lit(c[i])
            dot = term if dot is None else dot + term
        norm_c = sum(v * v for v in c)
        scores.append(-2.0 * dot + F.lit(norm_c))
    dist_arr = F.array(*scores)
    # array_position is 1-based; clusters are 0-based
    return points.withColumn(
        "cluster",
        (F.array_position(dist_arr, F.array_min(dist_arr)) - 1).cast("int"),
    )


def kmeans_fit_assign(
    points: DataFrame,
    dim: int,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Lloyd's algorithm; returns (vec_id, cluster) after `iters` rounds."""
    init = (
        points.orderBy("vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    cents = [[float(v) for v in r.embedding] for r in init]
    assigned = _assign(points, cents, dim)
    for _ in range(iters):
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
        assigned = _assign(points, cents, dim)
    return assigned.select("vec_id", "cluster")


@query("q_kmeans_embeddings")  # rows-only: iterative fixpoint, no SQL oracle
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load_table
    from .dedup import EMBED_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit_assign(emb, dim=EMBED_DIM).orderBy("vec_id")
