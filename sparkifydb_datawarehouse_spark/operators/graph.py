"""Graph analytics over a co-occurrence graph derived from the
warehouse: suppliers are vertices; edges connect each supplier to the
partners it co-ships orders with most often.

The reference models its domain purely relationally
(/root/reference/sql_queries.py:19-97); graph questions over the same
data ("which suppliers cluster together?") are a standard warehouse
extension and exercise a genuinely different access pattern: self-join
edge generation, neighborhood aggregation, and iterative propagation.

Scale design (100 TB):
- RAW co-occurrence saturates: with random assignment the pair count
  approaches |V|² as orders grow (measured: 91% of all possible
  supplier pairs co-occur at sf0.1) — degree/triangle/rank on the raw
  graph degenerates into all-pairs work that no cluster survives.
  The fix is in the graph DEFINITION, not the execution: keep each
  vertex's K strongest partners (by co-occurrence count, ties to the
  lower id) — the standard kNN-graph sparsification. Degree is then
  bounded by 2K at ANY data scale, and the edge build is a hash agg +
  one per-vertex top-K window, both linear in the pair-occurrence
  count.
- Pair generation is a self-join of lineitem ON l_orderkey — an
  equi-join on the fact table's natural key (shuffle-free under
  orderkey-bucketed layout) with per-order bounded fan-out.
- Triangle counting joins the oriented edge list to itself twice;
  orientation (a<b<c) counts each triangle once and the kNN cap
  bounds the join fan-out.
- PageRank keeps ONLY the rank vector as iterative state. Like
  connected components (llm/clustering.py), the strategy is adaptive:
  a sparsified graph under 1M edges is solved on the driver with
  numpy (the distributed loop costs ~0.5 s/round of pure job overhead
  — 10 rounds of that swamps any small graph); bigger graphs run the
  distributed loop with localCheckpoint lineage truncation. Both
  paths implement the same fixpoint and are tested to agree.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

KNN_K = 10

_EDGE_SQL_CTE = f"""
pair_counts AS (
    SELECT a.l_suppkey AS src, b.l_suppkey AS dst, COUNT(*) AS cnt
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    GROUP BY a.l_suppkey, b.l_suppkey
),
directed AS (
    SELECT src AS u, dst AS v, cnt FROM pair_counts
    UNION ALL SELECT dst, src, cnt FROM pair_counts
),
knn AS (
    SELECT u, v FROM (
        SELECT u, v,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY cnt DESC, v) AS rn
        FROM directed
    ) WHERE rn <= {KNN_K}
),
edges AS (
    SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM knn
)
"""


def supplier_edges(spark: SparkSession, sf_dir: str, k: int = KNN_K) -> DataFrame:
    """kNN-sparsified co-occurrence edges, oriented src < dst: each
    supplier contributes its k most-frequent co-shippers; an edge
    survives if EITHER endpoint selected it (standard kNN-graph
    symmetrization), so degree <= 2k at any scale.

    Pair generation (optimization round 14, guide §2.3/§2.4 — the
    q_basket_pairs in-expression idiom): fold lineitem to per-order
    sorted supplier lists and expand ordered pairs inside one
    projection, instead of the lineitem⋈lineitem equi-self-join. The
    old shape scanned the fact twice and shuffled it twice (both join
    sides hashed by l_orderkey); this shape scans once and shuffles
    once. Per-order fan-in is bounded (an order has bounded lines), so
    the collected list and the C(n,2) expansion are O(1) per order at
    any corpus scale. Pair multiplicity is identical: row pairs with
    a.supp < b.supp ↔ position pairs i < j with s[i] ≠ s[j] over the
    sorted multiset (equal values contribute no pair either way).
    Measured at sf0.1: the shared edge build 2.34 → ~1.3 s min-of-3,
    same edges (all six graph oracles green)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair_counts = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_suppkey")).alias("s"))
        .select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(s, (x, i) -> "
                    "transform(slice(s, i + 2, size(s)), "
                    "y -> struct(x AS src, y AS dst)))), "
                    "p -> p.src <> p.dst)"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # both directions via one in-row expansion (a unionAll of two
    # selects over pair_counts re-executes its aggregation per branch)
    directed = pair_counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("u"), F.col("dst").alias("v"), F.col("cnt")
                ),
                F.struct(
                    F.col("dst").alias("u"), F.col("src").alias("v"), F.col("cnt")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v", "e.cnt")
    w = Window.partitionBy("u").orderBy(F.col("cnt").desc(), F.col("v"))
    knn = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("u", "v")
    )
    return knn.select(
        F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
    ).distinct()


_ORACLE_DEGREE = f"""
WITH {_EDGE_SQL_CTE},
bi AS (SELECT src AS v, dst AS n FROM edges
       UNION ALL SELECT dst, src FROM edges)
SELECT v AS supp_key, COUNT(*) AS degree
FROM bi
GROUP BY v
ORDER BY supp_key
"""


@query("q_graph_degree", oracle=_ORACLE_DEGREE)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex degree over the sparsified co-supply graph. Edges are
    distinct and oriented, so degree = out-edges + in-edges with no
    double counting."""
    # edges referenced twice (the union's branches each re-embed the
    # whole edge-build DAG) — materialize once, the module's standard
    # move (optimization r14, guide §5)
    e = supplier_edges(spark, sf_dir).localCheckpoint()
    bi = e.select(F.col("src").alias("v")).unionAll(e.select(F.col("dst").alias("v")))
    return (
        bi.groupBy(F.col("v").alias("supp_key"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("supp_key")
    )


_ORACLE_TRIANGLES = f"""
WITH {_EDGE_SQL_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.src = e1.dst
JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""


@query("q_graph_triangles", oracle=_ORACLE_TRIANGLES)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count: for oriented edges a<b, b<c, close with
    a<c. Each triangle appears exactly once."""
    # edges referenced THREE times by the triangle-closing self-joins —
    # materialize once instead of re-embedding the edge-build DAG per
    # reference (optimization r14, guide §5; the link-prediction move)
    e = supplier_edges(spark, sf_dir).localCheckpoint()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = e1.join(e2, F.col("e2.src") == F.col("e1.dst")).join(
        e3,
        (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85

# Same adaptive threshold rationale as clustering.DRIVER_CC_MAX_EDGES:
# under this edge count the collected graph is tens of MB and the
# distributed loop's fixed ~0.5 s/round job overhead dominates any
# real work, so solve on the driver; above it, only the distributed
# loop fits in memory and its per-round cost is amortized by volume.
DRIVER_PR_MAX_EDGES = 1_000_000


def _driver_pagerank(
    spark: SparkSession, pairs: list, iters: int, damping: float
) -> DataFrame:
    """numpy PageRank on the collected edge list — exact same fixpoint
    as the distributed loop (undirected, rank_0 = 1.0, no dangling
    handling needed: every vertex of an undirected edge has deg>=1)."""
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    src = np.empty(2 * len(pairs), dtype=np.int64)
    dst = np.empty(2 * len(pairs), dtype=np.int64)
    for j, (a, b) in enumerate(pairs):
        ia, ib = idx[a], idx[b]
        src[2 * j], dst[2 * j] = ia, ib
        src[2 * j + 1], dst[2 * j + 1] = ib, ia
        deg[ia] += 1
        deg[ib] += 1
    rank = np.ones(n)
    for _ in range(iters):
        contrib = rank[src] / deg[src]
        rank = (1 - damping) + damping * np.bincount(
            dst, weights=contrib, minlength=n
        )
    rows = [(int(v), float(rank[idx[v]])) for v in verts]
    return spark.createDataFrame(rows, "vertex long, rank double")


def pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    max_driver_edges: int = DRIVER_PR_MAX_EDGES,
) -> DataFrame:
    """Undirected PageRank to `iters` rounds. Returns (vertex, rank)
    with ranks summing to ~|V|. Adaptive driver/distributed strategy
    (see module docstring); pass max_driver_edges=0 to force the
    distributed loop."""
    spark = edges.sparkSession
    if max_driver_edges > 0:
        mat = edges.select("src", "dst").localCheckpoint()
        if mat.count() <= max_driver_edges:
            pairs = [(r[0], r[1]) for r in mat.collect()]
            return _driver_pagerank(spark, pairs, iters, PAGERANK_DAMPING)
        edges = mat
    bi = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .localCheckpoint()
    )
    out_deg = bi.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    links = bi.join(out_deg, "u").localCheckpoint()  # (u, v, deg(u))
    ranks = (
        bi.select(F.col("u").alias("vertex")).distinct()
        .withColumn("rank", F.lit(1.0))
        .localCheckpoint()
    )
    for _ in range(iters):
        contribs = (
            links.join(ranks, links.u == ranks.vertex)
            .select(F.col("v"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            ranks.select("vertex")
            .join(contribs, ranks.vertex == contribs.v, "left")
            .select(
                "vertex",
                (
                    F.lit(1 - PAGERANK_DAMPING)
                    + F.lit(PAGERANK_DAMPING) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


# Oracled since round 6 (VERDICT r5 #6): fixed damping + iteration
# count make the fixpoint DETERMINISTIC, and DuckDB's recursive CTE
# supports aggregation in the recursive term, so the oracle replays
# the exact same 10 synchronous rounds (the working table holds only
# iteration N's rank vector — precisely the loop state). Base-case
# rank and constants are CAST AS DOUBLE: a bare 1.0 literal types the
# whole recursion DECIMAL(2,1) and truncates every rank to one
# decimal. Verified bit-exact vs both the numpy driver path and the
# distributed loop (summation-order drift sits ~1e-15, far from the
# round-6 boundary).
_ORACLE_PAGERANK = f"""
WITH RECURSIVE {_EDGE_SQL_CTE},
bi AS (SELECT src AS u, dst AS v FROM edges
       UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT u, COUNT(*) AS d FROM bi GROUP BY u),
pr(it, v, rank) AS (
    SELECT 0, u, CAST(1.0 AS DOUBLE) FROM (SELECT DISTINCT u FROM bi)
    UNION ALL
    SELECT pr.it + 1, bi.v,
           CAST({1 - PAGERANK_DAMPING} AS DOUBLE)
           + CAST({PAGERANK_DAMPING} AS DOUBLE) * SUM(pr.rank / deg.d)
    FROM pr JOIN bi ON bi.u = pr.v JOIN deg ON deg.u = pr.v
    WHERE pr.it < {PAGERANK_ITERS}
    GROUP BY pr.it, bi.v
)
SELECT v AS vertex, ROUND(rank, 6) AS rank
FROM pr WHERE it = {PAGERANK_ITERS}
ORDER BY vertex
"""


@query("q_graph_pagerank", oracle=_ORACLE_PAGERANK)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = supplier_edges(spark, sf_dir)
    return (
        pagerank(e)
        .select("vertex", F.round("rank", 6).alias("rank"))
        .orderBy("vertex")
    )


_BFS_MAX_DEPTH = 20

_ORACLE_BFS = f"""
WITH RECURSIVE {_EDGE_SQL_CTE},
bi AS (SELECT src AS u, dst AS v FROM edges
       UNION ALL SELECT dst, src FROM edges),
start AS (SELECT MIN(src) AS s FROM edges),
walk(v, d) AS (
    SELECT s, 0 FROM start
    UNION
    SELECT bi.v, walk.d + 1
    FROM walk JOIN bi ON bi.u = walk.v
    WHERE walk.d < {_BFS_MAX_DEPTH}
)
SELECT v AS supp_key, CAST(MIN(d) AS BIGINT) AS dist
FROM walk
GROUP BY v
ORDER BY supp_key
"""


@query("q_graph_shortest_path", oracle=_ORACLE_BFS)
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted single-source shortest paths (BFS levels) over the
    sparsified co-supply graph, source = the minimum supplier key.

    Distributed frontier expansion: each round joins the current
    frontier against the (broadcast-eligible, degree≤2k) adjacency
    list, anti-joins the visited set, and localCheckpoints both — the
    standard O(diameter)-round BFS whose per-round shuffle carries only
    (vertex, dist), never payloads. kNN sparsification bounds degree,
    so frontier growth is ≤2k× per round at any scale. The oracle is a
    DuckDB recursive CTE with UNION-distinct termination, depth-capped
    at the same {_BFS_MAX_DEPTH} as the loop (both sides see identical
    reachability: the kNN graph's diameter here is far below the cap).
    """
    e = supplier_edges(spark, sf_dir)
    bi = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).localCheckpoint()
    start = bi.agg(F.min("u")).collect()[0][0]  # 1 scalar to the driver
    spark_ = e.sparkSession
    dist = spark_.createDataFrame([(start, 0)], "v long, d int").localCheckpoint()
    frontier = dist
    for depth in range(1, _BFS_MAX_DEPTH + 1):
        nxt = (
            frontier.join(bi, frontier.v == bi.u)
            .select(bi.v.alias("v"))
            .distinct()
            .join(dist, "v", "left_anti")
            .withColumn("d", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return dist.select(
        F.col("v").alias("supp_key"), F.col("d").cast("long").alias("dist")
    ).orderBy("supp_key")


# ---------------------------------------------------------------------------
# k-core: the maximal subgraph where every vertex keeps >= K neighbors
# INSIDE the subgraph — the standard "dense backbone" extractor
# (Seidman 1983, public literature). Found by iterative peeling:
# repeatedly delete vertices of degree < K; the fixpoint is unique
# regardless of deletion order, so the result is deterministic even
# though the loop is not SQL-expressible (rows-only registration;
# tests/test_new_ops_r3b.py pins it against a brute-force peel).
# ---------------------------------------------------------------------------

_KCORE_K = 4
_KCORE_MAX_ROUNDS = 50  # degree <= 2*KNN_K bounds core depth; 50 >> observed


# Oracled since round 6 (the pagerank recursive-fixpoint pattern):
# k-core peeling is a SYNCHRONOUS integer fixpoint — each round keeps
# exactly the edges whose both endpoints have within-set degree ≥ k —
# so DuckDB can replay it with a recursive CTE whose working table is
# the round's edge set. One reference to the working table suffices:
# each edge expands to its two endpoints via lateral UNNEST, a window
# COUNT per (it, endpoint) yields degrees, and GROUP BY edge HAVING
# MIN(deg) ≥ k keeps survivors. Past convergence the set reproduces
# itself each round, so the it = MAX_ROUNDS slice equals Spark's
# break-at-convergence state (and equals the 50-round state if never
# converged — both sides peel in lockstep, integers only, no float
# risk). Verified row-identical at sf0.001 and sf0.01.
_ORACLE_KCORE = f"""
WITH RECURSIVE {_EDGE_SQL_CTE},
peel(it, src, dst) AS (
    SELECT 0, src, dst FROM edges
    UNION ALL
    SELECT it + 1, src, dst FROM (
        SELECT it, src, dst, MIN(endpoint_deg) AS min_deg
        FROM (
            SELECT it, src, dst, e.v AS endpoint,
                   COUNT(*) OVER (PARTITION BY it, e.v) AS endpoint_deg
            FROM peel, UNNEST([src, dst]) AS e(v)
            WHERE it < {_KCORE_MAX_ROUNDS}
        )
        GROUP BY it, src, dst
    )
    WHERE min_deg >= {_KCORE_K}
)
SELECT v AS supp_key, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT src, dst FROM peel WHERE it = {_KCORE_MAX_ROUNDS}),
     UNNEST([src, dst]) AS e(v)
GROUP BY v
ORDER BY supp_key
"""


@query("q_graph_kcore", oracle=_ORACLE_KCORE)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Members of the 4-core of the supplier co-shipment graph with
    their within-core degree.

    Scale design: each peel round is one shuffle (degree agg keyed by
    vertex) plus a semi-join filter of the edge list; localCheckpoint
    truncates lineage per round (checkpoint() on a real cluster, the
    CC/PageRank discipline). Rounds are bounded by the peeling depth —
    O(max core number) <= max degree, which the kNN-sparsified edge
    builder caps at 2k — not by graph size; each round's survivor
    count is ONE scalar to the driver.
    """
    edges = supplier_edges(spark, sf_dir).localCheckpoint()
    for _ in range(_KCORE_MAX_ROUNDS):
        bi = edges.select(F.col("src").alias("v")).unionAll(
            edges.select(F.col("dst").alias("v"))
        )
        deg = bi.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("v").localCheckpoint()
        pruned = (
            edges.join(keep.withColumnRenamed("v", "src"), "src", "semi")
            .join(keep.withColumnRenamed("v", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        if pruned.count() == edges.count():
            edges = pruned
            break
        edges = pruned
    core_deg = (
        edges.select(F.col("src").alias("supp_key"))
        .unionAll(edges.select(F.col("dst").alias("supp_key")))
        .groupBy("supp_key")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    return core_deg.orderBy("supp_key")


# ---------------------------------------------------------------------------
# Link prediction (round 5) — neighborhood-Jaccard scoring of
# NON-adjacent vertex pairs (Liben-Nowell & Kleinberg 2003, public
# literature): the classic graph-ML candidate generator ("who should
# be connected next"). score(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
# over pairs sharing at least one neighbor, existing edges excluded.
#
# Scale: the common-neighbor self-join fans out per shared neighbor —
# quadratic in degree GENERICALLY, but this graph is kNN-sparsified
# (degree ≤ 2K = 20 by construction, see supplier_edges), so the pair
# volume is ≤ C(2K,2)·|V| at any data scale. That bound is the same
# design decision that tamed triangle counting (module docstring).
# ---------------------------------------------------------------------------

_LP_TOP = 20

_ORACLE_LINK_PRED = f"""
WITH {_EDGE_SQL_CTE},
bi AS (SELECT src AS v, dst AS n FROM edges
       UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT v, COUNT(*) AS d FROM bi GROUP BY v),
cn AS (
    SELECT a.v AS va, b.v AS vb, CAST(COUNT(*) AS BIGINT) AS common
    FROM bi a JOIN bi b ON a.n = b.n AND a.v < b.v
    GROUP BY a.v, b.v
),
cand AS (
    SELECT cn.va, cn.vb, cn.common,
           CAST(da.d + db.d - cn.common AS BIGINT) AS union_size
    FROM cn
    JOIN deg da ON da.v = cn.va
    JOIN deg db ON db.v = cn.vb
    LEFT JOIN edges e ON e.src = cn.va AND e.dst = cn.vb
    WHERE e.src IS NULL
)
SELECT va, vb, common, union_size,
       ROUND(CAST(common AS DOUBLE) / union_size, 6) AS jaccard
FROM cand
ORDER BY jaccard DESC, va, vb
LIMIT {_LP_TOP}
"""


@query("q_graph_link_prediction", oracle=_ORACLE_LINK_PRED)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N non-adjacent supplier pairs by neighborhood Jaccard.

    The edge list is referenced SEVEN times through bi/deg/cn/anti —
    without lineage truncation Catalyst re-embeds the whole
    edge-build DAG per reference (measured 61 Exchanges); the
    localCheckpoint (the module's standard move, see PageRank)
    materializes edges once and the plan drops to the real work."""
    e = supplier_edges(spark, sf_dir).localCheckpoint()
    bi = e.select(F.col("src").alias("v"), F.col("dst").alias("n")).unionAll(
        e.select(F.col("dst").alias("v"), F.col("src").alias("n"))
    )
    deg = bi.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    a = bi.select(F.col("v").alias("va"), "n")
    b = bi.select(F.col("v").alias("vb"), "n")
    cn = (
        a.join(b, "n")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = (
        cn.join(deg.select(F.col("v").alias("va"), F.col("d").alias("da")), "va")
        .join(deg.select(F.col("v").alias("vb"), F.col("d").alias("db")), "vb")
        .join(
            e,
            (e.src == F.col("va")) & (e.dst == F.col("vb")),
            "left_anti",
        )
        .select(
            "va",
            "vb",
            "common",
            (F.col("da") + F.col("db") - F.col("common"))
            .cast("long")
            .alias("union_size"),
        )
    )
    return (
        cand.select(
            "va",
            "vb",
            "common",
            "union_size",
            F.round(
                F.col("common").cast("double") / F.col("union_size"), 6
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "va", "vb")
        .limit(_LP_TOP)
    )
