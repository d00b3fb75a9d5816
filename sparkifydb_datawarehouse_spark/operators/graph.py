"""Graph analytics over a co-occurrence graph derived from the
warehouse: suppliers are vertices; an edge connects two suppliers that
ship lines of the same order.

The reference models its domain purely relationally
(/root/reference/sql_queries.py:19-97); graph questions over the same
data ("which suppliers cluster together?") are a standard warehouse
extension and exercise a genuinely different access pattern: self-join
edge generation, neighborhood aggregation, and iterative propagation.

Scale design (100 TB):
- Edge generation is a self-join of lineitem with itself ON
  l_orderkey — an equi-join on the natural partitioning key of the
  fact table, so with orderkey-bucketed layout it is shuffle-free.
  Within an order the pair fan-out is bounded (orders have ~7 lines),
  so output is O(rows · lines_per_order), never O(n²).
- Degree is one hash agg over the (distinct) edge set.
- Triangle counting joins the edge list to itself twice; the
  canonical a<b<c orientation makes each triangle counted exactly
  once AND keeps every join's build side the (smaller) oriented edge
  set. Spark broadcasts it when small; at scale this is the standard
  two-shuffle triangle join, and highest-degree-vertex orientation
  (order by degree, not id) would cap skew — noted, not needed at
  fixture scale.
- PageRank keeps ONLY the rank vector as iterative state,
  localCheckpoint-ed per round (same lineage discipline as
  llm/clustering.connected_components); the edge list is checkpointed
  once and reused by every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_EDGE_SQL_CTE = """
edges AS (
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
)
"""


def supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct co-occurrence edges, oriented src < dst."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )


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
    """Vertex degree over the undirected co-supply graph. Edges are
    distinct and oriented, so degree = out-edges + in-edges with no
    double counting."""
    e = supplier_edges(spark, sf_dir)
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
    e = supplier_edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = e1.join(e2, F.col("e2.src") == F.col("e1.dst")).join(
        e3,
        (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85


def pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Undirected PageRank to `iters` rounds. Returns (vertex, rank)
    with ranks summing to ~|V|. State per round = the rank vector
    only, localCheckpoint-ed (checkpoint() on a real cluster)."""
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


@query("q_graph_pagerank")  # rows-only: iterative fixpoint, no SQL oracle
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = supplier_edges(spark, sf_dir)
    return (
        pagerank(e)
        .select("vertex", F.round("rank", 6).alias("rank"))
        .orderBy("vertex")
    )
