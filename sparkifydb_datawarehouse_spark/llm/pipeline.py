"""Corpus-cleaning funnel — the composed dedup pipeline as ONE
operator with per-stage accounting.

Individual stages exist as their own oracle-checked queries (exact
fingerprints, n-gram Jaccard pairs, connected components,
representative selection); a training-data pipeline runs them as a
FUNNEL and reports what each stage removed — the number a data lead
actually reviews before a training run. Stages here:

  raw documents
    → exact dedup (normalized-text fingerprint, keep min doc_id)
    → near-dup collapse (3-gram Jaccard >= 0.5 pair graph over the
      exact-dedup survivors, connected components, keep the lowest
      doc_id per cluster)

Output: one row per stage with docs and chars retained — fully
oracle-checked (the DuckDB side replays the same funnel with a
recursive-CTE component fixpoint, same as q_dedup_clusters').

Scale: the stages inherit their components' designs — fingerprint
hash agg; banded same-source candidate join; adaptive CC (driver
union-find under 1M edges); max_by keep-rule. The funnel adds only
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .clustering import connected_components

_J_THRESHOLD = 0.5


def _exact_survivors(docs: DataFrame) -> DataFrame:
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    keep = (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return docs.join(keep, "doc_id", "left_semi")


def _near_dup_pairs(docs: DataFrame) -> DataFrame:
    """Jaccard >= threshold pairs via the INVERTED-INDEX form: explode
    distinct shingles, equi-join on (source, shingle), count shared
    shingles per pair, then |A∩B|/(|A|+|B|-|A∩B|). Exactly equivalent
    to per-pair array intersection for any threshold > 0 (pairs
    sharing no shingle score 0 and can never appear), but the work is
    proportional to SHARED content instead of candidates × array
    width — the per-pair array_intersect form measured 40+ s at sf0.1
    where this runs in ~2 s, and at 100 TB the shuffle carries
    (source, shingle-hash, doc) rows, never the shingle arrays. Stop
    words / boilerplate shingles with huge postings lists are the
    skew risk — production caps posting-list length (drops nothing
    above-threshold for near-dup-sized lists)."""
    # Distinct shingle hashes via an indexed element_at transform —
    # map-side, no token shuffle (r11: replaced posexplode + 2 window
    # leads; the old "interpreted HOF costs ~7 s" note was about the
    # per-gram F.slice array-copy form, which the indexed form avoids
    # — measured faster than the leads at sf0.1 with an identical hash
    # stream). The exploded (doc, source, hash) table is small
    # (shingles ≈ tokens) and localCheckpoint-ed so both join sides
    # read materialized partitions instead of recomputing lineage.
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    ex = (
        spread.select("doc_id", "source", toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 2, 0)),"
                    " (x, i) -> xxhash64(concat_ws(' ', x,"
                    " element_at(t, i + 2), element_at(t, i + 3))))"
                )
            ).alias("sh_hash"),
        )
        .distinct()  # Jaccard is over shingle SETS
        .localCheckpoint()
    )
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # The id window ALSO rides in the join key (same banding trick as
    # the as-of/cosine joins): common boilerplate shingles have deep
    # postings lists, and joining on (source, shingle) alone evaluates
    # |postings|² pairs per shingle before the id residual can prune —
    # measured 18 s for ONE surviving pair. Banding the id space at
    # window width bounds each bucket's fan-out by docs-per-window.
    band = F.floor(F.col("doc_id") / 100)
    a = ex.select(
        F.col("doc_id").alias("doc_a"),
        "source",
        "sh_hash",
        F.explode(F.array(band, band + 1)).alias("band"),
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"), "source", "sh_hash", band.alias("band")
    )
    common = (
        a.join(b, ["source", "sh_hash", "band"])
        .filter(
            (F.col("doc_b") > F.col("doc_a"))
            & (F.col("doc_b") <= F.col("doc_a") + 100)
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.round(jac, 6) >= _J_THRESHOLD)
        .select("doc_a", "doc_b")
    )


_ORACLE_FUNNEL = f"""
WITH RECURSIVE
docs0 AS (SELECT doc_id, text, n_chars, source FROM documents),
fp AS (
    SELECT doc_id, n_chars, source, text,
           md5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM docs0
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
exact_kept AS (SELECT f.* FROM fp f JOIN keepers k ON k.doc_id = f.doc_id),
sh AS (
    SELECT doc_id, source,
           list_distinct(list_transform(
               range(len(toks) - 2),
               i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]
           )) AS shingles
    FROM (
        SELECT doc_id, source,
               list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS toks
        FROM exact_kept
    )
    WHERE len(toks) >= 3
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sh a
    JOIN sh b ON a.source = b.source
            AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 100
    WHERE ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
          >= {_J_THRESHOLD}
),
bi AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
reach(v, l) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM bi)
    UNION
    SELECT b.d, r.l FROM reach r JOIN bi b ON b.s = r.v
),
labels AS (SELECT v AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY v),
near_dropped AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
near_kept AS (
    SELECT e.* FROM exact_kept e
    WHERE e.doc_id NOT IN (SELECT doc_id FROM near_dropped)
)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_chars AS BIGINT) AS total_chars
FROM (
    SELECT 'raw' AS stage, 1 AS ord, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM docs0
    UNION ALL
    SELECT 'exact_dedup', 2, COUNT(*), SUM(n_chars) FROM exact_kept
    UNION ALL
    SELECT 'near_dedup', 3, COUNT(*), SUM(n_chars) FROM near_kept
)
ORDER BY ord
"""


@query("q_corpus_funnel", oracle=_ORACLE_FUNNEL)
def corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def stage(name: str, df: DataFrame, ord_: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(ord_).alias("ord"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )

    exact_kept = _exact_survivors(docs)
    pairs = _near_dup_pairs(exact_kept)
    labels = connected_components(pairs, "doc_a", "doc_b")
    dropped = labels.filter(F.col("vertex") != F.col("cluster_id")).select(
        F.col("vertex").alias("doc_id")
    )
    near_kept = exact_kept.join(dropped, "doc_id", "left_anti")
    out = (
        stage("raw", docs, 1)
        .unionAll(stage("exact_dedup", exact_kept, 2))
        .unionAll(stage("near_dedup", near_kept, 3))
    )
    return out.orderBy("ord").select("stage", "n_docs", "total_chars")
