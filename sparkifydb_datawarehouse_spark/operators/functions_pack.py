"""B12-B14: scalar function packs — string, date/math, JSON, array.

The reference's only scalar expressions are `=`, `!=` and CASE WHEN
(SURVEY §2 A7/A11); the engine exposes the standard analytics
function surface. All functions below are built-in pyspark.sql.functions
(JVM-side, whole-stage-codegen'd) — no Python UDFs in these paths.

Cross-engine notes:
- substring is 1-based in both Spark and DuckDB.
- regexp_extract exists under the same name/semantics in both.
- Spark get_json_object('$.k') ≡ DuckDB json_extract_string(props,'$.k').
- collect_set order is nondeterministic → wrap in sort_array before
  concat (DuckDB: list_sort(list(DISTINCT ...))).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# B12 — string functions over part names/types.
# ---------------------------------------------------------------------------

_ORACLE_STRING = """
SELECT p_partkey AS part_key,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT(p_brand, '#', p_type) AS brand_type,
       LENGTH(p_name) AS name_len,
       CAST(p_type LIKE '%BRASS%' AS BOOLEAN) AS is_brass,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       REPLACE(p_brand, 'Brand', 'B') AS brand_short,
       TRIM(CONCAT(' ', p_brand, ' ')) AS brand_trim
FROM part
ORDER BY part_key
"""


@query("q_string_funcs", oracle=_ORACLE_STRING)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_key"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_brand", "Brand", "B").alias("brand_short"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    ).orderBy("part_key")


# ---------------------------------------------------------------------------
# B13 — date + math functions over orders/lineitem.
# ---------------------------------------------------------------------------

_ORACLE_DATE_MATH = """
SELECT l_orderkey AS order_key,
       l_linenumber AS line_number,
       date_trunc('month', l_shipdate) AS ship_month,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
       ROUND(ABS(l_discount - 0.05), 6) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
       CAST(l_partkey % 10 AS BIGINT) AS pk_mod
FROM lineitem
ORDER BY order_key, line_number
"""


@query("q_date_math_funcs", oracle=_ORACLE_DATE_MATH)
def date_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        # string, not DATE: Spark DateType → python date objects while
        # DuckDB → datetime64; a formatted string hashes identically
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_partkey") % 10).alias("pk_mod"),
    ).orderBy("order_key", "line_number")


# ---------------------------------------------------------------------------
# B14 — JSON extraction from the events.props payload.
# ---------------------------------------------------------------------------

_ORACLE_JSON = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       event_type
FROM events
ORDER BY event_id
"""


@query("q_json_extract", oracle=_ORACLE_JSON)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        "event_type",
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# B14 — array explode + ordered re-collect (embeddings + event-type sets).
# ---------------------------------------------------------------------------

_ORACLE_EXPLODE = """
SELECT vec_id,
       CAST(pos - 1 AS BIGINT) AS pos,
       ROUND(CAST(val AS DOUBLE), 4) AS component
FROM (
    SELECT vec_id, UNNEST(embedding) AS val,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
)
WHERE pos <= 8
ORDER BY vec_id, pos
"""


@query("q_explode_collect", oracle=_ORACLE_EXPLODE)
def explode_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("val").cast("double"), 4).alias("component"),
        )
        .orderBy("vec_id", "pos")
    )


_ORACLE_COLLECT = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("q_collect_set", oracle=_ORACLE_COLLECT)
def collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("event_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# B12+ — conditional / comparison / edit-distance functions.
# ---------------------------------------------------------------------------

_ORACLE_MISC = """
SELECT p_partkey AS part_key,
       COALESCE(NULLIF(p_brand, 'Brand#1'), 'other') AS brand_or_other,
       LEAST(p_size, 25) AS size_capped,
       GREATEST(CAST(p_size AS DOUBLE), p_retailprice / 100) AS max_metric,
       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
       REVERSE(p_brand) AS brand_rev,
       LEFT(p_name, 4) AS name_left,
       RIGHT(p_name, 3) AS name_right,
       REPEAT(p_brand, 2) AS brand_twice
FROM part
ORDER BY part_key
"""


@query("q_misc_funcs", oracle=_ORACLE_MISC)
def misc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_key"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("other")).alias(
            "brand_or_other"
        ),
        F.least(F.col("p_size"), F.lit(25)).alias("size_capped"),
        F.greatest(
            F.col("p_size").cast("double"), F.col("p_retailprice") / 100
        ).alias("max_metric"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 4).alias("name_left"),
        F.expr("right(p_name, 3)").alias("name_right"),
        F.repeat("p_brand", 2).alias("brand_twice"),
    ).orderBy("part_key")


# ---------------------------------------------------------------------------
# B14 — map functions: construction (from_json as map type +
# map_concat), lookup (element_at), structure (map_keys), and
# map-level higher-order ops (map_filter, transform_values). The
# oracle reconstructs every output from the underlying JSON/scalars —
# map semantics themselves are engine-internal, their RESULTS are not.
# ---------------------------------------------------------------------------

_ORACLE_MAP = """
SELECT event_id,
       'k,type_len' AS key_list,
       CAST(props->>'k' AS BIGINT) AS k_value,
       CAST(LENGTH(event_type) AS BIGINT) AS type_len,
       CAST((CASE WHEN CAST(props->>'k' AS BIGINT) > 50 THEN 1 ELSE 0 END)
            + (CASE WHEN LENGTH(event_type) > 50 THEN 1 ELSE 0 END) AS INT)
           AS n_big_values,
       CAST(props->>'k' AS BIGINT) * 2 AS k_doubled
FROM events
ORDER BY event_id
"""


@query("q_map_funcs", oracle=_ORACLE_MAP)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    m2 = F.map_concat(
        m, F.create_map(F.lit("type_len"), F.length("event_type").cast("long"))
    )
    with_map = ev.select("event_id", m2.alias("m"))
    return with_map.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("key_list"),
        F.element_at("m", "k").alias("k_value"),
        F.element_at("m", "type_len").alias("type_len"),
        F.size(F.map_filter("m", lambda k, v: v > 50)).alias("n_big_values"),
        F.element_at(
            F.transform_values("m", lambda k, v: v * 2), "k"
        ).alias("k_doubled"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type): parse once into a binary
# variant, extract typed paths lazily. Against 100 TB of ragged JSON
# this replaces N stringly get_json_object re-parses per row with ONE
# parse; shredded variant columns in parquet readers take it further.
# The engine demonstrates the full roundtrip: build a nested JSON
# document, parse_json -> VARIANT, extract typed fields with
# variant_get. Fields are int/string only — float-through-JSON-text
# roundtrips are repr-sensitive and belong to the ingest layer's
# schema, not a correctness gate.
# ---------------------------------------------------------------------------

_ORACLE_VARIANT = """
SELECT event_id,
       event_type AS vtype,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
       CAST(length(event_type) AS INT) AS type_len
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0
ORDER BY event_id
"""


@query("q_variant_json", oracle=_ORACLE_VARIANT)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    nested = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","type_len":'),
        F.length("event_type").cast("string"),
        F.lit('},"k":'),
        F.get_json_object("props", "$.k"),
        F.lit("}"),
    )
    v = ev.withColumn("v", F.parse_json(nested))
    return (
        v.select(
            "event_id",
            F.variant_get("v", "$.meta.type", "string").alias("vtype"),
            F.variant_get("v", "$.k", "long").alias("k_value"),
            F.variant_get("v", "$.meta.type_len", "int").alias("type_len"),
        )
        .filter(F.col("k_value") % 7 == 0)
        # parse once (optimization r13, guide §2.4): the final sort's
        # range sampling re-ran parse_json + variant_get over every
        # event a second time; the surviving typed rows are small
        .localCheckpoint(eager=False)
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Array function pack over the embeddings table: the collection
# transformations an array-typed column actually needs (dedupe, sort,
# slice, membership, length) — all JVM-side expressions, no UDFs.
# Arrays are rounded to 2dp BEFORE the set ops so the float values
# compared across engines are the same decimals.
# ---------------------------------------------------------------------------

_ORACLE_ARRAY = """
SELECT vec_id,
       array_length(emb2) AS n_dims,
       CAST(list_contains(emb2, '0.00') AS BOOLEAN) AS has_zero,
       len(list_distinct(emb2)) AS n_distinct,
       array_to_string(list_sort(list_slice(emb2, 1, 4)), ',') AS first4_sorted,
       array_to_string(list_slice(list_sort(emb2), -3, -1), ',') AS top3
FROM (
    SELECT vec_id,
           [ROUND(CAST(x AS DOUBLE), 2)::DECIMAL(12,2)::VARCHAR
            FOR x IN embedding] AS emb2
    FROM embeddings
    WHERE vec_id % 50 = 0
)
ORDER BY vec_id
"""


@query("q_array_funcs", oracle=_ORACLE_ARRAY)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id % 50 = 0")
    # elements become fixed-point strings ('0.05') BEFORE the set ops:
    # deterministic cross-engine values AND a hash-stable final column
    # (float-array stringification is repr-sensitive; decimals aren't).
    # String sort order == numeric order is NOT generally true, but
    # both engines apply the same lexicographic rule — the oracle pins
    # the shared semantics, which is what's under test.
    emb2 = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double"), 2).cast("decimal(12,2)").cast("string"),
    )
    df = emb.withColumn("emb2", emb2)
    return df.select(
        "vec_id",
        F.size("emb2").alias("n_dims"),
        F.array_contains("emb2", "0.00").alias("has_zero"),
        F.size(F.array_distinct("emb2")).alias("n_distinct"),
        F.array_join(F.sort_array(F.slice("emb2", 1, 4)), ",").alias("first4_sorted"),
        F.array_join(F.slice(F.sort_array("emb2"), -3, 3), ",").alias("top3"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Mode / most-frequent-value aggregate per group.
# ---------------------------------------------------------------------------

# Native mode() exists in both engines but their frequency-TIE
# behavior differs (observed: Spark's deterministic mode picked 'de'
# where DuckDB picked 'en' for a 2-way tie) — an aggregate whose
# answer depends on engine internals can't be an oracle. The
# deterministic formulation (max count, ties broken by lowest value)
# is pinned explicitly via window rank in BOTH engines.
_ORACLE_MODE = """
WITH c AS (
    SELECT source, lang, COUNT(*) AS n
    FROM documents GROUP BY source, lang
), r AS (
    SELECT source, lang, n,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n_langs
    FROM c
)
SELECT source, lang AS top_lang, n AS top_n, n_langs
FROM r WHERE rn = 1
ORDER BY source
"""


@query("q_agg_mode", oracle=_ORACLE_MODE)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("lang"))
    wc = Window.partitionBy("source")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("n_langs", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("n").alias("top_n"),
            "n_langs",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# XML ingest (Spark 4 from_xml) + URL parsing (parse_url): the
# remaining semi-structured/string codecs a warehouse ingest layer
# meets. DuckDB parses neither, so the oracle derives the expected
# values from the SAME source columns the XML/URL strings were built
# from — the roundtrip through the codec is what's under test.
# ---------------------------------------------------------------------------

_ORACLE_XML_URL = """
SELECT event_id,
       event_type AS xml_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS xml_k,
       'events.example.com' AS url_host,
       '/' || event_type AS url_path,
       'uid=' || CAST(user_id AS VARCHAR) AS url_query
FROM events
WHERE event_id % 100 = 0
ORDER BY event_id
"""


@query("q_xml_url_funcs", oracle=_ORACLE_XML_URL)
def xml_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = load_table(spark, sf_dir, "events").filter("event_id % 100 = 0")
    xml = F.concat(
        F.lit("<ev><type>"),
        F.col("event_type"),
        F.lit("</type><k>"),
        F.get_json_object("props", "$.k"),
        F.lit("</k></ev>"),
    )
    url = F.concat(
        F.lit("https://events.example.com/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id").cast("string"),
    )
    xml_schema = StructType(
        [StructField("type", StringType()), StructField("k", LongType())]
    )
    parsed = ev.withColumn("x", F.from_xml(xml, xml_schema)).withColumn("u", url)
    return parsed.select(
        "event_id",
        F.col("x.type").alias("xml_type"),
        F.col("x.k").alias("xml_k"),
        F.parse_url("u", F.lit("HOST")).alias("url_host"),
        F.parse_url("u", F.lit("PATH")).alias("url_path"),
        F.parse_url("u", F.lit("QUERY")).alias("url_query"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# try_* tolerant evaluation — Spark 4 runs ANSI mode by DEFAULT:
# overflow, bad casts, and division by zero now FAIL queries that
# silently returned NULL on 3.x. The production posture is explicit:
# keep ANSI on (loud correctness) and use try_cast / try_divide /
# try_add exactly where dirty data is EXPECTED, so tolerance is
# visible in the plan instead of being a global setting. This pack
# parses a deliberately dirty value out of events.props JSON.
# ---------------------------------------------------------------------------

_ORACLE_TRY = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.score') AS DOUBLE) AS score,
       TRY_CAST(json_extract_string(props, '$.label') AS BIGINT) AS label_num,
       CASE WHEN value = 0 THEN NULL ELSE ROUND(100.0 / value, 4) END AS inv_value
FROM events
WHERE event_id % 7 = 0
ORDER BY event_id
"""


@query("q_try_funcs", oracle=_ORACLE_TRY)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Column.try_cast (no F.try_cast function exists in pyspark 4.1)
    score = F.get_json_object("props", "$.score").try_cast("double")
    label_num = F.get_json_object("props", "$.label").try_cast("bigint")
    inv = F.round(F.try_divide(F.lit(100.0), F.nullif(F.col("value"), F.lit(0.0))), 4)
    return (
        ev.filter(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            score.alias("score"),
            label_num.alias("label_num"),
            inv.alias("inv_value"),
        )
        .orderBy("event_id")
    )
