"""Round-3 behavioral tests: the approx robust-stats scale path and
the equi-width histogram degenerate-range guard."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sparkifydb_datawarehouse_spark import registry
from conftest import SF_SMOKE

registry.load_all_modules()


def test_robust_stats_approx_tracks_exact(spark):
    """The t-digest form must stay within 1% of the exact two-pass
    MAD/median (its correctness anchor); the weighted mean is identical
    algebra on both paths, so it matches to float tolerance."""
    exact = (
        registry.QUERIES["q_agg_robust_stats"](spark, SF_SMOKE)
        .toPandas()
        .set_index("return_flag")
    )
    approx = (
        registry.QUERIES["q_agg_robust_stats_approx"](spark, SF_SMOKE)
        .toPandas()
        .set_index("return_flag")
    )
    assert sorted(exact.index) == sorted(approx.index)
    for flag in exact.index:
        e, a = exact.loc[flag], approx.loc[flag]
        assert a["weighted_mean_price"] == pytest.approx(
            e["weighted_mean_price"], rel=1e-9
        )
        # since the r7 contract-oracle conversion the approx query
        # carries the exact anchors itself plus within-tol flags
        assert a["exact_median_price"] == pytest.approx(
            e["median_price"], rel=1e-9
        )
        assert a["exact_mad_price"] == pytest.approx(e["mad_price"], rel=1e-9)
        assert a["median_within_tol"] == 1
        assert a["mad_within_tol"] == 1


def test_histogram_equiwidth_constant_column(spark, tmp_path):
    """hi == lo (constant column) must land every row in bin 0, not a
    NaN-keyed group (the bin expression would otherwise divide 0/0)."""
    pd.DataFrame({"l_extendedprice": [42.5] * 100}).to_parquet(
        os.path.join(tmp_path, "lineitem.parquet")
    )
    out = (
        registry.QUERIES["q_histogram_equiwidth"](spark, str(tmp_path))
        .toPandas()
        .set_index("bin")
    )
    assert list(out.index) == [0]
    assert out.loc[0, "n"] == 100
    assert out.loc[0, "bin_lo"] == out.loc[0, "bin_hi"] == 42.5


# ---------------------------------------------------------------------------
# JSONPaths file parsing (reference COPY contract, sql_queries.py:102-107)
# ---------------------------------------------------------------------------


def test_jsonpaths_positional_mapping(tmp_path):
    import json

    from sparkifydb_datawarehouse_spark.sources.json_mapped import (
        mapping_from_jsonpaths,
    )

    p = tmp_path / "paths.json"
    p.write_text(json.dumps({"jsonpaths": ["$['firstName']", "$.ts", '$["userId"]']}))
    # names are ignored; position against the DDL column list decides
    assert mapping_from_jsonpaths(str(p), ["first_name", "ts", "user_id"]) == {
        "firstName": "first_name",
        "ts": "ts",
        "userId": "user_id",
    }

    with pytest.raises(ValueError, match="positional mapping"):
        mapping_from_jsonpaths(str(p), ["only", "two"])

    p.write_text(json.dumps({"jsonpaths": ["$['a']['nested']"]}))
    with pytest.raises(ValueError, match="unsupported jsonpath"):
        mapping_from_jsonpaths(str(p), ["a"])

    p.write_text(json.dumps({"not_jsonpaths": []}))
    with pytest.raises(ValueError, match="jsonpaths"):
        mapping_from_jsonpaths(str(p), [])


def test_sparkify_jsonpaths_file_round_trips_to_known_mapping():
    """The generated log_json_path.json parsed against the DDL column
    order must reproduce the literal camelCase->snake_case mapping the
    pipeline has always used (so the staging_events oracle is
    unaffected by the file indirection)."""
    from sparkifydb_datawarehouse_spark.pipelines import sparkify
    from sparkifydb_datawarehouse_spark.sources.json_mapped import (
        mapping_from_jsonpaths,
    )

    sparkify.ensure_fixtures()
    parsed = mapping_from_jsonpaths(
        sparkify.JSONPATHS_FILE, sparkify.EVENTS_STAGING_COLUMNS
    )
    assert parsed == sparkify.EVENTS_MAPPING


# ---------------------------------------------------------------------------
# Object-store ingestion seam (the COPY-from-S3 analog)
# ---------------------------------------------------------------------------


def test_object_store_profile_shape():
    """The S3A profile must carry the three things the COPY analog
    needs: a credentials CHAIN (IAM_ROLE analog, no secrets), a
    rename-free committer (S3 has no atomic rename), and ranged-read
    fadvise for parquet."""
    from sparkifydb_datawarehouse_spark.session import object_store_profile

    p = object_store_profile()
    assert "credentials.provider" in "".join(p)
    assert p["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert p["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"
    # every key is spark conf syntax; values are strings (builder contract)
    assert all(k.startswith("spark.") and isinstance(v, str) for k, v in p.items())


def test_scheme_qualified_paths_flow_through_loader(spark):
    """file://-scheme URIs resolve through the same Hadoop FileSystem
    machinery as s3a:// — proving sf_dir can be an object-store URI
    with no loader changes."""
    from sparkifydb_datawarehouse_spark.tables import load_table

    local = load_table(spark, SF_SMOKE, "region").collect()
    via_uri = load_table(spark, f"file://{SF_SMOKE}", "region").collect()
    assert sorted(map(tuple, local)) == sorted(map(tuple, via_uri))


def test_varchar_clamp_matches_redshift_truncation(spark, tmp_path):
    """The opt-in VARCHAR(n) clamp must truncate exactly at the DDL
    cap and leave within-cap values (and the default path) untouched."""
    import json

    from pyspark.sql.types import StringType, StructField, StructType

    from sparkifydb_datawarehouse_spark.sources.json_mapped import read_json_mapped

    f = tmp_path / "rows.json"
    f.write_text(
        json.dumps({"firstName": "A" * 50, "level": "free"}) + "\n"
        + json.dumps({"firstName": "Bo", "level": "paid-tier-xx"}) + "\n"
    )
    schema = StructType(
        [StructField("firstName", StringType()), StructField("level", StringType())]
    )
    mapping = {"firstName": "first_name", "level": "level"}
    caps = {"first_name": 30, "level": 10}

    clamped = read_json_mapped(
        spark, str(f), schema, mapping=mapping, varchar_caps=caps
    ).collect()
    got = {r["first_name"]: r["level"] for r in clamped}
    assert "A" * 30 in got and got["A" * 30] == "free"
    assert got["Bo"] == "paid-tier-"  # 10-char cap

    plain = read_json_mapped(spark, str(f), schema, mapping=mapping).collect()
    assert {r["first_name"] for r in plain} == {"A" * 50, "Bo"}


def test_sparkify_clamp_is_noop_on_fixture_corpus(spark):
    """Fixture values all fit the DDL caps, so the clamped and default
    staging loads must be identical — clamp parity with a Redshift
    load that succeeds without TRUNCATECOLUMNS."""
    from sparkifydb_datawarehouse_spark.pipelines.sparkify import load_staging_events

    a = load_staging_events(spark).orderBy("ts", "session_id", "item_in_session")
    b = load_staging_events(spark, clamp_varchar=True).orderBy(
        "ts", "session_id", "item_in_session"
    )
    assert a.collect() == b.collect()


# ---------------------------------------------------------------------------
# Invariants for the round-3 helpers
# ---------------------------------------------------------------------------


def test_canonical_url_is_idempotent_and_variant_insensitive(spark):
    """canonical(canonical(u)) == canonical(u), and every synthesized
    variant family (tracking params, case, trailing slash + fragment)
    maps to the plain form's canonical."""
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark.llm.dedup import canonical_url

    base = "https://srcx.example.com/en/item/7"
    variants = [
        base,
        base + "?utm_source=news&ref=tw&page=2",
        "HTTPS://SRCX.EXAMPLE.COM/en/item/7",
        base + "/#section",
        base + "?page=2&utm_campaign=x&fbclid=abc",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("c1"),
    ).withColumn("c2", canonical_url(F.col("c1")))
    rows = out.collect()
    # idempotent
    assert all(r["c1"] == r["c2"] for r in rows), rows
    # variant-insensitive up to kept real params
    canons = {r["c1"] for r in rows}
    assert canons == {base, base + "?page=2"}, canons


def test_ewma_stays_within_window_bounds(spark, sf_dir):
    """EWMA is a convex combination of the frame's values, so it must
    lie within [min, max] of the trailing window for every row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark import registry
    from sparkifydb_datawarehouse_spark.tables import load_table

    ewma = registry.QUERIES["q_ts_ewma"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    bounds = ev.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    joined = ewma.join(bounds, "event_id")
    bad = joined.filter(
        (F.col("ewma_value") < F.col("lo") - 1e-9)
        | (F.col("ewma_value") > F.col("hi") + 1e-9)
    ).count()
    assert bad == 0


def test_weighted_median_reduces_to_lower_median_under_unit_weights(spark):
    """With all weights equal, the cumulative-crossing definition picks
    the lower median — verify on a hand-computed frame."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0), ("b", 5.0), ("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double").withColumn("w", F.lit(1.0))
    w_cum = Window.partitionBy("g").orderBy("v")
    cum = df.select(
        "g", "v",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(Window.partitionBy("g")).alias("totw"),
    )
    got = {
        r["g"]: r["m"]
        for r in cum.filter(F.col("cumw") >= F.col("totw") / 2)
        .groupBy("g")
        .agg(F.min("v").alias("m"))
        .collect()
    }
    # even count -> lower median; odd count -> true median
    assert got == {"a": 20.0, "b": 7.0}


def test_chunking_covers_every_token_exactly_once_per_stride_window(spark, sf_dir):
    """Chunk accounting: per doc, the union of [start, start+n_tokens)
    intervals must cover [0, n) with overlap exactly CHUNK-STRIDE
    between consecutive chunks (except possibly the last)."""
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark import registry
    from sparkifydb_datawarehouse_spark.llm.chunking import CHUNK_TOKENS, STRIDE

    chunks = registry.QUERIES["q_text_chunking"](spark, sf_dir).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        for i, r in enumerate(rs):
            start = i * STRIDE
            assert r["n_tokens"] >= 1
            if i < len(rs) - 1:
                assert r["n_tokens"] == CHUNK_TOKENS
        # last chunk must reach the end and contribute new tokens
        last = rs[-1]
        assert last["n_tokens"] >= 1


def test_scan_binaryfile_magic_and_catalog(spark):
    """binaryFile scan: every fixture file surfaces with the parquet
    magic and the listing covers the whole catalog — raw frame plus
    the r9 contract form."""
    from sparkifydb_datawarehouse_spark.sources.binaryfile_source import (
        scan_binaryfile_frame,
    )
    from sparkifydb_datawarehouse_spark.tables import TABLE_NAMES

    raw = scan_binaryfile_frame(spark, SF_SMOKE).collect()
    names = {r.file_name for r in raw}
    assert names == {f"{t}.parquet" for t in TABLE_NAMES}
    for r in raw:
        assert r.magic_hex == "50415231", r  # b"PAR1"
        assert r.n_bytes > 0
    rows = registry.QUERIES["q_scan_binaryfile"](spark, SF_SMOKE).collect()
    assert [r.file_name for r in rows] == sorted(names)
    assert all(r.magic_hex == "50415231" and r.plausible_size == 1 for r in rows)


def test_file_census_matches_duckdb(spark):
    """q_file_census (rows-only in the registry: its oracle needs a
    dynamic path) value-checked here against DuckDB's
    read_parquet(filename=true) at the same sf_dir."""
    import duckdb

    got = {
        r.file_name: r.n_rows
        for r in registry.QUERIES["q_file_census"](spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""SELECT regexp_extract(filename, '([^/]+)$', 1), COUNT(*)
                FROM read_parquet('{SF_SMOKE}/lineitem.parquet', filename=true)
                GROUP BY 1"""
        ).fetchall()
    )
    assert got == {k: int(v) for k, v in want.items()}
