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
        assert a["median_price"] == pytest.approx(e["median_price"], rel=0.01)
        assert a["mad_price"] == pytest.approx(e["mad_price"], rel=0.01)


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
