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
