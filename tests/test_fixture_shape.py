"""ADVICE r9 closures for the binaryFile scan family.

1. ``q_scan_binaryfile``'s VALUES oracle hardcodes the driver
   fixtures' one-plain-file-per-table layout; assert that layout here
   so a future multi-part fixture fails loudly in CI rather than at
   driver time.
2. ``q_file_census`` empty-input PARITY (not just no-crash): the
   HAVING-gated oracle must emit zero rows exactly when the Spark
   groupBy over a zero-row scan does.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.tables import TABLE_NAMES

registry.load_all_modules()

_FIXTURE_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", _FIXTURE_DIRS)
def test_fixture_layout_one_plain_file_per_table(sf_dir):
    # the q_scan_binaryfile oracle is a VALUES table of exactly the ten
    # catalog names — valid only while each table is ONE plain file and
    # the directory holds nothing else matching *.parquet
    entries = sorted(e for e in os.listdir(sf_dir) if e.endswith(".parquet"))
    assert entries == sorted(f"{t}.parquet" for t in TABLE_NAMES), (
        f"{sf_dir} layout drifted — q_scan_binaryfile's VALUES oracle "
        "assumes exactly one plain <table>.parquet per catalog table"
    )
    for e in entries:
        assert os.path.isfile(os.path.join(sf_dir, e)), (
            f"{sf_dir}/{e} is not a plain file — multi-part table breaks "
            "the binaryFile listing oracle"
        )


def test_file_census_empty_input_parity(spark, tmp_path):
    empty = tmp_path / "lineitem.parquet"
    (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .limit(0)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(empty))
    )
    spark_rows = registry.QUERIES["q_file_census"](spark, str(tmp_path)).count()
    with duckdb.connect() as con:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{empty}/*.parquet')"
        )
        oracle_rows = len(con.sql(registry.ORACLE["q_file_census"]).df())
    assert spark_rows == oracle_rows == 0
