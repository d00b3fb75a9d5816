"""ISO-week / day-of-week boundary semantics (SURVEY §7 sharp edge):
Dec 29 - Jan 3 is where engines disagree on weekofyear, and dow has a
known off-by-one (Redshift/DuckDB 0=Sun..6 vs Spark dayofweek
1=Sun..7). The engine's shims must match DuckDB on exactly these
dates."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

# years chosen so every ISO edge case appears: Jan 1 landing in week
# 52, 53, and 1; Dec 31 landing in week 52, 53, and 1
_DATES = [
    "2019-12-29", "2019-12-30", "2019-12-31",  # 2020 starts midweek
    "2020-01-01", "2020-01-02", "2020-01-03",
    "2020-12-31", "2021-01-01",                # week 53 year
    "2021-12-31", "2022-01-01", "2022-01-03",
    "2015-12-28", "2016-01-04",                # 53-week ISO year 2015
    "2024-02-29",                              # leap day
]


def test_weekofyear_and_dow_match_duckdb_on_boundaries(spark):
    df = spark.createDataFrame([(d,) for d in _DATES], "d string").select(
        F.to_timestamp("d").alias("ts")
    )
    got = {
        str(r["ts"].date()): (r["week"], r["dow"])
        for r in df.select(
            "ts",
            F.weekofyear("ts").alias("week"),
            (F.dayofweek("ts") - 1).alias("dow"),  # the A14 shim
        ).collect()
    }
    con = duckdb.connect()
    for d in _DATES:
        wk, dow = con.execute(
            f"SELECT CAST(weekofyear(TIMESTAMP '{d}') AS INT),"
            f" CAST(dayofweek(TIMESTAMP '{d}') AS INT)"
        ).fetchone()
        assert got[d] == (wk, dow), f"{d}: spark {got[d]} vs duckdb {(wk, dow)}"
