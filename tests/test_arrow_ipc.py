"""Arrow IPC / Feather V2 connector tests (round 12): two-phase sink
protocol, per-partition codec rotation, dictionary-encoding contract,
and the typed roundtrip against the source parquet."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark.sources import arrow_ipc
from sparkifydb_datawarehouse_spark.tables import load_table


def test_arrow_dir_sink_two_phase_commit(spark, sf_dir, tmp_path):
    arrow_ipc.register_sink(spark)
    out = str(tmp_path / "arrow_out")
    df = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    (
        df.repartition(4, "s_suppkey")
        .write.format("arrow_ipc_dir")
        .option("path", out)
        .option("alternate_col", "s_suppkey")
        .option("dictionary_cols", "s_name")
        .mode("append")
        .save()
    )
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part-") and f.endswith(".arrow")]
    assert 2 <= len(parts) <= 4
    assert not [f for f in files if f.startswith("_tmp_")], "uncommitted temps"
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest == {"n_files": len(parts), "n_rows": df.count()}

    import pyarrow as pa
    import pyarrow.ipc as ipc

    total = 0
    seen_codecs = set()
    for p in parts:
        blob = open(os.path.join(out, p), "rb").read()
        assert blob[:6] == b"ARROW1" and blob.rstrip(b"\x00").endswith(b"ARROW1")
        reader = ipc.open_file(pa.BufferReader(blob))
        t = reader.read_all()
        assert pa.types.is_dictionary(t.column("s_name").type)
        total += t.num_rows
        # infer the rotation from the file: compressed bodies differ,
        # but the codec is recoverable from the estate contract — min
        # key parity mod 3 — so just check values roundtrip exactly
        keys = t.column("s_suppkey").to_pylist()
        seen_codecs.add(min(keys) % 3)
    assert total == df.count()
    assert len(seen_codecs) >= 2, "codec rotation never alternated"


def test_scan_arrow_ipc_matches_parquet(spark, sf_dir):
    got = arrow_ipc.scan_arrow_ipc(spark, sf_dir)
    exp = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_returnflag",
            "l_shipdate",
        )
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_dictionary_contract_refuses_plain_estate(spark, tmp_path, monkeypatch):
    # a plain (non-dictionary) l_returnflag column must refuse loudly
    # THROUGH the registered query's decode path
    import datetime

    import pyarrow as pa
    import pyarrow.ipc as ipc

    d = tmp_path / "plain_estate"
    d.mkdir()
    (d / "_SUCCESS").write_text("{}")
    t = pa.table(
        {
            "l_orderkey": pa.array([1], pa.int64()),
            "l_linenumber": pa.array([1], pa.int32()),
            "l_quantity": pa.array([50.0], pa.float64()),
            "l_returnflag": pa.array(["A"], pa.string()),  # NOT dict-encoded
            "l_shipdate": pa.array(
                [datetime.datetime(1995, 1, 1)], pa.timestamp("us")
            ),
        }
    )
    with ipc.new_file(str(d / "part-00000.arrow"), t.schema) as w:
        w.write_table(t)
    monkeypatch.setattr(arrow_ipc, "lineitem_arrow_dir", lambda *_: str(d))
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="dictionary"):
        arrow_ipc.scan_arrow_ipc(spark, "ignored").collect()


def test_stream_format_estate_and_framing(spark, sf_dir, tmp_path):
    # stream files: no ARROW1 magic, open_stream reads them,
    # open_file refuses them
    import pyarrow as pa
    import pyarrow.ipc as ipc

    arrow_ipc.register_sink(spark)
    out = str(tmp_path / "arrows_out")
    df = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    (
        df.repartition(2, "s_suppkey")
        .write.format("arrow_ipc_dir")
        .option("path", out)
        .option("ipc_format", "stream")
        .option("dictionary_cols", "s_name")
        .mode("append")
        .save()
    )
    parts = [f for f in sorted(os.listdir(out)) if f.endswith(".arrows")]
    assert parts, "no stream files written"
    total = 0
    for p in parts:
        blob = open(os.path.join(out, p), "rb").read()
        assert blob[:6] != b"ARROW1"
        t = ipc.open_stream(pa.BufferReader(blob)).read_all()
        assert pa.types.is_dictionary(t.column("s_name").type)
        total += t.num_rows
        with pytest.raises(pa.ArrowInvalid):
            ipc.open_file(pa.BufferReader(blob))
    assert total == df.count()


def test_scan_arrow_stream_matches_parquet(spark, sf_dir):
    got = arrow_ipc.scan_arrow_stream(spark, sf_dir)
    exp = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 5)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.min("l_orderkey").alias("first_order"),
        )
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_sink_declared_schema_survives_all_null_partitions(spark, tmp_path):
    # ADVICE r12 #4: a partition whose column is entirely null must
    # still write the DECLARED type, not an inferred null type —
    # otherwise the estate's files disagree on schema and the read
    # side fails. Partition by group so one partition is all-null.
    arrow_ipc.register_sink(spark)
    out = str(tmp_path / "arrow_nulls")
    df = spark.createDataFrame(
        [(1, "g0", "x"), (2, "g0", "y"), (3, "g1", None), (4, "g1", None)],
        "k long, g string, payload string",
    )
    (
        df.repartition(2, "g")
        .write.format("arrow_ipc_dir")
        .option("path", out)
        .mode("append")
        .save()
    )
    import pyarrow as pa
    import pyarrow.ipc as ipc

    schemas = set()
    for p in sorted(os.listdir(out)):
        if not p.endswith(".arrow"):
            continue
        t = ipc.open_file(os.path.join(out, p)).read_all()
        schemas.add(str(t.schema))
        assert pa.types.is_string(t.column("payload").type)
    assert len(schemas) == 1, f"schema skew across estate files: {schemas}"
