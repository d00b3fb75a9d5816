"""Pure-Python Avro OCF codec tests (round 11): zigzag/varint
primitives, nullable unions, both block codecs, multi-block streams,
schema-driven decode of a hand-built stream, and error paths."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkifydb_datawarehouse_spark.sources.avro_source import (
    AvroError,
    _read_long,
    _write_long,
    decode_ocf,
    encode_ocf,
)

FIELDS = [
    ("id", "long", False),
    ("name", "string", True),
    ("score", "double", True),
    ("flag", "boolean", False),
    ("payload", "bytes", True),
]


def _mk(i):
    return {
        "id": i,
        "name": None if i % 5 == 0 else f"n{i}",
        "score": None if i % 7 == 0 else i * 0.5,
        "flag": i % 2 == 0,
        "payload": None if i % 3 == 0 else bytes((i % 256, (2 * i) % 256)),
    }


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_varint_roundtrip(n):
    buf = bytearray()
    _write_long(buf, n)
    val, pos = _read_long(bytes(buf), 0)
    assert val == n and pos == len(buf)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_with_nulls_and_blocks(codec):
    recs = [_mk(i) for i in range(250)]
    blob = encode_ocf(recs, FIELDS, codec=codec, block_rows=64)  # 4 blocks
    fields, out = decode_ocf(blob)
    assert fields == [tuple(f) for f in FIELDS]
    assert out == recs


def test_hand_built_single_record_stream():
    # encode one record by hand and let the schema-driven reader parse
    # it — independence from the writer
    import json

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
            ],
        }
    ).encode()
    meta = bytearray()
    _write_long(meta, 2)
    for k, v in (("avro.codec", b"null"), ("avro.schema", schema)):
        _write_long(meta, len(k))
        meta += k.encode()
        _write_long(meta, len(v))
        meta += v
    _write_long(meta, 0)
    sync = b"S" * 16
    body = bytearray()
    _write_long(body, -3)  # zigzag long
    _write_long(body, 1)  # union branch 1 = string
    _write_long(body, 2)
    body += b"hi"
    block = bytearray()
    _write_long(block, 1)  # one record
    _write_long(block, len(body))
    block += body
    blob = b"Obj\x01" + bytes(meta) + sync + bytes(block) + sync
    fields, out = decode_ocf(blob)
    assert out == [{"a": -3, "b": "hi"}]


def test_error_paths():
    recs = [_mk(1)]
    good = encode_ocf(recs, FIELDS)
    with pytest.raises(AvroError, match="magic"):
        decode_ocf(b"Nope" + good[4:])
    with pytest.raises(AvroError, match="sync marker"):
        decode_ocf(good[:-1] + b"X")
    with pytest.raises(AvroError, match="codec"):
        encode_ocf(recs, FIELDS, codec="snappy")
    from sparkifydb_datawarehouse_spark.sources.avro_source import _parse_schema

    with pytest.raises(AvroError, match="union"):
        _parse_schema(
            '{"type": "record", "name": "r", "fields":'
            ' [{"name": "a", "type": ["null", "string", "long"]}]}'
        )
    with pytest.raises(AvroError, match="record"):
        _parse_schema('{"type": "enum", "name": "e"}')


def test_scan_avro_typed_roundtrip(spark, sf_dir):
    from sparkifydb_datawarehouse_spark.sources.avro_source import scan_avro
    from sparkifydb_datawarehouse_spark.tables import load_table
    from pyspark.sql import functions as F

    got = scan_avro(spark, sf_dir)
    exp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 13)
        .select(
            "s_suppkey",
            "s_name",
            F.col("s_nationkey").cast("long").alias("s_nationkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
