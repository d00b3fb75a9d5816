"""Avro Object Container File source (B1, round 11) — a pure-Python
reader/writer for the Apache Avro 1.x OCF format (public spec,
avro.apache.org: magic ``Obj\\x01``, metadata map with the JSON schema
and codec, 16-byte sync marker, length-prefixed data blocks).

Avro is THE row-oriented interchange format of the Hadoop/Kafka
estate; Spark's own reader lives in the external spark-avro package,
which is not installed here — so this connector implements the
container + binary encoding natively (zigzag-varint ints/longs,
length-prefixed strings/bytes, little-endian IEEE doubles, 1-byte
booleans, union-index-prefixed nullable fields; ``null`` and
``deflate`` — raw RFC-1951 — block codecs) and exposes it through the
same posture as the XML connector next door: Avro is an INGEST
format — a one-pass distributed parse into columnar storage, after
which you land Parquet and never scan the Avro again.

Scale shape: the WRITE side (fixture materialization) encodes per
partition with mapInPandas — each task emits one self-contained OCF
blob (own header + sync), the natural unit an Avro estate arrives in.
The READ side is the 100 TB direction: ``binaryFile`` scan over the
``.avro`` files → per-file decode in mapInPandas → typed rows; files
are the parallelism unit exactly as in a real multi-file estate, and
only typed columns leave the decoder."""

from __future__ import annotations

import hashlib
import json
import os
import struct
import tempfile
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .layout import _source_fingerprint

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic fixture sync marker


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _write_long(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(data):
            raise AvroError("varint ran off the end of the block")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise AvroError("varint longer than 64 bits")
    val = (acc >> 1) ^ -(acc & 1)  # un-zigzag
    return val, pos


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf += b


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise AvroError("bytes length out of range")
    return data[pos : pos + n], pos + n


def _encode_value(buf: bytearray, val, typ: str) -> None:
    if val is None:
        raise AvroError(f"null value for non-nullable {typ}")
    if typ in ("long", "int"):
        _write_long(buf, int(val))
    elif typ == "string":
        _write_bytes(buf, str(val).encode("utf-8"))
    elif typ == "bytes":
        _write_bytes(buf, bytes(val))
    elif typ == "double":
        buf += struct.pack("<d", float(val))
    elif typ == "boolean":
        buf.append(1 if val else 0)
    else:
        raise AvroError(f"unsupported avro type {typ}")


def _decode_value(data: bytes, pos: int, typ: str):
    if typ in ("long", "int"):
        return _read_long(data, pos)
    if typ == "string":
        raw, pos = _read_bytes(data, pos)
        return raw.decode("utf-8"), pos
    if typ == "bytes":
        return _read_bytes(data, pos)
    if typ == "double":
        if pos + 8 > len(data):
            raise AvroError("double ran off the end of the block")
        return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
    if typ == "boolean":
        if pos >= len(data):
            raise AvroError("boolean ran off the end of the block")
        return bool(data[pos]), pos + 1
    raise AvroError(f"unsupported avro type {typ}")


# fields: list of (name, primitive_type, nullable)


def _record_schema_json(name: str, fields) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": fn, "type": ["null", ft] if nullable else ft}
                for fn, ft, nullable in fields
            ],
        }
    )


def _parse_schema(schema_json: str):
    try:
        sch = json.loads(schema_json)
    except json.JSONDecodeError as e:
        raise AvroError(f"bad schema JSON: {e}") from e
    if sch.get("type") != "record":
        raise AvroError("only record schemas are supported")
    fields = []
    for f in sch.get("fields", []):
        t = f["type"]
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(t) != 2 or "null" not in t or len(branches) != 1:
                raise AvroError(f"unsupported union {t}")
            fields.append((f["name"], branches[0], True))
        else:
            fields.append((f["name"], t, False))
    return sch.get("name", "record"), fields


def encode_ocf(
    records,
    fields,
    name: str = "row",
    codec: str = "null",
    block_rows: int = 1000,
    sync: bytes = _SYNC,
) -> bytes:
    """Serialize dict records into one self-contained OCF blob."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec}")
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": _record_schema_json(name, fields).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # end of metadata map
    out += sync
    for start in range(0, len(records), block_rows):
        chunk = records[start : start + block_rows]
        body = bytearray()
        for rec in chunk:
            for fn, ft, nullable in fields:
                val = rec.get(fn)
                if nullable:
                    if val is None:
                        _write_long(body, 0)  # union branch: null
                        continue
                    _write_long(body, 1)
                _encode_value(body, val, ft)
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, len(chunk))
        _write_bytes(out, payload)
        out += sync
    return bytes(out)


def decode_ocf(blob: bytes):
    """Parse one OCF blob → (field specs, list of dict records)."""
    if blob[:4] != _MAGIC:
        raise AvroError("not an Avro OCF (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(blob, pos)
        if n == 0:
            break
        if n < 0:  # negative count: a byte size precedes the entries
            _, pos = _read_long(blob, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(blob, pos)
            v, pos = _read_bytes(blob, pos)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise AvroError("OCF missing avro.schema")
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec}")
    _, fields = _parse_schema(meta["avro.schema"].decode())
    sync = blob[pos : pos + 16]
    pos += 16
    records = []
    while pos < len(blob):
        n_rows, pos = _read_long(blob, pos)
        payload, pos = _read_bytes(blob, pos)
        if blob[pos : pos + 16] != sync:
            raise AvroError("sync marker mismatch (corrupt block boundary)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        bp = 0
        for _ in range(n_rows):
            rec = {}
            for fn, ft, nullable in fields:
                if nullable:
                    branch, bp = _read_long(payload, bp)
                    if branch == 0:
                        rec[fn] = None
                        continue
                    if branch != 1:
                        raise AvroError(f"bad union branch {branch}")
                rec[fn], bp = _decode_value(payload, bp, ft)
            records.append(rec)
        if bp != len(payload):
            raise AvroError("block decoded short/long of its payload")
    return fields, records


# ---------------------------------------------------------------------------
# the connector query: supplier → distributed per-partition OCF blobs
# (deflate/null alternating) → binaryFile scan + per-file decode
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def supplier_avro_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the supplier table as a multi-file .avro estate
    (one OCF per partition, codec alternating null/deflate), cached by
    source fingerprint (the ADVICE-r4 cache rule)."""
    fp = _source_fingerprint(sf_dir, "supplier")
    tag = hashlib.md5(f"{sf_dir}|{fp}|avro".encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"sparkifydb_avro_{tag}")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        df = load_table(spark, sf_dir, "supplier").repartition(4, "s_suppkey")
        fields = [
            (f.name, _SPARK_TO_AVRO[f.dataType.simpleString()], True)
            for f in df.schema.fields
        ]

        def to_ocf(batches):
            import pandas as pd

            rows = []
            for pdf in batches:
                rows.extend(pdf.to_dict("records"))
            codec = "deflate" if (rows and rows[0]["s_suppkey"] % 2) else "null"
            blob = encode_ocf(rows, fields, name="supplier", codec=codec)
            yield pd.DataFrame({"blob": [blob]})

        from pyspark.sql.types import BinaryType, StructField, StructType

        blobs = df.mapInPandas(
            to_ocf, StructType([StructField("blob", BinaryType())])
        ).collect()
        for i, r in enumerate(blobs):
            with open(os.path.join(d, f"part-{i:04d}.avro"), "wb") as fh:
                fh.write(bytes(r["blob"]))
        open(marker, "w").close()
    return d


_ORACLE_AVRO = """
SELECT s_suppkey, s_name, s_nationkey, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_nationkey >= 13
ORDER BY s_suppkey
"""


@query("q_scan_avro", oracle=_ORACLE_AVRO)
def scan_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed roundtrip of the supplier table through a multi-file Avro
    OCF estate: distributed per-file decode (binaryFile scan →
    mapInPandas over the pure-Python OCF reader — files are the
    parallelism unit, exactly a real Avro estate's shape), value-
    checked against the original parquet. deflate and null block
    codecs both on the read path (alternating per file)."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    d = supplier_avro_dir(spark, sf_dir)
    out_schema = StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", LongType()),
            StructField("acctbal", DoubleType()),
        ]
    )

    def decode_files(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                _, recs = decode_ocf(bytes(content))
                for r in recs:
                    rows.append(
                        (
                            r["s_suppkey"],
                            r["s_name"],
                            r["s_nationkey"],
                            r["s_acctbal"],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(d)
        .select("content")
    )
    return (
        files.mapInPandas(decode_files, out_schema)
        .filter(F.col("s_nationkey") >= 13)
        # round SPARK-side so the HALF_UP semantics match the oracle's
        # ROUND (python's round() is banker's and would diverge)
        .withColumn("acctbal", F.round("acctbal", 2))
        .orderBy("s_suppkey")
    )
