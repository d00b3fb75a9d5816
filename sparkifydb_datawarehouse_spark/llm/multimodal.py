"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched Pandas functions.

The container has no image/audio codecs (SURVEY/task brief), so the
DECODE step is stubbed two ways:
- a deterministic fake media container ("FAKE" magic + width/height
  header + payload bytes) generated Spark-side from `documents`, so
  the whole pipeline — binary column construction, metadata struct,
  mapInPandas schema/batching, feature extraction — is real and
  tested end to end;
- `decode_image` raises NotImplementedError with a clear message and
  gates on an import-try of PIL, marking exactly where a real codec
  plugs in.

Scale notes:
- Binary payloads ride in Arrow record batches
  (spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory —
  for multi-MB media, lower it or use binaryFile source splitting).
- mapInPandas streams batch-iterators: peak memory is one batch per
  core, not one partition — required for 100 TB of media.
- Feature extraction emits small fixed-width rows (the features),
  never re-emits payload bytes — downstream shuffles carry features
  only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..tables import load_table

_MAGIC = b"FAKE"


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary media column from document text:
    [4-byte magic][2-byte width][2-byte height][utf-8 payload],
    plus a typed metadata struct — the schema shape a real media
    table would have (payload opaque, metadata queryable)."""
    width = (F.col("doc_id") % 64 + 1).cast("int")
    height = (F.col("doc_id") % 48 + 1).cast("int")
    header_hex = F.concat(
        F.lit(_MAGIC.hex().upper()),
        F.lpad(F.hex(width), 4, "0"),
        F.lpad(F.hex(height), 4, "0"),
    )
    media = F.concat(F.to_binary(header_hex, F.lit("hex")), F.encode("text", "utf-8"))
    meta = F.struct(
        F.lit("image/fake").alias("kind"),
        F.length(media).cast("long").alias("n_bytes"),
        width.alias("width"),
        height.alias("height"),
    )
    return docs.select("doc_id", media.alias("media"), meta.alias("media_meta"))


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("magic_ok", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload_checksum", LongType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch feature extraction — the deterministic stand-in for
    image decode + stats. Pure Python over Arrow batches; emits
    fixed-width features, drops payloads."""
    for pdf in batches:
        out = []
        for doc_id, media, meta in zip(pdf["doc_id"], pdf["media"], pdf["media_meta"]):
            blob = bytes(media)
            magic_ok = int(blob[:4] == _MAGIC)
            width = int.from_bytes(blob[4:6], "big") if magic_ok else -1
            height = int.from_bytes(blob[6:8], "big") if magic_ok else -1
            payload = blob[8:] if magic_ok else blob
            out.append(
                (
                    int(doc_id),
                    meta["kind"],
                    len(blob),
                    magic_ok,
                    width,
                    height,
                    sum(payload) % (1 << 31),
                )
            )
        yield pd.DataFrame(out, columns=[f.name for f in _FEATURE_SCHEMA.fields])


@query("q_multimodal_features")  # rows-only: binary plumbing, no SQL analog
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → fake media binary column → Arrow-batched feature
    extraction via mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    return (
        media.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
        .orderBy("doc_id")
    )


def decode_image(blob: bytes):  # pragma: no cover - codec gate
    """Decode a real image payload. The container ships no codecs;
    this is the marked plug-point for PIL/libvips in production."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires an image codec (e.g. Pillow), "
            "which is not available in this environment; use the "
            "deterministic fake-media path (attach_fake_media + "
            "multimodal_features) for pipeline testing"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(blob))
