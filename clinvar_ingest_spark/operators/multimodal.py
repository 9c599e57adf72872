"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this
container): :func:`decode_image_stub` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake
feature so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and testable. Swap ``_decode_bytes`` for a real
decoder (PIL/libsndfile/pyav) in production; nothing else changes.

Reference analogue: the binary `fileref` payload column
(schema/src/main/jade-tables/xml_archive.table.json:11-14) and the
external heavy-decode step (process-xml-release.yaml:70-90).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),  # JSON metadata
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("checksum64", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_bytes(payload: bytes, kind: str, fake: bool) -> list[float]:
    """STUB decode: replace with a real decoder in production."""
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/soundfile/pyav — not available in "
            "this container; pass fake=True for the deterministic stub"
        )
    # deterministic fake 'embedding': 4 moments of the byte histogram
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(payload))
    s = float(sum(payload))
    mean = s / n
    var = float(sum((b - mean) ** 2 for b in payload[:256])) / min(n, 256.0)
    return [n, mean, var, float(payload[0])]


def extract_media_features(
    df: DataFrame, fake: bool = True, batch_size_hint: int = 256
) -> DataFrame:
    """mapInPandas over (media_id, kind, payload, meta) → FEATURE_SCHEMA.

    Arrow streams binary batches; per-batch work is vectorized where the
    container allows. Partitioning is preserved (narrow transform) — at
    scale, repartition upstream by size, not count, so batches of large
    videos don't OOM a worker (spark.sql.files.maxPartitionBytes analog
    for in-flight media is the caller's repartition policy).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if b else -1
                    ).astype("int32"),
                    "checksum64": payloads.map(_fnv64),
                    "feature": [
                        _decode_bytes(b, k, fake)
                        for b, k in zip(payloads, pdf["kind"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fnv64(b: bytes | None) -> int:
    if b is None:
        return 0
    h = 0xCBF29CE484222325
    for ch in b:
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - 2**63  # signed long


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat a text corpus as binary media rows (test harness)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.to_json(F.struct(F.col(id_col))).alias("meta"),
    )
