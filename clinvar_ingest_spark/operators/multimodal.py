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

import numpy as np
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


def _real_decoder():
    """Optional real decoder (PIL for images), import-gated: absent in
    this container, so callers use the deterministic stub. Swapping in
    a real library changes NOTHING else — schema, batching, and
    partitioning are identical."""
    try:  # pragma: no cover - library not in container
        from PIL import Image  # noqa: F401

        import io

        def decode(payload: bytes, kind: str) -> list[float]:
            if kind != "image" or not payload:
                return [0.0, 0.0, 0.0, 0.0]
            img = Image.open(io.BytesIO(payload))
            import numpy as _np

            arr = _np.asarray(img, dtype=_np.float64)
            return [
                float(img.width),
                float(img.height),
                float(arr.mean()),
                float(arr.var()),
            ]

        return decode
    except ImportError:
        return None


def _decode_batch(payloads: pd.Series, kinds: pd.Series, fake: bool) -> list[list[float]]:
    """Numpy-vectorized deterministic stub 'embedding': 4 moments of the
    byte stream — or the real decoder when its library is installed."""
    if not fake:
        real = _real_decoder()
        if real is None:
            raise NotImplementedError(
                "media decode requires PIL/soundfile/pyav — not available "
                "in this container; pass fake=True for the deterministic "
                "stub (same schema/batching, fake feature values)"
            )
        return [real(b, k) for b, k in zip(payloads, kinds)]
    out = []
    for b in payloads:
        if b is None or len(b) == 0:
            out.append([0.0, 0.0, 0.0, 0.0])
            continue
        a = np.frombuffer(b, dtype=np.uint8)
        n = float(len(a))
        mean = float(a.mean())
        head = a[:256].astype(np.float64)
        var = float(((head - mean) ** 2).sum()) / min(n, 256.0)
        out.append([n, mean, var, float(a[0])])
    return out


def extract_media_features(
    df: DataFrame, fake: bool = True, batch_size_hint: int = 256
) -> DataFrame:
    """(media_id, kind, payload, meta) → FEATURE_SCHEMA.

    Byte-level features (size, first byte, checksum) are computed
    JVM-side as column expressions — full payloads never cross the
    Python boundary for them (`xxhash64` is a codegen'd intrinsic; the
    old FNV implementation looped Python per byte). Only the decode
    step ships payload bytes to Python, Arrow-batched via mapInPandas,
    and the stub decode is numpy-vectorized per buffer.

    Partitioning is preserved (narrow transform) — at scale,
    repartition upstream by size, not count, so batches of large
    videos don't OOM a worker (spark.sql.files.maxPartitionBytes analog
    for in-flight media is the caller's repartition policy).
    """
    with_meta = df.select(
        "media_id",
        "kind",
        "payload",
        F.coalesce(F.length("payload"), F.lit(0)).cast("long").alias("n_bytes"),
        F.when(
            F.coalesce(F.length("payload"), F.lit(0)) == 0, F.lit(-1)
        )
        .otherwise(F.conv(F.hex(F.substring("payload", 1, 1)), 16, 10).cast("int"))
        .alias("first_byte"),
        F.xxhash64("payload").alias("checksum64"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "first_byte": pdf["first_byte"],
                    "checksum64": pdf["checksum64"],
                    "feature": _decode_batch(pdf["payload"], pdf["kind"], fake),
                }
            )

    return with_meta.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat a text corpus as binary media rows (test harness)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.to_json(F.struct(F.col(id_col))).alias("meta"),
    )
