"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

Decode paths, in precedence order (round 3 — the real path now RUNS):

1. **Built-in dependency-free decoders** for uncompressed formats —
   PPM (P6) and 24-bit BI_RGB BMP — header parse + numpy pixel read.
   These execute in CI with zero extra libraries, so the non-stub
   branch is exercised end-to-end (schema → batch → decode → feature).
2. **PIL**, import-gated, for rich formats (absent in this container).
3. ``fake=True`` → the deterministic byte-moment stub (plumbing tests
   that don't care about pixels).

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


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6): ASCII header ``P6 <w> <h> <maxval>``
    (whitespace-separated, ``#`` comments allowed), then raw RGB bytes.
    Returns (width, height, uint8 array of shape (h, w, 3))."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    need = w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return w, h, px.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24-bit BI_RGB BMP (the format the round-3
    directive names): BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up
    rows padded to 4 bytes, BGR order → returned as RGB (h, w, 3)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return w, h, rows[..., ::-1]  # BGR → RGB


def decode_image_builtin(payload: bytes) -> list[float] | None:
    """[width, height, mean, var] via the dependency-free decoders, or
    None when the payload isn't a format they speak (caller falls
    through to PIL)."""
    if payload[:2] == b"P6":
        w, h, arr = decode_ppm(payload)
    elif payload[:2] == b"BM":
        w, h, arr = decode_bmp(payload)
    else:
        return None
    a = arr.astype(np.float64)
    return [float(w), float(h), float(a.mean()), float(a.var())]


def _real_decoder():
    """Optional real decoder (PIL for images), import-gated: absent in
    this container, so callers use the deterministic stub. Swapping in
    a real library changes NOTHING else — schema, batching, and
    partitioning are identical."""
    try:  # pragma: no cover - library not in container
        from PIL import Image  # noqa: F401

        import io

        def decode(payload: bytes) -> list[float]:
            # callers guarantee kind == "image" and a non-empty payload
            # (_decode_batch raises for other kinds — no silent zeros)
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
        pil = _real_decoder()  # rich formats, import-gated
        out = []
        for b, k in zip(payloads, kinds):
            if not b:  # NULL/empty payload: zero feature (documented)
                out.append([0.0, 0.0, 0.0, 0.0])
                continue
            if k != "image":
                # LOUD failure, not silent zeros: no audio/video decoder
                # exists, and all-zero "features" would be
                # indistinguishable from real decoded values downstream
                raise NotImplementedError(
                    f"no real decoder for kind={k!r} — only image "
                    "(PPM/BMP builtin, PIL import-gated); pass fake=True "
                    "for the deterministic byte-moment stub"
                )
            feat = decode_image_builtin(bytes(b))
            if feat is not None:
                out.append(feat)
            elif pil is not None:
                out.append(pil(bytes(b)))
            else:
                raise NotImplementedError(
                    "payload is neither PPM(P6) nor 24-bit BMP and PIL is "
                    "not installed — rich-format decode requires PIL; or "
                    "pass fake=True for the deterministic byte-moment stub"
                )
        return out
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
