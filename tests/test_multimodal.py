"""Multimodal binary-column plumbing. Round 3: the REAL decode path
runs in CI via dependency-free PPM(P6)/24-bit-BMP decoders; PIL stays
import-gated for rich formats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators import multimodal as mm


def make_ppm(w, h, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + px.tobytes(), px


def make_bmp(w, h, seed=0):
    """Minimal 24-bit BI_RGB bottom-up BMP."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        r = px[y][:, ::-1].tobytes()  # RGB → BGR
        rows += r + b"\x00" * (stride - len(r))
    off = 14 + 40
    size = off + len(rows)
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00" * 4 + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(hdr) + bytes(rows), px


@pytest.fixture()
def media(spark):
    rows = [
        (0, "image", b"\x89PNG fake bytes", "{}"),
        (1, "audio", b"RIFF fake", "{}"),
        (2, "video", None, "{}"),
        (3, "image", b"", "{}"),
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_feature_extraction_fake(media):
    out = {r["media_id"]: r for r in mm.extract_media_features(media, fake=True).collect()}
    assert out[0]["n_bytes"] == 15
    assert out[0]["first_byte"] == 0x89
    assert out[2]["n_bytes"] == 0 and out[2]["first_byte"] == -1
    assert out[3]["first_byte"] == -1
    assert len(out[0]["feature"]) == 4
    assert out[0]["feature"][0] == 15.0  # deterministic stub: n as feature[0]


def test_ppm_decoder_roundtrip():
    payload, px = make_ppm(5, 3, seed=1)
    w, h, arr = mm.decode_ppm(payload)
    assert (w, h) == (5, 3)
    assert np.array_equal(arr, px)


def test_bmp_decoder_roundtrip():
    # width 5 → stride padding exercised (15 bytes → 16)
    payload, px = make_bmp(5, 4, seed=2)
    w, h, arr = mm.decode_bmp(payload)
    assert (w, h) == (5, 4)
    assert np.array_equal(arr, px)


def test_real_decode_runs_in_spark(spark):
    """The NON-stub decode branch executes end-to-end: real pixel
    means/vars come back through the Arrow batch boundary."""
    ppm, ppx = make_ppm(4, 2, seed=3)
    bmp, bpx = make_bmp(3, 3, seed=4)
    rows = [
        (0, "image", ppm, "{}"),
        (1, "image", bmp, "{}"),
        (2, "video", None, "{}"),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r["feature"]
        for r in mm.extract_media_features(media, fake=False).collect()
    }
    assert out[0][:2] == [4.0, 2.0]
    assert out[0][2] == pytest.approx(ppx.astype(np.float64).mean())
    assert out[0][3] == pytest.approx(ppx.astype(np.float64).var())
    assert out[1][:2] == [3.0, 3.0]
    assert out[1][2] == pytest.approx(bpx.astype(np.float64).mean())
    assert out[2] == [0.0, 0.0, 0.0, 0.0]  # non-image: zero feature


def test_rich_format_still_gated(media):
    """PNG/RIFF payloads still require PIL (absent here) — the builtin
    decoders never mis-parse them."""
    with pytest.raises(Exception):
        mm.extract_media_features(media, fake=False).collect()


def test_checksum_deterministic(media):
    a = {r["media_id"]: r["checksum64"] for r in mm.extract_media_features(media).collect()}
    b = {r["media_id"]: r["checksum64"] for r in mm.extract_media_features(media).collect()}
    assert a == b
    assert a[0] != a[1]


def test_documents_adapter(spark):
    docs = spark.createDataFrame([(7, "hello")], ["doc_id", "text"])
    m = mm.documents_as_media(docs).collect()[0]
    assert m["media_id"] == 7
    assert bytes(m["payload"]) == b"hello"
    feats = mm.extract_media_features(mm.documents_as_media(docs)).collect()[0]
    assert feats["n_bytes"] == 5
    assert feats["first_byte"] == ord("h")


# ---- property-based decoder round-trips (pure numpy, no Spark) ----

from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_roundtrip_property(w, h, seed):
    payload, px = make_ppm(w, h, seed=seed)
    dw, dh, arr = mm.decode_ppm(payload)
    assert (dw, dh) == (w, h)
    assert np.array_equal(arr, px)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    """Every width exercises a different stride padding (w*3 mod 4)."""
    payload, px = make_bmp(w, h, seed=seed)
    dw, dh, arr = mm.decode_bmp(payload)
    assert (dw, dh) == (w, h)
    assert np.array_equal(arr, px)
    feat = mm.decode_image_builtin(payload)
    assert feat[0] == float(w) and feat[1] == float(h)
    assert feat[2] == pytest.approx(px.astype(np.float64).mean())
