"""Multimodal binary-column plumbing (decode stubbed per container limits)."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators import multimodal as mm


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


def test_real_decode_is_stubbed(media):
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
