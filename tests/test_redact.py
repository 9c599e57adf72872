"""PII detection/redaction kernels and the quality-gate composition."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.redact import pii_columns
from clinvar_ingest_spark.operators.quality_gate import quality_filter, quality_gate


def test_pii_columns(spark):
    df = spark.createDataFrame(
        [
            (0, "write to alice.smith+x@mail.example.org for info"),
            (1, "server at 192.168.1.254 and card 4111111111111111"),
            (2, "nothing sensitive here, just 1234 and a.b"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in pii_columns(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_longnum"]) == (1, 0, 0)
    assert "alice" not in out[0]["text_redacted"]
    assert out[0]["text_redacted"] == "write to [PII] for info"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_longnum"]) == (0, 1, 1)
    assert out[1]["text_redacted"] == "server at [PII] and card [PII]"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_longnum"]) == (0, 0, 0)
    assert out[2]["text_redacted"] == out[2]["text"] if "text" in out[2] else True
    assert out[3]["text_redacted"] == ""


def test_redaction_order_email_before_digits(spark):
    # the email's local part contains a 9-digit run; the email pattern
    # must consume it before the longnum pattern can see it
    df = spark.createDataFrame([(0, "id 123456789 mail 987654321@x.io end")],
                               ["doc_id", "text"])
    r = pii_columns(df).collect()[0]
    # counts are raw per-pattern matches on the ORIGINAL text (the digit
    # run inside the email matches longnum too); redaction is order-aware
    assert r["n_email"] == 1 and r["n_longnum"] == 2
    assert r["text_redacted"] == "id [PII] mail [PII] end"


@pytest.fixture()
def gate_docs(spark):
    return spark.createDataFrame(
        [
            # passes everything: 20+ unique-ish tokens with stopwords
            (0, "the cat and the dog walked to a house in town for food "
                "with many other friendly animals nearby today again soon"),
            (1, "spam spam spam spam spam spam spam spam spam spam spam spam "
                "spam spam spam spam spam spam spam spam"),  # top-token + trigram fail
            (2, "too short"),                                  # length fail
            (3, ""),                                           # empty fails all
        ],
        ["doc_id", "text"],
    )


def test_quality_gate_flags(gate_docs):
    out = {r["doc_id"]: r.asDict() for r in quality_gate(gate_docs).collect()}
    assert out[0]["keep"] is True
    assert out[1]["g_len"] is True
    assert out[1]["g_top_token"] is False
    assert out[1]["g_dup_trigram"] is False
    assert out[1]["keep"] is False
    assert out[2]["g_len"] is False and out[2]["keep"] is False
    assert out[3]["keep"] is False


def test_quality_filter_form(gate_docs):
    kept = quality_filter(gate_docs)
    assert kept.columns == gate_docs.columns
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_gate_is_single_stage(gate_docs):
    """The gate must fuse into the scan: no Exchange in the plan."""
    plan = quality_gate(gate_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
