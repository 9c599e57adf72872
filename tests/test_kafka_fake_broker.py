"""End-to-end Kafka seam against an in-process fake broker.

No real broker exists in this sandbox, so the fake implements exactly
the producer protocol the production classes speak (confluent_kafka
``Producer.produce``/``flush``, kafka-python ``send``/``flush``/
``close``) and an in-memory topic log on the consumer side. What this
proves end-to-end:

- ``bus.KafkaNotifySink`` drives a real produce-then-flush sequence
  with the reference's notify payload (notify-clingen-kafka.py:17-48);
- changelog events round-trip the JSON wire envelope byte-exactly
  (``KafkaChangelogSource.project_value``, html via base64);
- at-least-once Kafka delivery collapses to exactly-once table state:
  re-consuming the topic from offset 0 and re-applying is a ledger
  no-op with an unchanged state hash.
"""

import json
import sys
import types
from collections import defaultdict

import pytest

# ---------------------------------------------------------------- fake broker

_BROKER: dict[str, list[bytes]] = defaultdict(list)


class _FakeConfluentProducer:
    """confluent_kafka.Producer protocol: produce() buffers, flush()
    delivers — messages must NOT be visible before the flush."""

    def __init__(self, conf):
        self.conf = conf
        self._pending: list[tuple[str, bytes]] = []

    def produce(self, topic, payload):
        self._pending.append((topic, bytes(payload)))

    def flush(self):
        for topic, payload in self._pending:
            _BROKER[topic].append(payload)
        self._pending.clear()


class _FakeKafkaPythonProducer:
    """kafka-python KafkaProducer protocol (send/flush/close)."""

    def __init__(self, bootstrap_servers=None, **conf):
        self.bootstrap_servers = bootstrap_servers
        self._pending: list[tuple[str, bytes]] = []
        self.closed = False

    def send(self, topic, payload):
        self._pending.append((topic, bytes(payload)))

    def flush(self):
        for topic, payload in self._pending:
            _BROKER[topic].append(payload)
        self._pending.clear()

    def close(self):
        self.closed = True


@pytest.fixture(autouse=True)
def clean_broker():
    _BROKER.clear()
    yield
    _BROKER.clear()


@pytest.fixture()
def fake_confluent(monkeypatch):
    mod = types.ModuleType("confluent_kafka")
    mod.Producer = _FakeConfluentProducer
    monkeypatch.setitem(sys.modules, "confluent_kafka", mod)
    return mod


@pytest.fixture()
def fake_kafka_python(monkeypatch):
    # make confluent_kafka unimportable so the fallback engages
    monkeypatch.setitem(sys.modules, "confluent_kafka", None)
    mod = types.ModuleType("kafka")
    mod.KafkaProducer = _FakeKafkaPythonProducer
    monkeypatch.setitem(sys.modules, "kafka", mod)
    return mod


# ------------------------------------------------------------------- fixtures


@pytest.fixture()
def changelog_df(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )

    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            generate_changelog(ChangelogSpec(n_events=400, n_urls=80, seed=21)),
            schema=changelog_arrow_schema(),
            preserve_index=False,
        ),
        p,
    )
    return spark.read.parquet(p)


# ----------------------------------------------------------------- notify sink


def test_notify_sink_produce_then_flush(spark, tmp_path, fake_confluent, changelog_df):
    """Diff export through KafkaNotifySink: the reference's payload
    lands on the broker topic only at close() (flush), and equals the
    export's return record byte-for-byte."""
    from clinvar_ingest_spark.bus import KafkaNotifySink
    from clinvar_ingest_spark.engine import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.replay(changelog_df, batch_size=200)
    hist = eng.table.history()
    sink = KafkaNotifySink("fake-broker:9092", "clingen-updates")
    msg = eng.export_diff_ndjson(
        hist[-2], hist[-1], str(tmp_path / "export"), notify_sink=sink
    )
    # close() did the flush inside export_diff_ndjson
    assert len(_BROKER["clingen-updates"]) == 1
    wire = json.loads(_BROKER["clingen-updates"][0])
    assert wire == msg
    assert wire["files"] and all(f.startswith("change=") for f in wire["files"])
    assert set(wire["counts"]) == {"created", "updated", "deleted"}


def test_notify_sink_buffers_until_flush(fake_confluent):
    from clinvar_ingest_spark.bus import KafkaNotifySink

    sink = KafkaNotifySink("fake-broker:9092", "t")
    sink.send({"a": 1})
    assert _BROKER["t"] == []  # produce() only buffers
    sink.close()
    assert json.loads(_BROKER["t"][0]) == {"a": 1}


def test_notify_sink_kafka_python_fallback(fake_kafka_python):
    from clinvar_ingest_spark.bus import KafkaNotifySink

    sink = KafkaNotifySink("fake-broker:9092", "t2")
    assert sink._flavor == "kafka-python"
    sink.send({"b": 2})
    sink.close()
    assert json.loads(_BROKER["t2"][0]) == {"b": 2}
    assert sink._producer.closed


# ------------------------------------------- changelog wire + exactly-once


def _produce_changelog(topic: str, pdf) -> None:
    """Upstream CDC producer: one JSON envelope per event, html base64
    (the wire contract KafkaChangelogSource.project_value decodes)."""
    import base64

    prod = _FakeConfluentProducer({})
    for _, r in pdf.iterrows():
        env = {
            "seq": int(r["seq"]),
            "op": r["op"],
            "url": r["url"],
            "warc_ts": r["warc_ts"].isoformat() if r["warc_ts"] is not None else None,
            "html": (
                base64.b64encode(r["html"]).decode("ascii")
                if r["html"] is not None
                else None
            ),
            "lang": r["lang"],
            "schema_ver": int(r["schema_ver"]),
            "extra": r["extra"],
        }
        prod.produce(topic, json.dumps(env).encode("utf-8"))
    prod.flush()


def _consume_as_kafka_frame(spark, topic: str):
    """The broker's topic log as the Kafka source's output shape —
    (value binary, offset long); project_value only reads `value`."""
    rows = [
        (bytearray(payload), off)
        for off, payload in enumerate(_BROKER[topic])
    ]
    return spark.createDataFrame(rows, "value binary, offset long")


def test_changelog_envelope_roundtrip_and_exactly_once(
    spark, tmp_path, changelog_df
):
    """Changelog → JSON wire → project_value is byte-exact, and
    re-consuming the topic from offset 0 (at-least-once redelivery)
    no-ops against the ledger: same state hash, no new lineage."""
    from clinvar_ingest_spark.bus import KafkaChangelogSource
    from clinvar_ingest_spark.engine import CdcEngine

    pdf = changelog_df.toPandas()
    _produce_changelog("cdc-pages", pdf)
    assert len(_BROKER["cdc-pages"]) == len(pdf)

    consumed = KafkaChangelogSource.project_value(
        _consume_as_kafka_frame(spark, "cdc-pages")
    )
    from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

    assert consumed.schema == CHANGELOG_SCHEMA
    got = consumed.orderBy("seq").toPandas()
    want = pdf.sort_values("seq").reset_index(drop=True)
    assert list(got["seq"]) == list(want["seq"])
    assert list(got["op"]) == list(want["op"])
    assert list(got["warc_ts"]) == list(want["warc_ts"])
    # byte-identical html through base64 (None stays None)
    assert [
        None if h is None else bytes(h) for h in got["html"]
    ] == [None if h is None else bytes(h) for h in want["html"]]

    # exactly-once: apply, then re-deliver the whole topic again
    eng = CdcEngine(spark, str(tmp_path / "t2"), n_buckets=4)
    stats = eng.replay(consumed, batch_size=200)
    h1 = eng.state_hash()
    n_lineage = eng.lineage().count()

    redelivered = KafkaChangelogSource.project_value(
        _consume_as_kafka_frame(spark, "cdc-pages")
    )
    eng.replay(redelivered, batch_size=200)  # every batch ledger-skips
    assert eng.state_hash() == h1
    assert eng.lineage().count() == n_lineage
