"""Message-bus seam (round 3): notify sink + changelog source behind
interfaces, file analogues fully tested, Kafka implementations
import-/plan-gated with actionable errors (reference wire:
notify-clingen-kafka.py:17-48)."""

import base64
import json
import os

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.bus import (
    FileChangelogSource,
    FileNotifySink,
    KafkaChangelogSource,
    KafkaNotifySink,
)


def test_file_notify_sink_overwrite_and_sequence(tmp_path):
    d = str(tmp_path / "n")
    s = FileNotifySink(d)
    s.send({"a": 1})
    s.send({"a": 2})
    s.close()
    assert json.load(open(os.path.join(d, "_notify.json"))) == {"a": 2}

    seq = FileNotifySink(d, filename=None)
    seq.send({"b": 1})
    seq.send({"b": 2})
    names = sorted(f for f in os.listdir(d) if f.startswith("notify-"))
    assert names == ["notify-000001.json", "notify-000002.json"]
    assert json.load(open(os.path.join(d, names[1]))) == {"b": 2}


def test_export_diff_through_custom_sink(spark, tmp_path):
    """The engine's export accepts any NotifySink — a recording sink
    sees exactly the default _notify.json payload."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )

    pdf = generate_changelog(ChangelogSpec(n_events=400, n_urls=80, seed=33))
    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.replay(spark.read.parquet(p), batch_size=200)
    hist = eng.table.history()

    class Recorder:
        msgs: list = []

        def send(self, m):
            self.msgs.append(m)

        def close(self):
            self.closed = True

    rec = Recorder()
    msg = eng.export_diff_ndjson(
        hist[1], hist[-1], str(tmp_path / "d"), notify_sink=rec
    )
    assert rec.msgs == [msg]
    assert rec.closed
    # custom sink replaces the default file write
    assert not os.path.exists(str(tmp_path / "d" / "_notify.json"))
    # default sink writes it
    msg2 = eng.export_diff_ndjson(hist[1], hist[-1], str(tmp_path / "d2"))
    assert json.load(open(str(tmp_path / "d2" / "_notify.json"))) == msg2


def test_kafka_notify_sink_is_import_gated():
    with pytest.raises(ImportError, match="FileNotifySink"):
        KafkaNotifySink("broker:9092", "topic")


def test_kafka_changelog_source_plan_gated(spark):
    src = KafkaChangelogSource("broker:9092", "changelog")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        src.batch(spark)


def test_kafka_value_projection_roundtrip(spark):
    """The Kafka-envelope deserialization (the part a broker deployment
    actually swaps in) round-trips changelog events exactly."""
    events = [
        {
            "seq": 1, "op": "insert", "url": "https://h/x",
            "warc_ts": "2024-06-01T10:00:00.000000Z",
            "html": base64.b64encode(b"<p>hi</p>").decode(),
            "lang": "en", "schema_ver": 1, "extra": '{"k": 1}',
        },
        {
            "seq": 2, "op": "delete", "url": "https://h/x",
            "warc_ts": "2024-06-01T11:00:00.000000Z",
            "html": None, "lang": None, "schema_ver": 1, "extra": None,
        },
    ]
    kafka_shaped = spark.createDataFrame(
        [(json.dumps(e).encode("utf-8"),) for e in events], "value binary"
    )
    rows = {
        r["seq"]: r
        for r in KafkaChangelogSource.project_value(kafka_shaped).collect()
    }
    assert bytes(rows[1]["html"]) == b"<p>hi</p>"
    assert rows[1]["op"] == "insert" and rows[1]["lang"] == "en"
    assert rows[2]["html"] is None and rows[2]["op"] == "delete"
    assert rows[1]["warc_ts"].hour == 10


def test_file_changelog_source_stream_drives_tail(spark, tmp_path):
    """tail_changelog through the source seam = identical apply path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )
    from clinvar_ingest_spark.streaming.tail import tail_until_drained

    pdf = generate_changelog(ChangelogSpec(n_events=300, n_urls=60, seed=44))
    seg = tmp_path / "segs"
    seg.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        str(seg / "segment-0001.parquet"),
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    tail_until_drained(eng, str(seg), str(tmp_path / "ckpt"))

    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=4)
    b = spark.read.parquet(str(seg / "segment-0001.parquet"))
    lo, hi = b.agg(F.min("seq"), F.max("seq")).collect()[0]
    ref.apply_batch(b, int(lo), int(hi))
    assert eng.state_hash() == ref.state_hash()
    # batch() reads the same rows
    assert FileChangelogSource(str(seg)).batch(spark).count() == len(pdf)


def test_file_notify_sequence_survives_consumer_deletions(tmp_path):
    """Sequence numbers come from max existing seq + 1 (not a count):
    a consumer deleting processed records must never cause a new
    record to overwrite a surviving one."""
    d = str(tmp_path / "n2")
    s = FileNotifySink(d, filename=None)
    for i in range(3):
        s.send({"i": i + 1})
    os.unlink(os.path.join(d, "notify-000001.json"))
    os.unlink(os.path.join(d, "notify-000002.json"))
    s.send({"i": 4})
    names = sorted(f for f in os.listdir(d) if f.startswith("notify-"))
    assert names == ["notify-000003.json", "notify-000004.json"]
    assert json.load(open(os.path.join(d, "notify-000003.json"))) == {"i": 3}
    assert json.load(open(os.path.join(d, "notify-000004.json"))) == {"i": 4}


def test_file_notify_names_never_reused_after_full_deletion(tmp_path):
    """Even if consumers delete EVERY record, the high-water marker
    keeps notify filenames unique over time — a new record can never
    assume a previously-seen identity."""
    d = str(tmp_path / "n3")
    s = FileNotifySink(d, filename=None)
    s.send({"i": 1})
    s.send({"i": 2})
    os.unlink(os.path.join(d, "notify-000001.json"))
    os.unlink(os.path.join(d, "notify-000002.json"))
    s.send({"i": 3})
    names = sorted(f for f in os.listdir(d) if f.startswith("notify-"))
    assert names == ["notify-000003.json"]
    assert json.load(open(os.path.join(d, names[0]))) == {"i": 3}
