"""Message-bus seam: the notify sink and the changelog source behind
small interfaces, so the file-based sandbox analogues and a real Kafka
deployment are a SWAP, not a rewrite.

Reference parity: the pipeline's diff export ends with one Kafka
message listing the exported slice files (reference:
orchestration/scripts/notify-clingen-kafka.py:17-48 — producer config
from env, ``{release_date, bucket, files[]}`` payload), and its input
arrives as files on GCS. This sandbox has no Kafka broker, so:

- ``FileNotifySink`` / ``FileChangelogSource`` are the real, tested
  implementations (the engine's ``_notify.json`` + parquet-segment
  tail);
- ``KafkaNotifySink`` / ``KafkaChangelogSource`` are complete
  implementations of the same interfaces, import-/plan-gated: the
  notify sink needs ``confluent_kafka`` (the reference's client) or
  ``kafka-python``; the source builds the standard
  ``readStream.format("kafka")`` + JSON-projection plan, which needs
  the spark-sql-kafka package on the cluster. Both raise actionable
  errors here and work unchanged where the dependencies exist.
"""

from __future__ import annotations

import os
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ----------------------------------------------------------------- notify sink


class NotifySink(Protocol):
    """Where per-batch/per-export notify records go (reference:
    notify-clingen-kafka.py payloads)."""

    def send(self, message: dict) -> None: ...

    def close(self) -> None: ...


class FileNotifySink:
    """Atomic-JSON notify record — the sandbox stand-in for the Kafka
    producer. ``filename=None`` appends sequence-numbered records
    (``notify-000001.json`` …) instead of overwriting one file."""

    def __init__(self, directory: str, filename: str | None = "_notify.json"):
        self.directory = directory
        self.filename = filename

    def send(self, message: dict) -> None:
        from clinvar_ingest_spark.lakelet.manifest import atomic_write_json

        os.makedirs(self.directory, exist_ok=True)
        if self.filename is not None:
            atomic_write_json(
                os.path.join(self.directory, self.filename), message
            )
            return
        # sequence mode: slots are claimed via the link CAS so two
        # concurrent senders can never overwrite each other's record —
        # the loser retries on the next slot. The next number comes
        # from max(existing, high-water marker): a count would collide
        # after consumer deletions, and the marker keeps names unique
        # over time even if consumers delete EVERY record (a reused
        # filename would give a new record a previously-seen identity).
        from clinvar_ingest_spark.lakelet.manifest import (
            atomic_write_json,
            link_pointer,
            read_json,
        )

        hwm_path = os.path.join(self.directory, "_notify_hwm.json")
        try:
            mx = int(read_json(hwm_path).get("hwm", 0))
        except (FileNotFoundError, ValueError):
            mx = 0
        for f in os.listdir(self.directory):
            if f.startswith("notify-") and f.endswith(".json"):
                try:
                    mx = max(mx, int(f[7:-5]))
                except ValueError:
                    continue
        for seq in range(mx + 1, mx + 1_000_000):
            try:
                link_pointer(self.directory, f"notify-{seq:06d}.json", message)
                atomic_write_json(hwm_path, {"hwm": seq})
                return
            except FileExistsError:
                continue
        raise RuntimeError("could not claim a notify sequence slot")

    def close(self) -> None:  # nothing buffered
        pass


class KafkaNotifySink:
    """Kafka producer notify sink (reference notify-clingen-kafka.py
    parity: same payload, same produce-then-flush shape). Import-gated:
    instantiating without a Kafka client library raises ImportError
    with instructions; with one installed this is the drop-in."""

    def __init__(self, bootstrap_servers: str, topic: str, **producer_conf):
        self.topic = topic
        try:
            from confluent_kafka import Producer  # the reference's client

            self._producer = Producer(
                {"bootstrap.servers": bootstrap_servers, **producer_conf}
            )
            self._flavor = "confluent"
        except ImportError:
            try:
                from kafka import KafkaProducer  # kafka-python fallback

                self._producer = KafkaProducer(
                    bootstrap_servers=bootstrap_servers, **producer_conf
                )
                self._flavor = "kafka-python"
            except ImportError as e:
                raise ImportError(
                    "KafkaNotifySink needs `confluent_kafka` or "
                    "`kafka-python` (neither installed in this sandbox); "
                    "use FileNotifySink here — the interfaces are identical"
                ) from e

    def send(self, message: dict) -> None:
        import json

        payload = json.dumps(message).encode("utf-8")
        if self._flavor == "confluent":
            self._producer.produce(self.topic, payload)
        else:
            self._producer.send(self.topic, payload)

    def close(self) -> None:
        if self._flavor == "confluent":
            self._producer.flush()
        else:
            self._producer.flush()
            self._producer.close()


# ------------------------------------------------------------ changelog source


class ChangelogSource(Protocol):
    """Where change events come from. ``batch`` = bounded read,
    ``stream`` = Structured Streaming DataFrame in the changelog
    schema (streaming/tail.CHANGELOG_SCHEMA)."""

    def batch(self, spark: SparkSession) -> DataFrame: ...

    def stream(self, spark: SparkSession) -> DataFrame: ...


class FileChangelogSource:
    """Parquet-segment changelog directory (each closed segment = one
    offset range) — the sandbox binlog."""

    def __init__(self, path: str, max_files_per_trigger: int = 8):
        self.path = path
        self.max_files_per_trigger = max_files_per_trigger

    def batch(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def stream(self, spark: SparkSession) -> DataFrame:
        from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

        return (
            spark.readStream.schema(CHANGELOG_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.path)
        )


class DebeziumFileSource:
    """JSON-lines segment directory of Debezium envelopes → changelog
    stream: ``readStream.text`` + :func:`sources.debezium.parse_debezium`
    — the file analogue of a Kafka topic carrying Debezium values
    (each closed ``.jsonl`` segment = one flushed offset range).
    Tombstones and malformed records drop inside the projection, so
    the downstream ``foreachBatch`` apply is identical to the native
    tail; composes with ``streaming/tail.py tail_changelog(source=…)``
    whole (exactly-once stays the ENGINE's ledger, per that module)."""

    def __init__(
        self,
        path: str,
        max_files_per_trigger: int = 8,
        spill_unknown_after: bool = False,
    ):
        self.path = path
        self.max_files_per_trigger = max_files_per_trigger
        self.spill_unknown_after = spill_unknown_after

    def _parse(self, raw: DataFrame) -> DataFrame:
        from clinvar_ingest_spark.sources.debezium import parse_debezium

        return parse_debezium(
            raw, spill_unknown_after=self.spill_unknown_after
        )

    def batch(self, spark: SparkSession) -> DataFrame:
        return self._parse(spark.read.text(self.path))

    def stream(self, spark: SparkSession) -> DataFrame:
        return self._parse(
            spark.readStream.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            ).text(self.path)
        )


class KafkaChangelogSource:
    """Kafka topic → changelog-schema DataFrame: the standard
    ``format("kafka")`` reader + a JSON value projection (html arrives
    base64 inside the JSON envelope, seq = the event's own sequence —
    Kafka offsets are per-partition and don't survive repartitioning,
    so the LWW/ledger key stays the producer-assigned ``seq``).

    Plan-gated: building the reader requires the spark-sql-kafka
    package on the classpath (`--packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`);
    without it Spark raises at ``load()`` and this class re-raises
    with that instruction. The projection logic below is exercised by
    pytest against a literal Kafka-shaped frame, so the only untested
    piece on this sandbox is the broker I/O itself.
    """

    def __init__(
        self,
        bootstrap_servers: str,
        topic: str,
        starting_offsets: str = "earliest",
    ):
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.starting_offsets = starting_offsets

    @staticmethod
    def project_value(df: DataFrame) -> DataFrame:
        """Kafka envelope (``value: binary`` JSON) → changelog schema.
        Split out so the deserialization is testable without a broker."""
        from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

        from pyspark.sql import types as T

        wire = T.StructType(
            [
                f if f.name != "html" else T.StructField("html", T.StringType())
                for f in CHANGELOG_SCHEMA.fields
            ]
        )
        parsed = df.select(
            F.from_json(F.decode(F.col("value"), "UTF-8"), wire).alias("e")
        ).select("e.*")
        return parsed.withColumn("html", F.unbase64("html"))

    def _reader(self, spark: SparkSession, streaming: bool):
        r = spark.readStream if streaming else spark.read
        return (
            r.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
        )

    def _load(self, spark: SparkSession, streaming: bool) -> DataFrame:
        try:
            raw = self._reader(spark, streaming).load()
        except Exception as e:  # kafka source not on the classpath
            raise RuntimeError(
                "the Kafka source needs spark-sql-kafka on the classpath "
                "(spark-submit --packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<spark-version>); on this "
                "sandbox use FileChangelogSource — same interface"
            ) from e
        return self.project_value(raw)

    def batch(self, spark: SparkSession) -> DataFrame:
        return self._load(spark, streaming=False)

    def stream(self, spark: SparkSession) -> DataFrame:
        return self._load(spark, streaming=True)
