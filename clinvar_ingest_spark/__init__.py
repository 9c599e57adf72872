"""clinvar_ingest_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
DataBiosphere/clinvar-ingest (reference at /root/reference, read-only):
release-mirroring / change-data-capture into snapshot-versioned lake
tables, re-architected Spark-first.

Subsystems
----------
- ``sources``   — deterministic changelog (binlog/WAL) generation + readers
                  (reference: FTP + XML→JSON extraction,
                  orchestration/templates/ingest-xml-archive.yaml:44-62).
- ``functions`` — vectorized scalar kernels: HTML→text extraction,
                  canonical JSON (reference: Content.scala:16-48), text
                  analysis, fingerprints.
- ``operators`` — LWW dedup (reference: ArchiveBranches.scala:140-156),
                  CREATE/UPDATE/DELETE diff classification (reference:
                  docker/diff/diff.py:117-182), MERGE apply, dedup/
                  similarity suites for training-data pipelines.
- ``lakelet``   — Iceberg-semantics snapshot table format on plain
                  Parquet + JSON manifests: copy-on-write, time travel,
                  atomic commits, name-mapping schema evolution
                  (reference: TDR dataset + snapshot cut,
                  orchestration/scripts/request-release-date-snapshot.py:127-154).
- ``streaming`` — micro-batch apply loop, offsets ledger, lineage metrics
                  (reference: processing_history short-circuits,
                  README.md:30-41).
- ``engine``    — the top-level CdcEngine tying it together.
"""

__version__ = "0.1.0"

from clinvar_ingest_spark.session import get_spark  # noqa: F401
