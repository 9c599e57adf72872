"""lakelet — an Iceberg-semantics snapshot table layer on Parquet + JSON manifests.

No Iceberg/Delta jars ship in this sandbox, so the engine implements the
semantics it needs directly (SURVEY.md §7): immutable Parquet data files
bucketed by key-hash, JSON snapshot manifests with file-level stats,
atomic rename-based commits with deterministic snapshot IDs, time
travel, and name-mapping schema evolution (add / rename / widen without
data rewrite). The interface is narrow enough that a real Iceberg
catalog could be dropped in behind it later.
"""

from clinvar_ingest_spark.lakelet.manifest import Manifest, FileEntry, ColumnSpec  # noqa: F401
from clinvar_ingest_spark.lakelet.table import (  # noqa: F401
    CommitConflictError,
    LakeletTable,
    PAGES_COLUMNS,
)
from clinvar_ingest_spark.lakelet.release import ReleaseSet, write_fanout_release  # noqa: F401
