"""Incremental view maintenance (IVM) — aggregates kept current from
the CDC change feed without rescanning the table.

The reference materializes release-level rollups by re-querying
BigQuery per release (per-release COUNT gates,
orchestration/scripts/count-processing-history-rows.sh:113-127; diff
slices re-derived per release pair, docker/diff/diff.py:117-182). At
10^10 rows a "recount the world per batch" rollup is the second
full-table scan nobody can afford; a CDC engine should maintain
downstream aggregates from the changes it already computed. This is
the classic self-maintainable-view result (Gupta & Mumick, "Maintenance
of Materialized Views: Problems, Techniques, and Applications", IEEE
DE Bulletin 1995): COUNT/SUM group-by views are maintainable from
insert/delete deltas alone, no base-table access.

Mechanics here lean on the lakelet's copy-on-write invariant instead of
row-level change capture: a bucket whose file set is identical in two
manifests holds identical rows (`CdcEngine.changed_buckets`), so

    Δview = agg(new rows of changed buckets) − agg(old rows of changed
            buckets)

is exact — untouched buckets cancel symbolically and are never read.
Cost per refresh is two scans of |touched buckets|, not two scans of
the table; for an incremental hop that is |touched|/n_buckets of the
data (the same pruning the snapshot diff uses). The subtraction form
also absorbs updates (old value out, new value in) without needing the
update's before-image.

Measures are restricted to integer COUNT/SUM so view arithmetic is
associative, order-independent, and hash-stable cross-engine — the
same determinism contract as the rest of the engine (doubles would
make the maintained view differ from a recompute in the last bit
depending on shuffle order).

:class:`MaterializedAggView` persists the view beside the table with
the engine's commit discipline: deterministic artifact per (view,
snapshot), written to a tokened temp dir and pointed to by an
atomically-replaced ``_current.json``; refresh is idempotent and a
crash between data write and pointer flip self-heals on re-run.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AggViewSpec:
    """A group-by view with self-maintainable integer measures.

    ``measures``: list of ``("out_name", "count")`` or
    ``("out_name", "sum", "<column or SQL expr>")``. Sum expressions
    must be integer-typed (cast in the expr if needed) — see module
    docstring for why."""

    group_cols: Sequence[str]
    measures: Sequence[tuple] = field(default_factory=lambda: [("n_rows", "count")])

    #: ``group_cols=[]`` is a GLOBAL view: one row of corpus-level
    #: totals (e.g. document count + summed doc length for BM25's
    #: (N, avgdl)). Global aggregation always yields exactly one row,
    #: so the delta join degenerates to a cross join and the apply
    #: step to a union-sum — both handled below.

    def _aggs(self):
        out = []
        for m in self.measures:
            if m[1] == "count":
                out.append(F.count(F.lit(1)).cast("long").alias(m[0]))
            elif m[1] == "sum":
                out.append(
                    F.coalesce(F.sum(F.expr(m[2])), F.lit(0)).cast("long").alias(m[0])
                )
            else:  # pragma: no cover - spec error
                raise ValueError(f"unsupported measure kind: {m[1]!r}")
        return out

    @property
    def names(self) -> list[str]:
        return [m[0] for m in self.measures]

    @property
    def count_name(self) -> str:
        """The measure that decides group liveness (a group leaves the
        view when its row count returns to zero). A COUNT measure is
        required for exactly this reason."""
        for m in self.measures:
            if m[1] == "count":
                return m[0]
        raise ValueError("AggViewSpec needs a count measure to track group liveness")


def aggregate_full(df: DataFrame, spec: AggViewSpec) -> DataFrame:
    """Full aggregation of a row set — view initialization and the
    recompute oracle the incremental path must always equal."""
    return df.groupBy(*spec.group_cols).agg(*spec._aggs())


def view_delta(engine, old_snapshot: str, new_snapshot: str, spec: AggViewSpec) -> DataFrame:
    """Δview between two snapshots, reading ONLY changed buckets.

    Output: group cols + one signed delta per measure; groups whose
    deltas are all zero are dropped (an untouched group inside a
    touched bucket cancels here instead of at apply time)."""
    from clinvar_ingest_spark.lakelet.table import align_select

    buckets = engine.changed_buckets(old_snapshot, new_snapshot)
    new_m = engine.table.manifest(new_snapshot)
    old_m = engine.table.manifest(old_snapshot)
    live = ~F.coalesce(F.col("_deleted"), F.lit(False))
    old = engine.table.read(engine.spark, old_snapshot, buckets=buckets)
    # evolution-straddling hop: present old rows under the new schema
    # (same col-id name-mapping as reads and diffs)
    old = old.select(*align_select(old_m.columns, new_m.columns)).filter(live)
    new = engine.table.read(engine.spark, new_snapshot, buckets=buckets).filter(live)

    gk = list(spec.group_cols)
    a_new = aggregate_full(new, spec).select(
        *gk, *[F.col(n).alias(f"_new_{n}") for n in spec.names]
    )
    a_old = aggregate_full(old, spec).select(
        *gk, *[F.col(n).alias(f"_old_{n}") for n in spec.names]
    )
    # global view: both sides are exactly one row (global aggregation
    # is never empty), so a cross join IS the full-outer join
    j = a_new.crossJoin(a_old) if not gk else a_new.join(a_old, on=gk, how="full_outer")
    deltas = [
        (F.coalesce(F.col(f"_new_{n}"), F.lit(0)) - F.coalesce(F.col(f"_old_{n}"), F.lit(0)))
        .cast("long")
        .alias(n)
        for n in spec.names
    ]
    out = j.select(*gk, *deltas)
    nonzero = None
    for n in spec.names:
        c = F.col(n) != 0
        nonzero = c if nonzero is None else (nonzero | c)
    return out.filter(nonzero)


def apply_delta(view: DataFrame, delta: DataFrame, spec: AggViewSpec) -> DataFrame:
    """view ⊕ Δ: group-wise integer addition; groups whose row count
    returns to zero leave the view (COUNT-liveness rule)."""
    gk = list(spec.group_cols)
    if not gk:
        # global view: either side may hold 0 or 1 rows (the view row
        # leaves when the count returns to zero, the delta row when all
        # deltas cancel), so a join would lose the surviving side —
        # fold by union-sum instead, which is total over both cases.
        u = view.select(*spec.names).unionByName(delta.select(*spec.names))
        merged = u.agg(
            *[
                F.coalesce(F.sum(n), F.lit(0)).cast("long").alias(n)
                for n in spec.names
            ]
        )
        return merged.filter(F.col(spec.count_name) > 0)
    v = view.select(*gk, *[F.col(n).alias(f"_v_{n}") for n in spec.names])
    d = delta.select(*gk, *[F.col(n).alias(f"_d_{n}") for n in spec.names])
    j = v.join(d, on=gk, how="full_outer")
    merged = [
        (F.coalesce(F.col(f"_v_{n}"), F.lit(0)) + F.coalesce(F.col(f"_d_{n}"), F.lit(0)))
        .cast("long")
        .alias(n)
        for n in spec.names
    ]
    return j.select(*gk, *merged).filter(F.col(spec.count_name) > 0)


class MaterializedAggView:
    """A persisted aggregate view maintained against a :class:`CdcEngine`
    table.

    Layout under ``root/``: ``view-<snapshot_id>/`` parquet artifacts +
    ``_current.json`` pointer {snapshot_id, path}. ``refresh()`` brings
    the view to the table's current snapshot: full aggregation on first
    materialization, changed-bucket delta afterwards. Deterministic
    artifact content per snapshot + atomic pointer replace ⇒ idempotent
    refresh, crash self-heal, and old artifacts stay readable until
    swept (same retention shape as lakelet manifests)."""

    def __init__(self, engine, spec: AggViewSpec, root: str):
        self.engine = engine
        self.spec = spec
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- state

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_current.json")

    def current_snapshot_id(self) -> Optional[str]:
        p = self._pointer_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["snapshot_id"]

    def read(self) -> DataFrame:
        sid = self.current_snapshot_id()
        if sid is None:
            raise FileNotFoundError(f"view at {self.root} is not materialized yet")
        return self.engine.spark.read.parquet(self._artifact_path(sid))

    def _artifact_path(self, snapshot_id: str) -> str:
        return os.path.join(self.root, f"view-{snapshot_id}")

    # ----------------------------------------------------------- refresh

    def refresh(self) -> str:
        """Advance the view to the table's current snapshot; returns it.

        No-op when already current. One hop covers ANY snapshot
        distance — changed-bucket pruning is pairwise, so a view that
        lagged 50 commits still refreshes from the touched buckets of
        the combined span, not by replaying 50 deltas."""
        table_sid = self.engine.table.current_snapshot_id()
        view_sid = self.current_snapshot_id()
        if view_sid == table_sid:
            return table_sid
        live = ~F.coalesce(F.col("_deleted"), F.lit(False))
        if view_sid is None:
            nxt = aggregate_full(
                self.engine.table.read(self.engine.spark, table_sid).filter(live),
                self.spec,
            )
        else:
            delta = view_delta(self.engine, view_sid, table_sid, self.spec)
            nxt = apply_delta(self.read(), delta, self.spec)
        self._commit(nxt, table_sid)
        return table_sid

    def _commit(self, df: DataFrame, snapshot_id: str) -> None:
        final = self._artifact_path(snapshot_id)
        if not os.path.exists(final):
            tmp = os.path.join(
                self.root, f"_staging-{snapshot_id}-{uuid.uuid4().hex[:8]}"
            )
            df.write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, final)  # atomic promote; loser cleans up
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
                if not os.path.exists(final):  # pragma: no cover
                    raise
        tmp_ptr = f"{self._pointer_path()}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp_ptr, "w") as f:
            json.dump({"snapshot_id": snapshot_id, "path": final}, f)
        os.replace(tmp_ptr, self._pointer_path())
