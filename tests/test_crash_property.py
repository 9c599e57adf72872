"""Randomized crash/growth composition property.

The targeted exactly-once tests (test_exactly_once.py) each pin ONE
known crash window. This module fuzzes the COMPOSITION space the hand
set can't enumerate: random unaligned delivery prefixes of a growing
log, random batch grids, and randomly-injected crash-before-ledger
losses (manifest committed, ledger record gone — the window the
`apply_partial_to` manifest stamp exists for), finished by a full
replay. Invariant: the final table state (tombstones included) is
bit-identical to one clean replay — no event lost, none double-applied,
regardless of the interleaving.

A removed record for a batch that later commits pushed off the manifest
head exercises the OTHER documented recovery path (re-apply; LWW makes
the overlap convergent), so the property covers both repair branches
without steering.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clinvar_ingest_spark.engine import CdcEngine


def _changelog(spark, tmpdir, n_events=400):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )

    pdf = generate_changelog(
        ChangelogSpec(
            n_events=n_events, n_urls=80, n_hosts=5, seed=13,
            duplicate_rate=0.05,
        )
    )
    p = os.path.join(tmpdir, "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    return spark.read.parquet(p)


_STATE = {}


def _fixture(spark):
    # hypothesis re-enters the test many times; build the changelog and
    # the clean-replay reference hash once per process, not per example
    if "want" not in _STATE:
        base = tempfile.mkdtemp(prefix="crashprop_ref_")
        cl = _changelog(spark, base)
        ref = CdcEngine(spark, os.path.join(base, "ref"), n_buckets=4)
        ref.replay(cl, batch_size=160)
        _STATE["cl"] = cl
        _STATE["want"] = ref.state_hash(include_tombstones=True)
    return _STATE["cl"], _STATE["want"]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch=st.sampled_from([128, 150, 222]),
    cuts=st.lists(
        st.integers(min_value=20, max_value=390),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    crashes=st.lists(st.booleans(), min_size=4, max_size=4),
)
def test_random_growth_crash_composition(spark, batch, cuts, crashes):
    cl, want = _fixture(spark)
    base = tempfile.mkdtemp(prefix="crashprop_")
    try:
        e = CdcEngine(spark, os.path.join(base, "t"), n_buckets=4)
        for i, cut in enumerate(sorted(cuts) + [None]):
            df = cl if cut is None else cl.filter(f"seq < {cut}")
            e.replay(df, batch_size=batch)
            if crashes[i]:
                recs = e.ledger.all_records()
                if recs:
                    last = max(recs, key=lambda r: r["first_seq"])
                    os.remove(e.ledger._path(last["batch_id"]))
        # final full replay must repair every injected loss and land on
        # the clean-replay state exactly
        e.replay(cl, batch_size=batch)
        assert e.state_hash(include_tombstones=True) == want
        # the resume frontier reports the true complete prefix
        assert e.ledger.last_applied_seq() == 399
        # and one more replay over the committed log is a pure no-op
        assert e.replay(cl, batch_size=batch) == []
    finally:
        shutil.rmtree(base, ignore_errors=True)
