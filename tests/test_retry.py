"""Transient-failure retry envelope around sink commits.

Reference parity: poll-ingest-job.py:46-56 — jittered bounded retries
for transient failures, immediate surfacing of logic errors.
"""

import pytest

from clinvar_ingest_spark.retry import RetryPolicy, with_retries


def test_success_passthrough_no_sleep():
    sleeps = []
    assert with_retries(lambda: 42, sleep=sleeps.append) == 42
    assert sleeps == []


def test_transient_errors_retry_with_bounded_jitter():
    policy = RetryPolicy(attempts=5, base_delay_secs=0.2, seed=7)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("disk hiccup")
        return "ok"

    sleeps = []
    retries = []
    out = with_retries(
        flaky, policy, sleep=sleeps.append,
        on_retry=lambda a, e, d: retries.append((a, str(e), d)),
    )
    assert out == "ok" and calls["n"] == 3
    # full jitter: delay_i ∈ [0, base * 2^i], deterministic under seed
    assert len(sleeps) == 2
    assert 0.0 <= sleeps[0] <= 0.2 and 0.0 <= sleeps[1] <= 0.4
    assert [d for _, _, d in retries] == sleeps
    # same seed → same delays (reproducible)
    calls["n"] = 0
    sleeps2 = []
    with_retries(flaky, policy, sleep=sleeps2.append)
    assert sleeps2 == sleeps


def test_non_retryable_raises_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("logic bug")

    with pytest.raises(ValueError):
        with_retries(bad, RetryPolicy(seed=1), sleep=lambda _: None)
    assert calls["n"] == 1


def test_occ_conflict_passes_through_untouched():
    from clinvar_ingest_spark.lakelet.table import CommitConflictError

    calls = {"n": 0}

    def conflicted():
        calls["n"] += 1
        raise CommitConflictError("head moved")

    with pytest.raises(CommitConflictError):
        with_retries(conflicted, RetryPolicy(seed=1), sleep=lambda _: None)
    assert calls["n"] == 1  # re-plan is the engine loop's job, not ours


def test_exhaustion_reraises_last_error():
    calls = {"n": 0}

    def always():
        calls["n"] += 1
        raise OSError(f"hiccup {calls['n']}")

    with pytest.raises(OSError, match="hiccup 3"):
        with_retries(
            always, RetryPolicy(attempts=3, seed=1), sleep=lambda _: None
        )
    assert calls["n"] == 3


def test_mid_commit_transient_failure_reconverges(spark, tmp_path):
    """A transient IO error raised INSIDE a batch's manifest commit
    (after data files may exist, before the head moves) retries into
    the SAME idempotent snapshot: the victim's final state hash, ledger
    and snapshot chain equal a never-failed control replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )

    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            generate_changelog(ChangelogSpec(n_events=900, n_urls=120, seed=11)),
            schema=changelog_arrow_schema(),
            preserve_index=False,
        ),
        p,
    )
    cl = spark.read.parquet(p)

    control = CdcEngine(spark, str(tmp_path / "control"), n_buckets=8)
    control.replay(cl, batch_size=300)

    victim = CdcEngine(
        spark,
        str(tmp_path / "victim"),
        n_buckets=8,
        retry_policy=RetryPolicy(attempts=3, base_delay_secs=0.005, seed=3),
    )
    real = victim.table._commit_manifest
    state = {"commits": 0, "failed": False}

    def flaky(*args, **kwargs):
        state["commits"] += 1
        if state["commits"] == 2 and not state["failed"]:
            state["failed"] = True  # one transient hiccup, mid-replay
            raise OSError("simulated transient sink failure")
        return real(*args, **kwargs)

    victim.table._commit_manifest = flaky
    victim.replay(cl, batch_size=300)

    assert state["failed"]  # the injection actually fired
    assert victim.state_hash() == control.state_hash()
    assert victim.table.history() == control.table.history()
    # exactly one lineage record per batch — the retry never double-applied
    assert victim.lineage().count() == control.lineage().count()


def test_engine_logs_and_counts_transient_retries(spark, tmp_path, caplog):
    """Transient commit retries are observable: each fires a WARNING
    naming the batch/attempt/delay and bumps engine.retries_total —
    previously-fatal errors must never be retried in silence."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )

    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            generate_changelog(ChangelogSpec(n_events=300, n_urls=60, seed=5)),
            schema=changelog_arrow_schema(),
            preserve_index=False,
        ),
        p,
    )
    cl = spark.read.parquet(p)
    eng = CdcEngine(
        spark,
        str(tmp_path / "t"),
        n_buckets=4,
        retry_policy=RetryPolicy(attempts=3, base_delay_secs=0.001, seed=1),
    )
    real = eng.table._commit_manifest
    state = {"n": 0}

    def flaky(*args, **kwargs):
        state["n"] += 1
        if state["n"] == 1:
            raise OSError("simulated transient sink failure")
        return real(*args, **kwargs)

    eng.table._commit_manifest = flaky
    with caplog.at_level(logging.WARNING, logger="clinvar_ingest_spark.engine"):
        eng.replay(cl, batch_size=300)
    assert eng.retries_total == 1
    msgs = [r.message for r in caplog.records if "transient error" in r.message]
    assert len(msgs) == 1
    assert "attempt 1" in msgs[0] and "retrying in" in msgs[0]
