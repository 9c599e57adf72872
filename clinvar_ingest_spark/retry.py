"""Bounded jittered-backoff retry envelope for sink commits.

Reference parity: the reference polls its async TDR ingest jobs with a
jittered step and a hard timeout, treating 5xx responses as transient
("internal_error") while logic errors raise immediately
(orchestration/scripts/poll-ingest-job.py:18-56 — ``step_function``
returns ``random.randint(step, step + 10)``). This repo's sink commits
are synchronous, so the analogue is a retry envelope AROUND the commit:

- transient IO errors (``OSError`` by default) re-run the commit after
  an exponential full-jitter backoff, bounded by ``attempts``;
- every commit in the engine is idempotent by deterministic batch id,
  so a retry converges to the SAME snapshot — never a duplicate apply;
- optimistic-concurrency conflicts (``CommitConflictError``) are NOT
  transient: they must re-plan against the new head, which
  ``CdcEngine.apply_batch`` already does in its own loop, so the
  envelope re-raises them untouched.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Callable, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded exponential backoff with full jitter.

    ``seed=None`` draws real jitter (production — decorrelates writers
    that failed together); tests pin a seed for reproducible delays.
    """

    attempts: int = 5
    base_delay_secs: float = 0.2
    max_delay_secs: float = 10.0
    retryable: tuple[type[BaseException], ...] = (OSError,)
    seed: int | None = None

    def delay_for(self, attempt: int, rng: random.Random) -> float:
        """Full-jitter delay for the given 0-based failed attempt."""
        cap = min(self.max_delay_secs, self.base_delay_secs * (2.0**attempt))
        return rng.uniform(0.0, cap)


def with_retries(
    fn: Callable[[], T],
    policy: RetryPolicy | None = None,
    *,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException, float], None] | None = None,
) -> T:
    """Run ``fn`` to success, retrying transient errors per ``policy``.

    Retries only ``policy.retryable`` exception types; anything else
    (including CommitConflictError) propagates on the first raise. The
    final failure re-raises the last transient error itself — callers
    see the real cause, not a wrapper.
    """
    policy = policy or RetryPolicy()
    if policy.attempts < 1:
        raise ValueError(f"RetryPolicy.attempts must be >= 1, got {policy.attempts}")
    rng = random.Random(policy.seed)
    last: BaseException | None = None
    for attempt in range(policy.attempts):
        try:
            return fn()
        except policy.retryable as e:  # noqa: PERF203 — the retry IS the point
            last = e
            if attempt == policy.attempts - 1:
                break
            delay = policy.delay_for(attempt, rng)
            if on_retry is not None:
                on_retry(attempt + 1, e, delay)
            sleep(delay)
    assert last is not None
    raise last
