"""Session-scoped lifecycle for persisted intermediates.

Several dedup pipelines persist their signature/candidate lineages (the
UDF hot spot feeds both sides of a self-join — recomputing it doubles the
stage).  The returned DataFrames still reference those caches, so the
operator cannot unpersist before the caller materializes — but a
long-lived session running many queries (bench runs the whole registry)
would otherwise accumulate cached lineages in executor storage memory
indefinitely.

The contract: operators register every ``persist()`` they take out via
:func:`track`; entry points that run queries sequentially call
:func:`release_tracked` *before* starting the next query, freeing the
previous query's caches exactly when they can no longer be referenced.
The registry wrapper in ``queries.py`` applies this automatically to
every ``queries()`` entry, so the driver's 43-query sweep and ``bench.py``
hold at most one query's caches at a time.
"""

from __future__ import annotations

__all__ = ["track", "release_tracked"]

_TRACKED: list = []


def track(df):
    """Register a persisted DataFrame for deferred release; returns it."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns the count.
    Safe to call with dead SparkSessions — failures are swallowed because
    release is best-effort cleanup, never correctness."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 - best-effort cleanup
            pass
    return n
