"""Query-scoped registry of persisted intermediate frames.

Several stages persist small intermediates so coordinator-style probes
and the final join read ONE materialization of the upstream pipeline
(binary matching chain, fallback emptiness probes, the distributed rank's
range-partitioned stat table, MinHash signatures).  Spark has no
"after the action" hook, so those stages cannot unpersist on their own
success path — the frames are still lazy parts of the returned plan.  In
a long-lived session the cached blocks would accumulate and evict
executor memory (the reference has no analogous leak: its coordinator
holds series lists on the request heap, freed with the request).

Contract: stages call :func:`persist_tracked` instead of ``persist``;
query boundaries call :func:`release_all` once the previous result has
been materialized — the service facade releases after shaping each
response, and every catalog entry point releases on build, so at most
one query's caches are ever live.  ``unpersist`` is always safe: if a
released frame is re-executed later, Spark recomputes it from lineage
(correctness never depends on the cache).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for the next :func:`release_all`."""
    cached = df.persist(level)
    _TRACKED.append(cached)
    return cached


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame (LIFO); returns the release count.
    Never raises — a frame whose session already stopped is skipped."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n
