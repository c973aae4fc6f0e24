"""Session-level registry of persisted intermediates.

Several query/operator functions ``persist()`` an intermediate that
feeds multiple branches of the RETURNED (lazy) plan — an in-function
``unpersist()`` would defeat the cache before the caller ever executes
it, so the release has to happen after materialization. Every such
persist goes through :func:`track_persist` so a library user composing
query or operator functions in one long session can drop the
accumulated caches with one :func:`release_caches` call (the bench
calls ``spark.catalog.clearCache()`` between measurements, which
covers the same ground for its own process).

This lives one level below ``queries.py`` on purpose: the heaviest
caches are operator-level (MinHash signature tables, shingle-set
arrays, LSH band tables in ``operators/dedup.py`` /
``operators/similarity.py`` / ``operators/graph.py``), and a tracker
scoped to the query registry would miss exactly those when the
operators are used directly as a library.

Operators that fully consume a cache within their own function body
(persist -> iterate -> unpersist, e.g. the BFS/PageRank frontier
loops) manage their own lifecycle and do NOT go through the tracker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for later bulk release."""
    _TRACKED_CACHES.append(df)
    return df.persist()


def release_caches() -> int:
    """Unpersist every tracked intermediate so far. Returns the number
    released. Idempotent; safe to call anytime after the consumers have
    collected/written their results (the caches only pay off through
    materialization)."""
    n = 0
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
