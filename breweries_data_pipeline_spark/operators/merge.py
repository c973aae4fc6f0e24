"""CDC merge / upsert (changelog -> snapshot), the lakehouse MERGE
semantics a training-data pipeline needs for incrementally-updated
corpora. No reference analog (the reference overwrites whole layers).

``merge_upsert`` is latest-record-wins: union the base snapshot with
the change stream, keep the highest-version record per key (one
shuffle on the keys — identical cost shape to the engine's
deterministic dedup), then drop records whose final state is a delete
marker. Pure DataFrame composition: at scale this is exactly the
shuffle a MERGE INTO performs, minus transactional commit (pair with
the atomic-publish writers for snapshot isolation at the directory
level).

Skew note: a hot key concentrates its full history in one task; for
pathological keys compose with deduplicate_salted's two-phase ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[Column],
    *,
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Merge ``changes`` into ``base``: per key, the first row under
    ``order_by`` (pass version/timestamp columns DESC) wins; if the
    winning row satisfies ``delete_predicate`` the key disappears from
    the snapshot."""
    merged = base.unionByName(changes)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_predicate is not None:
        latest = latest.filter(~delete_predicate)
    return latest
