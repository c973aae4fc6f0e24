"""Join operators (SURVEY.md §2.6 X1/X2 — extension surface; the
reference contains no data joins).

Strategy selection, not new machinery: Catalyst already implements
broadcast-hash, shuffled-hash and sort-merge joins; this module's job
is to hand it the right hints.

Scale rules of thumb encoded here:
- dimension tables (region/nation/customer-sized) -> ``F.broadcast``:
  zero shuffle of the fact side; at 100 TB the fact-side shuffle IS
  the cost, so broadcasting every eligible dim is the single biggest
  win.
- fact-fact joins -> shuffle (sort-merge) on the join key; rely on AQE
  skew-join splitting for hot keys; pre-bucketing both sides on the
  key removes the shuffle entirely for repeated joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    *,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact ⋈ dimension with an explicit broadcast hint on the dim.

    The hint is advisory — AQE will demote it if the dim exceeds the
    broadcast threshold at runtime, so it is safe to set by table role
    rather than measured size.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (EXISTS). Only the
    join key of ``right`` is shuffled/broadcast — never its payload."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on, "left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    *,
    salt_from: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating salted equi-join, result-identical to the plain
    join on ``key`` for ``how`` in {'inner', 'left'} — the only
    accepted types: with the other side replicated ``buckets``×,
    right/full outer would emit each unmatched replica (``buckets``
    phantom rows) and semi/anti read replicated matches, so those
    joins are rejected rather than silently wrong.

    The skewed probe side gets a deterministic per-row salt (xxhash64 of
    ``salt_from`` mod ``buckets``); the other side is replicated
    ``buckets``× with an exploded salt column; joining on
    ``(key, salt)`` splits each hot key's rows across ``buckets``
    shuffle partitions instead of landing them all on one reducer.

    Use when ONE side is skewed and the other is small enough that a
    ``buckets``× replication is cheaper than a straggler task (if the
    other side is dim-sized, prefer a plain broadcast join — no shuffle
    at all). AQE's skew-join splitting covers sort-merge joins
    automatically; salting is the explicit fallback for the cases AQE
    cannot rewrite (e.g. when the skewed side feeds a window/aggregate
    next, or AQE is off).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "replication breaks right/full/semi/anti semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets)).cast("int")
    salted = skewed.withColumn("__salt", salt)
    replicated = other.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(buckets)]))
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")
