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


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Bloom-filter semi-join reduction: prune ``fact`` rows that
    cannot match ``dim`` BEFORE the join's shuffle, then run the exact
    equi-join — result-identical to ``fact.join(dim, on, how)`` for
    inner/semi joins (false positives survive the prefilter but die in
    the exact join; false negatives are impossible).

    Why it matters at 100 TB: when the build side is too large to
    broadcast as rows (say 10^9 distinct keys x 8 bytes) its Bloom
    bitmap still fits in single-digit MBs, and a selective dim
    predicate then cuts the probe-side exchange by the join
    selectivity — the dominant cost of a fact join at scale. This is
    the same rewrite Spark's AQE applies with
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` (and Trino /
    Iceberg call dynamic filtering); the explicit form is
    deterministic — no size-threshold heuristics — so plans are
    assertable in tests and stable across data growth.

    Mechanics (all JVM-side, no UDFs):
    - build: ``num_hashes`` positions per dim key via seeded xxhash64
      mod ``num_bits``; distinct positions collapse to <= num_bits/64
      (word, bits) rows via bit_or — a tiny aggregate over only the
      key column;
    - ship: the word->bits map rides a one-row broadcast crossJoin
      (the Q22-style scalar attach), i.e. the bitmap is broadcast
      ONCE, not re-evaluated per row;
    - probe: each fact row recomputes its positions and AND-tests the
      map words; a missing word means bit 0 -> row pruned.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prune_join supports how='inner'/'left_semi', got {how!r}: "
            "outer/anti joins need the pruned rows"
        )

    def _positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
        ]

    def _one_shl(bits_col):
        # shiftleft() only takes a Python int in the PySpark wrapper;
        # call the SQL function directly for a column shift amount
        return F.call_function(
            "shiftleft", F.lit(1).cast("long"), bits_col.cast("int")
        )

    # no distinct before the bit_or: OR absorbs duplicate positions,
    # so the partial (map-side) bit_or already collapses them — one
    # shuffle of <= num_bits/64 words per map task, not a distinct's
    # full position exchange
    num_words = (num_bits + 63) // 64
    pos = dim.select(F.explode(F.array(*_positions(F.col(on)))).alias("__pos"))
    words = pos.groupBy(
        (F.col("__pos") / 64).cast("int").alias("__word")
    ).agg(
        F.bit_or(_one_shl(F.pmod(F.col("__pos"), F.lit(64)))).alias("__bits")
    )
    # densify to an ARRAY indexed by word: Spark's map element_at is a
    # LINEAR scan over ArrayBasedMapData (O(num_words) per lookup —
    # measured 5x2048-entry scans per fact row before this), while
    # array element_at is O(1)
    sparse = words.agg(
        F.map_from_entries(F.collect_list(F.struct("__word", "__bits"))).alias("__m")
    )
    bitmap = sparse.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0).cast("long")),
        ).alias("__bloom")
    )

    tests = []
    for p in _positions(F.col(on)):
        word = (p / 64).cast("int")
        bit = _one_shl(F.pmod(p, F.lit(64)))
        tests.append(
            F.element_at(F.col("__bloom"), word + 1).bitwiseAND(bit) != 0
        )
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    pruned = (
        fact.crossJoin(F.broadcast(bitmap)).where(cond).drop("__bloom")
    )
    return pruned.join(dim, on, how)
