"""Count-min sketch over a key column (SURVEY.md §2.6 extension
surface: mergeable frequency sketches for 100 TB streams).

A CMS is a depth x width integer grid; every key increments one
counter per row (bucket = hash_r(key) % width) and a point estimate
is the MIN over the key's depth counters — always an overestimate,
with error <= 2N/width at 1 - (1/2)^depth probability.

Why it matters at scale: the sketch is a (depth * width)-row counts
table, independent of cardinality, built by ONE explode + hash
aggregate with map-side combine — and it MERGES by cell-wise sum
(compose with merge.merge_partial_aggs), so per-partition /
per-day sketches roll up without re-reading history, exactly where
exact per-key counts would need a full re-shuffle of the raw keys.

Hashing is the engine's cross-engine md5 idiom (corpus.hash_bucket
with a per-row salt), so DuckDB reproduces the grid bit-for-bit —
the sketch is deterministic, not sampled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from breweries_data_pipeline_spark.operators.corpus import hash_bucket


def cms_build(
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 128,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch: (r, bucket, cnt) with one row per non-empty
    cell (<= depth * width rows regardless of input size)."""
    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        hash_bucket(
                            F.col(key_col), f"{salt}{r}", width
                        ).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(
        F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 128,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each probe key: min over its depth counters.
    The sketch (bounded size) is broadcast; probes never shuffle."""
    probed = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        hash_bucket(
                            F.col(key_col), f"{salt}{r}", width
                        ).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket"))
    return (
        probed.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def ams_f2_sketch(
    keys: DataFrame, key_col: str, *, lanes: int = 16, salt: str = "ams"
) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) F2 sketch: per lane r, the signed
    occurrence sum Z_r = sum over the key stream of s_r(key) where
    s_r is a deterministic ±1 hash. E[Z_r^2] = F2 = sum of squared
    key frequencies — the repeat-rate / self-join-size moment that
    prices dedup and skew BEFORE running them.

    All `lanes` signs come from ONE md5 per key — the digest's first
    four hex chars parse to a 16-bit word and lane r takes bit r (the
    same digest-splitting idiom as the md5-lane MinHash/SimHash
    twins). The first cut hashed per-lane (16 md5s per key) and the
    sketch dominated its own bench family: one digest is 16x less
    hashing for statistically equivalent lanes. The lane sums are 16
    conditional SUM columns of a single global aggregate — zero
    explode, zero shuffle rows beyond the one-row partial-agg merge —
    then unpivoted to (r, z) so the mergeable-sketch contract
    (lane-wise sum across partitions/days) is unchanged. DuckDB
    replays the digest arithmetic bit-for-bit. Returns (r, z)."""
    word = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))), 1, 4),
        16,
        10,
    ).cast("long")
    staged = keys.select(word.alias("__w"))
    sums = staged.agg(
        *[
            F.sum(
                (F.shiftright(F.col("__w"), r) % 2) * 2 - 1
            ).alias(f"z{r}")
            for r in range(lanes)
        ]
    )
    stack = ", ".join(f"{r}L, z{r}" for r in range(lanes))
    return sums.selectExpr(f"stack({lanes}, {stack}) AS (r, z)")
