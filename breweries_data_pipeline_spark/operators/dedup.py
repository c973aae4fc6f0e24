"""Text deduplication operators (SURVEY.md §2.6 X7; BASELINE.json:
exact dedup, MinHash-LSH, SimHash, n-gram Jaccard).

Design for 100 TB — the non-negotiable rule is that candidate
generation is ALWAYS a bucketed equi-join (shuffle on a bucket key),
never an all-pairs crossJoin:

- exact dedup: md5 fingerprint -> one shuffle on the fingerprint.
- MinHash-LSH: signature is a narrow map (no explode, no shuffle);
  banding explodes to ``bands`` rows per doc; candidates come from a
  self equi-join on ``(band, band_hash)`` so only same-bucket docs
  ever meet. Verification re-checks candidates with exact n-gram
  Jaccard (two hash joins against the shingle table).
- SimHash: 64-bit signature via one token explode + groupBy(doc);
  candidates via the pigeonhole block trick (hamming <= k over 4
  blocks of 16 bits => at least one block equal when k <= 3), again a
  self equi-join on the block value.

Hash family: seeded ``xxhash64(value, i)`` — pure JVM, and avoids
``(a*h+b) mod p`` arithmetic that overflows long under ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from breweries_data_pipeline_spark.functions.text import ngram_jaccard, shingles
from breweries_data_pipeline_spark.operators.clean import deduplicate
from breweries_data_pipeline_spark.operators.text import with_fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact text dedup: md5 of whitespace-normalized text, keep the
    smallest id per fingerprint (deterministic, replayable). One
    shuffle on the fingerprint — the hash key is uniform by
    construction, so no skew at any scale."""
    return deduplicate(with_fingerprint(df, text_col), ["fingerprint"], order_by=[id_col])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, shingles, minhash signature array<long>). Narrow map —
    zero shuffle; scan-bound at any scale."""
    sh = shingles(text_col, shingle_size)
    out = df.select(F.col(id_col), sh.alias("shingles"))
    # base 64-bit shingle hashes once; per-function minima re-hash the
    # longs with the function index as seed input.
    out = out.withColumn(
        "_sh_hash", F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("_sh_hash"), lambda h, i=i: F.xxhash64(h, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )
    return out.withColumn("minhash", sig).drop("_sh_hash")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of at least one band meet
    in a bucket. Returns distinct (id_a, id_b) with id_a < id_b.

    b=16, r=4 puts the S-curve threshold near (1/16)^(1/4) ~= 0.5
    Jaccard. Candidate generation is a self equi-join on
    (band, band_hash): shuffle keyed by the band hash — bucketed,
    never all-pairs. A pathological bucket (thousands of identical
    docs) produces a quadratic bucket locally; the exact-dedup pass
    should run first so LSH only sees unique texts.
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(F.slice("minhash", j * rows_per_band + 1, rows_per_band)).alias(
                    "band_hash"
                ),
            )
            for j in range(bands)
        ]
    )
    buckets = (
        sig_df.select(F.col(id_col), F.explode(band_structs).alias("b"))
        .select(id_col, "b.band", "b.band_hash")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def verified_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified with EXACT n-gram Jaccard:
    (id_a, id_b, jaccard) with jaccard >= threshold. False positives
    from banding are eliminated; false negatives bounded by the LSH
    S-curve. Verification is two hash joins of the (small) candidate
    set against the shingle table — broadcast-able when candidates
    are rare, which AQE decides at runtime."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    sh = sigs.select(F.col(id_col), "shingles")
    return (
        cands.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            ngram_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Near-dup dedup: drop every doc with a verified near-duplicate of
    smaller id (single-pass LSH dedup — clusters collapse toward their
    minimum id; chains longer than one hop survive a pass, the
    standard LSH-dedup tradeoff vs full connected components)."""
    pairs = verified_near_dup_pairs(
        df, text_col, id_col, threshold, num_hashes, bands, shingle_size
    )
    dup_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dup_ids, id_col, "left_anti")


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc: hash each token to 64 bits; per bit
    position sum +1/-1 over tokens; the sign vector packs into one
    long. One explode + one shuffle on the id — at 100 TB the explode
    is the cost; partial aggregation combines map-side so the shuffle
    carries 64 ints per doc, not per token."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("th", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    packed = None
    for i in range(64):
        term = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else packed.bitwiseOR(term)
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(simhash) <= k, k <= 3.
    Pigeonhole blocking: split 64 bits into 4 blocks of 16; distance
    <= 3 implies at least one identical block, so candidates come from
    4 self equi-joins on a block value (union, distinct) — bucketed,
    never all-pairs."""
    if max_hamming > 3:
        raise ValueError("4-block pigeonhole blocking is exact only for max_hamming <= 3")
    sigs = simhash64(df, text_col, id_col)
    mask = F.lit(0xFFFF).cast("long")
    blocks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        *[
            F.shiftright("simhash", 16 * j).bitwiseAND(mask).alias(f"blk{j}")
            for j in range(4)
        ],
    )
    cand = None
    for j in range(4):
        a = blocks.alias("a")
        b = blocks.alias("b")
        cj = a.join(
            b,
            (F.col(f"a.blk{j}") == F.col(f"b.blk{j}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        cand = cj if cand is None else cand.unionByName(cj)
    return (
        cand.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
