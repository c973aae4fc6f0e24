"""Training-corpus management operators (BASELINE.json LLM-pipeline
surface; no reference analog — the reference is a tabular ELT
pipeline). The operations a 100 TB pretraining-data build needs after
dedup/quality filtering: deterministic split assignment, global
shuffle + sharding, and benchmark decontamination.

Design rules shared by all three:

- **Hash-derived pseudo-randomness, never RNG state.** Split and
  shuffle keys are md5 of (id, salt) — reproducible across runs,
  sessions, engines and partitionings, and oracle-checkable (DuckDB
  computes the identical digest). A seeded RNG would tie results to
  iteration order, which no distributed plan guarantees.
- **Narrow where possible.** Split assignment is a pure projection.
  The shuffle is one hash exchange on the shard id (each shard sorts
  locally — never a global sort). Decontamination broadcasts the
  (small) benchmark shingle set and anti-joins — one corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from breweries_data_pipeline_spark.functions.text import shingles, tokens


def hash_bucket(col: Column, salt: str, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): the first 8 hex chars of
    md5(col || ':' || salt) parsed as an integer, mod buckets. 32 bits
    of digest keeps the parse inside a long while leaving bucket skew
    at ~2^-16 for any realistic bucket count."""
    digest = F.md5(F.concat(col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % buckets


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    salt: str = "split",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label by
    hash bucket — the standard leakage-safe split: membership depends
    only on the id, so re-running over a grown corpus never moves an
    existing document between splits (a positional split would).
    Narrow projection; zero shuffle."""
    b = hash_bucket(F.col(id_col), salt, 100)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    salt: str = "shuffle",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global shuffle materialized as (shard, pos):
    shard = hash bucket of the id, pos = rank of the full md5 digest
    within the shard (digest, id tie-break). Reading shards in order
    of (shard, pos) visits the corpus in hash order — equivalent to a
    seeded permutation but reproducible under any partitioning.

    Scale shape: the per-shard rank is the bucket-offset two-pass
    scheme (operators.windows.bucketed_row_number) keyed by the first
    two hex chars of the digest — an order-respecting 256-way split
    of each shard — so parallelism is n_shards x 256, not n_shards:
    even a 16-shard layout of a 100 TB corpus never sorts a whole
    shard on one task.
    """
    from breweries_data_pipeline_spark.operators.windows import (
        bucketed_row_number,
    )

    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    keyed = df.withColumn("__digest", digest).withColumn(
        "shard", hash_bucket(F.col(id_col), salt, n_shards)
    )
    return bucketed_row_number(
        keyed,
        ["shard"],
        [F.col("__digest"), F.col(id_col)],
        F.substring("__digest", 1, 2),
        rank_name="pos",
    ).drop("__digest")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: drop every training document that
    shares at least one token ``n``-gram with the benchmark corpus —
    the standard eval-leakage filter for pretraining data.

    Plan: the benchmark's distinct shingles (small by assumption) are
    broadcast; training docs explode to (id, shingle) and inner-join
    to find contaminated ids, then a broadcast anti-join removes them.
    One corpus scan, no shuffle of document text; at 100 TB the
    explode is the only amplification and it carries (long, short
    string) pairs."""
    bench_sh = (
        benchmark.select(F.explode(shingles(text_col, n)).alias("__sh")).distinct()
    )
    contaminated = (
        docs.select(id_col, F.explode(shingles(text_col, n)).alias("__sh"))
        .join(F.broadcast(bench_sh), "__sh")
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(contaminated), id_col, "left_anti")


def dsir_weights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style data selection by importance resampling (Xie et al.
    2023, arXiv:2302.03169): score every document by how much more
    likely its hashed-token features are under the TARGET distribution
    (rows where ``target`` is true) than under the raw corpus, then
    select high-scoring documents.

    Returns (id, weight_micro, selected): ``weight_micro`` is an exact
    integer — per feature f the add-1-smoothed ratio
    p_f/q_f = ((ct_f+1)/(Tt+B)) / ((cr_f+1)/(Tr+B)) is linearized to
    round((p/q - 1) * 1e6) (first-order Taylor of ln(p/q), exact under
    IEEE rounding in any engine) and the document weight is the
    integer sum of count_f * lr_micro_f. The paper's log-likelihood
    form is one F.log swap away; the linearized form is used so the
    DuckDB oracle hash-matches bit-for-bit (libm ln is not guaranteed
    identical across engines, exactly-rounded +,-,*,/ and round()
    are).

    Plan shape at 100 TB: one explode to (doc, feature) pairs; the
    feature model is B rows (bounded, independent of corpus size) so
    it broadcasts; per-doc scoring is one groupBy(doc, feature) with
    map-side combine then one groupBy(doc). No shuffle carries raw
    text. Hashed features cap model size exactly as in the paper
    (they use 10k buckets at trillion-token scale)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("__w"),
        target.alias("__is_t"),
    )
    feats = toks.select(
        id_col,
        hash_bucket(F.col("__w"), salt, buckets).alias("__f"),
        "__is_t",
    )
    model = feats.groupBy("__f").agg(
        F.count("*").alias("__cr"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__ct"),
    )
    totals = model.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    b = float(buckets)
    lr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "__f",
            F.round(
                (
                    ((F.col("__ct") + 1.0) / (F.col("__tt") + b))
                    / ((F.col("__cr") + 1.0) / (F.col("__tr") + b))
                    - 1.0
                )
                * 1000000.0
            )
            .cast("long")
            .alias("__lr_micro"),
        )
    )
    perdoc = feats.groupBy(id_col, "__f").agg(F.count("*").alias("__cnt"))
    return (
        perdoc.join(F.broadcast(lr), "__f")
        .groupBy(id_col)
        .agg(F.sum(F.col("__cnt") * F.col("__lr_micro")).alias("weight_micro"))
        .select(
            id_col,
            "weight_micro",
            (F.col("weight_micro") >= 0).alias("selected"),
        )
    )


# tracking-parameter prefixes a crawl pipeline strips before URL-keyed
# dedup (the CommonCrawl/CCNet convention: analytics params vary per
# FETCH, not per document, so they only split true duplicate groups)
TRACKING_PARAM_RE = "^(utm_|ref=|fbclid=|gclid=)"


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL for URL-keyed dedup, entirely
    in JVM built-ins (zero UDFs — a pure projection):

    - scheme and host lowercased; the scheme's DEFAULT port stripped
      (:80 for http, :443 for https — a non-default port is identity);
    - fragment dropped (never sent to the server);
    - tracking query params (``TRACKING_PARAM_RE``) dropped;
    - surviving query params sorted (param order is transport noise);
    - an emptied query string drops its '?'.

    This is the first stage of a crawl-corpus dedup funnel: exact
    canonical-URL collapse removes the refetch/tracking-variant class
    orders of magnitude cheaper than any content hashing — and at
    100 TB it matters that it is a NARROW projection: the whole
    transform runs inside whole-stage codegen and the downstream
    groupBy's exchange carries only the canonical key."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    )
    host = F.lower(F.regexp_extract(nofrag, r"^[^:]+://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(nofrag, r"^[^:]+://[^/?#]+(.*)$", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = (
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
        )
        .otherwise(F.lit(""))
    )
    return F.concat(scheme, F.lit("://"), host, path, qs)
