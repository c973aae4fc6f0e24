"""X8 similarity-search tests: exact-vs-oracle is covered by the
parity sweep; here we check the ANN path — recall against the exact
top-k, and that candidate generation is an equi-join (no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from breweries_data_pipeline_spark.operators.similarity import ann_topk, cosine_topk
from breweries_data_pipeline_spark.sources import read_table


def _probe_set(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") < 5)


def test_ann_recall_vs_exact(spark, sf_dir):
    emb, probes = _probe_set(spark, sf_dir)
    exact = {
        (r.probe_id, r.vec_id) for r in cosine_topk(emb, probes, k=5).collect()
    }
    ann = {(r.probe_id, r.vec_id) for r in ann_topk(emb, probes, k=5).collect()}
    recall = len(exact & ann) / len(exact)
    # 16 planes / 4 bands: banding keeps high-cosine pairs with high
    # probability; a floor of 0.4 catches structural breakage without
    # flaking on LSH variance.
    assert recall >= 0.4, f"ANN recall {recall:.2f} below floor"


def test_ann_scores_are_exact_for_returned_pairs(spark, sf_dir):
    emb, probes = _probe_set(spark, sf_dir)
    exact = {
        (r.probe_id, r.vec_id): r.cosine
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    for r in ann_topk(emb, probes, k=5).collect():
        if (r.probe_id, r.vec_id) in exact:
            assert r.cosine == exact[(r.probe_id, r.vec_id)]


def test_ann_plan_has_no_cartesian_product(spark, sf_dir):
    emb, probes = _probe_set(spark, sf_dir)
    plan = ann_topk(emb, probes, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ivf_recall_vs_exact(spark, sf_dir):
    from breweries_data_pipeline_spark.operators.similarity import ivf_topk

    emb, probes = _probe_set(spark, sf_dir)
    exact = {(r.probe_id, r.vec_id) for r in cosine_topk(emb, probes, k=5).collect()}
    ivf = {(r.probe_id, r.vec_id) for r in ivf_topk(emb, probes, k=5).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall:.2f} below floor"


def test_ivf_kmeans_centroids_improve_or_match(spark, sf_dir):
    from breweries_data_pipeline_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb, probes = _probe_set(spark, sf_dir)
    cents = kmeans_centroids(emb, k=8, n_iter=2)
    assert len(cents) == 8
    dim = len(emb.select("embedding").first()[0])
    assert all(len(c) == dim for c in cents)

    exact = {(r.probe_id, r.vec_id) for r in cosine_topk(emb, probes, k=5).collect()}
    ivf = {
        (r.probe_id, r.vec_id)
        for r in ivf_topk(emb, probes, k=5, n_clusters=8, n_probe=3, kmeans_iter=2).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.4, f"IVF+kmeans recall {recall:.2f} below floor"


def test_embedding_dedup_drops_exact_duplicate_vectors(spark, sf_dir):
    from breweries_data_pipeline_spark.operators.similarity import (
        dedup_embeddings,
        embedding_near_dup_pairs,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    # clone vec 0 under a fresh id: an exact duplicate (cosine 1.0)
    clone = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    corpus = emb.unionByName(clone)
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(corpus, threshold=0.99).collect()
    }
    assert pairs.get((0, 1_000_000)) == pytest.approx(1.0, abs=1e-12)
    survivors = {r.vec_id for r in dedup_embeddings(corpus, threshold=0.99).collect()}
    assert 0 in survivors and 1_000_000 not in survivors

    plan = (
        embedding_near_dup_pairs(corpus, threshold=0.99)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_matches_numpy_lloyd_exactly(spark):
    """The one-row-per-cluster aggregate (r5 advice: no posexplode
    row amplification) must reproduce a reference numpy Lloyd
    iteration: same assignment (normalized-cosine argmax), same
    per-cluster per-dim means, empty clusters keeping their previous
    centroid."""
    import numpy as np

    from breweries_data_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    rng = np.random.RandomState(7)
    V = rng.randn(60, 8).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<double>",
    )
    k, iters = 4, 2
    got = np.array(kmeans_centroids(df, k=k, n_iter=iters))

    cents = V[:k].copy()
    for _ in range(iters):
        C = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(Vn @ C.T, axis=1)
        for c in range(k):
            if (assign == c).any():
                cents[c] = V[assign == c].mean(axis=0)
    assert np.allclose(got, cents, rtol=1e-12, atol=1e-12), (
        np.abs(got - cents).max()
    )
