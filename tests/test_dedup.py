"""X7 dedup operator tests: behavioral checks on synthetic near-dups
plus plan assertions that candidate generation never degenerates to an
all-pairs crossJoin."""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    near_dedup_minhash,
    simhash_near_dup_pairs,
    verified_near_dup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to find some food for the long cold winter"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0 (modulo id)
        (2, BASE.replace("winter", "night")),  # near dup of 0
        (3, "completely different text about spark query engines and shuffles"),
        (4, "   The  QUICK brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark forest to find some food for the long cold winter "),
        # 4 = whitespace/case variant of 0 -> same fingerprint
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalizes_and_keeps_min_id(spark):
    out = exact_dedup(_docs(spark))
    ids = sorted(r.doc_id for r in out.collect())
    # 0,1,4 share a fingerprint -> keep 0; 2 and 3 unique
    assert ids == [0, 2, 3]


def test_minhash_identical_docs_identical_signatures(spark):
    sigs = {r.doc_id: r.minhash for r in minhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]
    assert len(sigs[0]) == 64


def test_near_dup_pairs_find_the_near_dup(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in verified_near_dup_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_near_dedup_minhash_drops_dups_keeps_unique(spark):
    out = near_dedup_minhash(_docs(spark), threshold=0.5)
    ids = sorted(r.doc_id for r in out.collect())
    assert 0 in ids and 3 in ids
    assert 1 not in ids and 2 not in ids


def test_simhash_pairs_exact_dups_zero_distance(spark):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(_docs(spark)).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert not any(3 in p for p in pairs)


def test_lsh_plan_has_no_cartesian_product(spark, sf_dir):
    from breweries_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    for df in (
        verified_near_dup_pairs(docs, threshold=0.5),
        simhash_near_dup_pairs(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_connected_components_chain_star_isolated(spark):
    from breweries_data_pipeline_spark.operators.graph import connected_components

    # chain 1-2-3-4, star 10-{11,12,13}, isolated 20
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (10, 12), (13, 10)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 13, 20]], "id long")
    lab = {r.id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20}


def test_connected_components_long_chain_converges_by_jumping(spark):
    from breweries_data_pipeline_spark.operators.graph import connected_components

    n = 200  # chain of 200 nodes; naive propagation would need 200 rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    lab = connected_components(edges, nodes, max_iter=12)
    assert lab.filter(F.col("cluster_id") != 0).count() == 0


def _chain_docs(spark):
    """A 2-hop duplicate chain through a high-id hub: docs 1 and 2
    share nothing with each other, doc 3 is the token-union of both —
    so the verified pair graph is (1,3), (2,3) and 1~2 only
    transitively. Crucially doc 2 is never the LARGER id of any pair,
    which is exactly the case the single-pass anti-join cannot see."""
    a = " ".join(f"alpha{i}" for i in range(20))
    c = " ".join(f"omega{i}" for i in range(20))
    rows = [(1, a), (2, c), (3, a + " " + c)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_near_dedup_chain_safe_collapses_multi_hop(spark):
    """chain_safe=True must leave ONE survivor of the 1-3-2 chain;
    chain_safe=False documents the miss (doc 2 survives)."""
    docs = _chain_docs(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in verified_near_dup_pairs(docs, threshold=0.4, bands=32).collect()
    }
    assert (1, 3) in pairs and (2, 3) in pairs and (1, 2) not in pairs

    chain_safe = sorted(
        r.doc_id
        for r in near_dedup_minhash(docs, threshold=0.4, bands=32).collect()
    )
    assert chain_safe == [1]

    single_pass = sorted(
        r.doc_id
        for r in near_dedup_minhash(
            docs, threshold=0.4, bands=32, chain_safe=False
        ).collect()
    )
    assert single_pass == [1, 2]


def test_exact_collapse_yields_star_not_clique(spark):
    """10 byte-identical docs must produce 9 star edges (rep 0 ->
    members, jaccard exactly 1.0), NOT the 45-pair clique — the
    candidate-volume property that keeps LSH linear in copy count
    (r6 soak: the clique form cost 61x at 10 copies/vector). The
    dedup RESULT must be identical to the literal all-pairs form."""
    rows = [(i, BASE) for i in range(10)] + [
        (10, BASE.replace("winter", "night")),
        (11, "completely different text about spark query engines"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in verified_near_dup_pairs(docs, threshold=0.5).collect()
    }
    star = {(0, i) for i in range(1, 10)}
    assert star <= set(pairs)
    assert all(pairs[p] == 1.0 for p in star)
    # no intra-group clique edges (1,2), (2,7), ...
    assert not any(
        a != 0 and a < 10 and b < 10 for (a, b) in pairs
    ), sorted(pairs)
    # near-dup of the group (10) pairs with the REPRESENTATIVE only
    assert (0, 10) in pairs
    # dedup result identical with and without the collapse
    fast = {r.doc_id for r in near_dedup_minhash(docs, threshold=0.5).collect()}
    assert fast == {0, 11}
    lit_pairs = verified_near_dup_pairs(docs, threshold=0.5, collapse_exact=False)
    lit_dups = {r.id_b for r in lit_pairs.collect()}
    assert {r.doc_id for r in docs.collect()} - lit_dups == fast


def test_near_dedup_incremental_flags_history_matches(spark):
    from breweries_data_pipeline_spark.operators.dedup import near_dedup_incremental

    history = spark.createDataFrame(
        [(10, BASE), (11, "some unrelated historical document about databases")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (100, BASE),  # exact copy of history 10 -> J = 1.0
            (101, BASE.replace("winter", "night")),  # near dup of 10
            (102, "a fresh never seen before piece of text entirely novel"),
        ],
        ["doc_id", "text"],
    )
    out = near_dedup_incremental(batch, history, threshold=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {100, 101, 102}  # one row per batch doc, always
    assert rows[100]["n_dups"] == 1
    assert rows[100]["best_match_id"] == 10
    assert rows[100]["best_jaccard_ppm"] == 1_000_000
    assert rows[101]["n_dups"] == 1 and rows[101]["best_match_id"] == 10
    assert 500_000 <= rows[101]["best_jaccard_ppm"] < 1_000_000
    assert rows[102]["n_dups"] == 0
    assert rows[102]["best_match_id"] is None

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_prefix_len_fixed_point_matches_exact_rational(spark):
    """The prefix length |X| - ceil(t|X|) + 1 must be computed in exact
    fixed-point: float ceil(t*size) rounds UP for thresholds whose
    double is slightly high (0.1*10 -> 1.0000000000000002, ceil=2),
    cutting the prefix one short and dropping true pairs at J=t."""
    from fractions import Fraction

    from breweries_data_pipeline_spark.operators.dedup import (
        _prefix_len_expr,
        _t_ppm,
    )

    thresholds = [0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95]
    sizes = list(range(1, 200))
    df = spark.createDataFrame([(s,) for s in sizes], ["size"])
    for t in thresholds:
        got = {
            r["size"]: r["plen"]
            for r in df.select(
                "size", _prefix_len_expr("size", _t_ppm(t)).alias("plen")
            ).collect()
        }
        frac_t = Fraction(_t_ppm(t), 1_000_000)
        for s in sizes:
            ceil_ts = -((-frac_t * s) // 1)
            assert got[s] == s - int(ceil_ts) + 1, (t, s)


def test_neardup_string_ids_preserved(spark):
    """best_match_id keeps the index id's own type: string doc ids
    must not be nulled by a long cast (ADVICE r6)."""
    from breweries_data_pipeline_spark.operators.dedup import near_dedup_incremental

    history = spark.createDataFrame([("h-10", BASE)], ["doc_id", "text"])
    batch = spark.createDataFrame([("b-100", BASE)], ["doc_id", "text"])
    out = near_dedup_incremental(batch, history, threshold=0.5)
    row = out.collect()[0]
    assert row["doc_id"] == "b-100"
    assert row["n_dups"] == 1
    assert row["best_match_id"] == "h-10"


def test_shingle_index_bucketed_roundtrip_exchange_free_corpus_side(spark, sf_dir):
    """The persisted-index claim, asserted not argued (r6 verdict #7):
    write the ShingleIndex as bucketed catalog tables, reload, run the
    daily candidate join — results identical to the in-memory index,
    and every CORPUS-side input (prefix, sets, freq) scans bucketed
    with no Exchange on its side of the joins; the only shingle-keyed
    exchanges left are the (small) new batch's."""
    import re

    from breweries_data_pipeline_spark.operators.dedup import (
        build_shingle_index,
        near_dedup_against_index,
        read_shingle_index_bucketed,
        write_shingle_index_bucketed,
    )
    from breweries_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 5 == 0)
    history = docs.where(F.col("doc_id") % 5 != 0)
    idx_mem = build_shingle_index(history, threshold=0.5)
    try:
        write_shingle_index_bucketed(idx_mem, "t_shidx_test", n_buckets=8)
        idx = read_shingle_index_bucketed(spark, "t_shidx_test")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = near_dedup_against_index(batch, idx, threshold=0.5)
            plan = out._jdf.queryExecution().executedPlan().toString()
            n_shingle_ex = len(re.findall(r"Exchange hashpartitioning\(shingle", plan))
            assert plan.count("Bucketed: true") >= 3, plan[:2000]
            assert n_shingle_ex <= 2, f"corpus-side exchange crept back: {n_shingle_ex}"

            mem = near_dedup_against_index(batch, idx_mem, threshold=0.5)
            mplan = mem._jdf.queryExecution().executedPlan().toString()
            n_mem_ex = len(re.findall(r"Exchange hashpartitioning\(shingle", mplan))
            assert n_shingle_ex < n_mem_ex  # bucketing removed corpus exchanges

            assert sorted(map(tuple, out.collect())) == sorted(map(tuple, mem.collect()))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        for t in ("prefix", "sets", "freq", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS t_shidx_test_{t}")


def test_shingle_index_path_roundtrip_and_format_guard(spark, tmp_path):
    """write_shingle_index -> read_shingle_index reproduces the daily
    candidate join bit-for-bit, and a pre-v2 layout (flat meta.json,
    prefix without 'pos') is rejected with an actionable error instead
    of failing later with PATH_NOT_FOUND / UNRESOLVED_COLUMN."""
    import pytest as _pytest

    from breweries_data_pipeline_spark.operators.dedup import (
        build_shingle_index,
        near_dedup_against_index,
        read_shingle_index,
        write_shingle_index,
    )

    history = spark.createDataFrame(
        [(1, BASE), (2, BASE + " tail tokens here"), (3, "completely different words")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame([(100, BASE)], ["doc_id", "text"])
    idx_mem = build_shingle_index(history, threshold=0.5)
    path = str(tmp_path / "shidx")
    write_shingle_index(idx_mem, path)
    idx = read_shingle_index(spark, path)
    assert idx.threshold == 0.5 and idx.shingle_size == 3
    out = sorted(map(tuple, near_dedup_against_index(batch, idx, threshold=0.5).collect()))
    mem = sorted(map(tuple, near_dedup_against_index(batch, idx_mem, threshold=0.5).collect()))
    assert out == mem

    # pre-v2 layout #1: meta.json flat file instead of a meta dataset
    old = tmp_path / "oldidx"
    old.mkdir()
    (old / "meta.json").write_text('{"threshold": 0.5, "shingle_size": 3}')
    with _pytest.raises(ValueError, match="[Rr]ebuild"):
        read_shingle_index(spark, str(old))

    # pre-v2 layout #2: meta dataset present but prefix lacks 'pos'
    legacy = tmp_path / "legacyidx"
    spark.createDataFrame(
        [(0, 1, 2)], "threshold_ppm bigint, shingle_size int, format_version int"
    ).coalesce(1).write.mode("overwrite").json(str(legacy / "meta"))
    idx.prefix.drop("pos").write.mode("overwrite").parquet(str(legacy / "prefix"))
    with _pytest.raises(ValueError, match="pos"):
        read_shingle_index(spark, str(legacy))

    # version enforcement both ways: a fingerprinted index writes
    # format_version 3 (different on-disk shingle type) and reads
    # back; an UNKNOWN future version is rejected loudly instead of
    # silently mis-joining a layout this reader does not understand
    fp_path = str(tmp_path / "fpidx")
    write_shingle_index(
        build_shingle_index(history, threshold=0.5, fingerprint=True), fp_path
    )
    meta = spark.read.json(fp_path + "/meta").first()
    assert int(meta["format_version"]) == 3 and bool(meta["fingerprint"])
    assert read_shingle_index(spark, fp_path).fingerprint is True
    future = tmp_path / "futureidx"
    spark.createDataFrame(
        [(500000, 3, 4, False)],
        "threshold_ppm bigint, shingle_size int, format_version int, "
        "fingerprint boolean",
    ).coalesce(1).write.mode("overwrite").json(str(future / "meta"))
    idx.prefix.write.mode("overwrite").parquet(str(future / "prefix"))
    with _pytest.raises(ValueError, match="format_version=4"):
        read_shingle_index(spark, str(future))


def test_bucket_star_survivors_equal_clique_survivors(spark, sf_dir):
    """Star-vs-clique CC equivalence EXECUTED, not argued: on the real
    corpus, bucket-star edges (lsh_bucket_star_edges — one edge per
    non-min member, linear) and the bucket's full C(n,2) clique edges
    (quadratic self-join) must yield identical connected components,
    hence identical dedup survivors."""
    from breweries_data_pipeline_spark.operators.dedup import (
        lsh_bucket_star_edges,
        lsh_candidate_pairs,
    )
    from breweries_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from breweries_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", "doc_id", 64, 3).select(
        "doc_id", "minhash"
    )
    sigs.persist()
    try:

        def survivors(edges):
            paired = (
                edges.select(F.col("id_a").alias("doc_id"))
                .unionByName(edges.select(F.col("id_b").alias("doc_id")))
                .distinct()
            )
            comp = connected_components(
                edges, paired, src="id_a", dst="id_b", id_col="doc_id"
            )
            drop = comp.filter(
                F.col("doc_id") != F.col("cluster_id")
            ).select("doc_id")
            return {
                r.doc_id
                for r in docs.join(drop, "doc_id", "left_anti")
                .select("doc_id")
                .collect()
            }

        star = survivors(lsh_bucket_star_edges(sigs, "doc_id", 16, 4))
        clique = survivors(lsh_candidate_pairs(sigs, "doc_id", 16, 4))
        assert star == clique
        assert len(star) > 0
    finally:
        sigs.unpersist()


def test_fingerprint_index_matches_byte_faithful_twin(spark, sf_dir):
    """The fingerprint-before-exchange contract (r8 verdict #2): an
    index built over xxhash64 shingle fingerprints must produce the
    SAME daily-ingest annotations as the byte-faithful index, row for
    row — plus explicit collision accounting: on the fixture corpus
    the number of distinct shingle strings equals the number of
    distinct fingerprints (zero collisions), which is the exactness
    precondition the docstrings state. Also asserts the persisted
    flag survives the bucketed round-trip so a batch queried against
    a reloaded fingerprint index shingles the same way."""
    from breweries_data_pipeline_spark.operators.dedup import (
        _shingle_sets,
        build_shingle_index,
        near_dedup_against_index,
        read_shingle_index_bucketed,
        write_shingle_index_bucketed,
    )
    from breweries_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 5 == 0)
    history = docs.where(F.col("doc_id") % 5 != 0)

    # collision accounting over the WHOLE corpus (both sides)
    sets = _shingle_sets(docs, "text", "doc_id", 3)
    n_strings, n_fps = (
        sets.select(F.explode("shingles").alias("s"))
        .agg(
            F.countDistinct("s").alias("a"),
            F.countDistinct(F.xxhash64("s")).alias("b"),
        )
        .first()
    )
    assert n_strings == n_fps, "64-bit collision on fixture corpus"

    plain = near_dedup_against_index(
        batch, build_shingle_index(history, threshold=0.5), threshold=0.5
    )
    try:
        write_shingle_index_bucketed(
            build_shingle_index(history, threshold=0.5, fingerprint=True),
            "t_shidx_fp_test",
            n_buckets=8,
        )
        idx_fp = read_shingle_index_bucketed(spark, "t_shidx_fp_test")
        assert idx_fp.fingerprint is True  # flag survives the round-trip
        # the persisted sets/prefix really are longs, not strings
        assert dict(idx_fp.sets.dtypes)["shingles"] == "array<bigint>"
        assert dict(idx_fp.prefix.dtypes)["shingle"] == "bigint"
        fp = near_dedup_against_index(batch, idx_fp, threshold=0.5)
        assert sorted(map(tuple, fp.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        for t in ("prefix", "sets", "freq", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS t_shidx_fp_test_{t}")


def test_sentence_dedup_fp_matches_byte_faithful_twin(spark, sf_dir):
    """q_sentence_dedup_fp must reproduce q_sentence_dedup_global row
    for row on the fixture corpus (its md5-60-bit fingerprints are
    collision-free there — accounted explicitly), and its rank
    exchange must be keyed by the FINGERPRINT, never the sentence
    text (the whole point: the heavy shuffle carries 8-byte longs)."""
    from breweries_data_pipeline_spark.queries import (
        q_sentence_dedup_fp,
        q_sentence_dedup_global,
    )
    from breweries_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    sents = docs.select(
        F.explode(F.split("text", r"[.!?][ \t\n\x0b\f\r]+")).alias("sent")
    )
    n_sents, n_fps = sents.agg(
        F.countDistinct("sent").alias("a"),
        F.countDistinct(
            F.expr("cast(conv(substr(md5(sent), 1, 15), 16, 10) as bigint)")
        ).alias("b"),
    ).first()
    assert n_sents == n_fps, "60-bit collision on fixture corpus"

    fp = q_sentence_dedup_fp(spark, sf_dir)
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__fp" in plan  # rank shuffle keyed by fp
    raw = q_sentence_dedup_global(spark, sf_dir)
    assert sorted(map(tuple, fp.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_collapse_exact_index_matches_uncollapsed(spark, sf_dir):
    """The exact-collapse funnel order, proven semantics-preserving:
    an index built with collapse_exact=True (one rep per distinct
    history text + w multiplicities) queried by a collapse_exact=True
    batch must annotate every batch doc IDENTICALLY to the plain
    uncollapsed run — n_dups counts every corpus copy via w, and
    best_match_id is the best group's min id because the rep is that
    id. This is the lever that keeps candidate volume proportional to
    distinct-text pairs instead of copy-count squared (the sf10 disk
    ceiling's root cause)."""
    from breweries_data_pipeline_spark.operators.dedup import (
        build_shingle_index,
        near_dedup_against_index,
    )
    from breweries_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    # replicate the corpus 3x with distinct ids so exact-dup groups
    # exist on BOTH sides (the fixture corpus alone has few)
    tripled = docs.selectExpr(
        "explode(array(doc_id, doc_id + 1000000, doc_id + 2000000)) AS doc_id",
        "text",
    )
    batch = tripled.where(F.col("doc_id") % 5 == 0)
    history = tripled.where(F.col("doc_id") % 5 != 0)

    plain = near_dedup_against_index(
        batch, build_shingle_index(history, threshold=0.5), threshold=0.5
    )
    idx_c = build_shingle_index(
        history, threshold=0.5, collapse_exact=True, fingerprint=True
    )
    assert "w" in idx_c.sets.columns
    coll = near_dedup_against_index(
        batch, idx_c, threshold=0.5, collapse_exact=True
    )
    assert sorted(map(tuple, coll.collect())) == sorted(
        map(tuple, plain.collect())
    )
