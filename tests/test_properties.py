"""Property-based tests (hypothesis): engine operators vs naive Python
models on small generated frames. Complements the DuckDB oracle sweep
with adversarial inputs (empty strings, unicode-free edge ints,
duplicate keys, all-null columns)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from breweries_data_pipeline_spark.operators.clean import (
    deduplicate,
    drop_null_required,
    normalize_strings,
)
from breweries_data_pipeline_spark.operators.quality import rules_dataframe

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (forced collisions)
        st.integers(min_value=-100, max_value=100),  # ord
        st.one_of(st.none(), st.text(alphabet=" aBc\t", max_size=6)),  # s
    ),
    min_size=0,
    max_size=20,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_deduplicate_keeps_min_order_row(spark, rows):
    df = spark.createDataFrame(rows, "k long, o long, s string")
    got = {
        (r.k, r.o) for r in deduplicate(df, ["k"], order_by=["o", "s"]).collect()
    }
    model: dict[int, tuple] = {}
    for k, o, s in rows:
        cand = (o, s if s is not None else None)
        cur = model.get(k)
        # row_number orders nulls first for string asc (Spark default)
        key = (o, (s is None, s))
        if cur is None or key < cur[0]:
            model[k] = (key, (k, o))
    assert got == {v[1] for v in model.values()}


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_drop_null_required_model(spark, rows):
    df = spark.createDataFrame(rows, "k long, o long, s string")
    got = sorted((r.k, r.o) for r in drop_null_required(df, ["s"]).collect())
    want = sorted((k, o) for k, o, s in rows if s is not None)
    assert got == want


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_normalize_strings_model(spark, rows):
    df = spark.createDataFrame(rows, "k long, o long, s string")
    key = lambda t: (t[0], t[1] is None, t[1])  # noqa: E731 — None-safe sort
    got = sorted(
        ((r.k, r.s) for r in normalize_strings(df, ["s"]).select("k", "s").collect()),
        key=key,
    )
    # Spark's trim strips SPACES only (not \t), unlike str.strip()
    want = sorted(
        ((k, s.lower().strip(" ") if s is not None else None) for k, o, s in rows),
        key=key,
    )
    assert got == want


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_quality_not_null_counts_model(spark, rows):
    df = spark.createDataFrame(rows, "k long, o long, s string")
    report = rules_dataframe(
        df, [{"rule": "not_null", "column": "s"}, {"rule": "unique", "column": "k"}]
    ).collect()
    by_rule = {r.rule: r for r in report}
    assert by_rule["not_null"].invalid_count == sum(1 for _, _, s in rows if s is None)
    ks = [k for k, _, _ in rows]
    assert by_rule["unique"].invalid_count == len(ks) - len(set(ks))


PAIRS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=65535),
        st.integers(min_value=0, max_value=65535),
    ),
    min_size=1,
    max_size=12,
    unique=True,
)


@given(pairs=PAIRS)
@settings(**_SETTINGS)
def test_morton_key_is_bijective_on_domain(spark, pairs):
    """The Morton interleave must be invertible: distinct (a, b)
    pairs in the 16-bit domain map to distinct keys, and a Python
    bit-level decode recovers the inputs exactly."""
    from breweries_data_pipeline_spark.functions.zorder import morton_key

    df = spark.createDataFrame(pairs, ["a", "b"])
    out = df.select("a", "b", morton_key("a", "b").alias("k")).collect()
    assert len({r.k for r in out}) == len(pairs)
    for r in out:
        da = sum(((r.k >> (2 * i + 1)) & 1) << i for i in range(16))
        db = sum(((r.k >> (2 * i)) & 1) << i for i in range(16))
        assert (da, db) == (r.a, r.b)


@given(
    nums=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_long_div_matches_python_floor_division(spark, nums):
    """_long_div (the fixed-point workhorse behind every *_ppm /
    *_milli column) must agree with Python's // on non-negative
    longs."""
    from breweries_data_pipeline_spark.queries import _long_div
    from pyspark.sql import functions as F

    df = spark.createDataFrame(nums, ["n", "d"])
    out = df.select(
        "n", "d", _long_div(F.col("n"), F.col("d")).alias("q")
    ).collect()
    for r in out:
        assert r.q == r.n // r.d


def test_pagerank_star_graph_ranks_center_highest(spark):
    """On a star graph (all leaves point at the center) the center
    must out-rank every leaf, all leaves must tie, and no rank can
    exceed the total fixed-point mass."""
    from breweries_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "a")], ["src", "dst"]
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], ["node"])
    ranks = {r.node: r.rank for r in pagerank(edges, nodes).collect()}
    assert ranks["b"] == ranks["c"] == ranks["d"]
    assert ranks["a"] > ranks["b"]
    assert sum(ranks.values()) <= 1_000_000_000_000


@given(rows=ROWS, splitmod=st.integers(min_value=2, max_value=4))
@settings(**_SETTINGS)
def test_merge_partial_aggs_model(spark, rows, splitmod):
    """Algebraic merge over ANY partitioning of the input equals the
    one-shot aggregate — the invariant incremental materialized-view
    maintenance rests on."""
    from pyspark.sql import functions as F

    from breweries_data_pipeline_spark.operators.merge import merge_partial_aggs

    df = spark.createDataFrame(rows, "k long, o long, s string")

    def agg(d):
        return d.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum("o").alias("so"),
            F.min("o").alias("mn"),
            F.max("o").alias("mx"),
        )

    base = agg(df.filter(F.col("o") % splitmod == 0))
    delta = agg(df.filter(F.col("o") % splitmod != 0))
    merged = merge_partial_aggs(
        base, delta, ["k"], {"n": "sum", "so": "sum", "mn": "min", "mx": "max"}
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, agg(df).collect())
    )


@given(
    keys=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_cms_point_estimates_upper_bound_truth(spark, keys):
    """CMS estimates are overestimates for EVERY key under any input
    multiset (hash collisions only ever add)."""
    from pyspark.sql import functions as F

    from breweries_data_pipeline_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([(k,) for k in keys], "w string")
    sketch = cms_build(df, "w", depth=3, width=8)  # tiny grid: force collisions
    truth = df.groupBy("w").agg(F.count("*").alias("t"))
    est = cms_estimate(sketch, truth.select("w"), "w", depth=3, width=8)
    bad = truth.join(est, "w").filter(F.col("est_cnt") < F.col("t"))
    assert bad.isEmpty()


@given(
    devs=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=0, max_size=60
    )
)
@settings(max_examples=50, deadline=None)
def test_cusum_window_identity_equals_recursion(devs):
    """The cumsum-minus-running-min rewrite used by q_cusum_drift /
    streaming_cusum equals the textbook recursion
    s_i = max(0, s_{i-1} + d_i) for EVERY deviation sequence."""
    # textbook recursion
    s, rec = 0, []
    for d in devs:
        s = max(0, s + d)
        rec.append(s)
    # window identity: s_i = cum_i - min(0, min_{j<=i} cum_j)
    cum, minc, idm = 0, 0, []
    for d in devs:
        cum += d
        minc = min(minc, cum)
        idm.append(cum - min(0, minc))
    assert rec == idm


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40
    )
)
@settings(max_examples=50, deadline=None)
def test_ewma_lag_form_equals_truncated_recursion(vals):
    """q_ewma_smoothing's 16-lag weighted sum with den = 2^16 - 2^(16-m)
    is exactly the alpha=1/2 geometric weighting renormalized over the
    available window, for every position."""
    for i in range(len(vals)):
        window = vals[max(0, i - 15): i + 1]  # oldest..newest
        m = len(window)
        # direct geometric weights: newest gets 2^(m-1), .., oldest 2^0
        num_direct = sum(v * (1 << p) for p, v in enumerate(window))
        den_direct = (1 << m) - 1
        # engine form: lag k weighted 2^(15-k), den = 2^16 - 2^(16-m)
        num_engine = sum(
            vals[i - k] * (1 << (15 - k)) for k in range(min(16, i + 1))
        )
        den_engine = 65536 - (65536 >> m)
        # engine weights are the direct weights scaled by 2^(16-m)
        assert num_engine * den_direct == num_direct * den_engine
        assert num_engine // den_engine == (
            num_direct * (1 << (16 - m))
        ) // den_engine


@given(
    data=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=50)),
        min_size=2,
        max_size=80,
    )
)
@settings(max_examples=50, deadline=None)
def test_ks_distinct_value_grid_is_exact(data):
    """Evaluating D = max|F1-F2| on the distinct-value grid (what
    q_ks_test does) loses nothing vs evaluating at every sample,
    because the ECDF difference only changes at observed values."""
    a = sorted(v for g, v in data if g)
    b = sorted(v for g, v in data if not g)
    if not a or not b:
        return
    n1, n2 = len(a), len(b)
    # per-sample evaluation (naive)
    naive = max(
        abs(sum(1 for x in a if x <= v) * n2 - sum(1 for x in b if x <= v) * n1)
        for v in a + b
    )
    # distinct-grid evaluation
    grid = sorted(set(a + b))
    gridded = max(
        abs(sum(1 for x in a if x <= v) * n2 - sum(1 for x in b if x <= v) * n1)
        for v in grid
    )
    assert naive == gridded


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=5, max_size=24).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=14,
    ),
    t=st.sampled_from([0.1, 0.3, 0.5, 0.7, 0.9]),
)
def test_prefix_filtered_join_exact_vs_bruteforce(spark, docs, t):
    """AllPairs + PPJoin positional filter must be EXACT — all pairs
    with J >= t, none below — vs a naive Python brute force over a
    deliberately tiny (8-word) vocabulary: dense shingle collisions
    maximize prefix-bucket pressure, the regime where a recall bug in
    the positional bound (r7) or the fixed-point prefix length (r6
    advice) would surface."""
    import re

    from breweries_data_pipeline_spark.operators.dedup import (
        _t_ppm,
        prefix_filtered_similarity_join,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard_ppm
        for r in prefix_filtered_similarity_join(df, threshold=t).collect()
    }

    def shingle_set(text):
        # mirror functions.text.shingles: normalized 3-gram word shingles
        toks = re.findall(r"\S+", text.lower())
        return {" ".join(toks[i:i + 3]) for i in range(max(0, len(toks) - 2))}

    sets = [shingle_set(d) for d in docs]
    t_ppm = _t_ppm(t)
    expected = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union == 0:
                continue
            ppm = inter * 1_000_000 // union
            if ppm >= t_ppm:
                expected[(a, b)] = ppm
    assert got == expected


@given(
    lefts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=50),  # ts
        ),
        min_size=1,
        max_size=15,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=-9, max_value=9),  # value
        ),
        min_size=0,
        max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_as_of_join_backward_model(spark, lefts, rights):
    """as_of_join (union + carry-forward window) vs the obvious Python
    model: for each left row, the value of the LATEST right row with
    right.ts <= left.ts on the same key (inclusive), else null. Rights
    are deduped per (key, ts) in generation, matching the operator's
    documented uniqueness contract."""
    from breweries_data_pipeline_spark.operators.temporal import as_of_join

    rmap = {}
    for k, ts, v in rights:  # last generated wins — ONE row per (k, ts)
        rmap[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in rmap.items()]
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)], "k long, ts long, rid long"
    )
    right = spark.createDataFrame(rrows or [(99, 0, 0)], "k long, ts long, v long")
    if not rrows:
        right = right.filter("k < 0")
    got = {
        r.rid: r.v_asof
        for r in as_of_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    for i, (k, ts) in enumerate(lefts):
        prior = [(rts, v) for (rk, rts), v in rmap.items() if rk == k and rts <= ts]
        want = max(prior)[1] if prior else None
        assert got[i] == want, (i, k, ts, got[i], want)


@given(
    a=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=20),
    b=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=20),
)
@settings(**_SETTINGS)
def test_cms_merge_is_cellwise_sum(spark, a, b):
    """The sketch's 100 TB contract is MERGEABILITY: cms(A ++ B) must
    equal the cell-wise sum of cms(A) and cms(B) — per-partition /
    per-day sketches roll up without re-reading history. Exact, not
    approximate: both sides hash identically."""
    from breweries_data_pipeline_spark.operators.sketch import cms_build

    def cells(keys):
        if not keys:
            return {}
        df = spark.createDataFrame([(k,) for k in keys], "w long")
        return {
            (r.r, r.bucket): r.cnt
            for r in cms_build(df, "w", depth=3, width=8).collect()
        }

    ca, cb, cab = cells(a), cells(b), cells(a + b)
    summed = dict(ca)
    for cell, cnt in cb.items():
        summed[cell] = summed.get(cell, 0) + cnt
    assert cab == summed


@given(
    lefts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=15,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=-9, max_value=9),
        ),
        min_size=0,
        max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_as_of_join_forward_model(spark, lefts, rights):
    """as_of_join_forward vs the Python model: for each left row, the
    value (and ts) of the EARLIEST right row with right.ts >= left.ts
    on the same key (inclusive), else nulls."""
    from breweries_data_pipeline_spark.operators.temporal import as_of_join_forward

    rmap = {}
    for k, ts, v in rights:
        rmap[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in rmap.items()]
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)], "k long, ts long, rid long"
    )
    right = spark.createDataFrame(rrows or [(99, 0, 0)], "k long, ts long, v long")
    if not rrows:
        right = right.filter("k < 0")
    got = {
        r.rid: (r.ts_next, r.v_next)
        for r in as_of_join_forward(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    for i, (k, ts) in enumerate(lefts):
        nxt = [(rts, v) for (rk, rts), v in rmap.items() if rk == k and rts >= ts]
        want = min(nxt) if nxt else (None, None)
        assert got[i] == want, (i, k, ts, got[i], want)


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_bpe_learn_merges_vs_reference_model(spark, words, n_merges):
    """bpe_learn_merges vs an independent pure-Python BPE trainer
    (Sennrich-style): word-frequency table, weighted adjacent-pair
    counts, argmax by (count desc, lhs, rhs), greedy left-to-right
    non-overlapping merge application. A 2-letter alphabet maximizes
    overlapping-pair pressure ('aaaa' + merge (a,a)) — the regime
    where a replace()-semantics bug would surface."""
    from collections import Counter

    from breweries_data_pipeline_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame([(" ".join(words),)], ["text"])
    got = sorted(
        tuple(r) for r in bpe_learn_merges(docs, "text", n_merges=n_merges).collect()
    )

    vocab = Counter()
    for w in words:
        vocab[tuple(w)] += 1
    expected = []
    for r in range(n_merges):
        pairs: Counter = Counter()
        for toks, n in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((r, a, b, cnt))
        new_vocab: Counter = Counter()
        for toks, n in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    assert got == sorted(expected)


@given(
    toks=st.lists(st.text(alphabet="abXY9", min_size=1, max_size=4), max_size=40),
    k=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_chunk_tokens_partition_properties(toks, k):
    """chunk_tokens_py is an exact partition of the token stream:
    token counts add back up, concatenation round-trips, every chunk
    except the last is full, and indices are dense from 0."""
    from breweries_data_pipeline_spark.operators.text import chunk_tokens_py

    text = " ".join(toks)
    chunks = list(chunk_tokens_py(text, k))
    if not toks:
        assert chunks == []
        return
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    assert sum(c[2] for c in chunks) == len(toks)
    assert " ".join(c[1] for c in chunks) == text
    assert all(c[2] == k for c in chunks[:-1])
    assert 1 <= chunks[-1][2] <= k


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-2_000_000, max_value=2_000_000),
            min_size=3,
            max_size=3,
        ),
        min_size=8,
        max_size=24,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmeans_lloyd2_matches_python_model(spark, vecs):
    """q_kmeans_lloyd2 vs an independent pure-Python integer Lloyd:
    same micro-unit vectors (written as float32 so the round(x*1e6)
    recovery path is exercised), same truncating-div M-step, same
    min-cluster-id tie-break — duplicate points, empty clusters and
    negative sums included by generation."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from breweries_data_pipeline_spark.queries import REGISTRY

    d = tempfile.mkdtemp(prefix="lloyd2_")
    try:
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [[v / 1e6 for v in x] for x in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
        pq.write_table(tbl, f"{d}/embeddings.parquet")
        got = [
            tuple(r)
            for r in REGISTRY["q_kmeans_lloyd2"][0](spark, d).collect()
        ]

        def trunc_div(a: int, b: int) -> int:
            q = abs(a) // b
            return q if a >= 0 else -q

        def assign(cents: dict[int, list[int]]) -> dict[int, int]:
            return {
                vid: min(
                    (
                        sum((x - c) ** 2 for x, c in zip(xu, cv)),
                        cid,
                    )
                    for cid, cv in cents.items()
                )[1]
                for vid, xu in enumerate(vecs)
            }

        a1 = assign({i: vecs[i] for i in range(min(8, len(vecs)))})
        cents1: dict[int, list[int]] = {}
        for cid in sorted(set(a1.values())):
            members = [vecs[v] for v, c in a1.items() if c == cid]
            cents1[cid] = [
                trunc_div(sum(m[dim] for m in members), len(members))
                for dim in range(3)
            ]
        a2 = assign(cents1)
        want = sorted(
            (
                cid,
                sum(1 for c in a2.values() if c == cid),
                sum(vecs[v][0] for v, c in a2.items() if c == cid),
            )
            for cid in set(a2.values())
        )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
