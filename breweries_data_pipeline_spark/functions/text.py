"""Text-analysis column expressions (SURVEY.md §2.6 X9; BASELINE.json
LLM-pipeline surface).

All pure Column expressions over pyspark.sql.functions — JVM-side,
inside whole-stage codegen, no Python in the hot path. At 100 TB these
run as a narrow map over the documents scan with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small multilingual stopword lists for the heuristic language id /
# quality scoring. Deliberately tiny and fixed: the point is a
# deterministic, cheap, JVM-side signal, not linguistic accuracy.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
STOPWORDS_ES = ("el", "la", "de", "los", "las", "que", "y", "en", "un", "una")

_WS = r"\s+"


def normalized_text(col: Column | str) -> Column:
    """trim + lower + collapse whitespace — the canonical form used by
    fingerprinting and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), _WS, " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """A BPE-ish regex tokenization: splits out word pieces, numbers
    and punctuation separately (approximates an LLM tokenizer's
    pre-tokenization pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles -> array<string> (space-joined n-grams).
    Documents shorter than ``n`` tokens collapse to one whole-document
    shingle so every doc has a non-empty shingle set.

    Implementation: whitespace is first normalized to single spaces,
    then one regex pass captures a lookahead group of ``n``
    space-separated tokens anchored at each token start — a single
    JVM codegen'd scan per row. The equivalent
    transform(sequence, concat_ws(slice)) spelling is CodegenFallback
    (interpreted per gram) and benches ~8x slower; the regex emits
    identical arrays (verified row-for-row) with no explode and no
    shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    norm = F.regexp_replace(F.trim(c), _WS, " ")
    pat = r"(?:^| )(?=(" + r"(?:[^ ]+ ){%d}" % (n - 1) + r"[^ ]+))"
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def ngram_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two shingle arrays under set
    semantics (array_intersect/array_union both dedupe). Integer
    ratio cast to double -> bit-stable across engines."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def rolling_fingerprint(
    col: Column | str,
    base: int = 31,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> Column:
    """Polynomial rolling hash (Rabin-Karp family) of the raw text —
    the classic streaming document fingerprint. Left fold over
    character codes with per-step mod, so intermediate values stay
    < 2^36 (ANSI-overflow-safe) and the result is bit-identical to a
    SQL ``list_reduce`` spelling (oracle-checkable, unlike md5-free
    engines' opaque hashes)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(init).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


def kgram_hashes(
    col: Column | str,
    k: int = 5,
    base: int = 31,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> Column:
    """array<long>: the polynomial hash of every k-char-gram of the
    text (1-based k-gram i covers chars [i, i+k-1]) — the same
    oracle-checkable fold as rolling_fingerprint, applied per k-gram.
    All-integer, per-step mod (values stay < 2^36), bit-identical to
    a DuckDB list_transform + list_reduce replay. Caller guarantees
    len(text) >= k.

    IMPORTANT expression-shape note: materialize this as its OWN
    projection column before running window selections over it —
    embedding it inside a consumer expression makes every reference
    re-evaluate the whole O(n*k) tree (the first cut of q_winnowing
    recomputed it per window: O(n^2 k) interpreted, a 100x hang at
    300-char docs)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    n = F.size(codes)
    return F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.aggregate(
            F.slice(codes, i, k),
            F.lit(init).cast("long"),
            lambda acc, x: (acc * base + x) % mod,
        ),
    )


def winnow_positions(hashes: Column | str, w: int = 4) -> Column:
    """array<long>: winnowing selection (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS scheme) over a MATERIALIZED k-gram hash
    array column: slide a window of ``w`` consecutive hashes and in
    each window select the MINIMUM, ties to the RIGHTMOST occurrence
    (the paper's rule — it maximizes selection reuse between
    overlapping windows). Returns the distinct 1-based selected
    positions.

    Guarantee (why winnowing beats 1-in-p hash sampling for dedup):
    every window contributes >= 1 selection, so any match of length
    >= w + k - 1 chars between two documents shares at least one
    selected fingerprint — detection is deterministic, not
    probabilistic; expected density is 2/(w+1).

    Pass the hash array as a projected COLUMN (see kgram_hashes);
    window slices of a materialized array are O(w) reads. Caller
    guarantees size(hashes) >= w."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes
    m = F.size(h)

    def _sel(j: Column) -> Column:
        win = F.slice(h, j, w)
        # rightmost minimum: first occurrence in the reversed window
        return (
            j + (w - F.array_position(F.reverse(win), F.array_min(win)) + 1) - 1
        ).cast("long")

    return F.array_distinct(F.transform(F.sequence(F.lit(1), m - w + 1), _sel))


def _flat_codes(texts: list[str]):
    """(flat int64 codepoints, per-text lengths) for a whole batch in
    TWO C-level passes: one str join + one utf-32 encode. A utf-32-le
    code unit IS the codepoint, so ``frombuffer`` reproduces
    ``map(ord, t)`` exactly (Python strs are codepoint sequences — no
    surrogates) at ~100x less interpreted work than a per-character
    ``ord`` map (guide §4.2: per-row/per-char Python is the enemy)."""
    import numpy as np

    lens = np.fromiter(map(len, texts), dtype=np.int64, count=len(texts))
    flat = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype="<u4"
    ).astype(np.int64)
    return flat, lens


def _mod_stride(base: int, mod: int) -> int:
    """Largest number of Horner steps safely batched between modular
    reductions: after j unmodded steps values are < mod * base^j plus
    codepoint carries (absorbed by the factor 2). Modular reduction
    commutes with +/*, so batching leaves every residue identical
    while cutting the integer divisions ~j-fold (base 31 -> 6).

    Soundness bound (r12 advice): the factor-2 headroom absorbs the
    per-step codepoint addends only while each addend stays below
    mod*(base-1); a tiny custom mod (< ~0x10FFFF/(base-1)) breaks
    that, so fall back to per-step reduction — still exact, and
    (mod-1)*base + 0x10FFFF cannot overflow int64 for any mod that
    small. Callers must also keep init < mod (asserted at the kernel
    entry points) so the pre-fold residue starts in range."""
    if mod * (base - 1) <= 0x10FFFF:
        return 1
    j = 1
    while mod * (base ** (j + 1)) * 2 < 2 ** 63:
        j += 1
    return j


def _ragged_arange(counts):
    """0..c_i-1 for every i, concatenated — the index spine that turns
    per-document loops into whole-batch numpy ops over ragged rows."""
    import numpy as np

    total = int(counts.sum())
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )


def _winnow_flat(texts: list[str], k: int, w: int, base: int, mod: int,
                 init: int):
    """Whole-batch winnowing selection: returns
    (m, doc_sel, kpos, fps) where ``m`` is per-doc k-gram counts,
    ``doc_sel``/``kpos``/``fps`` are the doc index, 0-based k-gram
    position and hash value of every selected fingerprint, ordered by
    (doc, position) with per-doc position-distinct selections — the
    exact per-row spec (k Horner steps, rightmost-tie window argmin,
    position unique) computed with no per-document Python loop. The
    Horner fold runs over the CONCATENATED batch (contiguous slices);
    positions straddling a document boundary are computed then
    discarded via the ragged index spine (<= k-1 waste rows per doc).
    Caller guarantees len(text) >= k + w - 1 for every row."""
    import numpy as np

    # init must start in residue range or the first deferred-mod batch
    # silently folds an out-of-range value (r12 advice)
    assert 0 <= init < mod, f"init {init} must be in [0, mod={mod})"
    flat, lens = _flat_codes(texts)
    d = len(lens)
    off = np.cumsum(lens) - lens
    m = lens - k + 1                       # k-gram positions per doc
    voff = np.cumsum(m) - m                # per-doc start in valid space
    m_all = len(flat) - k + 1
    h_all = np.full(m_all, init, dtype=np.int64)
    stride = _mod_stride(base, mod)
    for s in range(k):                     # k full-batch Horner steps
        h_all = h_all * base + flat[s:s + m_all]
        if (s + 1) % stride == 0 or s == k - 1:
            h_all %= mod                   # batched mod: see _mod_stride
    within = _ragged_arange(m)
    h = h_all[np.repeat(off, m) + within]  # valid positions only
    # window starts that do not straddle a doc boundary
    wn = m - w + 1
    wstart = np.repeat(voff, wn) + _ragged_arange(wn)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum = first minimum of the reversed window
    ridx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
    # doc segments partition the valid index space, so one global
    # unique == per-doc position-unique, order preserved
    sel = np.unique(wstart + ridx[wstart])
    doc_sel = np.repeat(np.arange(d, dtype=np.int64), m)[sel]
    return m, doc_sel, sel - voff[doc_sel], h[sel]


def winnow_stats_udf(
    k: int = 5,
    w: int = 4,
    base: int = 31,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> "Column":
    """struct<n_kgrams,n_selected,fp_sum,fp_min,fp_max (all long)>:
    per-document winnowing statistics as ONE vectorized numpy kernel
    per Arrow batch — the production lane for kgram_hashes +
    winnow_positions. Because every operation is int64 arithmetic
    (k vectorized Horner steps with per-step mod, sliding-window
    argmin over the reversed window for the rightmost-tie rule),
    the kernel is BIT-IDENTICAL to the HOF spec and to DuckDB's list
    replay — integer math has no evaluation-order freedom, so unlike
    float kernels this one needs no pinned-order caveat
    (tests/test_units.py pins kernel == HOF on a corpus sample).
    The whole batch runs flattened (_winnow_flat): the Horner fold and
    window argmin are full-batch ops and per-doc stats come from
    reduceat over doc segments — no per-document Python loop at all
    (r12: the per-doc loop spent more time in loop overhead + small
    allocs than in arithmetic). Codepoint note: utf-32 units == ord()
    == the engines' ascii() for BMP text; the corpus is ASCII."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _stats(texts):
        import numpy as np

        tl = texts.tolist()
        if not tl:
            return pd.DataFrame(
                {f: pd.Series([], dtype="int64") for f in
                 ("n_kgrams", "n_selected", "fp_sum", "fp_min", "fp_max")}
            )
        m, doc_sel, _, fps = _winnow_flat(tl, k, w, base, mod, init)
        counts = np.bincount(doc_sel, minlength=len(m))  # >= 1 per doc
        starts = np.cumsum(counts) - counts
        return pd.DataFrame({
            "n_kgrams": m,
            "n_selected": counts.astype(np.int64),
            "fp_sum": np.add.reduceat(fps, starts),
            "fp_min": np.minimum.reduceat(fps, starts),
            "fp_max": np.maximum.reduceat(fps, starts),
        })

    _stats.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return pandas_udf(
        "n_kgrams long, n_selected long, fp_sum long, fp_min long, "
        "fp_max long"
    )(_stats)


def winnow_fingerprints_udf(
    k: int = 20,
    w: int = 8,
    base: int = 31,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> "Column":
    """array<long>: the DISTINCT selected fingerprint VALUES of a
    document under winnowing (ascending) — the join key set for
    MOSS-style local-similarity dedup (q_winnow_dedup), where
    winnow_stats_udf only returns summary stats. Same vectorized int64
    Arrow kernel as winnow_stats_udf (k Horner steps with per-step
    mod, sliding-window argmin over the reversed window for the
    rightmost-tie rule), so it is BIT-IDENTICAL to the HOF spec
    (kgram_hashes + winnow_positions) and to DuckDB's list replay —
    pinned in tests/test_units.py. Dedup wants k large enough that a
    shared k-gram is evidence, not vocabulary: the default k=20/w=8
    detects any shared substring of >= k+w-1 = 27 chars
    deterministically, while k=5 fingerprints of ordinary prose are
    common word fragments (measured df up to 398/500 docs — useless
    as a blocking key). Caller guarantees len(text) >= k+w-1."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fps(texts):
        import numpy as np

        tl = texts.tolist()
        if not tl:
            return pd.Series([], dtype=object)
        m, doc_sel, _, fps = _winnow_flat(tl, k, w, base, mod, init)
        # (doc, fp) packed into one int64 (fp < mod <= 2^31): a single
        # global unique == per-doc sorted-unique fp values. The pack
        # is only injective/overflow-free under these bounds (r12
        # advice) — mod is an exposed kwarg, so assert them.
        assert mod <= 2 ** 31 and len(tl) * mod < 2 ** 63, (
            f"packed (doc, fp) int64 key needs mod <= 2^31 and "
            f"batch_docs * mod < 2^63; got mod={mod}, docs={len(tl)}"
        )
        u = np.unique(doc_sel * mod + fps)
        docs_u = u // mod
        bounds = np.searchsorted(docs_u, np.arange(1, len(m)))
        return pd.Series(np.split(u % mod, bounds))

    _fps.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("array<long>")(_fps)


def winnow_fp_pos_udf(
    k: int = 20,
    w: int = 8,
    base: int = 31,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> "Column":
    """array<struct<fp:long,pos:long>>: each DISTINCT selected
    winnowing fingerprint with the 1-based k-gram position of its
    FIRST selected occurrence, ascending by fp — the localization
    payload q_winnow_spans needs to report MOSS-style matched regions
    (winnow_fingerprints_udf strips positions). Same vectorized int64
    kernel, same bit-identical contract vs the HOF spec; np.unique's
    return_index over the position-ordered value array IS min-position
    per fingerprint. Caller guarantees len(text) >= k+w-1."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fps(texts):
        import numpy as np

        tl = texts.tolist()
        if not tl:
            return pd.Series([], dtype=object)
        m, doc_sel, kpos, fps = _winnow_flat(tl, k, w, base, mod, init)
        # packed (doc, fp) + return_index: the input is (doc, position)
        # ordered, so the FIRST occurrence of each packed value is its
        # min position — np.unique gives per-doc fp-ascending uniques.
        # Pack bounds asserted (r12 advice): see winnow_fingerprints_udf.
        assert mod <= 2 ** 31 and len(tl) * mod < 2 ** 63, (
            f"packed (doc, fp) int64 key needs mod <= 2^31 and "
            f"batch_docs * mod < 2^63; got mod={mod}, docs={len(tl)}"
        )
        u, first = np.unique(doc_sel * mod + fps, return_index=True)
        docs_u = u // mod
        fps_u = u % mod
        pos_u = kpos[first] + 1  # 1-based, min position per fp
        bounds = np.searchsorted(docs_u, np.arange(1, len(m)))
        out = [
            [{"fp": int(f), "pos": int(p)} for f, p in zip(fs, ps)]
            for fs, ps in zip(np.split(fps_u, bounds),
                              np.split(pos_u, bounds))
        ]
        return pd.Series(out)

    _fps.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("array<struct<fp:bigint,pos:bigint>>")(_fps)


def cdc_chunk_fps(
    text: str,
    w: int = 16,
    div: int = 64,
    base1: int = 31,
    base2: int = 131,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> list[int]:
    """Pure-Python executable SPEC of content-defined chunking (the
    LBFS scheme — Muthitacharoen et al., SOSP 2001; FastCDC is the
    optimized descendant): a chunk boundary falls after character
    position j+w-1 whenever the polynomial hash of the w-gram starting
    at j satisfies H % div == 0, so boundaries are a pure function of
    LOCAL content — a one-character insertion reshapes only the chunk
    it lands in, where fixed-size chunking (q_chunk_dedup) shifts every
    downstream chunk. Returns the chunk fingerprints in order:
    fp = h1 * 2^31 + h2 with h1/h2 the base-31/base-131 Horner folds
    (init 7, per-step mod) of the chunk's characters — two independent
    31-bit lanes, so fingerprint collisions need a simultaneous double
    collision (~2^-62). The vectorized kernel (cdc_chunk_fps_udf) is
    equivalence-pinned against this spec; the DuckDB oracle replays the
    same folds as list_reduce."""
    codes = [ord(c) for c in text]
    n = len(codes)
    if n == 0:
        return []
    bpos = []
    if n >= w:
        for j in range(n - w + 1):  # 0-based window start
            h = init
            for c in codes[j:j + w]:
                h = (h * base1 + c) % mod
            if h % div == 0:
                bpos.append(j + w)  # 1-based chunk END position
    starts = [1] + [p + 1 for p in bpos]
    ends = bpos + [n]
    fps = []
    for s, e in zip(starts, ends):
        if s > e:  # last boundary at n -> empty trailing chunk
            continue
        h1 = h2 = init
        for c in codes[s - 1:e]:
            h1 = (h1 * base1 + c) % mod
            h2 = (h2 * base2 + c) % mod
        fps.append(h1 * 2_147_483_648 + h2)
    return fps


def cdc_chunk_fps_udf(
    w: int = 16,
    div: int = 64,
    base1: int = 31,
    base2: int = 131,
    mod: int = 2_147_483_647,
    init: int = 7,
) -> "Column":
    """array<long>: vectorized int64 Arrow kernel for cdc_chunk_fps —
    bit-identical to the spec (integer math has no evaluation-order
    freedom). Boundary detection is the winnowing kernel's w-step
    Horner trick per doc; chunk fingerprints are then folded for ALL
    chunks of the batch AT ONCE with a masked Horner loop of
    max-chunk-length steps (chunks are ragged, so the per-step mask
    retires finished chunks — total work stays O(total chars) and
    every step is a full-width numpy op, never a per-chunk Python
    loop)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fps(texts):
        import numpy as np

        tl = texts.tolist()
        d = len(tl)
        if d == 0:
            return pd.Series([], dtype=object)
        assert 0 <= init < mod, f"init {init} must be in [0, mod={mod})"
        flat, lens = _flat_codes(tl)
        off = np.cumsum(lens) - lens
        # boundary detection: w-step Horner over the CONCATENATED
        # batch (contiguous slices), within-doc windows selected via
        # the ragged index spine — no per-document Python loop
        m = np.maximum(lens - w + 1, 0)        # w-windows per doc
        n_all = len(flat)
        if n_all >= w:
            m_all = n_all - w + 1
            g_all = np.full(m_all, init, dtype=np.int64)
            stride = _mod_stride(base1, mod)
            for s in range(w):
                g_all = g_all * base1 + flat[s:s + m_all]
                if (s + 1) % stride == 0 or s == w - 1:
                    g_all %= mod           # batched mod: see _mod_stride
        else:
            g_all = np.empty(0, dtype=np.int64)
        within = _ragged_arange(m)
        gv = g_all[np.repeat(off, m) + within]
        doc_of_w = np.repeat(np.arange(d, dtype=np.int64), m)
        bmask = gv % div == 0
        bdoc = doc_of_w[bmask]                  # (doc, position) order
        bend = within[bmask] + w                # 1-based chunk ENDs
        nb = np.bincount(bdoc, minlength=d)
        # chunk table: per nonzero doc, starts [1, b+1...] / ends
        # [b..., n]; scattered into one flat array by doc offsets
        nch = np.where(lens > 0, nb + 1, 0)
        choff = np.cumsum(nch) - nch
        starts = np.empty(int(nch.sum()), dtype=np.int64)
        ends = np.empty_like(starts)
        nz = lens > 0
        starts[choff[nz]] = 1
        ends[(choff + nch - 1)[nz]] = lens[nz]
        if len(bdoc):
            bix = choff[bdoc] + _ragged_arange(nb)
            ends[bix] = bend
            starts[bix + 1] = bend + 1
        keep = starts <= ends   # last boundary at n -> drop empty tail
        kdoc = np.repeat(np.arange(d, dtype=np.int64), nch)[keep]
        st = off[kdoc] + starts[keep] - 1       # 0-based, batch-flat
        ln = ends[keep] - starts[keep] + 1
        # masked Horner: fold ALL chunks at once, retiring finished
        # chunks per step — O(total chars), full-width ops throughout
        h1 = np.full(len(st), init, dtype=np.int64)
        h2 = h1.copy()
        for s in range(int(ln.max()) if len(ln) else 0):
            act = ln > s
            c = flat[st[act] + s]
            h1[act] = (h1[act] * base1 + c) % mod
            h2[act] = (h2[act] * base2 + c) % mod
        fps = h1 * 2_147_483_648 + h2
        counts = np.bincount(kdoc, minlength=d)
        return pd.Series(np.split(fps, np.cumsum(counts)[:-1]))

    _fps.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("array<long>")(_fps)


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Number of tokens that are stopwords (array intersection-free:
    a filter over the token array, one pass)."""
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


# PII patterns kept to character classes + bounded quantifiers so the
# same pattern string is valid (and matches identically) under Java
# regex and RE2-family engines — no lookaround, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"


def pii_redact(col: Column | str) -> Column:
    """Redact email addresses then phone numbers with typed
    placeholder tags — the scrubbing pass a training-data pipeline
    runs before packing. Pure regexp_replace chain: JVM-side, one
    narrow projection, and oracle-checkable because the patterns are
    engine-portable (see above)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")
