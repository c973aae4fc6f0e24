"""Deterministic sf1 (10x) soak-data generator.

The driver ships sf0.001/sf0.01/sf0.1; the scale story above that is
argued from plan shape.  This tool materializes one more order of
magnitude locally (default: 10x sf0.1 -> ~6M-row lineitem) so the
bench can *measure* scaling instead of arguing it.

Method: k-fold replication of the source scale factor with key
offsets that preserve referential integrity:

- `region` / `nation` are fixed-size dimensions in TPC-H (they do not
  scale with sf) and are copied once, unchanged.
- every scaling table gets copy i's surrogate keys shifted by
  i * span(key) where span = max - min + 1 computed from the actual
  data, so foreign keys keep resolving inside the same copy:
  customer/orders/lineitem/part/supplier key chains stay closed.
- `events.user_id` draws from the customer key domain and is shifted
  by the *customer* span, so per-user event cadence (session windows,
  funnels, retention) is copy-invariant: 10x users, not 10x events
  per user.  Timestamps are left untouched -> 10x event density over
  the same wall-clock range, which is exactly what a larger tenant
  looks like.
- `documents.text` gets a per-copy suffix token (" rep{i}") so exact
  duplicates do NOT explode 10x (that would turn MinHash-LSH buckets
  pathological and measure a different workload); instead every
  original doc gains 9 *near*-duplicate siblings — a heavy but
  realistic near-dup corpus that stresses the banding joins the way
  a crawl snapshot family would.  n_chars is recomputed to stay
  consistent with the perturbed text.
- `embeddings.embedding` vectors are kept bit-identical across
  copies (10x corpus for ANN/IVF; duplicate points are legal and
  common in real embedding stores).

Everything is a pure pyarrow transform — deterministic, no RNG, no
Spark needed; output is one parquet file per table matching the
driver's layout so SPARK_GRAFT_SF_DIR can point straight at it.

Usage:
    python tools/gen_sf.py [--src /root/testdata/sf0.1] \
        [--dst .localdata/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

FIXED_DIMS = ("region", "nation")
DOC_TEXT_MODE = "neardup"  # set from --doc-text in main()
# table -> columns shifted by that table's own primary-key span
PRIMARY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
# table -> {column: span source (table, key)} for foreign keys
FOREIGN = {
    "orders": {"o_custkey": ("customer", "c_custkey")},
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {"user_id": ("customer", "c_custkey")},
}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _span(tbl: pa.Table, col: str) -> int:
    mm = pc.min_max(tbl[col]).as_py()
    return int(mm["max"]) - int(mm["min"]) + 1


def _shift(tbl: pa.Table, col: str, offset: int) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    typ = tbl.schema.field(idx).type
    shifted = pc.cast(pc.add(tbl[col], pa.scalar(offset, type=pa.int64())), typ)
    return tbl.set_column(idx, tbl.schema.field(idx), shifted)


def replicate(src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    base = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in TABLES}
    spans = {
        (t, k): _span(base[t], k)
        for t, k in list(PRIMARY.items())
        + [(st, sk) for m in FOREIGN.values() for (st, sk) in m.values()]
    }

    for t in TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        if t in FIXED_DIMS:
            pq.write_table(base[t], out)
            print(f"{t}: fixed dim, {base[t].num_rows} rows")
            continue
        parts = []
        if t == "documents" and DOC_TEXT_MODE == "distinct":
            # pre-sanitize ONCE, before any copy (incl. the verbatim
            # copy 0): the '~{i}' suffix injectivity argument below
            # assumes no source token contains '~' — a source token
            # literally ending '~<digit>' in copy 0 could otherwise
            # collide with a suffixed token from another copy. Strip
            # '~' from the source and the assumption holds by
            # construction; n_chars is recomputed to stay consistent.
            b = base[t]
            clean = pc.replace_substring(b["text"], "~", "")
            ti = b.schema.get_field_index("text")
            b = b.set_column(ti, b.schema.field(ti), clean)
            ni = b.schema.get_field_index("n_chars")
            base[t] = b.set_column(
                ni,
                b.schema.field(ni),
                pc.cast(pc.utf8_length(clean), pa.int64()),
            )
        for i in range(copies):
            tbl = base[t]
            if i > 0:
                if t in PRIMARY:
                    k = PRIMARY[t]
                    tbl = _shift(tbl, k, i * spans[(t, k)])
                for col, (st, sk) in FOREIGN.get(t, {}).items():
                    tbl = _shift(tbl, col, i * spans[(st, sk)])
                if t == "documents":
                    if DOC_TEXT_MODE == "distinct":
                        # suffix EVERY token with the copy index: no
                        # shingle survives across copies, so copies
                        # are fully DISTINCT documents and the corpus
                        # keeps the ORIGINAL near-dup density (k x
                        # more docs, not k x denser cliques). This is
                        # the realistic ingest-scale workload; the
                        # default " rep{i}" doc-suffix mode is the
                        # adversarial one (every doc gains k-1 TRUE
                        # near-dup siblings -> true-pair volume grows
                        # k^2 and any pairwise-verify stage is
                        # output-bound by construction).
                        # '~' separates token from copy index: a bare
                        # decimal suffix collides across copies>10
                        # ('x'+'11' == 'x1'+'1'); with the separator
                        # the text after the LAST '~' is always the
                        # copy index, so suffixed tokens are injective
                        # per copy at any copy count (source tokens
                        # are pre-stripped of '~' above, so the
                        # separator is unambiguous by construction)
                        text = pc.replace_substring_regex(
                            tbl["text"], r"(\S+)", rf"\1~{i}"
                        )
                    else:
                        text = pc.binary_join_element_wise(
                            tbl["text"], pa.scalar(f" rep{i}"), ""
                        )
                    ti = tbl.schema.get_field_index("text")
                    tbl = tbl.set_column(ti, tbl.schema.field(ti), text)
                    ni = tbl.schema.get_field_index("n_chars")
                    tbl = tbl.set_column(
                        ni,
                        tbl.schema.field(ni),
                        pc.cast(pc.utf8_length(text), pa.int64()),
                    )
            parts.append(tbl)
        # one FILE per copy (dir of part files), bounded row groups:
        # real 100 TB inputs are thousands of files, and Spark's scan
        # parallelism comes from files x row-group splits. The single
        # 1M-row-group file this replaces collapsed documents/events
        # scans to 1-2 tasks at sf1, serializing every narrow-map
        # kernel onto one core — the bench then reported 7-24x "scaling"
        # that was really a parallelism-1 layout artifact (r7 finding).
        if os.path.isdir(out):
            import shutil

            shutil.rmtree(out)
        elif os.path.exists(out):
            os.remove(out)
        os.makedirs(out, exist_ok=True)
        n_rows = 0
        for i, tbl in enumerate(parts):
            pq.write_table(
                tbl,
                os.path.join(out, f"part-{i:03d}.parquet"),
                row_group_size=1 << 17,
            )
            n_rows += tbl.num_rows
        print(f"{t}: {base[t].num_rows} -> {n_rows} rows in {len(parts)} files")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dst",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".localdata", "sf1"),
    )
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--doc-text",
        choices=("neardup", "distinct"),
        default="neardup",
        help="per-copy documents.text perturbation: 'neardup' (default)"
        " appends one ' rep{i}' token so every doc gains copies-1 TRUE"
        " near-dup siblings (adversarial dup density); 'distinct'"
        " suffixes every token so copies share no shingles (realistic"
        " ingest density: k x more docs at the source corpus's own"
        " dup rate)",
    )
    args = ap.parse_args()
    global DOC_TEXT_MODE
    DOC_TEXT_MODE = args.doc_text
    replicate(args.src, args.dst, args.copies)


if __name__ == "__main__":
    main()
