"""Z-order (Morton) keys for multi-column data clustering.

Why this exists at 100 TB: parquet data skipping works off per-file /
per-row-group min-max statistics. Sorting by a single column gives
perfect skipping on that column and none on any other; interleaving
the bits of two (or more) columns into one Morton key and sorting by
THAT clusters the data so every file covers a small hyper-rectangle
of the key space — range predicates on EITHER column skip most files
(the OSS-Spark analog of Delta/Iceberg OPTIMIZE ZORDER BY).

The key is pure integer bit arithmetic (shift / mask / or), built as
JVM column expressions inside whole-stage codegen — and mirrored
term-for-term by :func:`morton_key_sql` so an oracle can recompute it
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _check_bits(bits: int) -> None:
    """2*bits must stay <= 62 so an interleaved key never shifts into
    a long's sign bit (negative/aliased keys would break the total
    order :func:`write_zordered` relies on). Enforced, not assumed."""
    if not (1 <= bits <= 31):
        raise ValueError(
            f"bits must be in [1, 31] (2*bits <= 62 to fit a signed long); got {bits}"
        )


def normalize_to_domain(
    c: Column | str, lo: int, hi: int, bits: int = 16
) -> Column:
    """Affine-map an integer column from [lo, hi] onto the full
    [0, 2^bits - 1] domain (integer floor arithmetic). Z-ordering
    REQUIRES this: interleaving raw columns with unequal magnitudes
    lets the wider column's high bits dominate the key unopposed and
    the narrow column never clusters (caught by the layout test).
    Delta/Iceberg solve the same problem with per-column range
    partition ids; an exact affine map is equivalent for integer
    keys and oracle-reproducible.

    Exactness: the numerator (value - lo) * mask exceeds 2^53 (where a
    double-division floor silently rounds) and can even exceed 2^63
    (long overflow) for wide domains — an epoch-microsecond span of a
    century is ~3e15, times 65535 is ~2e20. The whole computation is
    therefore carried in decimal(38,0): multiply, make the numerator
    exactly divisible (subtract the modulus), divide — every step
    exact for |value| up to 38 digits, matching DuckDB's HUGEINT-safe
    integer `//` bit-for-bit."""
    _check_bits(bits)
    cc = (F.col(c) if isinstance(c, str) else c).cast("decimal(38,0)")
    mask = (1 << bits) - 1
    span = max(hi - lo, 1)
    scaled = (cc - F.lit(lo).cast("decimal(38,0)")) * F.lit(mask).cast(
        "decimal(38,0)"
    )
    exact = scaled - (scaled % F.lit(span).cast("decimal(38,0)"))
    return (exact / F.lit(span).cast("decimal(38,0)")).cast("long")


def normalize_to_domain_sql(c: str, lo: int, hi: int, bits: int = 16) -> str:
    """DuckDB spelling of :func:`normalize_to_domain` (same exact
    integer floor-division arithmetic; HUGEINT keeps the
    (value - lo) * mask product overflow-free for wide domains, the
    same role decimal(38,0) plays on the Spark side)."""
    _check_bits(bits)
    mask = (1 << bits) - 1
    span = max(hi - lo, 1)
    return (
        f"CAST((((CAST({c} AS HUGEINT) - {lo}) * {mask}) // {span}) AS BIGINT)"
    )


def morton_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Morton key: bit i of ``a`` lands at position
    2i+1, bit i of ``b`` at position 2i. Columns are masked to
    ``bits`` first, so the key is total-ordered within the truncated
    domain. 2*bits <= 62 keeps everything in a long (enforced by
    :func:`_check_bits`). Callers should :func:`normalize_to_domain`
    both columns first unless they already span comparable bit
    widths."""
    _check_bits(bits)
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    mask = (1 << bits) - 1
    ca = ca.cast("long").bitwiseAND(F.lit(mask))
    cb = cb.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i))
    return key.cast("long")


def morton_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The DuckDB spelling of :func:`morton_key` — the same shift /
    mask / or terms in the same order, so the two engines produce
    bit-identical keys."""
    _check_bits(bits)
    mask = (1 << bits) - 1
    ca = f"({a} & {mask})"
    cb = f"({b} & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({ca} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({cb} >> {i}) & 1) << {2 * i})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"
