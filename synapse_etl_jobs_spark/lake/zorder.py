"""Z-order (Morton-curve) clustering expressions for lake compaction.

Delta `OPTIMIZE ... ZORDER BY` / Iceberg `rewrite_data_files(strategy =>
'sort', sort_order => zorder(...))` analog, built from native Spark
expressions only:

1. each cluster column is rank-quantized to ``bits`` bits against
   boundaries taken from a bounded uniform sample (a distributed
   TakeOrderedAndProject over a hash ordering — never a full sort, never
   more than ``sample_rows`` values on the driver; the same
   sample-then-split shape Spark's own ``repartitionByRange`` uses);
2. the quantized values are bit-interleaved into one Morton code, so
   sorting by the single code clusters ALL the columns at once — every
   contiguous code range maps to a small hyper-rectangle of the column
   space.

Why this matters at 10^10 rows: a linear sort narrows per-file min/max
stats on the leading column only; the Morton sort narrows them on every
z-column simultaneously (~N^(1/k) of the domain per column for N files
over k columns), so file- and row-group-level stats pruning works for
predicates on ANY clustered column, not just the first.

All per-row work is whole-stage-codegen expressions (comparisons, shifts,
adds) — no UDFs, no window over the global table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_boundaries(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 6,
    sample_rows: int = 100_000,
    seed: int = 0,
) -> dict[str, list]:
    """Per-column quantile boundaries from one bounded, deterministic
    uniform sample per column.

    ``orderBy(xxhash64(row, seed)).limit(n)`` plans as a distributed
    TakeOrderedAndProject: each partition keeps its local top-n by the
    hash (a uniform random draw, deterministic given the data), and only
    n rows ever reach the driver — the boundary pick is O(sample) no
    matter the table size. Works for any orderable type (numerics,
    strings, dates); ``approxQuantile`` would cover numerics only.

    The ordering hash covers the FULL row, not just the sampled column:
    hashing the column alone gives every duplicate of a value the same
    draw, so on skewed columns the sample is all-or-nothing per distinct
    value and the quantile boundaries misrepresent row frequencies.
    Row-hashing keeps the draw uniform over rows while staying
    deterministic given the data (exact full-row duplicates still share
    a draw — acceptable: they are interchangeable rows). Map-typed
    payload columns are excluded from the hash (``xxhash64`` rejects
    MapType); the sampled columns themselves are always orderable, hence
    hashable, so the hash never degenerates to a constant.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _hashable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    n_buckets = 1 << bits
    row_cols = [
        F.col(f.name) for f in df.schema.fields if _hashable(f.dataType)
    ]
    out: dict[str, list] = {}
    for c in cols:
        vals = [
            r[0]
            for r in df.select(F.col(c).alias("_v"), *row_cols)
            .where(F.col("_v").isNotNull())
            .orderBy(F.xxhash64(*row_cols, F.lit(int(seed))), F.col("_v"))
            .select("_v")
            .limit(int(sample_rows))
            .collect()
        ]
        vals.sort()
        if not vals:
            out[c] = []
            continue
        # n_buckets-1 evenly spaced split points, deduplicated (heavy
        # hitters collapse buckets rather than skewing neighbours)
        raw = [
            vals[(i * len(vals)) // n_buckets]
            for i in range(1, n_buckets)
        ]
        bounds: list = []
        for b in raw:
            if not bounds or b != bounds[-1]:
                bounds.append(b)
        out[c] = bounds
    return out


def quantize_expr(col: str, boundaries: list) -> Column:
    """Bucket id of ``col`` = number of boundaries <= value, via one
    array-aggregate HOF over a literal boundary array (O(n_buckets)
    comparisons per row, fully codegen, no join). Nulls land in bucket
    0 — they cluster together at the curve origin."""
    if not boundaries:
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col(col) >= b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )


def morton_expr(quantized: Sequence[Column], bits: int) -> Column:
    """Bit-interleave k quantized columns (each in [0, 2^bits)) into one
    Morton code: output bit (i*k + j) = bit i of column j. A static sum
    of shift/mask terms — whole-stage codegen, no UDF."""
    k = len(quantized)
    code: Column | None = None
    for j, q in enumerate(quantized):
        qc = q.cast("long")
        for i in range(int(bits)):
            term = F.shiftleft(
                F.shiftright(qc, i).bitwiseAND(F.lit(1)), i * k + j
            )
            code = term if code is None else code + term
    assert code is not None
    return code


def zorder_column(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 6,
    sample_rows: int = 100_000,
    seed: int = 0,
) -> tuple[Column, int]:
    """The Morton-code Column for ``cols`` over ``df``'s value
    distribution, plus the total code width in bits (callers split the
    code's top bits into file ranges)."""
    bounds = sample_boundaries(
        df, cols, bits=bits, sample_rows=sample_rows, seed=seed
    )
    qs = [quantize_expr(c, bounds[c]) for c in cols]
    return morton_expr(qs, bits), bits * len(cols)
