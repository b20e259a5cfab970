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
    hash_cols: Sequence[str] | None = None,
) -> dict[str, list]:
    """Per-column quantile boundaries from one bounded, deterministic
    uniform sample per column.

    ``orderBy(xxhash64(..., seed)).limit(n)`` plans as a distributed
    TakeOrderedAndProject: each partition keeps its local top-n by the
    hash (a uniform random draw, deterministic given the data), and only
    n rows ever reach the driver — the boundary pick is O(sample) no
    matter the table size. Works for any orderable type (numerics,
    strings, dates); ``approxQuantile`` would cover numerics only.

    The ordering hash must be (near-)unique PER ROW, not per value:
    hashing the sampled column alone gives every duplicate of a value
    the same draw, so on skewed columns the sample is all-or-nothing per
    distinct value and the quantile boundaries misrepresent row
    frequencies. ``hash_cols`` names a row-unique column set to hash —
    a lake table passes its key columns, so each sampling scan reads
    only (keys + sampled column) and parquet column pruning holds.
    Without it the hash falls back to every non-map column of the row
    (map columns excluded — ``xxhash64`` rejects MapType): still
    row-uniform and deterministic, but each sampling pass then scans the
    full row width, including any large payload columns — at 10^10 rows
    always pass ``hash_cols``.
    """
    from synapse_etl_jobs_spark.operators.dedup import _contains_map

    n_buckets = 1 << bits
    if hash_cols is not None:
        row_cols = [F.col(c) for c in hash_cols]
    else:
        row_cols = [
            F.col(f.name)
            for f in df.schema.fields
            if not _contains_map(f.dataType)
        ]
    # the sampled-value alias must not collide with a real column that
    # row_cols re-selects (AMBIGUOUS_REFERENCE otherwise)
    alias = "_v"
    while alias in df.columns:
        alias += "_"
    out: dict[str, list] = {}
    for c in cols:
        vals = [
            r[0]
            for r in _sample_query(
                df, c, row_cols, alias, seed, sample_rows
            ).collect()
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


def _sample_query(
    df: DataFrame,
    c: str,
    row_cols: Sequence[Column],
    alias: str,
    seed: int,
    sample_rows: int,
) -> DataFrame:
    """The one-column uniform-sample query ``sample_boundaries`` runs —
    separate so ``tools/explain_audit.py`` can assert its plan shape on
    the real code path: a TakeOrderedAndProject over a scan that reads
    ONLY (hash columns + sampled column), never the payload width."""
    return (
        df.select(F.col(c).alias(alias), *row_cols)
        .where(F.col(alias).isNotNull())
        .orderBy(F.xxhash64(*row_cols, F.lit(int(seed))), F.col(alias))
        .select(alias)
        .limit(int(sample_rows))
    )


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
    hash_cols: Sequence[str] | None = None,
) -> tuple[Column, int]:
    """The Morton-code Column for ``cols`` over ``df``'s value
    distribution, plus the total code width in bits (callers split the
    code's top bits into file ranges). ``hash_cols`` (a row-unique
    column set, e.g. the table keys) keeps the boundary-sampling scans
    narrow — see ``sample_boundaries``. It must actually BE row-unique:
    a low-cardinality ``hash_cols`` makes the sample all-or-nothing per
    value (the skew the row hash exists to avoid); ``compact()`` passes
    the table key columns, which are unique by the merge contract."""
    bounds = sample_boundaries(
        df, cols, bits=bits, sample_rows=sample_rows, seed=seed,
        hash_cols=hash_cols,
    )
    qs = [quantize_expr(c, bounds[c]) for c in cols]
    return morton_expr(qs, bits), bits * len(cols)
