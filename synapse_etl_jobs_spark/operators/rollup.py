"""Multi-resolution rollups and mergeable sketches — the
continuous-aggregate surface of a 100 TB event lake.

- ``rollup_cascade``: hypertable-style cascade (TimescaleDB continuous
  aggregates): the finest level aggregates RAW rows once; every coarser
  level re-aggregates the PREVIOUS level (count→sum of counts, sum→sum,
  min→min, max→max). A day-level rollup over a year therefore reads
  ~8760 hour rows per key instead of re-scanning raw events —
  mergeability is what makes the cascade exact.
- ``sketch_distinct`` / ``sketch_union_estimate``: mergeable HLL
  distinct-count sketches (Apache DataSketches via the Spark 3.5+
  built-ins ``hll_sketch_agg`` / ``hll_union_agg``). Per-partition or
  per-batch sketch binaries are small, storable in the lake, and
  UNION-able — COUNT(DISTINCT) over any key combination without
  re-scanning raw data, the standard approximate-rollup pattern.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure op → (raw aggregate, merge aggregate)
_MERGEABLE = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    measures: Mapping[str, tuple[str, str | None]],
    levels: Sequence[str],
    *,
    keys: Sequence[str] = (),
) -> list[DataFrame]:
    """Cascaded event-time rollups: one DataFrame per level (finest
    first), each coarser level computed FROM the previous one.

    ``measures`` maps output name → (op, source column), op ∈
    count/sum/min/max (the mergeable set — averages are derived
    downstream as sum/count). ``levels`` are window durations ordered
    fine → coarse (each must evenly tile the next for exactness).
    Output per level: ``bucket`` (window start), keys, measures.
    """
    for name, (op, _src) in measures.items():
        if op not in _MERGEABLE:
            raise ValueError(
                f"measure {name!r}: op {op!r} is not mergeable "
                f"(supported: {sorted(_MERGEABLE)})"
            )
    out: list[DataFrame] = []
    cur: DataFrame | None = None
    for i, lvl in enumerate(levels):
        if i == 0:
            aggs = [
                (_MERGEABLE[op][0](src) if op != "count" else F.count("*")).alias(name)
                for name, (op, src) in measures.items()
            ]
            cur = (
                df.groupBy(F.window(F.col(ts_col), lvl).alias("_w"), *keys)
                .agg(*aggs)
            )
        else:
            aggs = [
                _MERGEABLE[op][1](name).alias(name)
                for name, (op, _src) in measures.items()
            ]
            cur = (
                out[-1]
                .groupBy(F.window(F.col("bucket"), lvl).alias("_w"), *keys)
                .agg(*aggs)
            )
        cur = cur.select(F.col("_w.start").alias("bucket"), *keys, *measures)
        out.append(cur)
    return out


def sketch_distinct(
    df: DataFrame,
    value_col: str,
    *,
    keys: Sequence[str] = (),
    lgk: int = 12,
) -> DataFrame:
    """Per-key HLL sketch binaries (mergeable, ~(2^lgk)/2 bytes each;
    lgk=12 → ~1.6% standard error, exact below the sparse threshold)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def sketch_union_estimate(
    sketches: DataFrame,
    *,
    keys: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches per key (e.g. across partitions/batches/tables)
    and estimate the distinct count — no raw-data re-scan."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .alias("distinct_est")
    )
