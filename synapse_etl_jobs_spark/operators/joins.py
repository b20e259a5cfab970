"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Neither exists in the reference (it has no joins at all,
SURVEY.md §2.3); they are engine surface because CDC consumers
constantly need them — "state of X as of event time T" (as-of) and
"which window/band does this event fall in" (range) — and the naive
formulations (inequality theta-joins) plan as broadcast nested loops or
cartesian products, which die at scale. Both operators here are
compositions of existing DataFrame ops with single-shuffle plans:

- ``asof_join``: union-and-window. Tag both sides, union them, and for
  each left row take the last non-null right payload in event-time
  order within the key partition — ONE shuffle on the join keys, no
  inequality join anywhere, state bounded by the window frame. The
  same trick streaming systems use for temporal-table joins.
- ``range_join``: interval binning. Explode each interval over the
  fixed-width bins it overlaps, bucket each point into its single bin,
  then a plain equi-join on (keys, bin) + residual bounds filter — the
  standard optimization (e.g. Databricks' range-join hints) expressed
  manually. Join fan-out is interval_span/bin_width per interval row,
  chosen by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tie_hash(right: DataFrame, rcols: Sequence[str]):
    """Deterministic tiebreak hash over the right payload columns.
    xxhash64 rejects map-containing types (HASH_MAP_TYPE), so such
    columns enter the hash as their ``to_json`` rendering."""
    from synapse_etl_jobs_spark.operators.dedup import _contains_map

    if not rcols:
        return F.lit(0).cast("long").alias("_tie")
    parts = [
        F.to_json(F.col(c)) if _contains_map(right.schema[c].dataType)
        else F.col(c)
        for c in rcols
    ]
    return F.xxhash64(*parts).alias("_tie")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the nearest
    ``right_ts`` at or before (``backward``) / at or after
    (``forward``) its ``left_ts``, within the same ``on`` keys —
    pandas ``merge_asof`` semantics, left-outer (no match → nulls).

    ``tolerance`` (same units as the ts columns) nulls out matches
    farther than the bound. Right payload columns are suffixed.

    Plan: one shuffle (the window partition on ``on``), all codegen.
    Ambiguity: several right rows sharing (keys, ts) resolve
    deterministically by a hash tiebreak — dedupe the right side first
    if that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    rcols = [c for c in right.columns if c not in set(on) and c != right_ts]
    out_rcols = {c: f"{c}{suffix}" for c in rcols}
    lcols = [c for c in left.columns if c not in set(on)]

    l_tag = left.select(
        *on,
        F.col(left_ts).cast("double").alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast("double").alias("_rt"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(out_rcols[c]) for c in rcols],
        F.lit(0).cast("long").alias("_tie"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).cast("double").alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.col(right_ts).cast("double").alias("_rt"),
        *[F.col(c).alias(out_rcols[c]) for c in rcols],
        _tie_hash(right, rcols),
    )
    u = l_tag.unionByName(r_tag)

    # event-time order with right rows sorting BEFORE left rows at equal
    # timestamps, so exact-time matches are included (merge_asof
    # semantics); forward = the same scan in reverse time order
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_is_left").asc(), F.col("_tie").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_is_left").asc(), F.col("_tie").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "*",
        F.last("_rt", ignorenulls=True).over(w).alias("_mrt"),
        *[
            F.last(out_rcols[c], ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in rcols
        ],
    ).filter(F.col("_is_left") == 1)

    within = F.lit(True)
    if tolerance is not None:
        delta = (
            F.col("_t") - F.col("_mrt")
            if direction == "backward"
            else F.col("_mrt") - F.col("_t")
        )
        within = F.col("_mrt").isNotNull() & (delta <= F.lit(float(tolerance)))
    return matched.select(
        *on,
        F.col(left_ts) if left_ts in lcols else F.col("_t").alias(left_ts),
        *[F.col(c) for c in lcols if c != left_ts],
        F.when(within, F.col("_mrt")).otherwise(F.lit(None)).alias(f"{right_ts}{suffix}"),
        *[
            F.when(within, F.col(f"_m_{c}")).otherwise(F.lit(None)).alias(out_rcols[c])
            for c in rcols
        ],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lower_col: str,
    upper_col: str,
    on: Sequence[str] = (),
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lower <= point <= upper`` (and equal ``on`` keys) WITHOUT an
    inequality join: intervals explode over the fixed-width bins they
    overlap, points bucket into their single bin, then a hash equi-join
    on (keys, bin) + the exact bounds filter. Each qualifying
    (point, interval) pair meets in exactly one bin — no duplicates, no
    post-dedup. Fan-out per interval ≈ span/bin_width + 1: pick
    ``bin_width`` near the typical span. ``how``: ``inner`` or ``left``
    (unmatched points kept with null interval columns).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    b = float(bin_width)
    p_bin = F.floor(F.col(point_col) / b).cast("long")
    lo_bin = F.floor(F.col(lower_col) / b).cast("long")
    hi_bin = F.floor(F.col(upper_col) / b).cast("long")

    iv = intervals.select(
        "*",
        F.explode(F.sequence(lo_bin, hi_bin)).alias("_bin"),
    )
    pt = points.select("*", p_bin.alias("_bin"))
    joined = pt.join(iv, [*on, "_bin"], "inner").filter(
        (F.col(point_col) >= F.col(lower_col))
        & (F.col(point_col) <= F.col(upper_col))
    )
    if how == "inner":
        return joined.drop("_bin")
    matched = joined.drop("_bin")
    unmatched = pt.drop("_bin").join(
        matched.select(*points.columns), list(points.columns), "left_anti"
    )
    extra = [c for c in matched.columns if c not in points.columns]
    unmatched = unmatched.select(
        "*", *[F.lit(None).cast(dict(matched.dtypes)[c]).alias(c) for c in extra]
    )
    return matched.unionByName(unmatched)
