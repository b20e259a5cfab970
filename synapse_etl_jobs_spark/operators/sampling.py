"""Deterministic sampling and dataset mixing for training-set assembly.

Everything is a pure hash function of (seed, row id) — no RNG state, no
``sample()`` nondeterminism: the same inputs give the same sample on any
cluster size, any partitioning, any Spark version (the property that
makes experiment lineage reproducible and lets a DuckDB oracle check the
exact row set).  All expressions are native Catalyst; cost is one
map-side select, no shuffle.

Hash: the portable 48-bit md5 hash (operators.text.md5_hash48) so ANSI
SQL mirrors the row set bit-for-bit.  At 100 TB the md5 cost is real but
scan-dominated; swap ``hash_fn`` for ``F.xxhash64``-based hashing when
oracle portability isn't needed.

Reference context: the reference has no sampling surface; this is part
of the training-data layer (SURVEY.md §8) alongside hash_split.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_hash48

_DENOM = 1_000_000  # rate resolution: 1e-6


def _rate_hash(id_col, seed: int, hash_fn=None) -> Column:
    """Uniform integer in [0, 1e6) derived from (seed, id)."""
    hf = hash_fn or md5_hash48
    col = id_col if isinstance(id_col, Column) else F.col(id_col)
    return F.pmod(
        hf(F.concat_ws("\x1f", F.lit(str(seed)), col.cast("string"))),
        F.lit(_DENOM),
    )


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
    hash_fn=None,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows: row survives iff
    ``hash(seed, id) % 1e6 < fraction * 1e6``.  Samples drawn with the
    same seed NEST (fraction 0.1 ⊂ fraction 0.2 — shrink a dataset
    without resampling); different seeds give independent samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * _DENOM))
    return df.filter(_rate_hash(id_col, seed, hash_fn) < thr)


def weighted_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: int = 42,
    hash_fn=None,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Dataset mixing with per-stratum weights — the training-mixture
    primitive (e.g. ``{"wiki": 3.0, "web": 0.25}`` oversamples wiki 3x
    and keeps a quarter of web).

    weight < 1: deterministic downsample (as ``hash_sample``).
    weight ≥ 1: every row gets ``floor(w)`` copies (``copy_idx`` 0..k-1,
    so downstream shuffles spread the copies), plus one extra copy for
    the hash-selected ``frac(w)`` of rows.  Expected row count is exactly
    ``Σ_s w_s · |s|``; the realized set is a pure function of (seed, id).

    Plan shape: one select + an array explode of at most ``ceil(w)``
    elements — map-side only, no shuffle, no RNG.  (The reference's Glue
    jobs have no analog; this serves the LLM-pipeline axis.)
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for stratum {s!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default weight: {default_weight}")

    r = _rate_hash(id_col, seed, hash_fn)
    strata = F.col(strata_col)

    # copies = floor(w) + (1 if r < frac(w)*1e6 else 0), branched by stratum
    def copies_for(w: float) -> Column:
        base = int(math.floor(w))
        frac_thr = int(round((w - base) * _DENOM))
        return F.lit(base) + (r < frac_thr).cast("int")

    n_copies = copies_for(default_weight)
    for s, w in sorted(weights.items()):
        n_copies = F.when(strata == s, copies_for(w)).otherwise(n_copies)

    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )
