"""Last-writer-wins dedup by key — the CDC reduction (SURVEY.md A2).

The reference relies on upstream uniqueness plus job bookmarks; the north
rule requires true LWW dedup on ``(repo, path, commit)`` keeping the row
with the maximum event sequence. Two strategies:

``dedup_lww``
    ``groupBy(keys).agg(max_by(struct(payload), seq))`` — a single hash
    aggregate. Spark performs partial (map-side) aggregation before the
    shuffle, so per-key data volume on the wire is already reduced; no
    sort is involved (unlike the window/row_number formulation, which
    shuffles ALL rows then sorts each partition).

``dedup_lww_salted``
    Explicit two-phase variant for pathological skew (one hot key owning
    a large share of events): phase 1 aggregates on ``(keys, salt)`` where
    salt is derived deterministically from ``seq`` — spreading a hot key
    over ``salt_buckets`` reducers — and phase 2 re-aggregates on the bare
    keys. For exact-duplicate storms the map-side partial aggregation of
    plain ``dedup_lww`` already collapses them, so salting matters when a
    hot key's rows are distinct (updates, not duplicates). Salt ONLY this
    pre-merge reduction; never salt the merge join keys (SURVEY.md §7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _payload_cols(df: DataFrame, keys: Sequence[str]) -> list[str]:
    return [c for c in df.columns if c not in set(keys)]


def dedup_lww(df: DataFrame, keys: Sequence[str], seq_col: str) -> DataFrame:
    """Keep, per key, the row with the maximum ``seq_col``.

    Ties on ``seq_col`` are broken arbitrarily (the event synthesizer and
    any well-formed CDC source make ``seq`` unique per key).
    """
    payload = _payload_cols(df, keys)
    agg = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("_top")
    out = df.groupBy(*keys).agg(agg)
    return out.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])


def dedup_lww_salted(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase LWW dedup with deterministic salting for skewed keys.

    Phase 1 shuffles on ``(keys, pmod(xxhash64(seq), salt_buckets))`` so a
    hot key fans out over ``salt_buckets`` reducers; each produces one
    partial winner. Phase 2 reduces the ≤``salt_buckets`` partial winners
    per key to the final winner — a tiny shuffle.
    """
    payload = _payload_cols(df, keys)
    salt = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)).alias("_salt")
    agg = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("_top")

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(agg)
        .select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])
    )
    final = partial.groupBy(*keys).agg(agg)
    return final.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])
