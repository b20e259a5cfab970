"""Embedding similarity search over an ``array<float>`` column.

- ``cosine`` / ``dot``: native zip_with+aggregate expressions (JVM-side,
  codegen) — no Python per row;
- ``brute_force_topk``: exact top-k — broadcast the (small) query side
  against the corpus, one pass, window per query. The correctness
  baseline and perfectly adequate when |queries| is small;
- ``rp_lsh_topk``: the scale path — random-hyperplane LSH (Charikar '02):
  deterministic pseudo-random hyperplanes from xxhash64, sign-bit
  signatures, candidates from equi-joining bucket keys across multiple
  independent tables, exact cosine re-rank of candidates only. At 10^9
  vectors the cross product never materializes; cost is #tables joins on
  compact keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, sim, rank), self-matches excluded,
    deterministic tie-break by neighbor id. The query side is broadcast —
    the corpus streams through one stage with no shuffle; the only
    shuffle is the per-query top-k window over |queries|·|corpus| rows,
    bounded by keeping |queries| small (real ANN serving goes through
    ``rp_lsh_topk``).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_bit(vec: Column, bit: int, seed: int) -> Column:
    """Sign bit of <vec, w_bit> where w_bit[j] is a deterministic
    pseudo-uniform weight in [-0.5, 0.5) derived from xxhash64(bit, j)."""
    proj = F.aggregate(
        F.sequence(F.lit(0), F.size(vec) - 1),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(vec, j + 1).cast("double")
        * ((F.pmod(F.xxhash64(F.lit(bit), j, F.lit(seed)), F.lit(10000)) / 10000.0) - 0.5),
    )
    return (proj >= 0).cast("long")


def rp_signature(vec: Column, bits: int = 16, seed: int = 42) -> Column:
    """Packed ``bits``-bit random-hyperplane signature (one long)."""
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + _hyperplane_bit(vec, b, seed) * F.lit(1 << b).cast("long")
    return acc


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 12,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share a signature in ≥1 of
    ``tables`` independent hash tables, then exact cosine re-rank.

    Recall rises with ``tables`` and falls with ``bits``; at scale, the
    corpus signatures are computed once and reused across query batches
    (materialize them alongside the embedding column).
    """
    def signed(df: DataFrame, side: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"{side}_id"), F.col(vec_col).alias(f"_{side}v")
        )
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    rp_signature(F.col(f"_{side}v"), bits, seed + 101 * t).alias("sig"),
                )
                for t in range(tables)
            ]
        )
        return out.select(
            f"{side}_id", f"_{side}v", F.explode(sigs).alias("_ts")
        ).select(f"{side}_id", f"_{side}v", "_ts.table", "_ts.sig")

    qs = signed(queries, "query")
    cs = signed(corpus, "neighbor")
    cands = (
        cs.join(F.broadcast(qs), ["table", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_queryv", "_neighborv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_queryv"), F.col("_neighborv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
