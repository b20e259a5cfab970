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


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k of (query_id, neighbor_id, sim) rows — adds
    ``rank`` and keeps rank ≤ k per query, deterministic tie-break by
    neighbor id.

    Phase 1 takes a LOCAL top-k within each (query, input-partition)
    group, so parallelism is #queries × #partitions instead of #queries
    — a single-query search over a 10^9-row corpus no longer funnels
    every scored row through one reducer. Phase 2 merges the ≤
    k·#partitions survivors per query (tiny). The result — values AND
    ranks — is identical to a single global window for any partition
    split, because the global top-k is a subset of the union of local
    top-ks and the final ordering re-ranks from scratch.
    """
    order = [F.col("sim").desc(), F.col("neighbor_id").asc()]
    w_local = Window.partitionBy("query_id", "_pid").orderBy(*order)
    local = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


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
    the corpus streams through one stage with no shuffle — and the
    reduction is the two-phase ``topk_per_query``: a map-side local
    top-k bounds the shuffle at k·#partitions rows per query, so
    parallelism never degenerates to #queries (the round-1 plan put all
    |corpus| rows for one query through one reducer).
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
    return topk_per_query(scored, k)


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
    """Packed ``bits``-bit random-hyperplane signature (one long).

    Column-expression form for ad-hoc use — the nested aggregates run
    interpreted. Corpus-scale paths use ``rp_signatures`` below
    (explode + codegen aggregation, different-but-equivalent hash
    family)."""
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + _hyperplane_bit(vec, b, seed) * F.lit(1 << b).cast("long")
    return acc


def rp_signatures(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    bits: int,
    tables: int,
    seed: int = 42,
) -> DataFrame:
    """All random-hyperplane signatures for a corpus in ONE codegen
    aggregation: posexplode the vector to (id, j, v_j) rows, compute
    every (table, bit) projection as a sum aggregate, then pack bits.

    Projections use INTEGER arithmetic — ``round(v·10^6) · w(b,j)`` with
    integer weights summed as longs — so the result is independent of
    aggregation order (float sums are not: two identical vectors reduced
    in different orders could land on opposite sides of zero, breaking
    the identical-vectors-always-collide guarantee that the exact-dup
    dedup path relies on). Max magnitude ≈ 10^6·5000·dim — far inside
    long range, ANSI-safe. Output: (id_col, table, sig).

    Null/empty vectors: ``posexplode`` yields no rows for them, so their
    ids are restored by a left join and take signature 0 in EVERY table
    (the same zero-default ``simhash_signatures`` gives zero-token docs,
    and what the inline ``rp_signature`` computes for an empty array).
    They collide only with each other; downstream cosine ranking decides
    what that means — they never silently vanish from results.
    """
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    ex = spread_for_explode(df).select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("_j", "_v")
    ).select(
        id_col,
        F.col("_j"),
        F.round(F.col("_v").cast("double") * 1_000_000).cast("long").alias("_vi"),
    )
    aggs = []
    for t in range(tables):
        tseed = seed + 101 * t
        for b in range(bits):
            w = F.pmod(
                F.xxhash64(F.lit(b), F.col("_j"), F.lit(tseed)), F.lit(10001)
            ) - 5000
            aggs.append(F.sum(F.col("_vi") * w).alias(f"_p_{t}_{b}"))
    # restore ids whose vector was null/empty (dropped by posexplode):
    # their _p_* sums are null, so every when() below takes the 0 branch
    # and the packed signature is 0 in every table
    sums = df.select(F.col(id_col)).join(ex.groupBy(id_col).agg(*aggs), id_col, "left")
    packed = []
    for t in range(tables):
        acc = F.lit(0).cast("long")
        for b in range(bits):
            acc = acc + F.when(
                F.col(f"_p_{t}_{b}") >= 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        packed.append(F.struct(F.lit(t).alias("table"), acc.alias("sig")))
    return sums.select(
        F.col(id_col), F.explode(F.array(*packed)).alias("_ts")
    ).select(id_col, "_ts.table", "_ts.sig")


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
        sigs = rp_signatures(
            df, id_col=id_col, vec_col=vec_col, bits=bits, tables=tables, seed=seed
        )
        return df.select(
            F.col(id_col).alias(f"{side}_id"), F.col(vec_col).alias(f"_{side}v")
        ).join(
            sigs.select(F.col(id_col).alias(f"{side}_id"), "table", "sig"),
            f"{side}_id",
        )

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
    return topk_per_query(scored, k)


def quantize_embedding(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "q",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric int8 scalar quantization: per-vector scale =
    max(|v|)/127, codes = round(v/scale) ∈ [-127, 127] stored as
    array<tinyint> — 4× smaller than float32 at 10^9-vector scale, and
    dot products stay exact integer arithmetic (rescale at the end).
    Deterministic (half-up rounding), all native expressions; zero/null
    vectors get scale 0 and an empty/zero code array."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = (F.coalesce(amax, F.lit(0.0)) / 127.0).alias(scale_col)
    codes = F.when(
        F.coalesce(amax, F.lit(0.0)) == 0.0,
        F.transform(v, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.round(x.cast("double") * 127.0 / amax)
            .cast("int").cast("tinyint"),
        )
    )
    return df.select("*", codes.alias(out_col), scale)


def dequantize_embedding(
    df: DataFrame,
    *,
    code_col: str = "q",
    scale_col: str = "q_scale",
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Inverse of ``quantize_embedding``: v̂[j] = code[j] · scale.
    Max elementwise error is scale/2 (= max|v|/254)."""
    return df.select(
        "*",
        F.transform(
            F.col(code_col), lambda c: c.cast("double") * F.col(scale_col)
        ).alias(out_col),
    )


def ivf_assign(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: pick ``n_cells`` corpus vectors as cell
    centroids (deterministic hash-sample) and assign every vector to its
    nearest centroid by cosine.

    ``refine_iters`` runs that many Lloyd (k-means) iterations over the
    hash-sampled start — distributed entirely in DataFrame aggregates:
    assign (broadcast centroids, map-only) → per-(cell, dim) mean via
    posexplode + one hash aggregate → re-pack centroid arrays. Two
    shuffles per iteration, each over (n_cells × dim) + (n × dim)
    compact rows; empty cells keep their previous centroid. Refined
    centroids tighten cells → higher recall at the same ``n_probe``.
    NOTE: float means depend on reduction order, so refined centroids
    are deterministic only up to float-sum ordering — the
    oracle-checked entry queries use ``refine_iters=0``; recall effects
    are pinned in pytest instead.

    Returns ``(centroids, assigned)`` where centroids = (cell, centroid
    vector) and assigned = corpus + ``_cell``. Assignment is one pass:
    centroids are broadcast (n_cells rows), the corpus streams through a
    single stage — no shuffle. At 10^9 vectors this is the standard
    IVF-flat build: O(n · n_cells) JVM-side dot products, embarrassingly
    parallel.
    """
    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # deterministic sample: the n_cells vectors with smallest xxhash64(id).
    # orderBy().limit() plans as TakeOrderedAndProject — each scan task
    # keeps a local top-n_cells and only those survivors merge — so the
    # pick is distributed. (A global row_number window here would funnel
    # the ENTIRE corpus through one task: the scale-killer at 10^9
    # vectors.) The row_number that assigns cell ids runs AFTER the
    # limit, over exactly n_cells rows — a single tiny-partition sort.
    hkey = F.xxhash64(F.col("_id"), F.lit(seed))
    w = Window.orderBy(F.xxhash64(F.col("_id"), F.lit(seed)), F.col("_id"))
    centroids = (
        c.orderBy(hkey.asc(), F.col("_id").asc())
        .limit(n_cells)
        .withColumn("_r", F.row_number().over(w))
        .select(
            (F.col("_r") - 1).alias("cell"),
            # double elements: exact for float inputs, and type-aligned
            # with Lloyd-refined mean centroids (refine_iters > 0)
            F.transform(F.col("_v"), lambda x: x.cast("double")).alias("centroid"),
        )
    )
    def assign(cents: DataFrame) -> DataFrame:
        scored = c.join(F.broadcast(cents)).select(
            "_id", "_v", "cell", cosine(F.col("_v"), F.col("centroid")).alias("_sim")
        )
        wc = Window.partitionBy("_id").orderBy(
            F.col("_sim").desc(), F.col("cell").asc()
        )
        return (
            scored.withColumn("_rk", F.row_number().over(wc))
            .filter(F.col("_rk") == 1)
            .select("_id", "_v", F.col("cell").alias("_cell"))
        )

    for _ in range(refine_iters):
        # Lloyd step: mean vector per cell, computed as ONE hash
        # aggregate over (cell, dim) rows, then re-packed in dim order
        means = (
            assign(centroids)
            .select("_cell", F.posexplode(F.col("_v")).alias("_j", "_x"))
            .groupBy("_cell", "_j")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .groupBy("_cell")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_j"), F.col("_m")))
                    ),
                    lambda s: s["_m"],
                ).alias("_new")
            )
        )
        # empty cells keep their previous centroid
        centroids = (
            centroids.join(
                means.withColumnRenamed("_cell", "cell"), "cell", "left"
            )
            .select(
                "cell",
                F.coalesce(F.col("_new"), F.col("centroid")).alias("centroid"),
            )
            .localCheckpoint(eager=True)  # truncate per-iteration lineage
        )

    assigned = assign(centroids).select(
        F.col("_id").alias(id_col), F.col("_v").alias(vec_col), "_cell"
    )
    return centroids, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k: score queries only against vectors in
    the ``n_probe`` cells nearest each query (inverted-file search, the
    FAISS IVF-Flat scheme). Recall rises with ``n_probe``/``n_cells``
    and with Lloyd-refined centroids (``refine_iters`` — see
    ``ivf_assign``); ``n_probe == n_cells`` degenerates to exact brute
    force.

    Plan shape at scale: the partitioned corpus is assigned once (reuse
    ``ivf_assign`` output as a materialized column), each query probes
    n_probe cells via an equi-join on ``_cell`` — the join key is a small
    int, so AQE can skew-split a hot cell — and only candidate pairs pay
    the full-dimension cosine.
    """
    centroids, assigned = ivf_assign(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells, seed=seed,
        refine_iters=refine_iters,
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    qscore = q.join(F.broadcast(centroids)).select(
        "query_id", "_qv", "cell", cosine(F.col("_qv"), F.col("centroid")).alias("_sim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cell").asc())
    probes = (
        qscore.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", F.col("cell").alias("_cell"))
    )
    cands = probes.join(assigned, "_cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("_qv"), F.col(vec_col)), 6).alias("sim"),
    )
    return topk_per_query(scored, k)


def _exact_candidates_blocked(
    c: DataFrame,
    *,
    threshold: float,
    block_rows: int = 2048,
    margin: float = 1e-6,
) -> tuple[DataFrame, DataFrame]:
    """All-pairs cosine CANDIDATES via blocked matrix multiply: (id_a <
    id_b) pairs whose numpy-float64 cosine is ≥ threshold − margin,
    returned together with the materialized (localCheckpointed) input
    frame so the caller's re-score joins reuse the same scan instead of
    recomputing the corpus projection.

    The naive exact path — a nested-loop cross join evaluating the
    ``cosine`` expression per pair — costs O(n²) *expression
    interpretations*; at 40k vectors (8·10⁸ pairs) it runs for hours.
    This kernel gets the same arithmetic from BLAS: ids are hashed into
    ⌈n/block_rows⌉ blocks, every block PAIR (bi ≤ bj) becomes one
    ``applyInPandas`` group that receives both blocks' rows
    (Arrow-batched) and computes the full inter-block similarity matrix
    with one float64 matmul — ~three orders of magnitude faster per
    pair, parallel over B(B+1)/2 independent tasks, peak task memory
    ≈ block_rows² · 8 bytes (32 MB at the default). Data amplification
    is (B+1)× over slim (id, vec) rows — the inherent cost of exact
    all-pairs; the LSH method is the path that avoids it.

    Caller contract: this returns CANDIDATES under a conservative
    margin (float64 matmul error for unit-scale vectors is ~1e-14,
    margin is 1e-6); the caller re-scores survivors with the same
    ``cosine`` Spark expression the naive path used, so the final
    output is bit-identical to the nested-loop formulation while the
    quadratic work happens in BLAS.
    """
    import math

    import numpy as np
    import pandas as pd

    # one materialization: the count (which sizes the block grid) and the
    # two block-tag joins below all read the same slim (id, vec) frame —
    # without the cut, a derived input would be recomputed three times
    c = c.localCheckpoint(eager=True)
    n = c.count()
    nblocks = max(1, math.ceil(n / block_rows))
    spark = c.sparkSession
    meta = spark.createDataFrame(
        [(i, j) for i in range(nblocks) for j in range(i, nblocks)],
        "bi int, bj int",
    )
    tagged = c.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(nblocks)).cast("int")
    )
    side_a = tagged.join(meta, tagged["_blk"] == meta["bi"]).select(
        "bi", "bj", "_id", "_v", F.lit(0).alias("_side")
    )
    side_b = tagged.join(
        meta, (tagged["_blk"] == meta["bj"]) & (meta["bi"] != meta["bj"])
    ).select("bi", "bj", "_id", "_v", F.lit(1).alias("_side"))
    both = side_a.unionByName(side_b)

    id_type = c.schema["_id"].dataType.simpleString()
    cut = float(threshold) - float(margin)

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        same = int(pdf["bi"].iat[0]) == int(pdf["bj"].iat[0])
        a = pdf[pdf["_side"] == 0]
        b = a if same else pdf[pdf["_side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ma = np.array([np.asarray(v, dtype=np.float64) for v in a["_v"]])
        mb = ma if same else np.array(
            [np.asarray(v, dtype=np.float64) for v in b["_v"]]
        )
        na = np.maximum(np.linalg.norm(ma, axis=1, keepdims=True), 1e-12)
        nb = na if same else np.maximum(
            np.linalg.norm(mb, axis=1, keepdims=True), 1e-12
        )
        sims = (ma / na) @ (mb / nb).T
        ia, ib = np.nonzero(sims >= cut)
        pa = a["_id"].to_numpy()[ia]
        pb = b["_id"].to_numpy()[ib]
        if same:
            keep = pa < pb  # dedupe mirrored pairs + drop the diagonal
            pa, pb = pa[keep], pb[keep]
        else:
            lo = np.where(pa < pb, pa, pb)
            hi = np.where(pa < pb, pb, pa)
            pa, pb = lo, hi
        return pd.DataFrame({"id_a": pa, "id_b": pb})

    pairs = both.groupBy("bi", "bj").applyInPandas(
        score, f"id_a {id_type}, id_b {id_type}"
    )
    return pairs, c


def embedding_neardup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    method: str = "lsh",
    bits: int = 10,
    tables: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, sim ≥ threshold).

    ``max_bucket_size`` (lsh only) drops (table, sig) signature groups
    above the cap before the self-join — the degenerate-bucket guard: a
    k-clone embedding family (duplicated documents embed identically)
    otherwise emits O(k²) candidate pairs. Trades recall on exactly
    those huge families; ``dedup_text.capped_group_stats`` on
    ``rp_signatures`` output (group_cols=("table", "sig")) reports what
    a cap drops.

    ``method='exact'`` scores every pair — the oracle/verification path,
    O(n²), only for small corpora or post-LSH candidate lists.
    ``method='lsh'`` is the scale path: candidates must collide in ≥1 of
    ``tables`` random-hyperplane signature tables (the same blocked
    self-join shape as MinHash-LSH banding — no cross product ever
    materializes; the join key is a compact (table, sig) pair, so at 10^9
    vectors the shuffle is #tables × n rows of three columns), then exact
    cosine verifies candidates only. Recall of true near-dups rises with
    ``tables``; for cosine ≥ 0.9 the collision probability per table is
    (1 - arccos(0.9)/π)^bits, so 6 tables × 10 bits gives ≈ 0.87 recall.
    """
    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if method == "exact":
        # reuse the helper's materialized frame: the two re-score joins
        # below read the checkpoint, not a recomputed corpus projection
        cand, cm = _exact_candidates_blocked(c, threshold=threshold)
        a = cm.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
        b = cm.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
        pairs = cand.join(a, "id_a").join(b, "id_b")
    elif method == "lsh":
        sigs = rp_signatures(
            c, id_col="_id", vec_col="_v", bits=bits, tables=tables, seed=seed
        )
        if max_bucket_size is not None:
            from synapse_etl_jobs_spark.operators.dedup_text import (
                cap_bucket_groups,
            )

            sigs = cap_bucket_groups(
                sigs, max_bucket_size, group_cols=("table", "sig")
            )
        blocked = c.join(sigs, "_id").select("_id", "_v", "table", "sig")
        a = blocked.select(
            F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "table", "sig"
        )
        b = blocked.select(
            F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "table", "sig"
        )
        pairs = (
            a.join(b, ["table", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method: {method}")
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def dedup_embedding(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    method: str = "lsh",
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-dup removal: keep the min-id representative of
    each near-dup group (single-round star contraction, same policy as
    ``minhash_dedup`` — adequate for small clusters; iterative
    connected-components is the upgrade path for chained dup clusters)."""
    from synapse_etl_jobs_spark.operators.dedup_text import keep_min_representative

    pairs = embedding_neardup_pairs(
        corpus, id_col=id_col, vec_col=vec_col,
        threshold=threshold, method=method, **lsh_kwargs,
    )
    return keep_min_representative(corpus, pairs, id_col)


# --------------------------------------------------------- incremental index
#
# Embedding twin of dedup_text's incremental MinHash index: the corpus'
# random-hyperplane signatures are PERSISTED once ((id, table, sig) —
# `tables` tiny rows per vector); each new batch is signed in O(batch),
# probed against the index, and verified with exact cosine against the
# candidate corpus vectors only (fetched by semijoin on candidate ids).


def rp_index(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Persistable RP-LSH index rows ``(id_col, table, sig)`` for a
    corpus — exactly ``rp_signatures`` output, named as the durable
    artifact. Probes MUST use the same (bits, tables, seed)."""
    return rp_signatures(
        df, id_col=id_col, vec_col=vec_col, bits=bits, tables=tables, seed=seed
    )


def rp_index_probe(
    new_df: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    tables: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Candidate (new_id, corpus_id) pairs between a new batch and an
    indexed corpus: sign the batch only, equi-join on (table, sig).
    Self-pairs are excluded (streaming redelivery can legally present a
    batch whose ids are already indexed — see dedup_text's cross probe).

    ``broadcast_probe`` (default on) broadcasts the batch's signature
    rows so the corpus-sized index NEVER shuffles (map-side
    BroadcastHashJoin); disable only for giant batches.
    ``max_bucket_size`` drops degenerate (table, sig) index groups
    above the cap, applied after a broadcast semijoin to the probed
    signatures so the cap window shuffles O(probed rows), not the
    whole index (group sizes are unchanged — the semijoin keeps whole
    groups)."""
    nb = rp_signatures(
        new_df, id_col=id_col, vec_col=vec_col, bits=bits, tables=tables, seed=seed
    ).select(F.col(id_col).alias("new_id"), "table", "sig")
    ix = index.select(F.col(id_col).alias("corpus_id"), "table", "sig")
    if max_bucket_size is not None:
        from synapse_etl_jobs_spark.operators.dedup_text import cap_probed_index

        # the cap makes nb feed TWO plan branches whose
        # BroadcastExchanges differ (ReuseExchange can't collapse them)
        # — cut lineage so the batch is signed ONCE per probe, not twice
        nb = nb.localCheckpoint()
        ix = cap_probed_index(ix, nb, max_bucket_size, group_cols=("table", "sig"),
                              broadcast_probe=broadcast_probe)
    if broadcast_probe:
        nb = F.broadcast(nb)
    return (
        nb.join(ix, ["table", "sig"])
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )


def embedding_dedup_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    *,
    index: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bits: int = 10,
    tables: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Rows of ``new_df`` that survive cosine near-dup removal against
    an already-deduped corpus and within the batch itself. Corpus
    vectors are touched only for candidate ids; a new vector is dropped
    when exact cosine ≥ ``threshold`` against any candidate corpus
    vector or a surviving smaller-id batch vector (single-round star
    contraction, same policy as ``dedup_embedding``). ids must be
    unique across corpus ∪ batch.

    ``broadcast_probe``/``max_bucket_size`` are the probe-scale guards
    — see ``rp_index_probe`` (the cap also applies to the within-batch
    self-join via ``embedding_neardup_pairs``)."""
    from synapse_etl_jobs_spark.operators.dedup_text import keep_min_representative

    lsh = dict(bits=bits, tables=tables, seed=seed)
    if index is None:
        index = rp_index(corpus_df, id_col=id_col, vec_col=vec_col, **lsh)
    cross = rp_index_probe(
        new_df, index, id_col=id_col, vec_col=vec_col,
        max_bucket_size=max_bucket_size, broadcast_probe=broadcast_probe,
        **lsh,
    ).localCheckpoint()

    cand_ids = cross.select(F.col("corpus_id").alias(id_col)).distinct()
    cand_vecs = corpus_df.join(cand_ids, on=id_col, how="leftsemi").select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
    )
    nv = new_df.select(F.col(id_col).alias("new_id"), F.col(vec_col).alias("_nv"))
    corpus_dup = (
        cross.join(nv, "new_id").join(cand_vecs, "corpus_id")
        .filter(F.round(cosine(F.col("_nv"), F.col("_cv")), 6) >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    # lineage cut before the within pass: rp_signatures' partition
    # probe (df.rdd) would otherwise finalize AQE on the derived
    # survivors frame and EXECUTE the whole cross-corpus verification a
    # second time just to count partitions (same reasoning as the
    # minhash twin's checkpointed `hit`)
    survivors = new_df.join(
        corpus_dup, on=id_col, how="left_anti"
    ).localCheckpoint()

    within = embedding_neardup_pairs(
        survivors, id_col=id_col, vec_col=vec_col, threshold=threshold,
        method="lsh", max_bucket_size=max_bucket_size, **lsh,
    )
    return keep_min_representative(survivors, within, id_col)
