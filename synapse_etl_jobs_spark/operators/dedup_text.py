"""Document deduplication at training-data scale.

- exact dedup: hash-groupBy — one shuffle on the content hash;
- n-gram Jaccard: exact similarity over shingle sets (verification
  primitive, and usable stand-alone on candidate pairs);
- MinHash + LSH: banded signatures → candidate pairs via an equi-join on
  (band, band-hash) — the standard near-dup pipeline (Broder '97;
  Leskovec-Rajaraman-Ullman ch.3). The only shuffle is the band-bucket
  join, and candidates are verified with exact Jaccard afterwards;
- SimHash: 64-bit signature (Charikar '02) via a grouped bit-vote in
  native expressions; near-dups = signatures within Hamming distance k,
  found by pigeonhole banding of the 64 bits.

Everything is deterministic (seeded xxhash64) and expressed with
higher-order array functions + joins — no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.operators.text import char_shingles, tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact content match.

    Hash-aggregate on sha2(text): map-side partial aggregation collapses
    duplicates before the shuffle, so wire volume ≈ distinct docs.
    """
    h = F.sha2(F.col(text_col), 256).alias("_h")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="leftsemi")


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two (distinct-element) arrays, 6-dp rounded."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / F.greatest(union, F.lit(1.0)), 6)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact k-shingle Jaccard for given candidate (id_a, id_b) pairs.

    Shingle sets are computed once per side and joined — at scale the
    pair list comes from LSH (below), never a cross join.
    """
    sh = df.select(
        F.col(id_col), char_shingles(text_col, k).alias("_sh")
    )
    a = sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sh_a")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sh_b")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        # pass through any extra pair columns (e.g. a cross/within mark)
        .select(*pairs.columns,
                jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"))
    )


def minhash_signature(c, num_hashes: int = 64, seed: int = 42) -> Column:
    """MinHash signature of a shingle array (array-expression form).

    Each shingle is hashed ONCE (xxhash64); the per-function family is the
    standard affine family h_i(x) = a_i*x + b_i over the 64-bit ring
    (Broder '97 / MMDS ch.3), so cost is |shingles| hashes + num_hashes
    mins instead of |shingles|·num_hashes hashes.

    NOTE: nested higher-order array functions run interpreted (outside
    whole-stage codegen); for corpus-scale signatures use
    ``minhash_signatures`` below — the explode+agg formulation — which
    benched ~40× faster. This form remains for small/ad-hoc use.
    """
    col = c if isinstance(c, Column) else F.col(c)
    hashes = F.transform(col, lambda s: F.xxhash64(s, F.lit(seed)))
    # function family = rehash of the base hash with the function index;
    # pure hashing avoids 64-bit wraparound arithmetic (ANSI mode throws)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(hashes, lambda h: F.xxhash64(h, i))),
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Corpus MinHash signatures via explode + per-function min aggregates.

    (id, shingle) rows are exploded once, each shingle hashed once, then a
    single hash-aggregate computes all ``num_hashes`` mins as separate agg
    columns — everything whole-stage-codegen, map-side partially
    aggregated before the one shuffle on id. Output: (id_col, _sig array).
    """
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    exploded = spread_for_explode(df).select(
        F.col(id_col), F.explode(char_shingles(text_col, shingle_k)).alias("_s")
    ).select(id_col, F.xxhash64("_s", F.lit(seed)).alias("_h"))
    # function family = rehash of the base hash with the function index
    # (pure hashing: no wraparound arithmetic under ANSI mode)
    aggs = [
        F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}") for i in range(num_hashes)
    ]
    sigs = exploded.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("_sig")
    )


def _band_buckets(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_hashes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """(_id, band, bucket) LSH bucket rows for a corpus — the shared
    banding step of self-join candidate generation and the persistable
    incremental index. ``bucket = xxhash64(band-slice of the signature)``,
    so identical texts land in the same bucket of every band."""
    band_size = num_hashes // bands
    sig = minhash_signatures(
        df, id_col=id_col, text_col=text_col,
        shingle_k=shingle_k, num_hashes=num_hashes, seed=seed,
    ).withColumnRenamed(id_col, "_id")
    return sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("_sig"), b * band_size + 1, band_size),
                            F.lit(seed),
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select("_id", "_bb.band", "_bb.bucket")


def cap_bucket_groups(
    rows: DataFrame,
    max_group_size: int,
    group_cols: Sequence[str] = ("band", "bucket"),
) -> DataFrame:
    """Drop every row of a group larger than ``max_group_size`` — the
    degenerate-bucket guard for LSH candidate generation.

    A (band, bucket) group of k rows emits O(k²) candidate pairs from
    the self-join; at web scale a boilerplate cluster (license headers,
    templated pages) can put 10^6 near-identical documents in one bucket
    — 10^12 pairs no AQE setting can absorb. Exact duplicates are
    pre-collapsed upstream (``exact_duplicate_map``), so a group that
    STILL exceeds the cap is a genuinely huge near-dup family; capping
    trades recall on exactly those groups, the standard LSH practice.
    One window shuffle on the group key — the same key the candidate
    self-join shuffles on, so the Exchange is reused.

    ``capped_group_stats`` reports what a cap would drop (or dropped),
    for the metrics/lineage row the caller logs.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    return (
        rows.withColumn("_gn", F.count(F.lit(1)).over(w))
        .filter(F.col("_gn") <= int(max_group_size))
        .drop("_gn")
    )


def capped_group_stats(
    rows: DataFrame,
    max_group_size: int,
    group_cols: Sequence[str] = ("band", "bucket"),
) -> DataFrame:
    """One row per OVER-CAP group: (group cols, group_size) — the
    observability side of ``cap_bucket_groups`` (what was/would be
    dropped). Aggregate it for a metrics row, or eyeball the histogram
    to pick the cap."""
    return (
        rows.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > int(max_group_size))
    )


def cap_probed_index(
    index_rows: DataFrame,
    probe_rows: DataFrame,
    max_group_size: int,
    group_cols: Sequence[str] = ("band", "bucket"),
    broadcast_probe: bool = True,
) -> DataFrame:
    """Degenerate-group cap for an INDEX being probed: semijoin the
    index to the probe's DISTINCT group keys, then drop groups above
    ``max_group_size``. The semijoin keeps whole groups, so group sizes
    (hence the cap decision) are unchanged by it; the cap's count window
    shuffles only O(probed index rows), never the whole index. The one
    place the cap-after-semijoin soundness argument lives — used by the
    MinHash probe paths here and the RP-LSH paths in ``similarity``.

    ``broadcast_probe`` mirrors the probe functions' flag: the distinct
    key set is broadcast by default (tiny for micro-batches), but a
    caller that disabled broadcasting because the batch is too large to
    fit a broadcast MUST disable it here too — the distinct keys scale
    with the batch, so this semijoin falls back to a shuffle join (AQE-
    splittable) in exactly the same regime."""
    keys = list(group_cols)
    probed = probe_rows.select(*keys).distinct()
    if broadcast_probe:
        probed = F.broadcast(probed)
    return cap_bucket_groups(
        index_rows.join(probed, keys, "leftsemi"), max_group_size, group_cols
    )


def bucket_size_histogram(
    rows: DataFrame,
    group_cols: Sequence[str] = ("band", "bucket"),
) -> DataFrame:
    """Power-of-two histogram of group sizes:
    ``(log2_size, n_groups, max_size)`` — the skew-observability feed
    for picking ``max_bucket_size`` (and for spotting boilerplate
    families growing at 100×). Output is BOUNDED (≤64 rows — one per
    power of two), so collecting it for a metrics/lineage row is safe at
    any corpus size; the cost is one partial-agg pass over ``rows``.
    """
    sizes = rows.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        sizes.groupBy(
            F.floor(F.log2("_n")).cast("int").alias("log2_size")
        )
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.max("_n").alias("max_size"),
        )
        .orderBy("log2_size")
    )


def exact_duplicate_map(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    digests: DataFrame | None = None,
) -> DataFrame:
    """(id_col, _rep): each document mapped to the min-id representative
    of its EXACT-duplicate class (shingle-set equality, i.e. Jaccard
    exactly 1.0 — the injective ``shingle_set_hash`` digest).

    This is the pre-collapse step that keeps LSH linear on boilerplate:
    identical documents share every band bucket, so feeding a k-clone
    cluster into the banded self-join emits O(k²) candidate pairs; after
    collapsing, the cluster enters LSH as ONE representative and its
    membership is recovered as k-1 star pairs (rep, member) — O(k).
    Implemented as a min over a digest-partitioned window: one exchange
    on the digest (whole rows shuffled — not map-side combinable, but
    the rows are slim (id, digest) pairs and it beats the agg+join-back
    shape that would digest both join sides; see the body comment).
    """
    from pyspark.sql.window import Window

    # min over a digest-partitioned window: ONE digest pass and ONE
    # exchange (an agg + join-back shape computes the digest on both
    # join sides — measured 2.8x this on the sf0.1 corpus). A window
    # partition is one duplicate class; even a 10^6-clone boilerplate
    # family is only ~40 MB of slim (id, digest) rows in that task.
    # ``digests``: a precomputed (id_col, _dg) frame — callers that
    # ALSO verify at threshold 1.0 compute the digest once and share it
    # (the digest pass is the dominant cost; see ``_verified_pairs``).
    # Contract: it must cover EVERY id of ``df`` — ids it misses drop
    # out of the map (and out of downstream candidates) silently.
    d = digests if digests is not None else df.select(
        F.col(id_col), shingle_set_hash(text_col, shingle_k).alias("_dg")
    )
    w = Window.partitionBy("_dg")
    return d.select(
        F.col(id_col), F.min(id_col).over(w).alias("_rep")
    )


def _collapse_exact(
    df: DataFrame, *, id_col: str, text_col: str, shingle_k: int,
    digests: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(mapped, reps_df, star_pairs) for the exact-dup pre-collapse:
    ``mapped`` = (id, _rep); ``reps_df`` = the representative rows of
    ``df``; ``star_pairs`` = (id_a=rep < id_b=member) pairs, each a
    GUARANTEED Jaccard-1.0 duplicate (no verification needed)."""
    # localCheckpoint: `mapped` (two slim columns) feeds THREE branches
    # (reps semijoin, star pairs, and — through reps_df — the whole
    # signature pipeline). Un-materialized, the digest aggregate +
    # join subtree re-inlines into every branch and the collapse costs
    # ~4x the pipeline it guards (measured on the streaming drive:
    # 22.6s -> 91s at sf0.1); checkpointed, the digest pass runs once.
    mapped = exact_duplicate_map(
        df, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
        digests=digests,
    ).localCheckpoint()
    reps_df = df.join(
        mapped.filter(F.col(id_col) == F.col("_rep")).select(id_col),
        id_col, "leftsemi",
    )
    star = mapped.filter(F.col(id_col) != F.col("_rep")).select(
        F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    return mapped, reps_df, star


def minhash_lsh_candidates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    collapse_exact: bool = False,
    max_bucket_size: int | None = None,
    digests: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded MinHash-LSH.

    rows/band = num_hashes/bands sets the similarity threshold knee at
    roughly (1/bands)^(band_size/num_hashes). Pipeline:
    shingle → signature → explode to (band, hash(band-slice)) → self-join
    on the bucket key. The explode multiplies rows by ``bands`` but each
    row is just (id, band, bucket) — tiny — and the join is a hash join
    on a high-cardinality key, AQE-skew-splittable at scale.

    Scale guards (both default OFF so the default output is the full
    candidate-pair set):

    - ``collapse_exact=True`` pre-collapses exact-duplicate documents
      (see ``exact_duplicate_map``) so a k-clone boilerplate cluster
      emits k-1 star pairs instead of O(k²) self-join pairs. The output
      is then a SUFFICIENT candidate set, not the full one: it induces
      the same verified duplicate clusters (identical docs have
      identical signatures, so cross-class candidacy and verification
      are invariant under swapping a member for its representative),
      which is what the dedup pipelines need.
    - ``max_bucket_size`` drops (band, bucket) groups larger than the
      cap before the self-join (``cap_bucket_groups``); use
      ``capped_group_stats`` on ``minhash_index(df, ...)`` to log what a
      cap drops.

    ``digests`` (optional, only read when ``collapse_exact=True``): a
    precomputed (id_col, _dg) shingle-digest frame shared with a
    verification pass so the text is digested once. Contract: it MUST
    cover every ``id_col`` of ``df`` (same contract as
    ``verify_exact_duplicates``) — ids missing from ``digests`` never
    reach the collapse map and would be silently dropped from the
    candidate output, not erred on.
    """
    star = None
    src = df
    if collapse_exact:
        _, src, star = _collapse_exact(
            df, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
            digests=digests,
        )
    buckets = _band_buckets(
        src, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
        num_hashes=num_hashes, bands=bands, seed=seed,
    )
    if max_bucket_size is not None:
        buckets = cap_bucket_groups(buckets, max_bucket_size)
    left = buckets.select(F.col("_id").alias("id_a"), "band", "bucket")
    right = buckets.select(F.col("_id").alias("id_b"), "band", "bucket")
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if star is not None:
        # disjoint by construction: star pairs have a non-representative
        # id_b, self-join pairs have two representatives
        pairs = pairs.unionByName(star)
    return pairs


def shingle_set_hash(text_col: str, k: int) -> Column:
    """Injective 256-bit digest of a document's k-shingle SET: shingles
    sorted, length-prefixed (so no separator collision is possible),
    concatenated, sha2-256. Two documents have Jaccard exactly 1.0 iff
    their shingle sets are equal iff these digests are equal (up to
    2^-256 — the same standard ``dedup_exact`` rests on)."""
    canon = F.transform(
        F.array_sort(char_shingles(text_col, k)),
        lambda x: F.concat(F.length(x).cast("string"), F.lit(":"), x),
    )
    return F.sha2(F.concat_ws("\x00", canon), 256)


def _doc_digests(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int,
    checkpoint: bool = True,
) -> DataFrame:
    """One ``(id, _dg)`` shingle-set digest row per document — THE
    digest recipe every exact-dup collapse / threshold-1.0 verification
    site shares (a one-site change here keeps the collapse, the
    verification, and the candidate-corpus digests comparing the same
    quantity; they are equality-joined across sites, so a drift would
    misclassify every cross pair).

    Spread first: the interpreted HOF digest runs in its input's stage,
    and a compact source scan would cap its parallelism.
    ``checkpoint`` (default) localCheckpoints the slim O(docs) frame so
    multiple consuming branches don't re-inline the digest subtree
    (measured 4x the whole pipeline un-materialized); pass False for a
    single-consumer derived frame."""
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    out = spread_for_explode(df.select(id_col, text_col), probe=False).select(
        F.col(id_col), shingle_set_hash(text_col, k).alias("_dg")
    )
    return out.localCheckpoint() if checkpoint else out


def verify_exact_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    digests: DataFrame | None = None,
) -> DataFrame:
    """Filter candidate (id_a, id_b) pairs down to EXACT duplicates
    (shingle-set equality, i.e. Jaccard 1.0) by joining one canonical
    set hash per document — O(docs) hashing + an equi-test per pair,
    instead of a full array-intersection per pair (benched ~6x cheaper
    on the verify stage: per-pair set ops touch every shingle of both
    sides again; the digest touches each document once).

    ``digests``: a precomputed (id_col, _dg) frame covering every id in
    ``pairs`` — lets a caller that already digested the documents (the
    exact-dup collapse) skip this pass entirely; ``df`` is not touched."""
    h = (
        digests.withColumnRenamed("_dg", "_h")
        if digests is not None
        else df.select(F.col(id_col), shingle_set_hash(text_col, k).alias("_h"))
    )
    a = h.select(F.col(id_col).alias("id_a"), F.col("_h").alias("_ha"))
    b = h.select(F.col(id_col).alias("id_b"), F.col("_h").alias("_hb"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("_ha") == F.col("_hb"))
        # pass through any extra pair columns (e.g. a cross/within mark)
        .select(*pairs.columns)
    )


def _verified_pairs(
    df: DataFrame, *, id_col: str, text_col: str, threshold: float, **lsh_kwargs
) -> DataFrame:
    """LSH candidate pairs filtered by exact Jaccard ≥ threshold — the
    shared front half of both near-dup removal pipelines. Verification
    shingles reuse the LSH ``shingle_k`` so candidate generation and
    verification measure the same similarity.

    ``threshold >= 1.0`` is the exact-duplicate special case: Jaccard
    1.0 means shingle-SET equality, which a canonical per-document set
    hash decides without per-pair array intersections (see
    ``verify_exact_duplicates``) — same result, one pass over the
    documents instead of one over every candidate pair's arrays."""
    k = lsh_kwargs.get("shingle_k", 5)
    digests = None
    if threshold >= 1.0 or lsh_kwargs.get("collapse_exact"):
        # ONE digest pass serves both the exact-dup collapse and the
        # threshold-1.0 verification (checkpointed inside the helper so
        # neither branch re-runs it)
        digests = _doc_digests(df, id_col=id_col, text_col=text_col, k=k)
    cands = minhash_lsh_candidates(
        df, id_col=id_col, text_col=text_col, digests=digests, **lsh_kwargs
    )
    if threshold >= 1.0:
        return verify_exact_duplicates(
            df, cands, id_col=id_col, text_col=text_col, k=k, digests=digests
        ).withColumn("jaccard", F.lit(1.0))
    return ngram_jaccard_pairs(
        df, cands, id_col=id_col, text_col=text_col, k=k
    ).filter(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Full near-dup removal: LSH candidates → exact-Jaccard verify →
    connected grouping via min-id propagation → keep group representative.

    Grouping uses a single-pass "union by min id" (greedy star joins),
    adequate for dedup where clusters are small; ``minhash_dedup_cc``
    (iterative connected components) is the exact-transitive upgrade.
    """
    verified = _verified_pairs(
        df, id_col=id_col, text_col=text_col, threshold=threshold, **lsh_kwargs
    )
    return keep_min_representative(df, verified, id_col)


def keep_min_representative(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Drop every row that has a smaller near-duplicate partner in
    ``pairs`` (id_a < id_b) — single-round star contraction shared by the
    text and embedding dedup pipelines. Under-merges chained clusters;
    ``connected_components`` is the exact-transitive alternative."""
    rep = (
        pairs.select(F.col("id_b").alias(id_col), F.col("id_a").alias("_rep"))
        .groupBy(id_col)
        .agg(F.min("_rep").alias("_rep"))
    )
    drop = rep.filter(F.col("_rep") < F.col(id_col)).select(id_col)
    return df.join(drop, on=id_col, how="left_anti")


def simhash(c, bits: int = 64, seed: int = 42) -> Column:
    """SimHash of a token array: sign of per-bit weighted votes.

    Native formulation: for each bit b, count tokens whose
    xxhash64(token, seed) has bit b set; bit is 1 if count > n/2.
    """
    col = c if isinstance(c, Column) else F.col(c)
    hashes = F.transform(col, lambda t: F.xxhash64(t, F.lit(seed)))
    n = F.size(hashes)
    # static unroll over bits (shiftright needs a literal bit count);
    # the predicate is built by a closure factory — a default-arg lambda
    # would be seen by F.filter as the two-arg (element, index) form
    def bit_set(b: int):
        return lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1

    acc = F.lit(0).cast("long")
    for b in range(bits):
        set_count = F.size(F.filter(hashes, bit_set(b)))
        # shiftleft (not a python literal): bit 63 wraps to the sign bit
        acc = acc + F.when(
            set_count * 2 > n, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return acc


def simhash_column(text_col: str = "text", bits: int = 64, seed: int = 42) -> Column:
    """Column-expression SimHash for ad-hoc use. For corpus-scale
    signatures use ``simhash_signatures`` below — the explode+aggregate
    formulation (benched 7× faster: the 64 per-bit array filters here run
    interpreted, the 64 conditional sums there are one whole-stage-codegen
    HashAggregate)."""
    return simhash(tokens(text_col), bits, seed)


def simhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """Corpus ``bits``-bit SimHash via explode + per-bit conditional sums.

    (id, token) rows are exploded once, each token hashed once, then ONE
    hash-aggregate computes all bit-vote counts as agg columns —
    map-side partially aggregated, fully codegen (same pattern as
    ``minhash_signatures``). Documents with zero tokens get signature 0
    (restored by a left join — explode drops them). Output:
    (id_col, simhash long). Bit-identical to ``simhash_column`` at the
    defaults.

    ``token_hash`` (Column→Column) swaps the per-token hash: default is
    seeded xxhash64 (production); ``operators.text.md5_hash48`` with
    ``bits=48`` is the portable variant whose signatures an ANSI-SQL
    oracle reproduces exactly — the aggregation plan is identical, only
    the leaf hash expression differs.
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in 1..64 (got {bits})")
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    hf = token_hash or (lambda t: F.xxhash64(t, F.lit(seed)))
    ex = spread_for_explode(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_t")
    ).select(id_col, hf(F.col("_t")).alias("_h"))
    aggs = [
        F.sum(F.shiftright("_h", b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(bits)
    ] + [F.count("*").alias("_n")]
    sums = ex.groupBy(id_col).agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.when(
            F.col(f"_b{b}") * 2 > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
    sig = sums.select(F.col(id_col), acc.alias("simhash"))
    return (
        df.select(id_col)
        .join(sig, id_col, "left")
        .select(id_col, F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    seed: int = 42,
    bits: int = 64,
    token_hash=None,
    group_blocks: int | None = None,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of ``bits``-bit
    SimHash.

    Pigeonhole over block COMBINATIONS (the multi-index scheme of
    HmSearch / Manku et al.'s simhash dedup): split the bits into
    ``blocks`` (> max_hamming) blocks; a pair within distance k differs
    in at most k blocks, so it AGREES on at least ``blocks - k`` — hence
    on at least one ``g``-subset of blocks for any g ≤ blocks - k. Each
    signature emits one packed key per g-subset (C(blocks, g) rows) and
    candidates come from ONE equi-join on (combo, key), then exact
    Hamming verify. Because the verify is exact, the output is EXACTLY
    the set of pairs within the distance bound (an ANSI-SQL oracle can
    replicate it with a brute-force bit_count(xor) compare when
    ``token_hash`` is the portable md5 variant).

    Scale shape (what g buys): with single blocks (g=1) the key space
    per block is only 2^(bits/blocks) values — 64 for the 48-bit/8-block
    configuration — so candidates grow as n²/2^width per block and the
    join degenerates quadratically long before the output does (measured
    312 s at a 50k-doc corpus, 53× its 5k cost). A g-block key has
    2^(g·width) values: g=3 over 6-bit blocks gives a 262k-value key
    space, collapsing the random-collision term by ~4000× for 7× more
    (tiny) exploded rows. ``group_blocks=None`` auto-picks the largest
    g ≤ blocks - max_hamming with C(blocks, g) ≤ 64 combos.

    Identical signatures are COLLAPSED before the join (the
    ``collapse_exact`` analog): every member of an equal-signature class
    is a Hamming-0 pair of every other, so the class enters the
    candidate join as one representative and its pairs are emitted
    directly — a k-clone boilerplate family costs O(k) join rows, never
    O(k²) (its C(k,2) OUTPUT pairs are inherent to the result set).

    The pigeonhole guarantee REQUIRES ``blocks > max_hamming`` (k
    differing bits can otherwise hit every block) and ``bits % blocks ==
    0`` (else trailing bits belong to no block) — both are validated
    rather than silently losing recall.
    """
    from itertools import combinations
    from math import comb

    if blocks <= max_hamming:
        raise ValueError(
            f"blocks ({blocks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole guarantee"
        )
    if bits % blocks != 0:
        raise ValueError(f"bits ({bits}) must be divisible by blocks ({blocks})")
    max_g = blocks - max_hamming
    if group_blocks is None:
        g = 1
        for cand in range(1, max_g + 1):
            if comb(blocks, cand) <= 64:
                g = cand
    else:
        if not 1 <= group_blocks <= max_g:
            raise ValueError(
                f"group_blocks ({group_blocks}) must be in 1..{max_g} "
                f"(blocks - max_hamming) for the pigeonhole guarantee"
            )
        g = group_blocks
    width = bits // blocks
    # (id, signature) — checkpointed: it feeds the combo explode, the
    # equal-signature self-join and both expansion joins below, and the
    # signature aggregation subtree must not re-inline into each
    sh = simhash_signatures(
        df, id_col=id_col, text_col=text_col, seed=seed,
        bits=bits, token_hash=token_hash,
    ).select(
        F.col(id_col).alias("_id"), F.col("simhash").alias("_sh")
    ).localCheckpoint()

    # ---- equal-signature classes: emit their pairs directly ----------
    within = (
        sh.select(F.col("_id").alias("id_a"), "_sh")
        .join(sh.select(F.col("_id").alias("id_b"), "_sh"), "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.lit(0).cast("integer").alias("hamming"))
    )

    # ---- candidate join over DISTINCT signatures only -----------------
    sigs = sh.select("_sh").distinct()

    def block_val(b: int):
        return (
            F.shiftright(F.col("_sh"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .cast("long")
        )

    combo_keys = []
    for ci, combo in enumerate(combinations(range(blocks), g)):
        key = F.lit(0).cast("long")
        for i, b in enumerate(combo):
            key = key + F.shiftleft(block_val(b), i * width)
        combo_keys.append(
            F.struct(F.lit(ci).alias("combo"), key.alias("key"))
        )
    blocked = sigs.select(
        "_sh", F.explode(F.array(*combo_keys)).alias("_ck")
    ).select("_sh", "_ck.combo", "_ck.key")
    sig_pairs = (
        blocked.select(F.col("_sh").alias("_sha"), "combo", "key")
        .join(blocked.select(F.col("_sh").alias("_shb"), "combo", "key"),
              ["combo", "key"])
        .filter(F.col("_sha") < F.col("_shb"))
        .select("_sha", "_shb",
                hamming64(F.col("_sha"), F.col("_shb")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

    # ---- expand signature pairs to document pairs ----------------------
    # every member pair across two near signatures is a near pair (a
    # document's Hamming distance IS its signature's); id order is
    # restored with least/greatest since signature order ≠ id order
    cross = (
        sig_pairs
        .join(sh.select(F.col("_id").alias("_ida"),
                        F.col("_sh").alias("_sha")), "_sha")
        .join(sh.select(F.col("_id").alias("_idb"),
                        F.col("_sh").alias("_shb")), "_shb")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    return cross.unionByName(within)


def connected_components(
    pairs: DataFrame,
    *,
    max_iter: int = 25,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Exact connected components over an undirected pair list —
    (node, component) where component = min node id of the cluster
    under the id type's natural ordering (numeric ids, string UUIDs,
    etc. — ids are never cast).

    Hash-Min label propagation (Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds", ICDE'13): every
    node starts labeled with itself; each round every node takes the min
    label in its closed neighborhood. Converges in O(graph diameter)
    rounds — near-dup clusters are shallow (a chain A~B~C has diameter
    2). If ``max_iter`` rounds pass without convergence the labels are
    NOT component minima: ``on_nonconverged="raise"`` (default) raises,
    ``"warn"`` emits a warning and returns the partial labels.

    Each round's labels are eagerly ``localCheckpoint``-ed: this
    materializes the round AND truncates the plan lineage, so round N
    never re-executes rounds 1..N-1 (checkpoint blocks are released by
    Spark's ContextCleaner when the caller drops the reference; on a
    cluster where executor loss matters, swap in reliable
    ``checkpoint()`` with a checkpoint dir). Input columns: ``id_a``,
    ``id_b``.

    This is the scale-out upgrade over ``minhash_dedup``'s single-round
    star contraction, which under-merges CHAINED duplicate clusters.
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # symmetric closure once; reused every round
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        # min neighbor label per node
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("component").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # materialize + truncate lineage
        )
        changed = not (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if not changed:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); labels are not final"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return labels


def minhash_dedup_cc(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup removal with EXACT transitive clustering: LSH candidates
    → exact-Jaccard verify → iterative connected components → keep each
    cluster's min-id representative. Unlike ``minhash_dedup`` this
    removes every member of a chained cluster (A~B~C), not just direct
    neighbors of a representative."""
    verified = _verified_pairs(
        df, id_col=id_col, text_col=text_col, threshold=threshold, **lsh_kwargs
    )
    comps = connected_components(verified.select("id_a", "id_b"))
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


# --------------------------------------------------------- incremental index
#
# At 100 TB the corpus is not re-hashed per ingest: the LSH bucket rows
# (id, band, bucket) are PERSISTED once (a lake table bucketed on
# (band, bucket) keeps the probe join shuffle-free on the index side)
# and each new batch is signed in O(batch), probed against the index,
# and verified only against the candidate corpus documents. Mirrors the
# reference's incremental snapshot jobs (process only the new window,
# never the accumulated table) applied to near-dup removal.


def minhash_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Persistable MinHash-LSH index rows ``(id_col, band, bucket)`` for
    a corpus — ``bands`` tiny rows per document. Probing a new batch
    against this index (``minhash_index_probe``) is equivalent to the
    cross-corpus half of ``minhash_lsh_candidates`` over the union, but
    costs O(new batch) signatures instead of O(corpus + batch)."""
    return _band_buckets(
        df, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
        num_hashes=num_hashes, bands=bands, seed=seed,
    ).withColumnRenamed("_id", id_col)


def minhash_index_probe(
    new_df: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Candidate (new_id, corpus_id) pairs between a new batch and an
    indexed corpus. Parameters MUST match the index build. Only the new
    batch is signed; the corpus contributes nothing but its index rows.

    Scale shape: with ``broadcast_probe`` (default) the batch's bucket
    rows — O(batch × bands) tiny triples — are broadcast, so the
    corpus-sized index side never shuffles: the probe is a map-side
    BroadcastHashJoin over the index scan, per micro-batch cost
    O(index-scan + candidates) with ZERO index Exchange. Disable only
    for giant batches (then the equi-join shuffles both sides and is
    AQE-skew-splittable). ``max_bucket_size`` drops index (band, bucket)
    groups above the cap — the degenerate-boilerplate guard (see
    ``cap_bucket_groups``). The cap is applied AFTER a broadcast
    semijoin to the batch's probed buckets, so its count window
    shuffles only O(probed index rows), never the whole index; group
    sizes are unchanged by the semijoin (it keeps whole groups)."""
    nb = _band_buckets(
        new_df, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
        num_hashes=num_hashes, bands=bands, seed=seed,
    ).select(F.col("_id").alias("new_id"), "band", "bucket")
    ix = index.select(F.col(id_col).alias("corpus_id"), "band", "bucket")
    if max_bucket_size is not None:
        # the cap makes nb feed TWO plan branches (the probed-bucket
        # semijoin and the probe join itself) whose BroadcastExchanges
        # differ, so ReuseExchange cannot collapse them — cut lineage so
        # the batch is signed ONCE per probe, not twice
        nb = nb.localCheckpoint()
        ix = cap_probed_index(ix, nb, max_bucket_size,
                              broadcast_probe=broadcast_probe)
    if broadcast_probe:
        nb = F.broadcast(nb)
    return (
        nb.join(ix, ["band", "bucket"])
        # self-pairs excluded, matching rp_index_probe: a redelivered
        # streaming batch legally finds its own ids in the index
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )


def minhash_dedup_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    *,
    index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 1.0,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    collapse_exact: bool = False,
    max_bucket_size: int | None = None,
    broadcast_probe: bool = True,
    index_loader=None,
    corpus_loader=None,
    observe_banding=None,
    observe_digests=None,
) -> DataFrame:
    """Rows of ``new_df`` that survive near-dup removal against an
    ALREADY-DEDUPED corpus and within the batch itself.

    A new document is dropped if it verifies (exact k-shingle Jaccard ≥
    ``threshold``) against any LSH-candidate corpus document, or against
    a surviving smaller-id document of its own batch (single-round star
    contraction, as ``minhash_dedup``). Corpus documents always win —
    the corpus is the already-committed training set.

    ``corpus_df`` text is touched only for candidate ids (semijoin), so
    per-increment cost is O(batch + candidates); pass ``index`` (from
    ``minhash_index``, typically read back from a lake table) to skip
    re-banding the corpus too.

    ids must be unique across corpus ∪ batch (true of any real corpus;
    asserted nowhere — a collision silently cross-matches).

    Scale guards:

    - ``collapse_exact=True``: the batch is pre-collapsed to one
      representative per exact-duplicate class (min id) BEFORE signing,
      so a k-clone boilerplate batch enters every join as one row
      instead of k — O(k) not O(k²). The survivor set is invariant: a
      non-representative member duplicates its (smaller-id) rep at
      Jaccard 1.0 ≥ any threshold, so it could never survive anyway.
    - ``max_bucket_size``: degenerate (band, bucket) groups above the
      cap are dropped from the index probe (after a broadcast semijoin
      to probed buckets — the cap never shuffles the whole index) and
      from the within-batch self-join. Trades recall on exactly the
      huge near-dup families; ``capped_group_stats`` reports them.
    - ``broadcast_probe`` (default on): the batch's bucket rows are
      broadcast so the corpus-sized index NEVER shuffles — the probe is
      a map-side BroadcastHashJoin per micro-batch. Disable only for
      giant batches.
    - ``index_loader`` (overrides ``index``): callable receiving the
      batch's DISTINCT (band, bucket) probe rows as a DataFrame and
      returning the index rows to probe — the storage-pruning hook: a
      lake index table bucketed on the LSH ``bucket`` column can serve
      ONLY the storage buckets the probe can touch (see
      ``streaming/dedup_stream.py``), never scanning the whole index.
      Returning a superset of the matching rows is always sound: the
      (band, bucket) equi-join discards the rest.
    - ``corpus_loader``: callable receiving the DISTINCT candidate
      corpus-id frame (one ``id_col`` column) and returning the corpus
      rows to verify against — the storage-pruning hook for the verify
      modes that must read candidate TEXT (``threshold < 1.0``, or a
      digest-less index at 1.0): a lake corpus table bucketed on the id
      can serve only the storage buckets holding candidates instead of
      a full-table LWW read per call (see ``streaming/dedup_stream.py``).
      A superset is always sound — the candidate-id semijoin discards
      the rest. On the index-digest path it is invoked only with the
      MATCHED corpus ids (usually none) to confirm digest matches
      against current text — see the confirm step below. When set for
      a text-verify mode, the candidate pairs are localCheckpointed so
      a loader that collects the ids on the driver doesn't re-run the
      probe join.
    - ``observe_banding``: callable receiving the batch's checkpointed
      banding rows ``(_id, band, bucket)`` — post-collapse, PRE-cap, the
      exact frame entering the probe/self joins. The observability hook:
      ``bucket_size_histogram`` over it is the cap-tuning signal, taken
      where the O(k²) hazard actually lives (a histogram over the
      post-dedup survivors would measure the skew AFTER dedup removed
      it). Near-free — the rows are already materialized.
    - Index digest columns: when ``threshold >= 1.0`` and the supplied
      index (or loader result) carries ``(_dg, _batch)`` columns (see
      streaming ``create_dedup_tables(store_digests=True)``),
      verification digests come straight off the index rows
      (``max_by(_dg, _batch)`` per candidate id) and only the MATCHED
      corpus ids — usually none — are then point-read to confirm the
      digest against the corpus's CURRENT text (a pruned index load
      can surface a stale ghost digest for a re-ingested document):
      per-batch cost stays O(batch + probed-index rows + matches) at
      any corpus size.
    - ``collapse_exact`` at ``threshold >= 1.0`` also skips the
      within-batch self-join entirely: post-collapse digests are
      pairwise distinct, so no within pair can verify — dead work.
    - ``observe_digests``: callable receiving the batch's checkpointed
      RAW-batch ``(id, _dg)`` shingle-set digest frame (only fires when
      one is computed, i.e. ``collapse_exact`` or ``threshold >= 1.0``).
      Lets callers derive exact-duplicate-class metrics (and the batch
      row count) from the already-materialized frame instead of
      re-digesting the batch text."""
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    lsh = dict(shingle_k=shingle_k, num_hashes=num_hashes,
               bands=bands, seed=seed)
    # ONE spread + digest pass over the batch serves BOTH the exact-dup
    # collapse and the threshold-1.0 verification below (checkpointed in
    # the helper: un-materialized, the digest subtree re-inlines into
    # the banding, verify and survivor branches — measured 4x the whole
    # pipeline on the streaming drive at sf0.1).
    batch_digests = None
    if collapse_exact or threshold >= 1.0:
        batch_digests = _doc_digests(
            new_df, id_col=id_col, text_col=text_col, k=shingle_k
        )
        if observe_digests is not None:
            observe_digests(batch_digests)
    if collapse_exact:
        # reps ids re-checkpointed (slim): each downstream reference to
        # the collapsed new_df then costs one semijoin against
        # materialized ids, not a window re-run over the digests
        reps = exact_duplicate_map(
            new_df, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
            digests=batch_digests,
        ).filter(F.col(id_col) == F.col("_rep")).select(id_col).localCheckpoint()
        new_df = new_df.join(reps, on=id_col, how="leftsemi")

    # ONE signature/banding pass over the batch serves BOTH the index
    # probe and the within-batch self-join (banding is deterministic
    # per document, so candidate pairs among any subset of the batch
    # are exactly the full-batch pairs filtered to that subset).
    # localCheckpoint (as in connected_components) materializes the
    # O(batch x bands) bucket rows and TRUNCATES LINEAGE: without it,
    # every downstream reference re-inlines the banding subtree and the
    # final plan blows up combinatorially (measured 21k formatted-plan
    # lines and optimizer-dominated wall time at sf0.1).
    nb = _band_buckets(
        new_df, id_col=id_col, text_col=text_col, **lsh
    ).localCheckpoint()
    if observe_banding is not None:
        observe_banding(nb)
    if index_loader is not None:
        index = index_loader(nb.select("band", "bucket").distinct())
    elif index is None:
        index = minhash_index(corpus_df, id_col=id_col, text_col=text_col, **lsh)
    # an index created with digest columns (see streaming
    # create_dedup_tables(store_digests=True)) lets threshold-1.0
    # verification run off index rows alone: candidate corpus TEXT is
    # never read, so the per-batch probe cost stays O(batch +
    # probed-index rows) even when the corpus is 100 TB. max_by on
    # _batch picks the latest digest per id — ghost rows of re-ingested
    # documents carry stale digests and must lose.
    ix_digest_rows = None
    if threshold >= 1.0 and index is not None and \
            {"_dg", "_batch"}.issubset(set(index.columns)):
        ix_digest_rows = index.select(
            F.col(id_col).alias("corpus_id"), "_dg", "_batch"
        )
    ix = index.select(F.col(id_col).alias("corpus_id"), "band", "bucket")
    nb_probe = nb.select(F.col("_id").alias("new_id"), "band", "bucket")
    if max_bucket_size is not None:
        ix = cap_probed_index(ix, nb, max_bucket_size,
                              broadcast_probe=broadcast_probe)
    if broadcast_probe:
        nb_probe = F.broadcast(nb_probe)
    cross = (
        nb_probe
        .join(ix, ["band", "bucket"])
        # a doc must never match ITS OWN index row: under the unique-id
        # contract self-pairs cannot occur, but streaming redelivery
        # (index committed, docs commit lost, batch replayed) legally
        # presents a batch whose ids are already indexed — without this
        # filter every redelivered doc would self-verify and be dropped
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id").distinct()
    )
    # the digest path reads corpus text only for MATCHED ids (the
    # confirm step below, fed from the checkpointed `hit`); this flag
    # gates the CANDIDATE-text read of the verify modes
    needs_corpus_text = threshold < 1.0 or ix_digest_rows is None
    if corpus_loader is not None and needs_corpus_text:
        # the loader typically collects the candidate ids on the driver
        # (storage-bucket pruning) — cut lineage so that collect job
        # doesn't re-run the probe join the verify below runs again
        cross = cross.localCheckpoint()
    # with collapse_exact at threshold >= 1.0 the within-batch self-join
    # is provably dead work: the collapse left pairwise-DISTINCT shingle
    # digests, and a threshold-1.0 verification passes only on digest
    # equality — no within pair can ever verify. Skip building it.
    skip_within = collapse_exact and threshold >= 1.0
    if skip_within:
        all_pairs = cross.select(
            F.lit(True).alias("_cross"),
            F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b"),
        )
    else:
        nb_within = nb
        if max_bucket_size is not None:
            nb_within = cap_bucket_groups(nb_within, max_bucket_size)
        within_cands = (
            nb_within.select(F.col("_id").alias("id_a"), "band", "bucket")
            .join(nb_within.select(F.col("_id").alias("id_b"), "band", "bucket"),
                  ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
        )
        # the banding aggregate appears in several plan branches — Spark's
        # ReuseExchange collapses the identical subtrees at execution, the
        # same way minhash_lsh_candidates' self-join shares one signature
        # pass; a (mark, id_a, id_b) union keeps cross and within hits
        # separable after ONE shared verification
        all_pairs = (
            cross.select(
                F.lit(True).alias("_cross"),
                F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b"),
            )
            .unionByName(
                within_cands.select(F.lit(False).alias("_cross"), "id_a", "id_b")
            )
        )

    # corpus text for candidate ids only; shingle verification runs
    # ONCE over (batch ∪ candidate corpus docs) for both pair sets.
    # The verify digest (per-doc shingle-set sort+sha) is interpreted
    # HOF work running in ITS input's stage — spread the compact doc
    # rows first, same reasoning as the signature explodes
    # (probe=False: the inputs are derived frames, don't pre-execute)
    cand_ids = cross.select(F.col("corpus_id").alias(id_col)).distinct()
    corpus_base = corpus_df
    if corpus_loader is not None and needs_corpus_text:
        corpus_base = corpus_loader(cand_ids)
    if threshold >= 1.0:
        if ix_digest_rows is not None:
            # digests straight off the index rows: one narrow
            # partial-agg over the candidate ids' index rows.
            # max_by(_batch) picks the latest LOADED row — a pruned
            # load can still miss a re-ingested doc's newest rows, so
            # matches are confirmed against current corpus text below.
            cand_digests = (
                ix_digest_rows
                .withColumnRenamed("corpus_id", id_col)
                .join(cand_ids, on=id_col, how="leftsemi")
                .groupBy(id_col)
                .agg(F.max_by("_dg", "_batch").alias("_dg"))
            )
        else:
            # the batch side was already digested above (checkpointed) —
            # only the candidate corpus docs need hashing here, so the
            # batch text is never re-touched for verification
            # (checkpoint=False: single-consumer derived frame)
            cand_corpus = corpus_base.join(cand_ids, on=id_col, how="leftsemi")
            cand_digests = _doc_digests(
                cand_corpus, id_col=id_col, text_col=text_col, k=shingle_k,
                checkpoint=False,
            )
        hit = verify_exact_duplicates(
            new_df, all_pairs, id_col=id_col, text_col=text_col, k=shingle_k,
            digests=batch_digests.unionByName(cand_digests),
        )
    else:
        cand_corpus = corpus_base.join(cand_ids, on=id_col, how="leftsemi")
        both = spread_for_explode(
            new_df.select(id_col, text_col).unionByName(
                cand_corpus.select(id_col, text_col)
            ),
            probe=False,
        )
        hit = ngram_jaccard_pairs(
            both, all_pairs, id_col=id_col, text_col=text_col, k=shingle_k
        ).filter(F.col("jaccard") >= threshold).drop("jaccard")
    # second lineage cut: `hit` (candidate pairs, tiny) feeds three
    # branches below — without the checkpoint each would re-run the
    # whole verify and re-inline its plan
    hit = hit.localCheckpoint()

    cross_hits = hit.filter(F.col("_cross"))
    if ix_digest_rows is not None and (
        corpus_loader is not None or corpus_df is not None
    ):
        # CONFIRM index-digest matches against the corpus's CURRENT
        # text before dropping anything: a pruned index load sees only
        # the storage buckets of the PROBED bucket values, so a
        # re-ingested document's latest rows (new text → different
        # buckets) can be invisible there and max_by(_dg, _batch) then
        # yields a stale ghost digest — without this check a batch doc
        # equal to the OLD text would be silently dropped although the
        # corpus no longer contains it. Cost: a point read of the
        # MATCHED corpus ids only (zero when nothing matched; the ids
        # derive from the checkpointed `hit`, so a driver-collecting
        # loader does not re-run the verify). The inner join also
        # drops matches whose corpus id no longer exists (deleted doc
        # ghost rows) — the same answer the corpus-text path computes.
        matched_ids = cross_hits.select(
            F.col("id_b").alias(id_col)
        ).distinct()
        base = (
            corpus_loader(matched_ids)
            if corpus_loader is not None else corpus_df
        )
        matched_corpus = base.join(matched_ids, on=id_col, how="leftsemi")
        has_dg = "_dg" in matched_corpus.columns
        has_text = text_col in matched_corpus.columns
        if has_dg and not has_text:
            # the corpus stores each row's own shingle-set digest (see
            # streaming create_dedup_tables(store_digests=True)): the
            # confirm reads id + _dg only — the text column never
            # leaves parquet and nothing is re-shingled. The stored
            # digest must use this probe's shingle_k (same
            # table-lifetime contract as the LSH parameters). A null
            # stored digest fails the equality below, i.e. the batch
            # doc is KEPT — the safe direction (a possible recall miss,
            # never silent loss); loaders for tables that may hold null
            # digests should return the text column too (next branch).
            cur_digests = matched_corpus.select(id_col, "_dg")
        elif has_dg and has_text:
            # prefer the stored digest, compute from text where null
            # (e.g. rows written before a _dg schema migration)
            cur_digests = matched_corpus.select(
                id_col,
                F.coalesce(
                    F.col("_dg"), shingle_set_hash(text_col, shingle_k)
                ).alias("_dg"),
            )
        else:
            cur_digests = _doc_digests(
                matched_corpus, id_col=id_col, text_col=text_col,
                k=shingle_k, checkpoint=False,
            )
        cross_hits = (
            cross_hits
            .join(
                batch_digests.select(
                    F.col(id_col).alias("id_a"), F.col("_dg").alias("_dga")
                ),
                "id_a",
            )
            .join(
                cur_digests.select(
                    F.col(id_col).alias("id_b"), F.col("_dg").alias("_dgb")
                ),
                "id_b",
            )
            .filter(F.col("_dga") == F.col("_dgb"))
            .select("_cross", "id_a", "id_b")
            # the confirm subtree (point read + digest over matched
            # docs) would otherwise re-inline into every downstream
            # branch — corpus_dup feeds survivors, which the within
            # star-contraction references twice more. The confirmed
            # pair set is tiny (≤ matched pairs); cut it once.
            .localCheckpoint()
        )

    corpus_dup = cross_hits.select(F.col("id_a").alias(id_col)).distinct()
    survivors = new_df.join(corpus_dup, on=id_col, how="left_anti")

    if skip_within:
        # no within pairs were generated (provably none can verify) —
        # the corpus-survivor set IS the answer
        return survivors

    # within-batch star contraction among corpus-survivors only (the
    # survivor subset's LSH pairs ARE the full-batch pairs filtered to
    # survivor endpoints — banding is per-document deterministic)
    surv_ids = survivors.select(id_col)
    within = (
        hit.filter(~F.col("_cross"))
        .join(surv_ids.withColumnRenamed(id_col, "id_a"), "id_a", "leftsemi")
        .join(surv_ids.withColumnRenamed(id_col, "id_b"), "id_b", "leftsemi")
        .select("id_a", "id_b")
    )
    return keep_min_representative(survivors, within, id_col)


# ------------------------------------------------------------ repeated spans
#
# Passage-level duplication (the practical Spark approximation of
# exact-substring dedup, Lee et al. ACL'22 "Deduplicating Training Data
# Makes Language Models Better"): a k-TOKEN shingle that occurs >=
# min_count times corpus-wide marks its token range as duplicated;
# overlapping/adjacent marked ranges merge into maximal spans per
# document. Suffix arrays don't distribute; corpus-wide shingle counts
# are one map-side-combinable aggregate, and the span merge is a per-
# document gaps-and-islands window (state bounded by document length).


def token_shingle_positions(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    token_hash=None,
) -> DataFrame:
    """(id, pos, h): hash of the k-token shingle starting at 0-based
    token position ``pos``. Tokens are whitespace-split, so joining them
    with a single space is injective — the shingle string IS the
    original k-token passage. ``token_hash`` (Column → Column) defaults
    to seeded xxhash64; pass ``md5_hash48`` for SQL-portable hashing."""
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    if token_hash is None:
        def token_hash(c):
            return F.xxhash64(c, F.lit(seed))
    t = tokens(text_col)
    n = F.size(t)
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return spread_for_explode(df).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda i: token_hash(F.concat_ws(" ", F.slice(t, i + 1, k))),
            )
        ).alias("pos", "h"),
    )


def repeated_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    seed: int = 42,
    token_hash=None,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    (id, span_start, span_end, n_shingles) with token range
    [span_start, span_end).

    A shingle counts as duplicated when its corpus-wide occurrence count
    (including repeats within one document) reaches ``min_count``.
    Marked positions p1 < p2 merge while p2 - p1 <= k (their k-token
    ranges overlap or touch). Shuffles: one count aggregate on the
    shingle hash (map-side combined), one semijoin back, one per-doc
    window whose partitions are bounded by document length."""
    from pyspark.sql import Window

    sh = token_shingle_positions(
        df, id_col=id_col, text_col=text_col, k=k, seed=seed,
        token_hash=token_hash,
    )
    dup = (
        sh.groupBy("h").agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h")
    )
    rep = sh.join(dup, "h", "leftsemi")
    w = Window.partitionBy(id_col).orderBy("pos")
    marked = rep.withColumn(
        "_brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "_g",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy(id_col, "_g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count("*").alias("n_shingles"),
        )
        .drop("_g")
    )


def duplication_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    seed: int = 42,
    token_hash=None,
) -> DataFrame:
    """Per-document duplicated-token accounting over ``repeated_spans``:
    (id, n_tokens, dup_tokens, dup_fraction). Spans are disjoint by
    construction, so dup_tokens = Σ(span_end - span_start), capped at
    n_tokens. Documents with no duplicated span report 0/0.0. Gate with
    e.g. ``.filter("dup_fraction < 0.5")`` to drop boilerplate-heavy
    documents without dropping the corpus' unique remainder."""
    spans = repeated_spans(
        df, id_col=id_col, text_col=text_col, k=k, min_count=min_count,
        seed=seed, token_hash=token_hash,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("_dup")
    )
    from synapse_etl_jobs_spark.operators.text import token_count

    return (
        df.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.least(
                F.coalesce(F.col("_dup"), F.lit(0)), F.col("n_tokens").cast("long")
            ).alias("dup_tokens"),
            F.round(
                F.least(F.coalesce(F.col("_dup"), F.lit(0)),
                        F.col("n_tokens").cast("long"))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )
