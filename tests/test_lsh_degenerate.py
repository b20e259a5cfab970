"""Degenerate-bucket guards for LSH candidate generation.

A (band, bucket) group of k documents emits O(k²) pairs from the
banded self-join; boilerplate clusters (license headers, templated
pages) make k huge at web scale. Two guards, both default-off:

- ``collapse_exact``: exact-duplicate classes enter LSH as ONE
  representative; members come back as k-1 star pairs — O(k);
- ``max_bucket_size``: (band, bucket) groups above the cap are dropped
  before the self-join, with ``capped_group_stats`` reporting what a
  cap drops.
"""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.operators.dedup_text import (
    cap_bucket_groups,
    capped_group_stats,
    exact_duplicate_map,
    minhash_dedup,
    minhash_index,
    minhash_lsh_candidates,
)

LSH = dict(shingle_k=4, num_hashes=32, bands=8, seed=7)
K_CLONES = 2000


@pytest.fixture(scope="module")
def boilerplate(spark):
    """K_CLONES identical docs + 3 distinct ones, ids 0..K+2."""
    clones = [(i, "permission is hereby granted free of charge") for i in range(K_CLONES)]
    distinct = [
        (K_CLONES, "the quick brown fox jumps over the lazy dog"),
        (K_CLONES + 1, "pack my box with five dozen liquor jugs"),
        (K_CLONES + 2, "permission is hereby granted free of charge "
                       "to any person obtaining a copy of this software"),
    ]
    return spark.createDataFrame(clones + distinct, "doc_id long, text string")


def test_collapse_exact_emits_linear_candidates(spark, boilerplate):
    """k identical docs → exactly k-1 star pairs (plus any rep-level
    pairs), NOT O(k²). This is the scale guarantee: a 10^6-clone
    boilerplate family enters the self-join as one representative."""
    cands = minhash_lsh_candidates(boilerplate, collapse_exact=True, **LSH)
    n = cands.count()
    # k-1 star pairs + at most a handful of rep-level pairs (3 distinct
    # docs + 1 representative = ≤ C(4,2) = 6 extra)
    assert K_CLONES - 1 <= n <= K_CLONES - 1 + 6
    # every clone is reachable from the representative (id 0)
    star = cands.filter((F.col("id_a") == 0) & (F.col("id_b") < K_CLONES))
    assert star.count() == K_CLONES - 1


def test_collapse_exact_preserves_dedup_result(spark):
    """Survivor set of the full dedup pipeline is invariant under the
    exact-dup pre-collapse (identical docs are interchangeable in both
    candidacy and verification)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),       # = 1
        (3, "alpha beta gamma delta epsilon zeta eta"),   # near 1
        (4, "completely different text about spark jobs"),
        (5, "completely different text about spark jobs"),  # = 4
        (6, "unrelated sixth document standing alone here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(
        r["doc_id"]
        for r in minhash_dedup(df, threshold=0.5, **LSH).collect()
    )
    collapsed = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            df, threshold=0.5, collapse_exact=True, **LSH
        ).collect()
    )
    assert base == collapsed
    assert 1 in base and 2 not in base and 4 in base and 5 not in base


def test_exact_duplicate_map_groups_by_shingle_set(spark):
    df = spark.createDataFrame(
        [(10, "aaaa bbbb"), (11, "aaaa bbbb"), (12, "cccc dddd")],
        "doc_id long, text string",
    )
    m = {r["doc_id"]: r["_rep"] for r in exact_duplicate_map(df, shingle_k=3).collect()}
    assert m == {10: 10, 11: 10, 12: 12}


def test_max_bucket_size_caps_degenerate_groups(spark, boilerplate):
    """With a cap below the clone-cluster size, the degenerate buckets
    are dropped entirely: pair count collapses from O(k²) to the pairs
    among small-bucket docs only."""
    capped = minhash_lsh_candidates(boilerplate, max_bucket_size=10, **LSH)
    # the clone cluster shares every bucket → all its buckets exceed the
    # cap → no clone-clone pairs survive; remaining pairs are among the
    # 3 distinct docs (possibly none)
    assert capped.filter(
        (F.col("id_a") < K_CLONES) & (F.col("id_b") < K_CLONES)
    ).count() == 0
    assert capped.count() <= 3


def test_capped_group_stats_reports_overcap_groups(spark, boilerplate):
    ix = minhash_index(boilerplate, **LSH)
    stats = capped_group_stats(ix, 10)
    rows = stats.collect()
    # the clone cluster fills one bucket per band → `bands` over-cap groups
    # (the near-dup doc may share some of them)
    assert len(rows) == LSH["bands"]
    assert all(r["group_size"] >= K_CLONES for r in rows)
    # and the guard itself drops exactly those groups' rows
    kept = cap_bucket_groups(ix, 10)
    assert kept.join(
        stats.select("band", "bucket"), ["band", "bucket"], "leftsemi"
    ).count() == 0


def test_guards_default_off_bitwise_identical(spark):
    """Defaults unchanged: no guard → the exact historical pair set."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "some other padding text entirely unlike"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(df, **LSH).collect()}
    assert a == {(1, 2)}


def test_bucket_size_histogram_bounded_and_correct(spark, boilerplate):
    from synapse_etl_jobs_spark.operators.dedup_text import (
        bucket_size_histogram, minhash_index,
    )

    ix = minhash_index(boilerplate, **LSH)
    hist = {r["log2_size"]: (r["n_groups"], r["max_size"])
            for r in bucket_size_histogram(ix).collect()}
    assert len(hist) <= 64  # bounded by construction
    # the K_CLONES family fills one bucket per band: its bin holds
    # `bands` groups of size >= K_CLONES
    big = max(hist)
    assert hist[big][0] >= LSH["bands"] and hist[big][1] >= K_CLONES
    # total groups = sum over bins
    n_groups = ix.select("band", "bucket").distinct().count()
    assert sum(n for n, _ in hist.values()) == n_groups
