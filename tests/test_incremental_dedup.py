"""Incremental MinHash-LSH index: probe a new batch against a persisted
corpus index without re-hashing the corpus."""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.operators.dedup_text import (
    minhash_dedup,
    minhash_dedup_incremental,
    minhash_index,
    minhash_index_probe,
    minhash_lsh_candidates,
)

LSH = dict(shingle_k=4, num_hashes=32, bands=8, seed=7)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "how vexingly quick daft zebras jump over fences"),
        (4, "sphinx of black quartz judge my vow tonight"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_equals_self_join_cross_pairs(spark, corpus):
    """Index-probe candidates == the cross-corpus subset of the
    whole-union self-join candidates (same banding, same buckets)."""
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog"),  # copy of 1
            (102, "a completely different sentence about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    ix = minhash_index(corpus, **LSH)
    probed = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_index_probe(new, ix, **LSH).collect()
    }
    full = minhash_lsh_candidates(corpus.unionByName(new), **LSH)
    cross = {
        (r["id_b"], r["id_a"])
        for r in full.filter(
            (F.col("id_a") <= 4) & (F.col("id_b") >= 101)
        ).collect()
    }
    assert probed == cross
    assert (101, 1) in probed


def test_incremental_dedup_drops_corpus_and_batch_dups(spark, corpus):
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog"),  # = corpus 1
            (102, "grumpy wizards make toxic brew for the evil queen"),
            (103, "grumpy wizards make toxic brew for the evil queen"),  # = 102
            (104, "jackdaws love my big sphinx of quartz obviously"),
        ],
        "doc_id long, text string",
    )
    kept = minhash_dedup_incremental(new, corpus, threshold=1.0, **LSH)
    assert sorted(r["doc_id"] for r in kept.collect()) == [102, 104]


def test_incremental_with_prebuilt_index_matches_inline(spark, corpus):
    new = spark.createDataFrame(
        [(101, "pack my box with five dozen liquor jugs"),
         (105, "fresh unseen text with no duplicate anywhere here")],
        "doc_id long, text string",
    )
    ix = minhash_index(corpus, **LSH)
    a = sorted(
        r["doc_id"]
        for r in minhash_dedup_incremental(
            new, corpus, index=ix, threshold=1.0, **LSH
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in minhash_dedup_incremental(
            new, corpus, threshold=1.0, **LSH
        ).collect()
    )
    assert a == b == [105]


def test_incremental_consistent_with_batch_dedup(spark, corpus):
    """Committing corpus then incrementally adding a batch must keep the
    same survivor set as one-shot dedup over the union, when the corpus
    is itself dup-free and all ids in the batch are larger (so min-id
    representatives always sit in the corpus)."""
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog"),
            (102, "grumpy wizards make toxic brew for the evil queen"),
            (103, "grumpy wizards make toxic brew for the evil queen"),
        ],
        "doc_id long, text string",
    )
    inc = minhash_dedup_incremental(new, corpus, threshold=1.0, **LSH)
    incremental_ids = sorted(
        [r["doc_id"] for r in corpus.select("doc_id").collect()]
        + [r["doc_id"] for r in inc.select("doc_id").collect()]
    )
    oneshot = minhash_dedup(
        corpus.unionByName(new), threshold=1.0, **LSH
    )
    oneshot_ids = sorted(r["doc_id"] for r in oneshot.select("doc_id").collect())
    assert incremental_ids == oneshot_ids


def test_near_dup_threshold_below_one(spark, corpus):
    """Sub-1.0 threshold verifies with exact Jaccard on candidates."""
    new = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dogs")],  # 1 char off
        "doc_id long, text string",
    )
    kept_strict = minhash_dedup_incremental(new, corpus, threshold=1.0, **LSH)
    kept_loose = minhash_dedup_incremental(new, corpus, threshold=0.7, **LSH)
    assert kept_strict.count() == 1  # not byte/shingle-set identical
    assert kept_loose.count() == 0  # but well above 0.7 Jaccard
