"""Incremental RP-LSH index: dedup a new embedding batch against a
persisted corpus index without re-signing the corpus."""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.operators.similarity import (
    dedup_embedding,
    embedding_dedup_incremental,
    rp_index,
    rp_index_probe,
)

LSH = dict(bits=8, tables=4, seed=3)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_probe_finds_exact_copies(spark, corpus):
    new = spark.createDataFrame(
        [(101, [1.0, 0.0, 0.0, 0.0]),      # copy of 1
         (102, [0.5, 0.5, 0.5, 0.5])],     # unlike anything
        "vec_id long, embedding array<float>",
    )
    ix = rp_index(corpus, **LSH)
    cands = {(r["new_id"], r["corpus_id"])
             for r in rp_index_probe(new, ix, **LSH).collect()}
    assert (101, 1) in cands  # identical vectors collide in every table


def test_incremental_drops_corpus_and_batch_dups(spark, corpus):
    new = spark.createDataFrame(
        [
            (101, [1.0, 0.0, 0.0, 0.0]),   # = corpus 1
            (102, [0.0, 0.0, 0.0, 1.0]),   # new direction
            (103, [0.0, 0.0, 0.0, 1.0]),   # = 102 (in-batch)
        ],
        "vec_id long, embedding array<float>",
    )
    kept = embedding_dedup_incremental(new, corpus, threshold=0.99, **LSH)
    assert sorted(r["vec_id"] for r in kept.collect()) == [102]


def test_prebuilt_index_and_self_pair_exclusion(spark, corpus):
    """Probing with an index that ALREADY contains the batch's own ids
    (streaming redelivery state) must not self-drop the batch."""
    new = spark.createDataFrame(
        [(201, [0.0, 0.0, 0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    ix = rp_index(corpus, **LSH).unionByName(rp_index(new, **LSH))
    kept = embedding_dedup_incremental(
        new, corpus, index=ix, threshold=0.99, **LSH
    )
    assert [r["vec_id"] for r in kept.collect()] == [201]


def test_incremental_consistent_with_oneshot(spark, corpus):
    new = spark.createDataFrame(
        [
            (101, [1.0, 0.0, 0.0, 0.0]),
            (102, [0.0, 0.0, 0.0, 1.0]),
            (103, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    inc = embedding_dedup_incremental(new, corpus, threshold=0.99, **LSH)
    incremental_ids = sorted(
        [r["vec_id"] for r in corpus.select("vec_id").collect()]
        + [r["vec_id"] for r in inc.select("vec_id").collect()]
    )
    oneshot = dedup_embedding(
        corpus.unionByName(new), threshold=0.99, method="lsh", **LSH
    )
    assert incremental_ids == sorted(
        r["vec_id"] for r in oneshot.select("vec_id").collect()
    )
