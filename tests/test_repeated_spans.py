"""Passage-level duplication: corpus-wide repeated k-token shingles
merged into maximal per-document spans."""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.operators.dedup_text import (
    duplication_stats,
    repeated_spans,
    token_shingle_positions,
)

A = "a b c d e f g h i j"  # 10 tokens
B = "k l m n o p q r s t u v"  # 12 tokens


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, A),
            (2, B),
            (3, A + " SEP3 " + B),  # both halves duplicated, gap at SEP3
            (4, "completely unique text with nothing shared at all here"),
            (5, ""),  # shorter than k: no shingles, never crashes
            (6, "x y z"),
        ],
        "doc_id long, text string",
    )


def test_shingle_positions_are_zero_based_and_guarded(spark, docs):
    sh = token_shingle_positions(docs, k=4)
    d1 = sh.filter("doc_id = 1")
    assert d1.count() == 7  # 10 - 4 + 1
    assert d1.agg(F.min("pos"), F.max("pos")).first() == (0, 6)
    assert sh.filter("doc_id in (5, 6)").count() == 0  # < k tokens


def test_spans_merge_and_split_on_gaps(spark, docs):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(docs, k=4).collect()
    }
    # full-doc spans for the two repeated halves, two islands for doc 3
    assert spans == {
        (1, 0, 10), (2, 0, 12),
        (3, 0, 10),   # A-half: positions 0..6 → [0, 6+4)
        (3, 11, 23),  # B-half after the unique separator token
    }


def test_within_document_repeats_count(spark):
    # the same 4-gram twice in ONE doc reaches min_count=2 by itself
    d = spark.createDataFrame(
        [(1, "p q r s UNIQUE1 UNIQUE2 p q r s")], "doc_id long, text string"
    )
    spans = repeated_spans(d, k=4).collect()
    assert {(r["span_start"], r["span_end"]) for r in spans} == {(0, 4), (6, 10)}


def test_min_count_threshold(spark, docs):
    # raising min_count above the occurrence count silences everything
    assert repeated_spans(docs, k=4, min_count=9).count() == 0


def test_duplication_stats(spark, docs):
    stats = {r["doc_id"]: r for r in duplication_stats(docs, k=4).collect()}
    assert stats[1]["dup_fraction"] == 1.0
    assert stats[4]["dup_tokens"] == 0 and stats[4]["dup_fraction"] == 0.0
    assert stats[5]["n_tokens"] == 0 and stats[5]["dup_fraction"] == 0.0
    r3 = stats[3]
    assert r3["n_tokens"] == 23 and r3["dup_tokens"] == 22
    assert abs(r3["dup_fraction"] - 22 / 23) < 1e-6


def test_portable_hash_matches_default_structure(spark, docs):
    from synapse_etl_jobs_spark.operators.text import md5_hash48

    a = repeated_spans(docs, k=4)
    b = repeated_spans(docs, k=4, token_hash=md5_hash48)
    rows = lambda df: {tuple(r) for r in df.collect()}
    assert rows(a) == rows(b)  # span structure is hash-agnostic
