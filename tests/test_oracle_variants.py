"""Pins for the oracle-checked operator variants added in round 2:
portable md5-derived token hash (SQL-reproducible), parameterized
SimHash width, winnowing empty-doc behavior, and the threshold-1.0
exact-dup guarantees the LSH gate queries rely on."""

import pyspark.sql.functions as F

from synapse_etl_jobs_spark.operators.dedup_text import (
    minhash_dedup, minhash_lsh_candidates, simhash_near_pairs,
    simhash_signatures,
)
from synapse_etl_jobs_spark.operators.text import fingerprint, md5_hash48

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # verbatim copy
    (3, "a completely different sentence about spark engines"),
    (4, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
    (5, ""),  # empty doc
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_md5_hash48_range_and_determinism(spark):
    df = spark.createDataFrame([("hello",), ("hello",), ("x",)], "s string")
    vals = [r[0] for r in df.select(md5_hash48("s")).collect()]
    assert vals[0] == vals[1] == 102534830799947  # pinned: md5 prefix base-16
    assert all(0 <= v < 2**48 for v in vals)


def test_simhash_bits_param(spark):
    d = _docs(spark)
    sig48 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(
        d, bits=48, token_hash=md5_hash48).collect()}
    # 48-bit signatures stay under 2^48; identical texts identical sigs
    assert all(0 <= v < 2**48 for v in sig48.values())
    assert sig48[1] == sig48[2]
    assert sig48[5] == 0  # zero tokens → signature 0


def test_simhash_near_pairs_exactness_portable(spark):
    """Pigeonhole banding + exact verify == brute-force hamming compare
    (the property the SQL oracle checks at gate scale)."""
    d = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(
        d, bits=48, token_hash=md5_hash48).collect()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 4
    }
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in simhash_near_pairs(
        d, max_hamming=4, blocks=8, bits=48, token_hash=md5_hash48).collect()}
    assert got == want
    assert (1, 2, 0) in got  # the verbatim copy always survives


def test_fingerprint_empty_doc_and_portable_hash(spark):
    d = _docs(spark)
    out = {r["doc_id"]: r["fp"] for r in d.select(
        "doc_id", fingerprint("text", window=2, token_hash=md5_hash48).alias("fp")
    ).collect()}
    assert out[5] == []          # empty doc → EMPTY fingerprint, no nulls
    assert out[1] == out[2] != []  # identical docs → identical fingerprints
    assert out[1] == sorted(set(out[1]))  # sorted distinct
    assert all(0 <= v < 2**48 for v in out[1])


def test_minhash_threshold_one_keeps_only_shingle_distinct(spark):
    """threshold=1.0 removes exactly the docs with an equal-shingle-set
    smaller partner — the contract the copy-augmented gate oracle uses."""
    d = _docs(spark)
    kept = sorted(r["doc_id"] for r in minhash_dedup(
        d, threshold=1.0, shingle_k=5, num_hashes=32, bands=8).collect())
    assert kept == [1, 3, 4, 5]  # only the verbatim copy (2) is dropped
    # and LSH candidate recall for the exact pair is structural:
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(
        d, shingle_k=5, num_hashes=32, bands=8).collect()}
    assert (1, 2) in cands
