"""Candidate-text reads prune to candidate storage buckets.

The threshold-1.0 digest path reads the corpus only to CONFIRM digest
matches (matched ids, usually none — see the ghost-digest test below);
the rest pin the OTHER verify modes — threshold < 1.0, or a digest-less
index — where candidate text must be read: the read goes through
``corpus_loader`` / ``prune_corpus_scan`` and touches only the storage
buckets holding candidate ids, never a full-corpus LWW scan, with a
bit-identical survivor set either way.
"""

import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.operators.dedup_text import (
    minhash_dedup_incremental,
)
from synapse_etl_jobs_spark.streaming.dedup_stream import (
    create_dedup_tables, dedup_stream_into_table,
)

DOC_SCHEMA = StructType().add("doc_id", "long").add("text", "string")
LSH = dict(shingle_k=4, num_hashes=32, bands=16)

CORPUS = [
    (10, "the quick brown fox jumps over the lazy dog today"),
    (11, "sphinx of black quartz judge my vow this evening"),
    (12, "pack my box with five dozen liquor jugs right now"),
    (13, "how vexingly quick daft zebras jump in the park"),
]
BATCH = [
    (100, "the quick brown fox jumps over the lazy cat today"),  # ~10
    (101, "completely unrelated fresh document about spark plans"),
]
THR = 0.5


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_corpus_loader_sees_only_candidates_and_preserves_result(spark):
    corpus = spark.createDataFrame(CORPUS, DOC_SCHEMA)
    batch = spark.createDataFrame(BATCH, DOC_SCHEMA)

    plain = minhash_dedup_incremental(
        batch, corpus, threshold=THR, **LSH
    )
    assert _ids(plain) == [101]  # 100 verifies against corpus doc 10

    seen: list[list[int]] = []

    def loader(cand_ids):
        seen.append(_ids(cand_ids))
        # a real loader returns a bucket superset; returning exactly the
        # candidate rows is the tightest legal superset
        return corpus.join(cand_ids, "doc_id", "leftsemi")

    pruned = minhash_dedup_incremental(
        batch, corpus, threshold=THR, corpus_loader=loader, **LSH
    )
    assert _ids(pruned) == [101]
    # the loader was consulted, and only with true LSH candidates — a
    # subset of the corpus ids (the fresh doc matched nothing)
    assert len(seen) == 1
    assert seen[0] and set(seen[0]) <= {10, 11, 12, 13}
    assert 10 in seen[0]


def _digest_index(spark, rows, batch):
    """(id, band, bucket, _dg, _batch) index rows for the given docs —
    what a streaming ingest of ``rows`` at ``batch`` would have merged."""
    from synapse_etl_jobs_spark.operators.dedup_text import (
        _doc_digests, minhash_index,
    )

    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    return minhash_index(docs, **LSH).join(
        _doc_digests(docs, id_col="doc_id", text_col="text",
                     k=LSH["shingle_k"], checkpoint=False),
        "doc_id",
    ).withColumn("_batch", F.lit(batch).cast("long"))


def test_digest_path_reads_corpus_only_for_matches(spark):
    """threshold >= 1.0 with an index carrying (_dg, _batch): candidate
    digests come off index rows; the corpus loader runs only to CONFIRM
    matches — exactly the matched ids, and stays cold when nothing
    matched."""
    corpus = spark.createDataFrame(CORPUS, DOC_SCHEMA)
    ix = _digest_index(spark, CORPUS, 0)

    seen: list[list[int]] = []

    def loader(cand_ids):
        seen.append(_ids(cand_ids))
        return corpus.join(cand_ids, "doc_id", "leftsemi")

    exact_dup = spark.createDataFrame(
        [(100, CORPUS[0][1]), (101, "totally fresh text here")], DOC_SCHEMA
    )
    kept = minhash_dedup_incremental(
        exact_dup, corpus, index=ix, threshold=1.0,
        corpus_loader=loader, **LSH,
    )
    assert _ids(kept) == [101]
    # consulted once, with exactly the matched corpus id
    assert seen == [[10]]

    seen.clear()
    fresh_only = spark.createDataFrame(
        [(102, "another entirely unrelated document body")], DOC_SCHEMA
    )
    kept2 = minhash_dedup_incremental(
        fresh_only, corpus, index=ix, threshold=1.0,
        corpus_loader=loader, **LSH,
    )
    assert _ids(kept2) == [102]
    # no digest match → the confirm step reads nothing: either the
    # loader never ran, or it ran with an empty matched-id frame
    assert all(ids == [] for ids in seen)


def test_pruned_digest_load_cannot_drop_on_stale_ghost(spark):
    """A PRUNED index load returns only the probed (band, bucket) rows,
    so for a RE-INGESTED document (old text T1 → new text T2) a batch
    doc equal to T1 probes only T1's buckets and sees only the stale
    ghost rows — max_by(_dg, _batch) then yields the T1 digest although
    the corpus now holds T2. The confirm step must point-read the
    matched id's CURRENT text and KEEP the batch doc."""
    t1 = "the quick brown fox jumps over the lazy dog today"
    t2 = "sphinx of black quartz judge my vow again this very evening"
    # X (id 10) ingested with T1 at batch 0, re-ingested with T2 at
    # batch 1: the index holds BOTH generations of rows (immutable
    # facts); the corpus holds only the current text T2
    corpus = spark.createDataFrame([(10, t2)], DOC_SCHEMA)
    ix = _digest_index(spark, [(10, t1)], 0).unionByName(
        _digest_index(spark, [(10, t2)], 1)
    )

    def tight_loader(probed):
        # the tightest legal pruning: exactly the probed (band, bucket)
        # rows — X's T2-generation rows are invisible to a T1 probe
        return ix.join(probed, ["band", "bucket"], "leftsemi")

    # the stale-text doc must arrive ALONE: with a T2 doc in the same
    # batch, T2's buckets get probed too, the loader returns X's fresh
    # rows and max_by already answers correctly — the bug needs the
    # fresh generation to be invisible to the pruned load
    stale = spark.createDataFrame(
        [(100, t1)],  # equals the STALE text — corpus no longer has it
        DOC_SCHEMA,
    )
    kept = minhash_dedup_incremental(
        stale, corpus, index_loader=tight_loader, threshold=1.0, **LSH,
    )
    assert _ids(kept) == [100]

    dup = spark.createDataFrame(
        [(101, t2)],  # equals the CURRENT text — a true duplicate
        DOC_SCHEMA,
    )
    kept2 = minhash_dedup_incremental(
        dup, corpus, index_loader=tight_loader, threshold=1.0, **LSH,
    )
    assert _ids(kept2) == []


def test_stream_sub_one_threshold_prunes_corpus_read(spark, tmp_path):
    """End-to-end: a threshold<1.0 stream with prune_corpus_scan on
    routes the candidate-text read through docs_table.scan_keys (bucket
    pruning) and commits the same corpus as with pruning off."""
    results = {}
    for tag, prune in (("on", True), ("off", False)):
        docs, index = create_dedup_tables(
            spark, str(tmp_path / f"docs_{tag}"), str(tmp_path / f"ix_{tag}"),
            DOC_SCHEMA, num_buckets=4, store_digests=False,
        )
        calls: list[list[tuple]] = []
        real_scan = docs.scan_keys

        def spy(key_values, _real=real_scan, _calls=calls, **kw):
            _calls.append(list(key_values))
            return _real(key_values, **kw)

        docs.scan_keys = spy
        src = str(tmp_path / f"src_{tag}")
        spark.createDataFrame(CORPUS, DOC_SCHEMA).coalesce(1)\
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        dedup_stream_into_table(
            docs, index, stream, str(tmp_path / f"ckpt_{tag}"),
            threshold=THR, prune_corpus_scan=prune, **LSH,
        )
        # batch 2 carries the near-dup + the fresh doc: candidates exist,
        # so the pruned run must consult scan_keys here
        spark.createDataFrame(BATCH, DOC_SCHEMA).coalesce(1)\
            .write.mode("append").parquet(src)
        stream2 = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        dedup_stream_into_table(
            docs, index, stream2, str(tmp_path / f"ckpt_{tag}"),
            threshold=THR, prune_corpus_scan=prune, **LSH,
        )
        results[tag] = _ids(docs.read())
        if prune:
            assert calls, "prune_corpus_scan never reached scan_keys"
            probed = {kv[0] for kvs in calls for kv in kvs}
            # only corpus ids are ever looked up, and the near-dup
            # partner is among them
            assert probed <= {10, 11, 12, 13} and 10 in probed
        else:
            assert not calls

    assert results["on"] == results["off"] == [10, 11, 12, 13, 101]
