"""Streaming corpus ingestion with near-dup removal: the LSH index and
the corpus table advance together, exactly-once, per micro-batch."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.operators.dedup_text import minhash_index
from synapse_etl_jobs_spark.streaming.dedup_stream import (
    create_dedup_tables, dedup_stream_into_table,
)

DOC_SCHEMA = StructType().add("doc_id", "long").add("text", "string")
LSH = dict(shingle_k=4, num_hashes=32, bands=8)

B1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "pack my box with five dozen liquor jugs"),  # in-batch dup of 2
]
B2 = [
    (4, "the quick brown fox jumps over the lazy dog"),  # dup of corpus 1
    (5, "sphinx of black quartz judge my vow tonight"),
]


def _run(spark, tmp_path, docs, index, src_dir, ckpt):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src_dir)
    dedup_stream_into_table(
        docs, index, stream, ckpt,
        threshold=1.0, **LSH,
    )


def test_stream_dedups_within_and_across_batches(spark, tmp_path):
    docs, index = create_dedup_tables(
        spark, str(tmp_path / "docs"), str(tmp_path / "ix"), DOC_SCHEMA,
        num_buckets=4,
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(B1, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, tmp_path, docs, index, src, ckpt)
    assert sorted(r["doc_id"] for r in docs.read().collect()) == [1, 2]
    # index rows exactly for the survivors, one per band
    assert index.read().count() == 2 * LSH["bands"]

    spark.createDataFrame(B2, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, tmp_path, docs, index, src, ckpt)
    assert sorted(r["doc_id"] for r in docs.read().collect()) == [1, 2, 5]
    assert index.read().count() == 3 * LSH["bands"]

    # exactly-once: re-running with the same checkpoint applies nothing
    v_docs, v_ix = docs.manifest.table_version, index.manifest.table_version
    _run(spark, tmp_path, docs, index, src, ckpt)
    docs2 = LakeTable.load(spark, docs.path)
    ix2 = LakeTable.load(spark, index.path)
    assert docs2.manifest.table_version == v_docs
    assert ix2.manifest.table_version == v_ix


def test_crash_window_redelivery_reconverges(spark, tmp_path):
    """Simulate the index-committed/docs-lost crash: the index already
    holds the batch's own ids when the batch is (re)delivered as batch 0.
    Self-pairs must not drop the survivors, the index merge must
    short-circuit on its marker, and the docs merge must commit the
    identical survivor set."""
    docs, index = create_dedup_tables(
        spark, str(tmp_path / "docs"), str(tmp_path / "ix"), DOC_SCHEMA,
        num_buckets=4,
    )
    batch = spark.createDataFrame(B1, DOC_SCHEMA)
    # what the lost first attempt committed: index rows for the
    # SURVIVORS of batch 0 (ids 1 and 2), under the stream's marker
    survivors = batch.filter(F.col("doc_id") != 3)
    index.merge(
        minhash_index(survivors, **LSH).select(
            "doc_id", "band", "bucket",
            F.lit("UPSERT").alias("op"), F.lit(0).cast("long").alias("seq"),
        ),
        stream_id="dedup", batch_id=0, pre_reduced=True,
    )
    v_ix = LakeTable.load(spark, index.path).manifest.table_version

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch.coalesce(1).write.parquet(src)
    _run(spark, tmp_path, docs, index, src, ckpt)

    assert sorted(r["doc_id"] for r in docs.read().collect()) == [1, 2]
    ix2 = LakeTable.load(spark, index.path)
    assert ix2.manifest.table_version == v_ix  # marker short-circuited
    assert ix2.read().count() == 2 * LSH["bands"]


def test_crash_window_redelivery_sub_one_threshold(spark, tmp_path):
    """threshold < 1.0 chain case (A~B, B~C, C!~A): after the
    index-committed/docs-lost crash, the handler excludes the batch's
    own ids from the index view, so the replay recomputes the FIRST
    attempt's survivor set instead of diverging via ghost index rows."""
    from synapse_etl_jobs_spark.operators.dedup_text import (
        minhash_dedup_incremental,
    )

    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    B = "alpha beta gamma delta epsilon zeta eta theta lambda mu"  # ~A
    C = "nu xi gamma delta epsilon zeta eta theta lambda mu"       # ~B, !~A
    batch = spark.createDataFrame(
        [(1, A), (2, B), (3, C)], "doc_id long, text string"
    )
    lsh = dict(shingle_k=4, num_hashes=32, bands=16)
    thr = 0.62  # sits between sim(A,C) and min(sim(A,B), sim(B,C))

    # sanity: the chain shape holds at this threshold
    from synapse_etl_jobs_spark.operators.dedup_text import (
        minhash_lsh_candidates, ngram_jaccard_pairs,
    )
    sims = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            batch, minhash_lsh_candidates(batch, **lsh), k=4
        ).collect()
    }
    assert sims[(1, 2)] >= thr and sims[(2, 3)] >= thr
    assert sims.get((1, 3), 0.0) < thr

    # first attempt's survivor set (empty corpus): star contraction
    # drops both B and C via A and B respectively... B drops via A;
    # C's partner B is dropped, so C SURVIVES star contraction only if
    # B is not a survivor — pin whatever the operator computes
    empty = batch.filter("doc_id < 0")
    first = sorted(
        r["doc_id"]
        for r in minhash_dedup_incremental(
            batch, empty, threshold=thr, **lsh
        ).collect()
    )

    # crash state: survivors' index rows committed under batch 0
    docs, index = create_dedup_tables(
        spark, str(tmp_path / "docs"), str(tmp_path / "ix"),
        batch.schema, num_buckets=4,
    )
    from synapse_etl_jobs_spark.operators.dedup_text import minhash_index
    surv_df = batch.join(
        spark.createDataFrame([(i,) for i in first], "doc_id long"),
        "doc_id", "leftsemi",
    )
    index.merge(
        minhash_index(surv_df, **lsh).select(
            "doc_id", "band", "bucket",
            F.lit("UPSERT").alias("op"), F.lit(0).cast("long").alias("seq"),
        ),
        stream_id="dedup", batch_id=0,
    )

    # redelivery as stream batch 0
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    dedup_stream_into_table(
        docs, index, stream, str(tmp_path / "ckpt"), threshold=thr, **lsh
    )
    assert sorted(r["doc_id"] for r in docs.read().collect()) == first
    # index holds exactly the first attempt's survivors
    assert sorted(
        {r["doc_id"] for r in index.read().collect()}
    ) == first


def test_index_rebuild_recovers_from_docs_marker(spark, tmp_path):
    """Inverse window: docs committed, index lost/rebuilt empty. The
    batch guard keys on BOTH markers, so redelivery re-derives the
    index rows while the docs merge short-circuits."""
    docs, index = create_dedup_tables(
        spark, str(tmp_path / "docs"), str(tmp_path / "ix"), DOC_SCHEMA,
        num_buckets=4,
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(B1, DOC_SCHEMA).coalesce(1).write.parquet(src)
    _run(spark, tmp_path, docs, index, src, str(tmp_path / "ckpt1"))
    assert index.read().count() == 2 * LSH["bands"]

    # lose the index table entirely; fresh checkpoint redelivers batch 0
    import shutil

    shutil.rmtree(index.path)
    docs2, index2 = LakeTable.load(spark, docs.path), None
    index2 = create_dedup_tables(
        spark, str(tmp_path / "docs_unused"), str(tmp_path / "ix"),
        DOC_SCHEMA, num_buckets=4,
    )[1]
    v_docs = docs2.manifest.table_version
    _run(spark, tmp_path, docs2, index2, src, str(tmp_path / "ckpt2"))
    assert LakeTable.load(spark, docs.path).manifest.table_version == v_docs
    assert index2.read().count() == 2 * LSH["bands"]


def test_metrics_path_writes_batch_histograms(spark, tmp_path):
    """Opt-in skew observability: one JSON line per applied batch with
    rows in/kept, the (band, bucket) size histogram of the banding that
    ENTERED the joins (pre-dedup — a histogram over the survivors would
    measure the skew after dedup removed it), and the raw batch's
    exact-duplicate class-size histogram."""
    import json

    docs, index = create_dedup_tables(
        spark, str(tmp_path / "docs"), str(tmp_path / "ix"), DOC_SCHEMA,
        num_buckets=4,
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics.jsonl")
    spark.createDataFrame(B1, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    dedup_stream_into_table(
        docs, index, stream, ckpt, threshold=1.0,
        metrics_path=metrics, **LSH,
    )
    lines = [json.loads(x) for x in open(metrics)]
    assert len(lines) == 1
    m = lines[0]
    assert m["rows_in"] == 3 and m["rows_kept"] == 2
    # the banding entering the joins covers ALL 3 batch docs: the exact
    # duplicates (2, 3) share every band bucket -> 8 groups of size 2,
    # plus doc 1's 8 singletons. The old survivor-based histogram showed
    # only singletons — the skew signal vanished with the dups.
    assert m["bucket_histogram"] == [
        {"log2_size": 0, "n_groups": LSH["bands"], "max_size": 1},
        {"log2_size": 1, "n_groups": LSH["bands"], "max_size": 2},
    ]
    # raw-batch exact classes: {1} and {2, 3}
    assert m["exact_class_histogram"] == [
        {"log2_size": 0, "n_groups": 1, "max_size": 1},
        {"log2_size": 1, "n_groups": 1, "max_size": 2},
    ]
    # exactly-once replay appends no new metrics line
    stream2 = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    dedup_stream_into_table(
        docs, index, stream2, ckpt, threshold=1.0,
        metrics_path=metrics, **LSH,
    )
    assert len(open(metrics).readlines()) == 1


def test_reingested_doc_ghost_does_not_drop_unique_text(spark, tmp_path):
    """End-to-end ghost confirm: doc 10 is ingested with T1, re-ingested
    with T2 (its T1-generation index rows become ghosts in other
    buckets), then a batch ships Y=T1 (now UNIQUE — the corpus holds
    only T2) and Z=T2 (a true duplicate). The pruned index load sees
    only the ghost digest for Y's probe; the stored-digest confirm
    (docs table `_dg` column, store_digests default) must keep Y and
    still drop Z."""
    t1 = "the quick brown fox jumps over the lazy dog today"
    t2 = "sphinx of black quartz judge my vow again this very evening"
    docs, index = create_dedup_tables(
        spark, str(tmp_path / "docs"), str(tmp_path / "ix"), DOC_SCHEMA,
        num_buckets=4,
    )
    assert "_dg" in [f.name for f in docs.manifest.current_schema().fields]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    for rows in ([(10, t1)], [(10, t2)], [(100, t1), (101, t2)]):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _run(spark, tmp_path, docs, index, src, ckpt)
    state = {r["doc_id"]: (r["text"], r["_dg"]) for r in docs.read().collect()}
    assert set(state) == {10, 100}
    assert state[10][0] == t2 and state[100][0] == t1
    # the stored digest is each row's OWN text digest
    from synapse_etl_jobs_spark.operators.dedup_text import _doc_digests

    expected = {
        r["doc_id"]: r["_dg"]
        for r in _doc_digests(
            spark.createDataFrame([(10, t2), (100, t1)], DOC_SCHEMA),
            id_col="doc_id", text_col="text", k=LSH["shingle_k"],
            checkpoint=False,
        ).collect()
    }
    assert {k: v[1] for k, v in state.items()} == expected


def test_null_stored_digest_falls_back_to_text(spark, tmp_path):
    """A docs table whose ``_dg`` column arrived by schema migration
    (no create-time completeness prop) holds NULL digests on old rows:
    the confirm must read candidate text and compute the digest there,
    or a true duplicate of such a row is silently kept."""
    from synapse_etl_jobs_spark.operators.dedup_text import (
        _doc_digests, minhash_index,
    )

    t1 = "the quick brown fox jumps over the lazy dog today"
    schema_dg = StructType.fromJson(DOC_SCHEMA.jsonValue()).add(
        "_dg", "string"
    )
    docs = LakeTable.create(
        spark, str(tmp_path / "docs"), schema_dg, ["doc_id"],
        num_buckets=4, write_mode="mor",
    )
    assert docs.manifest.props.get("dedup_digests") != "full"
    ix_schema = (
        StructType()
        .add("doc_id", "long").add("band", "integer").add("bucket", "long")
        .add("_dg", "string").add("_batch", "long")
    )
    index = LakeTable.create(
        spark, str(tmp_path / "ix"), ix_schema,
        ["doc_id", "band", "bucket"], bucket_cols=["bucket"],
        num_buckets=4, write_mode="mor",
    )
    # doc 10 written by an "external" path: digest column left NULL;
    # its index rows DO carry the digest (the stale-load hazard needs
    # the index digest to match)
    seed = spark.createDataFrame([(10, t1)], DOC_SCHEMA)
    docs.merge(
        seed.select(
            "doc_id", "text", F.lit(None).cast("string").alias("_dg"),
            F.lit("UPSERT").alias("op"), F.lit(0).cast("long").alias("seq"),
        ),
        batch_id=0,
    )
    ixrows = minhash_index(seed, **LSH).join(
        _doc_digests(seed, id_col="doc_id", text_col="text",
                     k=LSH["shingle_k"], checkpoint=False),
        "doc_id",
    ).withColumn("_batch", F.lit(0).cast("long"))
    index.merge(
        ixrows.select(
            "doc_id", "band", "bucket", "_dg", "_batch",
            F.lit("UPSERT").alias("op"), F.lit(0).cast("long").alias("seq"),
        ),
        batch_id=0,
    )
    src = str(tmp_path / "src")
    spark.createDataFrame([(100, t1)], DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, tmp_path, docs, index, src, str(tmp_path / "ckpt"))
    assert sorted(r["doc_id"] for r in docs.read().collect()) == [10]
