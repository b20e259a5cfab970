"""Continuous corpus ingestion with near-dup removal.

The flagship integration of the CDC engine with the training-data
operators: a document stream is tailed micro-batch by micro-batch;
each batch is near-dup-deduplicated against the ALREADY-COMMITTED
corpus through the persisted MinHash-LSH index (never re-hashing the
corpus — O(batch + candidates) per batch, `operators/dedup_text.py`),
survivors are MERGEd into the corpus lake table, and their index rows
are MERGEd into the index lake table. Both merges ride the engine's
idempotent batch markers, so the at-least-once redelivery of
Structured Streaming becomes exactly-once corpus AND index state.

Crash-window analysis (the reason for the commit ORDER below):

- index commit ✓, docs commit ✗, batch redelivered: the batch's ids
  are already indexed. The batch handler EXCLUDES its own ids from the
  index view before probing (and the probe additionally excludes
  self-pairs), so the replay sees exactly the first attempt's index
  state and recomputes the identical survivor set at ANY threshold;
  the index merge short-circuits on its marker, the docs merge then
  commits — reconverged.
- docs commit before index (the WRONG order) would strand the corpus
  with documents the index never learns about: every future batch
  could ship a duplicate of them undetected. Index first is safe,
  docs first is not; hence index first.

Scale shape: the per-batch cost is the batch's signatures + one
equi-join against the index + verification against candidate corpus
documents only. The index table is O(corpus × bands) tiny rows; at
cluster scale it would be bucketed on (band, bucket) so the probe join
co-partitions — here it rides the lake table's hash bucketing.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.operators.dedup_text import (
    minhash_dedup_incremental, minhash_index,
)


def create_dedup_tables(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    doc_schema: StructType,
    *,
    id_col: str = "doc_id",
    num_buckets: int = 16,
    write_mode: str = "mor",
) -> tuple[LakeTable, LakeTable]:
    """Create the (corpus, LSH-index) lake-table pair for
    ``dedup_stream_into_table``. The corpus table is keyed by the
    document id; the index table by (id, band) with the bucket hash as
    payload, so index merges are idempotent per document per band."""
    docs = LakeTable.create(
        spark, docs_path, doc_schema, [id_col],
        num_buckets=num_buckets, write_mode=write_mode,
    )
    ix_schema = (
        StructType()
        .add(id_col, doc_schema[id_col].dataType)
        .add("band", "integer")
        .add("bucket", "long")
    )
    index = LakeTable.create(
        spark, index_path, ix_schema, [id_col, "band"],
        num_buckets=num_buckets, write_mode=write_mode,
    )
    return docs, index


def dedup_stream_into_table(
    docs_table: LakeTable,
    index_table: LakeTable,
    docs_stream: DataFrame,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 1.0,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    stream_id: str = "dedup",
    trigger_once: bool = True,
) -> Any:
    """Tail a document stream into a near-dup-free corpus table.

    Each micro-batch: probe the persisted LSH index → verify → drop
    batch docs duplicating the corpus (or a smaller-id batch survivor)
    → MERGE the survivors' index rows, then the survivors themselves
    (order matters — see the module docstring). ``batch_id`` doubles as
    the LWW seq, so a re-ingested id in a later batch updates its row.

    LSH parameters are baked into the INDEX — every batch must probe
    with the parameters the index was built with, so pass the same ones
    for the table's whole lifetime (store them next to the table path
    if in doubt).
    """
    lsh = dict(shingle_k=shingle_k, num_hashes=num_hashes,
               bands=bands, seed=seed)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-op only when BOTH commits landed: keying on the docs
        # marker alone would leave a rebuilt or lagging index empty
        # forever (docs marker present → batch skipped → index rows
        # never re-derived), silently disabling dedup for those docs
        if docs_table.is_batch_applied(
            stream_id, batch_id
        ) and index_table.is_batch_applied(stream_id, batch_id):
            return
        corpus = docs_table.read()
        # exclude the batch's OWN ids from the index view: after the
        # index-committed/docs-lost crash, the redelivered batch's ids
        # are already indexed — probing against them would change which
        # batch docs drop at thresholds < 1.0 (a doc whose only partner
        # was a NON-survivor could otherwise cross-match a ghost index
        # row and diverge from the first attempt). With the exclusion
        # the replay sees exactly the first attempt's index state, so
        # the survivor set recomputes identically at ANY threshold.
        index = index_table.read().select(id_col, "band", "bucket").join(
            batch_df.select(id_col), id_col, "left_anti"
        )
        # NOT pre_reduced: a batch may legally carry the same id twice
        # (at-least-once upstream producers); merge's LWW reduction
        # resolves equal-seq ties deterministically by payload order
        kept = minhash_dedup_incremental(
            batch_df, corpus, index=index,
            id_col=id_col, text_col=text_col, threshold=threshold, **lsh,
        ).persist()  # two merges below consume it — compute once
        try:
            new_index = minhash_index(
                kept, id_col=id_col, text_col=text_col, **lsh
            )
            index_table.merge(
                new_index.select(
                    id_col, "band", "bucket",
                    F.lit("UPSERT").alias("op"),
                    F.lit(batch_id).cast("long").alias("seq"),
                ),
                stream_id=stream_id, batch_id=batch_id,
            )
            docs_table.merge(
                kept.select(
                    *kept.columns,
                    F.lit("UPSERT").alias("op"),
                    F.lit(batch_id).cast("long").alias("seq"),
                ),
                stream_id=stream_id, batch_id=batch_id,
            )
        finally:
            kept.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if trigger_once:
        query.awaitTermination()
    return query
