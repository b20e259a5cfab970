"""spark-submit entry for STREAMING corpus ingestion with near-dup
removal: tail a directory of document parquet, deduplicate each
micro-batch against the committed corpus via the persisted MinHash-LSH
index (O(batch + candidates) per batch), and MERGE survivors + index
rows exactly-once (see streaming/dedup_stream.py for the crash-window
analysis).

    spark-submit --py-files synapse_etl_jobs_spark.zip \
        tools/run_dedup_stream_job.py \
        --source /data/docs --docs-table /warehouse/corpus \
        --index-table /warehouse/corpus_lsh --checkpoint /ckpt/corpus \
        --threshold 1.0 --bands 16 --num-hashes 64 --shingle-k 5

First run creates both tables from the source schema (columns: doc_id
long, text string, plus any payload). Re-runs resume from the
checkpoint; redelivered micro-batches short-circuit on their markers.
LSH parameters are baked into the index — pass the SAME values for the
table's whole lifetime.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="parquet dir to tail")
    p.add_argument("--docs-table", required=True)
    p.add_argument("--index-table", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=1.0)
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--num-hashes", type=int, default=64)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--mode", choices=["cow", "mor"], default="mor")
    p.add_argument("--continuous", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming.dedup_stream import (
        dedup_stream_into_table,
    )

    spark = SparkSession.builder.appName("dedup-stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sample = spark.read.parquet(args.source)
    # load-or-create each table INDIVIDUALLY: a crash between the two
    # creates must not brick the job (and a genuinely corrupt manifest
    # must surface, not be silently re-created over)
    from synapse_etl_jobs_spark.lake.fs import filesystem_for

    def load_or_create(path, maker):
        fs = filesystem_for(path, spark)
        if fs.exists(os.path.join(path, "_manifests")):
            return LakeTable.load(spark, path)
        return maker()

    from pyspark.sql.types import StructType

    # digest columns included (create_dedup_tables(store_digests=True)
    # parity): threshold-1.0 verification then runs off index rows
    # alone, never scanning the corpus table per micro-batch
    ix_schema = (
        StructType()
        .add(args.id_col, sample.schema[args.id_col].dataType)
        .add("band", "integer")
        .add("bucket", "long")
        .add("_dg", "string")
        .add("_batch", "long")
    )
    # the corpus carries each row's own digest too: the ghost-confirm
    # point read then compares stored digests instead of re-shingling
    docs_schema = StructType.fromJson(sample.schema.jsonValue()).add(
        "_dg", "string"
    )
    docs = load_or_create(
        args.docs_table,
        lambda: LakeTable.create(
            spark, args.docs_table, docs_schema, [args.id_col],
            num_buckets=args.buckets, write_mode=args.mode,
        ),
    )
    index = load_or_create(
        args.index_table,
        lambda: LakeTable.create(
            spark, args.index_table, ix_schema, [args.id_col, "band"],
            num_buckets=args.buckets, write_mode=args.mode,
        ),
    )

    stream = spark.readStream.schema(sample.schema).parquet(args.source)
    query = dedup_stream_into_table(
        docs, index, stream, args.checkpoint,
        id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold, shingle_k=args.shingle_k,
        num_hashes=args.num_hashes, bands=args.bands, seed=args.seed,
        trigger_once=not args.continuous,
    )
    if args.continuous:
        # keep the process alive: returning here would tear down the
        # JVM and kill the "continuous" stream within milliseconds
        query.awaitTermination()
    docs = LakeTable.load(spark, args.docs_table)
    print(json.dumps({
        "docs_table": args.docs_table,
        "table_version": docs.manifest.table_version,
        "corpus_rows": docs.read().count(),
    }))


if __name__ == "__main__":
    main()
