"""Ports of the remaining Python backfill scripts: the old-data-warehouse
file-download union job and the kinesis file-download reshape.

Reference:

- /root/reference/src/scripts/backfill_jobs/backfill_old_dataware_house_file_download_records.py
  — the reference's most complex script: two catalog sources read with a
  (release_number, record_date range) pushdown predicate, a per-record
  ``json.loads`` map on EACH (bulk downloads carry a ``fileSummary``
  array that is exploded and filtered to ``re.match("SUCCESS", status)``
  rows; single downloads carry a ``downloadedFile`` struct), common
  fields injected (stack, zero-strip instance, ms→date record_date),
  two ApplyMappings, a DataFrame union, resolveChoice('match_catalog'),
  and a partitioned write (:89-181).
- /root/reference/src/scripts/backfill_jobs/backfill_kinesis_file_download_records.py
  — rename/cast mapping + two derived fields + partitioned write (:34-72).

Spark-first shape: the three per-record ``json.loads`` transforms are
ONE ``from_json`` each with explicit schemas (drift-tolerant: absent
keys parse to typed nulls, the get_key_from_json_payload semantics);
the explode is native; the regex filter is ``rlike``; everything stays
in whole-stage codegen with zero per-row Python. The union is by NAME
(the reference unions positionally over identically-mapped frames —
same result, name-matching is just safer), and the final cast to the
destination schema is the resolveChoice('match_catalog') contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.functions.scalars import (
    millis_to_timestamp, remove_padded_leading_zeros,
)

# transform_bulk_download's json.loads target (:24-44): fileSummary is
# an array of per-file structs; userId / resultZipFileHandleId ride the
# envelope
_BULK_JSON = (
    "userId bigint, resultZipFileHandleId string, "
    "fileSummary array<struct<fileHandleId:string,associateObjectId:string,"
    "associateObjectType:string,status:string>>"
)

# transform_download's json.loads target (:53-67)
_FILE_JSON = (
    "userId bigint, resultZipFileHandleId string, "
    "downloadedFile struct<fileHandleId:string,associateObjectId:string,"
    "associateObjectType:string>"
)

# the destination's column order (bulk_final_frame mapping :127-142)
_OUT_COLS = [
    "timestamp", "stack", "instance", "record_date", "user_id",
    "project_id", "downloaded_file_handle_id", "file_handle_id",
    "association_object_id", "association_object_type",
]


def _common_fields(df: DataFrame, stack: str, release_number: str) -> DataFrame:
    """add_common_fields (:70-85): stack/instance injection, epoch-ms
    record_date, null project_id; userId and resultZipFileHandleId come
    from the parsed JSON column ``_j`` added by the caller."""
    return (
        df.withColumn("stack", F.lit(stack))
        .withColumn(
            "instance",
            remove_padded_leading_zeros(F.lit(release_number)),
        )
        .withColumn("user_id", F.col("_j.userId"))
        .withColumn(
            "downloaded_file_handle_id", F.col("_j.resultZipFileHandleId")
        )
        .withColumn("project_id", F.lit(None).cast("long"))
        .withColumn(
            "record_date",
            F.to_date(millis_to_timestamp(F.col("timestamp"))),
        )
    )


def backfill_old_dwh_file_downloads(
    spark: SparkSession,
    bulk_df: DataFrame,
    file_df: DataFrame,
    destination_path: str,
    *,
    stack: str = "prod",
    release_number: str = "000000123",
) -> DataFrame:
    """Run the old-data-warehouse backfill over two pre-filtered sources
    (each needs columns ``timestamp bigint, json string`` — the caller
    applies the release/date pushdown predicate via ``Catalog.table``,
    matching the reference's from_catalog reads :89-101). Writes
    record_date-partitioned parquet; returns the destination read-back.
    """
    bulk = _common_fields(
        bulk_df.withColumn("_j", F.from_json("json", _BULK_JSON)),
        stack, release_number,
    )
    # gs_explode + re.match("SUCCESS", status) filter (:121-125)
    bulk_out = (
        bulk.withColumn("payload", F.explode("_j.fileSummary"))
        .filter(F.col("payload.status").rlike("^SUCCESS"))
        .select(
            millis_to_timestamp("timestamp").alias("timestamp"),
            "stack", "instance", "record_date",
            F.col("user_id").cast("long").alias("user_id"),
            F.col("project_id").cast("long").alias("project_id"),
            "downloaded_file_handle_id",
            F.col("payload.fileHandleId").alias("file_handle_id"),
            F.col("payload.associateObjectId").alias("association_object_id"),
            F.col("payload.associateObjectType").alias("association_object_type"),
        )
    )
    file = _common_fields(
        file_df.withColumn("_j", F.from_json("json", _FILE_JSON)),
        stack, release_number,
    )
    file_out = file.select(
        millis_to_timestamp("timestamp").alias("timestamp"),
        "stack", "instance", "record_date",
        F.col("user_id").cast("long").alias("user_id"),
        F.col("project_id").cast("long").alias("project_id"),
        "downloaded_file_handle_id",
        F.col("_j.downloadedFile.fileHandleId").alias("file_handle_id"),
        F.col("_j.downloadedFile.associateObjectId").alias("association_object_id"),
        F.col("_j.downloadedFile.associateObjectType").alias("association_object_type"),
    )
    out = bulk_out.select(_OUT_COLS).unionByName(file_out.select(_OUT_COLS))
    out.write.mode("append").partitionBy("record_date").parquet(destination_path)
    return spark.read.option("basePath", destination_path).parquet(destination_path)


def backfill_kinesis_file_downloads(
    spark: SparkSession,
    source_df: DataFrame,
    destination_path: str,
) -> DataFrame:
    """The kinesis file-download backfill (:42-72): rename/cast mapping,
    a null downloaded_file_handle_id, record_date derived from the
    event timestamp, record_date-partitioned write.

    The reference repartitions to 1 before writing (:62) because Glue's
    writer created one small file per task on a tiny backfill; here the
    write stays parallel — at 10^10 rows a single-task write IS the
    bottleneck, and downstream reads never depend on file count.
    """
    out = source_df.select(
        F.col("userid").cast("long").alias("user_id"),
        F.col("timestamp").cast("timestamp").alias("timestamp"),
        F.col("projectid").cast("long").alias("project_id"),
        F.col("filehandleid").cast("string").alias("file_handle_id"),
        F.col("associatetype").cast("string").alias("association_object_type"),
        F.col("associateid").cast("string").alias("association_object_id"),
        F.col("stack").cast("string").alias("stack"),
        F.col("instance").cast("string").alias("instance"),
        F.lit(None).cast("string").alias("downloaded_file_handle_id"),
        F.to_date(F.col("timestamp")).alias("record_date"),
    )
    out.write.mode("append").partitionBy("record_date").parquet(destination_path)
    return spark.read.option("basePath", destination_path).parquet(destination_path)
