"""End-to-end port of the node-snapshots BACKFILL script — the
reference's script-style lifecycle (§3.2 of SURVEY.md): headerless
quoted CSV scan with file-name provenance → 3-column mapping → JSON
parse of the snapshot payload with required-field defaulting →
changeType derivation / DELETE handling → filename-derived partition
fields → partitioned gzip-JSON write.

Reference: /root/reference/src/scripts/backfill_jobs/backfill_node_snapshots.py
(CSV scan :28-43, provenance :46, mapping :52-60, populate_fields
:64-97, add_partition_fields :101-107, drop+write :111-124).

Everything here is native expressions: the per-record ``json.loads`` +
field defaulting becomes ``from_json`` with an explicit schema (absent
fields parse to typed nulls — the same defaulting, schema-level), the
ISO-8601 parsing and the ≥1s changeType rule are column arithmetic, and
the filename date comes from the provenance column. No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.functions.scalars import (
    filename_to_date, iso8601_to_millis, remove_padded_leading_zeros,
    year_month_day,
)
from synapse_etl_jobs_spark.operators.mapping import apply_mapping
from synapse_etl_jobs_spark.sources.readers import read_csv, with_provenance

# the backfill's required snapshot fields (populate_fields:66-73);
# absent JSON keys land as typed nulls via from_json
SNAPSHOT_SCHEMA = (
    "id string, name string, description string, parentId string, "
    "createdByPrincipalId bigint, createdOn string, "
    "modifiedByPrincipalId bigint, modifiedOn string, nodeType string, "
    "versionNumber bigint, versionComment string, versionLabel string, "
    "isLatestVersion boolean, activityId string, fileHandleId string, "
    "columnModelIds array<string>, scopeIds array<string>, "
    "items array<string>, reference string, alias string, "
    "isSearchEnabled boolean, definingSQL string, isPublic boolean, "
    "isRestricted boolean, isControlled boolean, benefactorId string, "
    "projectId string, etag string"
)


def backfill_node_snapshots(
    spark: SparkSession,
    source_path: str,
    destination_path: str,
    *,
    release_number: str,
    stack: str = "prod",
    node_record_type: str = "noderecord",
) -> DataFrame:
    """Run the backfill: read the CSV drop under ``source_path``,
    reshape into the change-event envelope, write partitioned gzip
    NDJSON under ``destination_path``, and return the written frame
    (lazy re-read) for inspection.

    ``node_record_type='deletednode'`` emits changeType=DELETE with a
    null userId, exactly like the reference (:92-94)."""
    raw = read_csv(spark, source_path, schema=None, header=False,
                   multiline=True, recursive=True)
    named = with_provenance(raw)  # adds `filename`
    mapped = apply_mapping(named, [
        ("_c0", "string", "changeTimestamp", "bigint"),
        ("_c2", "string", "snapshot_raw", "string"),
        ("filename", "string", "filename", "string"),
    ])
    snap = F.from_json(F.col("snapshot_raw"), SNAPSHOT_SCHEMA)
    created_ms = iso8601_to_millis(snap["createdOn"])
    modified_ms = iso8601_to_millis(snap["modifiedOn"])
    if node_record_type == "noderecord":
        user_id = snap["modifiedByPrincipalId"]
        change_type = F.when(
            (modified_ms - created_ms) / 1000.0 >= 1, F.lit("UPDATE")
        ).otherwise(F.lit("CREATE"))
        created_out, modified_out = created_ms, modified_ms
    elif node_record_type == "deletednode":
        user_id = F.lit(None).cast("long")
        change_type = F.lit("DELETE")
        # the reference leaves deletednode timestamps as the raw strings
        created_out = snap["createdOn"].cast("string")
        modified_out = snap["modifiedOn"].cast("string")
    else:
        raise ValueError(f"unknown node record type: {node_record_type}")

    fdate = filename_to_date("filename")
    y, m, d = year_month_day(fdate.cast("timestamp"))
    out = mapped.select(
        F.col("changeTimestamp"),
        change_type.alias("changeType"),
        user_id.alias("userId"),
        F.lit("ENTITY").alias("objectType"),
        F.lit(stack).alias("stack"),
        remove_padded_leading_zeros(F.lit(release_number)).alias("instance"),
        F.struct(
            *[snap[f].alias(f) for f in (
                "id", "name", "description", "parentId",
                "createdByPrincipalId")],
            created_out.alias("createdOn"),
            snap["modifiedByPrincipalId"].alias("modifiedByPrincipalId"),
            modified_out.alias("modifiedOn"),
            *[snap[f].alias(f) for f in (
                "nodeType", "versionNumber", "versionComment",
                "versionLabel", "isLatestVersion", "activityId",
                "fileHandleId", "columnModelIds", "scopeIds", "items",
                "reference", "alias", "isSearchEnabled", "definingSQL",
                "isPublic", "isRestricted", "isControlled",
                "benefactorId", "projectId", "etag")],
        ).alias("snapshot"),
        F.unix_millis(fdate.cast("timestamp")).alias("snapshotTimestamp"),
        y, m, d,
    )
    (
        out.write.partitionBy("year", "month", "day")
        .option("compression", "gzip")
        .mode("append")
        .json(destination_path)
    )
    return spark.read.option("recursiveFileLookup", "true").json(destination_path)
