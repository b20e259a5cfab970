"""Ports of the remaining small snapshot jobs — each is the reference's
mapping list plus its per-record transform, re-expressed as one or two
vectorized stages.

- ``user_profile_snapshots``: 17-entry mapping, first-email selection
  (N3, null-safe), partition date, drop the emails array
  (/root/reference/src/scripts/glue_jobs/user_profile_snapshots.py:22-64).
- ``certified_quiz_question_snapshots``: nested corrections reshape
  (N2: ``snapshot.corrections[*].question.questionIndex`` → flat
  struct array via a transform lambda), created_on drift default from
  the deprecated passedOn (P6), partition date, explode (N1), final
  mapping (/root/reference/src/scripts/glue_jobs/certified_quiz_question_snapshots.py:18-85).
- ``file_download_records``: 12-entry payload mapping, partition date,
  associate-id syn-strip, downloaded_file_handle_id ← file_handle_id
  defaulting (P6)
  (/root/reference/src/scripts/glue_jobs/file_download_records.py:20-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.functions.scalars import (
    first_element, ms_to_partition_date, syn_id_string_to_int,
)
from synapse_etl_jobs_spark.operators.mapping import apply_mapping, with_defaults
from synapse_etl_jobs_spark.operators.nested import explode_array

USER_PROFILE_MAPPING: list[tuple[str, str, str, str]] = [
    ("changeTimestamp", "bigint", "change_timestamp", "timestamp"),
    ("changeType", "string", "change_type", "string"),
    ("userId", "bigint", "change_user_id", "bigint"),
    ("snapshotTimestamp", "bigint", "snapshot_timestamp", "timestamp"),
    ("snapshotTimestamp", "bigint", "snapshot_date", "bigint"),
    ("snapshot.ownerId", "string", "id", "bigint"),
    ("snapshot.userName", "string", "user_name", "string"),
    ("snapshot.firstName", "string", "first_name", "string"),
    ("snapshot.lastName", "string", "last_name", "string"),
    ("snapshot.emails", "array", "emails", "array"),
    ("snapshot.location", "string", "location", "string"),
    ("snapshot.company", "string", "company", "string"),
    ("snapshot.position", "string", "position", "string"),
    ("snapshot.industry", "string", "industry", "string"),
    ("snapshot.createdOn", "bigint", "created_on", "timestamp"),
    ("snapshot.twoFactorAuthEnabled", "boolean", "is_two_factor_auth_enabled", "boolean"),
    ("snapshot.tosAgreements", "array", "tos_agreements", "array"),
]


def user_profile_snapshots(events: DataFrame) -> DataFrame:
    """Mapping → partition date → first-email selection → drop the
    array (the reference's execute+transform,
    user_profile_snapshots.py:19-40)."""
    mapped = apply_mapping(events, USER_PROFILE_MAPPING)
    return (
        mapped
        .withColumn("snapshot_date", ms_to_partition_date("snapshot_date"))
        .withColumn("email", first_element("emails"))
        .drop("emails")
    )


QUIZ_QUESTION_OUTPUT_MAPPING: list[tuple[str, str, str, str]] = [
    ("changeTimestamp", "bigint", "change_timestamp", "timestamp"),
    ("changeType", "string", "change_type", "string"),
    ("snapshot.userId", "string", "change_user_id", "bigint"),
    ("snapshotTimestamp", "bigint", "snapshot_timestamp", "timestamp"),
    ("stack", "string", "stack", "string"),
    ("instance", "string", "instance", "string"),
    ("snapshot.responseId", "int", "response_id", "bigint"),
    ("correction.questionIndex", "int", "question_index", "bigint"),
    ("correction.isCorrect", "boolean", "is_correct", "boolean"),
    ("snapshot_date", "string", "snapshot_date", "date"),
    ("created_on", "bigint", "created_on", "timestamp"),
]


def certified_quiz_question_snapshots(events: DataFrame) -> DataFrame:
    """Corrections reshape (transform lambda over the nested array) →
    created_on drift default (coalesce with the deprecated passedOn;
    records predating the field entirely fall back too) → partition
    date → explode to one row per correction → output mapping."""
    snap_fields = {
        f.name for f in events.schema["snapshot"].dataType.fields
    }
    created = (
        F.coalesce(F.col("snapshot.createdOn"), F.col("snapshot.passedOn"))
        if "createdOn" in snap_fields
        else F.col("snapshot.passedOn")
    )
    pre = (
        events
        .withColumn(
            "corrections",
            F.transform(
                F.col("snapshot.corrections"),
                lambda c: F.struct(
                    c["question"]["questionIndex"].alias("questionIndex"),
                    c["isCorrect"].alias("isCorrect"),
                ),
            ),
        )
        .withColumn("snapshot_date", ms_to_partition_date("snapshotTimestamp"))
        .withColumn("created_on", created)
    )
    exploded = explode_array(pre, "corrections", "correction")
    return apply_mapping(exploded, QUIZ_QUESTION_OUTPUT_MAPPING)


FILE_DOWNLOAD_MAPPING: list[tuple[str, str, str, str]] = [
    ("payload.userId", "bigint", "user_id", "bigint"),
    ("timestamp", "bigint", "timestamp", "timestamp"),
    ("timestamp", "bigint", "record_date", "bigint"),
    ("payload.projectId", "bigint", "project_id", "bigint"),
    ("payload.fileHandleId", "string", "file_handle_id", "bigint"),
    ("payload.downloadedFileHandleId", "string", "downloaded_file_handle_id", "bigint"),
    ("payload.associateType", "string", "association_object_type", "string"),
    ("payload.associateId", "string", "association_object_id", "string"),
    ("payload.sessionId", "string", "session_id", "string"),
    ("stack", "string", "stack", "string"),
    ("instance", "string", "instance", "string"),
]


def file_download_records(events: DataFrame) -> DataFrame:
    """Mapping → partition date → associate-id syn-strip →
    downloaded_file_handle_id ← file_handle_id defaulting (covers both
    a null value and the field being absent from the batch entirely —
    apply_mapping nulls missing sources)."""
    mapped = apply_mapping(events, FILE_DOWNLOAD_MAPPING)
    out = (
        mapped
        .withColumn("record_date", ms_to_partition_date("record_date"))
        .withColumn(
            "association_object_id",
            syn_id_string_to_int("association_object_id"),
        )
    )
    return with_defaults(
        out, {"downloaded_file_handle_id": F.col("file_handle_id")}
    )
