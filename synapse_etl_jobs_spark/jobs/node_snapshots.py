"""End-to-end port of the reference's node-snapshots job — the proof
that the operator library composes into the reference's real workload.

Reference: /root/reference/src/scripts/glue_jobs/node_snapshots.py —
a 34-column ``apply_mapping`` list (lines 42-80: envelope fields, the
dual snapshotTimestamp→(timestamp, partition-date) mapping at 46-48,
nested ``snapshot.*`` flattening incl. arrays/structs at 49-79) followed
by a per-record ``transform`` (lines 27-38) that (a) converts the
partition key from epoch-ms to a ``yyyy-MM-dd`` date string and (b)
strips the ``syn`` prefix from six id columns.

Here the whole job is TWO vectorized stages — the mapping is one
``select`` (flatten+rename+cast fused into the scan) and the transform
is native column expressions — no per-record Python anywhere. Drift
tolerance is inherited from ``apply_mapping``: a batch missing any
``snapshot.*`` field still produces the full 34-column schema with
typed nulls (the reference's resolveChoice/defaulting behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from synapse_etl_jobs_spark.functions.scalars import (
    ms_to_partition_date, syn_id_string_to_int,
)
from synapse_etl_jobs_spark.operators.mapping import apply_mapping

# Verbatim semantic port of node_snapshots.py:42-80 (source path, source
# type, target name, target type). bigint→timestamp means epoch-ms.
NODE_SNAPSHOTS_MAPPING: list[tuple[str, str, str, str]] = [
    ("changeType", "string", "change_type", "string"),
    ("changeTimestamp", "bigint", "change_timestamp", "timestamp"),
    ("userId", "bigint", "change_user_id", "bigint"),
    ("snapshotTimestamp", "bigint", "snapshot_timestamp", "timestamp"),
    # dual mapping: same source into a bigint for the partition date
    ("snapshotTimestamp", "bigint", "snapshot_date", "bigint"),
    ("snapshot.id", "string", "id", "string"),
    ("snapshot.benefactorId", "string", "benefactor_id", "string"),
    ("snapshot.projectId", "string", "project_id", "string"),
    ("snapshot.parentId", "string", "parent_id", "string"),
    ("snapshot.nodeType", "string", "node_type", "string"),
    ("snapshot.createdOn", "bigint", "created_on", "timestamp"),
    ("snapshot.createdByPrincipalId", "bigint", "created_by", "bigint"),
    ("snapshot.modifiedOn", "bigint", "modified_on", "timestamp"),
    ("snapshot.modifiedByPrincipalId", "bigint", "modified_by", "bigint"),
    ("snapshot.versionNumber", "bigint", "version_number", "bigint"),
    ("snapshot.fileHandleId", "string", "file_handle_id", "string"),
    ("snapshot.name", "string", "name", "string"),
    ("snapshot.versionComment", "string", "version_comment", "string"),
    ("snapshot.versionLabel", "string", "version_label", "string"),
    ("snapshot.alias", "string", "alias", "string"),
    ("snapshot.activityId", "string", "activity_id", "string"),
    ("snapshot.columnModelIds", "array", "column_model_ids", "array"),
    ("snapshot.scopeIds", "array", "scope_ids", "array"),
    ("snapshot.items", "array", "items", "array"),
    ("snapshot.reference", "struct", "reference", "struct"),
    ("snapshot.isSearchEnabled", "boolean", "is_search_enabled", "boolean"),
    ("snapshot.definingSQL", "string", "defining_sql", "string"),
    ("snapshot.isPublic", "boolean", "is_public", "boolean"),
    ("snapshot.isControlled", "boolean", "is_controlled", "boolean"),
    ("snapshot.isRestricted", "boolean", "is_restricted", "boolean"),
    ("snapshot.effectiveArs", "array", "effective_ars", "array"),
    ("snapshot.annotations", "string", "annotations", "string"),
    ("snapshot.derivedAnnotations", "string", "derived_annotations", "string"),
    ("snapshot.internalAnnotations", "string", "internal_annotations", "string"),
    ("snapshot.versionHistory", "array", "version_history", "array"),
    ("snapshot.projectStorageUsage", "struct", "project_storage_usage", "struct"),
]

# the six id columns the reference's transform passes through
# syn_id_string_to_int (node_snapshots.py:31-37)
_SYN_ID_COLUMNS = (
    "id", "benefactor_id", "project_id", "parent_id",
    "file_handle_id", "activity_id",
)


def node_snapshots(events: DataFrame) -> DataFrame:
    """The full job: mapping list → partition-date conversion → syn-id
    normalization. Input is the raw change-event envelope (nested
    ``snapshot`` struct); output is the flat snapshot table the
    reference writes, partitionable by ``snapshot_date``."""
    mapped = apply_mapping(events, NODE_SNAPSHOTS_MAPPING)
    out = mapped.withColumn(
        "snapshot_date", ms_to_partition_date("snapshot_date")
    )
    for c in _SYN_ID_COLUMNS:
        out = out.withColumn(c, syn_id_string_to_int(c))
    return out
