"""End-to-end port of the reference's access-record job — its flagship
pipeline (largest mapping, deepest transform chain, behavior pinned by
the reference's own 76-case test corpus).

Reference: /root/reference/src/scripts/glue_jobs/process_access_record.py —
a 24-column ``apply_mapping`` list over ``payload.*`` (lines 199-224,
dual timestamp→(timestamp, partition-date) mapping at 201-203) followed
by a per-record ``transform`` (lines 47-57) chaining: URL → normalized
method signature (prefixed with the HTTP method), user-agent → client
enum, (client, UA) → client version, URL → entity id, epoch-ms →
partition date, and instance zero-padding strip.

Here: one ``select`` for the mapping, then native expressions for the
date/instance scalars and Arrow-batched pandas UDFs for the Python-regex
functions (their semantics differ from Java regex, so they stay in
Python — vectorized, never per-row)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from synapse_etl_jobs_spark.functions.access_record import (
    client_udf, client_version_udf, entity_id_udf,
    normalized_method_signature,
)
from synapse_etl_jobs_spark.functions.scalars import (
    ms_to_partition_date, remove_padded_leading_zeros,
)
from synapse_etl_jobs_spark.operators.mapping import apply_mapping

# Verbatim semantic port of process_access_record.py:199-224.
PROCESS_ACCESS_RECORD_MAPPING: list[tuple[str, str, str, str]] = [
    ("payload.sessionId", "string", "session_id", "string"),
    ("payload.timestamp", "bigint", "timestamp", "timestamp"),
    # dual mapping: same source into a bigint for the partition date
    ("payload.timestamp", "bigint", "record_date", "bigint"),
    ("payload.userId", "bigint", "user_id", "bigint"),
    ("payload.method", "string", "method", "string"),
    ("payload.requestURL", "string", "request_url", "string"),
    ("payload.userAgent", "string", "user_agent", "string"),
    ("payload.host", "string", "host", "string"),
    ("payload.origin", "string", "origin", "string"),
    ("payload.xforwardedFor", "string", "x_forwarded_for", "string"),
    ("payload.via", "string", "via", "string"),
    ("payload.threadId", "bigint", "thread_id", "bigint"),
    ("payload.elapseMS", "bigint", "elapse_ms", "bigint"),
    ("payload.success", "boolean", "success", "boolean"),
    ("payload.stack", "string", "stack", "string"),
    ("payload.instance", "string", "instance", "string"),
    ("payload.vmId", "string", "vm_id", "string"),
    ("payload.returnObjectId", "string", "return_object_id", "string"),
    ("payload.queryString", "string", "query_string", "string"),
    ("payload.responseStatus", "bigint", "response_status", "bigint"),
    ("payload.oauthClientId", "string", "oauth_client_id", "string"),
    ("payload.basicAuthUsername", "string", "basic_auth_username", "string"),
    ("payload.authenticationMethod", "string", "auth_method", "string"),
]


def process_access_records(records: DataFrame) -> DataFrame:
    """The full job: mapping list → derived columns. Output = the 23
    mapped columns + normalized_method_signature, client,
    client_version, entity_id (the reference's transform chain,
    process_access_record.py:47-57), with record_date converted to the
    partition date string and instance zero-strip applied."""
    mapped = apply_mapping(records, PROCESS_ACCESS_RECORD_MAPPING)
    return (
        mapped
        .withColumn(
            "normalized_method_signature",
            normalized_method_signature("method", "request_url"),
        )
        .withColumn("client", client_udf("user_agent"))
        .withColumn(
            "client_version", client_version_udf("client", "user_agent")
        )
        .withColumn("entity_id", entity_id_udf("request_url"))
        .withColumn("record_date", ms_to_partition_date("record_date"))
        .withColumn("instance", remove_padded_leading_zeros("instance"))
    )
