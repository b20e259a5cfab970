"""Port of the access-record BACKFILL script — the inverse of the
process-access-record job: flat old-warehouse CSV columns are folded
INTO the ``payload`` struct envelope, the partition fields are derived
from the payload timestamp, and the result is written gzip-JSON
partitioned by year/month/day.

Reference: /root/reference/src/scripts/backfill_jobs/backfill_process_access_record.py
— ApplyMapping of 23 flat string columns into ``payload.*`` with casts
(:47-75), a per-record transform promoting stack/instance/timestamp to
the envelope and computing ``'%02d'``-padded month/day from the UTC
timestamp (:17-26), repartition + partitioned write (:79-88).

Spark-first: the mapping is one ``select`` building the typed struct
(the dotted-target ApplyMapping IS struct construction), the partition
fields are column arithmetic, zero per-row Python. The reference's
``repartition(1)`` (:79) is dropped deliberately — at scale a
single-task write is the bottleneck and nothing downstream depends on
file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.functions.scalars import (
    millis_to_timestamp, year_month_day,
)

# (source_col, payload_field, cast_type) — backfill_process_access_record.py:49-73
_PAYLOAD_MAPPING: list[tuple[str, str, str]] = [
    ("session_id", "sessionId", "string"),
    ("timestamp", "timestamp", "bigint"),
    ("user_id", "userId", "bigint"),
    ("method", "method", "string"),
    ("request_url", "requestURL", "string"),
    ("user_agent", "userAgent", "string"),
    ("host", "host", "string"),
    ("origin", "origin", "string"),
    ("via", "via", "string"),
    ("thread_id", "threadId", "bigint"),
    ("elapse_ms", "elapseMS", "bigint"),
    ("success", "success", "boolean"),
    ("stack", "stack", "string"),
    ("instance", "instance", "string"),
    ("date", "date", "string"),
    ("vm_id", "vmId", "string"),
    ("return_object_id", "returnObjectId", "string"),
    ("query_string", "queryString", "string"),
    ("response_status", "responseStatus", "bigint"),
    ("oauth_client_id", "oauthClientId", "string"),
    ("basic_auth_username", "basicAuthUsername", "string"),
    ("auth_method", "authenticationMethod", "string"),
    ("x_forwarded_for", "xforwardedFor", "string"),
]


def backfill_access_records(
    spark: SparkSession,
    source_df: DataFrame,
    destination_path: str,
) -> DataFrame:
    """Run the backfill over a pre-filtered source (the caller applies
    the release_number pushdown predicate via ``Catalog.table``,
    matching the reference's from_catalog read :40-44). Returns the
    destination read-back."""
    payload = F.struct(
        *[
            F.col(src).cast(t).alias(dst)
            for src, dst, t in _PAYLOAD_MAPPING
        ]
    ).alias("payload")
    ts_ms = F.col("timestamp").cast("bigint")
    ts = millis_to_timestamp(ts_ms)
    # the reference stores year as an INT but month/day as '%02d'-padded
    # strings (:23-25) — so the helper's string year is discarded for
    # F.year() below
    _, m, d = year_month_day(ts)
    out = source_df.select(
        payload,
        F.col("stack").cast("string").alias("stack"),
        F.col("instance").cast("string").alias("instance"),
        ts_ms.alias("timestamp"),
        F.year(ts).alias("year"),
        m, d,
    )
    (
        out.write.mode("append")
        .partitionBy("year", "month", "day")
        .option("compression", "gzip")
        .json(destination_path)
    )
    # partition-discovery read-back (basePath, as the sibling
    # file-download backfills) so year/month/day come back as columns;
    # the explicit writer schema pins their TYPES — inference would cast
    # the '%02d' month/day directory values to ints and break the
    # reference's zero-padded-string contract
    return (
        spark.read.schema(out.schema)
        .option("basePath", destination_path)
        .json(destination_path)
    )
