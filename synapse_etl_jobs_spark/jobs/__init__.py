"""Worked ports of complete reference jobs, composed from the operator
library (mapping → transforms → partition columns)."""

from synapse_etl_jobs_spark.jobs.node_snapshots import (
    NODE_SNAPSHOTS_MAPPING, node_snapshots,
)
from synapse_etl_jobs_spark.jobs.process_access_record import (
    PROCESS_ACCESS_RECORD_MAPPING, process_access_records,
)
from synapse_etl_jobs_spark.jobs.snapshot_jobs import (
    FILE_DOWNLOAD_MAPPING, QUIZ_QUESTION_OUTPUT_MAPPING,
    USER_PROFILE_MAPPING, certified_quiz_question_snapshots,
    file_download_records, user_profile_snapshots,
)

from synapse_etl_jobs_spark.jobs.registry import (
    JOB_SPECS, SnapshotJobSpec, build_job, run_job,
)

__all__ = [
    "JOB_SPECS", "SnapshotJobSpec", "build_job", "run_job",
    "NODE_SNAPSHOTS_MAPPING", "node_snapshots",
    "PROCESS_ACCESS_RECORD_MAPPING", "process_access_records",
    "USER_PROFILE_MAPPING", "user_profile_snapshots",
    "QUIZ_QUESTION_OUTPUT_MAPPING", "certified_quiz_question_snapshots",
    "FILE_DOWNLOAD_MAPPING", "file_download_records",
]
