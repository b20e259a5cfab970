"""Worked ports of complete reference jobs, composed from the operator
library (mapping → transforms → partition columns)."""

from synapse_etl_jobs_spark.jobs.node_snapshots import (
    NODE_SNAPSHOTS_MAPPING, node_snapshots,
)
from synapse_etl_jobs_spark.jobs.process_access_record import (
    PROCESS_ACCESS_RECORD_MAPPING, process_access_records,
)

__all__ = [
    "NODE_SNAPSHOTS_MAPPING", "node_snapshots",
    "PROCESS_ACCESS_RECORD_MAPPING", "process_access_records",
]
