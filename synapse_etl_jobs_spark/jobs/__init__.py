"""Worked ports of complete reference jobs, composed from the operator
library (mapping → transforms → partition columns)."""

from synapse_etl_jobs_spark.jobs.node_snapshots import (
    NODE_SNAPSHOTS_MAPPING, node_snapshots,
)

__all__ = ["NODE_SNAPSHOTS_MAPPING", "node_snapshots"]
