"""Sources: schema-on-read file scans + the deterministic CDC synthesizer."""

from synapse_etl_jobs_spark.sources.synth import synth_change_events  # noqa: F401
from synapse_etl_jobs_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_json,
    with_provenance,
)
