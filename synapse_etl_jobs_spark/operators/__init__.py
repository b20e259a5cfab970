"""Relational + training-data operators, all DataFrame-first."""

from synapse_etl_jobs_spark.operators.mapping import apply_mapping, with_defaults  # noqa: F401
from synapse_etl_jobs_spark.operators.dedup import dedup_lww, dedup_lww_salted  # noqa: F401
