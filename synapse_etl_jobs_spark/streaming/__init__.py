"""Incremental/streaming ingestion: replay drivers + exactly-once markers."""

from synapse_etl_jobs_spark.streaming.replay import ReplayDriver, stream_into_table  # noqa: F401
