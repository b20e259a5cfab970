"""Incremental/streaming ingestion: replay drivers + exactly-once markers."""

from synapse_etl_jobs_spark.streaming.dedup_stream import (  # noqa: F401
    create_dedup_tables, dedup_stream_into_table,
)
from synapse_etl_jobs_spark.streaming.joins import interval_join  # noqa: F401
from synapse_etl_jobs_spark.streaming.replay import ReplayDriver, stream_into_table  # noqa: F401
from synapse_etl_jobs_spark.streaming.replicate import (  # noqa: F401
    changelog_to_events, replicate_once, replicate_stream,
)
from synapse_etl_jobs_spark.streaming.stateful import stateful_lww_filter  # noqa: F401
from synapse_etl_jobs_spark.streaming.windows import (  # noqa: F401
    session_agg, sliding_agg, tumbling_agg,
)
