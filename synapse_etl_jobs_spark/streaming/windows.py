"""Event-time windowed aggregation — the engine's streaming-analytics
surface (tumbling / sliding / session windows with watermarked late-data
handling).

The reference has no streaming runtime (it approximates a stream with
scheduled batch jobs + bookmarks, src/scripts/glue_jobs/glue_job.py:40-44);
these operators exist because a CDC tailer needs event-time rollups of its
own stream (events/min per repo, lag monitoring) and they complete the
Structured Streaming idiom set: ``F.window``/``F.session_window`` grouped
aggregation works identically on a batch DataFrame (full recompute) and a
streaming one (incremental state), so the SAME pipeline definition serves
backfill and tail — the lambda-architecture unification Structured
Streaming was built for.

Late data: on a stream, ``watermark`` bounds state (rows later than the
bound are dropped); on batch input the watermark is a no-op and every row
counts. Replays therefore reconverge bit-identically as long as the
watermark only drops rows that the LWW merge would also have superseded.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_col: Column,
    aggs: Mapping[str, Column],
    keys: list[str] | None,
    watermark: str | None,
) -> DataFrame:
    """Shared body: optional stream watermark → groupBy(window, keys) →
    flatten the window struct to ``window_start`` / ``window_end`` so
    results are plain-SQL comparable."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    grouped = df.groupBy(window_col.alias("_w"), *(keys or [])).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return grouped.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Mapping[str, Column],
    *,
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows (``F.window``): one row per
    (window, keys)."""
    return _windowed_agg(
        df, ts_col, F.window(F.col(ts_col), duration), aggs, keys, watermark
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Mapping[str, Column],
    *,
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    return _windowed_agg(
        df, ts_col, F.window(F.col(ts_col), duration, slide), aggs, keys, watermark
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Mapping[str, Column],
    *,
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (``F.session_window``): a session closes after
    ``gap`` of event-time silence per key. Streaming requires a watermark
    (state must expire); batch computes exact sessions."""
    return _windowed_agg(
        df, ts_col, F.session_window(F.col(ts_col), gap), aggs, keys, watermark
    )
