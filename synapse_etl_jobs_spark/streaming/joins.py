"""Stream-stream event-time joins (the click-attribution shape).

A CDC tailer often needs to correlate TWO live streams — e.g. change
events against a stream of review approvals, or impressions against
clicks — where a plain equi-join would require unbounded state on both
sides. Structured Streaming's stream-stream join bounds that state with
two ingredients, both mandatory here:

- a watermark on BOTH inputs (how late each stream may be), and
- a time-interval predicate tying the two event times together
  (``right.ts ∈ [left.ts + lower, left.ts + upper]``), which tells the
  state store when a buffered row can never match again and is evicted.

State size is therefore O(events inside the interval window per key),
independent of stream length — the property that lets this run forever
at 10^10-event scale. Without the interval bound Spark would (correctly)
refuse outer joins and buffer inner-join state forever.

Batch/stream parity: the same definition applied to two BATCH frames is
an ordinary equi + range-predicate join (watermarks become no-ops), so
one pipeline definition serves both the live tail and the backfill —
mirroring the rest of the streaming surface (windows.py).

Scale notes (batch mode): the equi-key conjunct keeps Catalyst on a
hash-partitioned join keyed by ``keys`` with the interval as a
post-join filter — never a cartesian; the plan is asserted in
tools/explain_audit-style tests. On streams, Spark plans a
StreamingSymmetricHashJoin partitioned the same way.

Reference parity: the reference's closest construct is sequential batch
jobs joining snapshots by date partition (e.g. Athena backfills joining
file-handle tables on id + date window,
/root/reference/src/scripts/backfill_jobs/backfill_acl_snapshots_athena.sql);
this is the always-on form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str | None = None,
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two (possibly streaming) frames on ``keys`` where the right
    event time falls in ``[left_ts + lower, left_ts + upper]``.

    ``watermark`` is applied to BOTH sides and is REQUIRED when either
    input is a stream (state eviction + outer-join result finalization).
    ``how`` supports ``inner`` and ``left_outer`` (unmatched left rows
    emit once their watermark passes — the "impression with no click"
    case). Non-key, non-ts columns are disambiguated with the given
    prefixes; key columns and both timestamps keep one copy each.
    """
    streaming = left.isStreaming or right.isStreaming
    if streaming and not watermark:
        raise ValueError(
            "stream-stream joins require a watermark (state is unbounded "
            "without one); pass watermark='<delay>'"
        )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how}")

    if watermark:
        if left.isStreaming or not streaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming or not streaming:
            right = right.withWatermark(right_ts, watermark)

    lts, rts = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    payload_l = [c for c in left.columns if c not in keys and c != left_ts]
    payload_r = [c for c in right.columns if c not in keys and c != right_ts]
    l = left.select(
        *keys, F.col(left_ts).alias(lts),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in payload_l],
    )
    r = right.select(
        *keys, F.col(right_ts).alias(rts),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload_r],
    )

    cond = F.lit(True)
    for k in keys:
        cond = cond & (l[k] == r[k])
    cond = cond & (
        F.col(rts) >= F.col(lts) + F.expr(f"INTERVAL {lower}")
    ) & (
        F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {upper}")
    )

    joined = l.join(r, cond, how)
    # one copy of each key column (right copy is null for unmatched left)
    return joined.select(
        *[l[k].alias(k) for k in keys],
        lts, rts,
        *[f"{left_prefix}{c}" for c in payload_l],
        *[f"{right_prefix}{c}" for c in payload_r],
    )
