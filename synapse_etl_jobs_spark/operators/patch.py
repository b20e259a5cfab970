"""Partial-column CDC updates: collapse patch events into full rows.

Real change streams often carry only the columns an UPDATE touched —
Debezium partial ``after`` images, DynamoDB streams' update masks,
JSON-merge-patch feeds. The reference's snapshot jobs sidestep this by
always shipping full rows (``/root/reference/src/scripts/glue_jobs/
glue_job.py:63-76`` re-snapshots whole records); a CDC engine has to
take the sparse form. This module gives the lake's LWW merge path
Paimon-style *partial-update* merge-engine semantics, expressed as ONE
Spark aggregation — no per-row Python, no window over the table.

Event contract (envelope on top of the payload columns):

- ``op = 'UPSERT'``  — full row: every payload column is set;
- ``op = 'PATCH'``   — sets exactly the columns named in ``set_col``
  (an ``array<string>``); other payload columns are ignored (their
  values in the event are meaningless, NOT "set to null" — to null a
  column, name it in ``set_col`` and carry null);
- ``op = 'DELETE'``  — removes the key; later events re-create it from
  an empty row.

Collapse semantics per key, over events ordered by ``seq``:

- the latest DELETE resets the row: writes at or before it are dead;
- each payload column independently takes the value of the LATEST event
  after that reset in which it was set (per-column last-writer-wins);
- the key survives iff any non-DELETE event follows the last DELETE.

This is exactly "apply the events one by one in seq order", computed as
a single ``groupBy(keys)`` with map-side partial aggregation: per column
``max(struct(seq, value)) FILTER (WHERE set)`` plus the max DELETE /
non-DELETE seqs — a few bytes of state per (key, column) per scan
partition, so a hot key never concentrates raw events on one reducer.
Events with a null ``seq`` are dropped up front (same malformed-input
rule the stateful LWW filter pins: an unordered event can never win).

Besides the collapsed values, the output carries the CRDT state the
lake's ``merge_patches`` persists per key — per-column winner seqs
(``_colseq_<c>``) and the batch's max DELETE seq (``_bdel``) — which is
what makes patch application ORDER-INSENSITIVE across batches: merging
two collapsed states is a pointwise max, so replaying batches in any
order converges to the same table state (see ``LakeTable.merge_patches``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEL_SEQ = "_del_seq"
_LIVE_SEQ = "_live_seq"


def set_flag_col(c: str) -> str:
    """Name of the boolean "this batch sets column ``c``" output column."""
    return f"_set_{c}"


def col_seq_col(c: str) -> str:
    """Name of the per-column winner-seq output column (the seq of the
    latest in-batch event that set ``c`` after the batch's last DELETE;
    null when the batch leaves ``c`` unset)."""
    return f"_colseq_{c}"


def collapse_patches(
    events: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    set_col: str = "set_cols",
) -> DataFrame:
    """Reduce a patch-event batch to one row per key.

    Returns columns: ``key_cols``, ``seq`` (max event seq for the key),
    ``op`` ('UPSERT' or 'DELETE'), each payload column (its collapsed
    value, null when unset), ``_set_<col>`` booleans marking which
    payload columns the batch actually set after its last DELETE,
    ``_colseq_<col>`` (the winning set-event's seq, null when unset —
    the per-column half of the CRDT state ``merge_patches`` persists),
    ``_bdel`` (the batch's max DELETE seq, null if none), ``_btouch``
    (the batch's max non-DELETE seq — key existence), and ``_wipe_base``
    (true when the batch contains a DELETE — within-batch shorthand for
    ``_bdel IS NOT NULL``).
    """
    from synapse_etl_jobs_spark.operators.dedup import _contains_map

    keys = list(key_cols)
    seq = F.col(seq_col).cast("long")
    op = F.upper(F.col(op_col))
    is_del = op == "DELETE"

    # map-containing columns can't ride an ordering struct
    # (INVALID_ORDERING_TYPE) — serialize them to JSON inside the
    # per-column winner struct and decode after the winner is picked,
    # exactly as dedup_lww does for whole-row LWW
    unorderable = {
        c for c in payload_cols if _contains_map(events.schema[c].dataType)
    }

    aggs = [
        F.max(F.when(is_del, seq)).alias(_DEL_SEQ),
        F.max(F.when(~is_del, seq)).alias(_LIVE_SEQ),
    ]
    for c in payload_cols:
        sets_c = (op == "UPSERT") | (
            (op == "PATCH") & F.array_contains(F.col(set_col), c)
        )
        v = F.to_json(F.col(c)) if c in unorderable else F.col(c)
        aggs.append(
            F.max(
                F.when(sets_c, F.struct(seq.alias("s"), v.alias("v")))
            ).alias(f"_w_{c}")
        )

    g = events.filter(seq.isNotNull()).groupBy(*keys).agg(*aggs)

    # a write is live iff it happened after the batch's last DELETE
    after_del = lambda s: (  # noqa: E731
        F.col(_DEL_SEQ).isNull() | (s > F.col(_DEL_SEQ))
    )
    is_delete = F.col(_LIVE_SEQ).isNull() | ~after_del(F.col(_LIVE_SEQ))

    out_cols = [F.col(k) for k in keys]
    out_cols.append(
        F.greatest(F.col(_LIVE_SEQ), F.col(_DEL_SEQ)).alias("seq")
    )
    out_cols.append(
        F.when(is_delete, F.lit("DELETE")).otherwise(F.lit("UPSERT")).alias("op")
    )
    for c in payload_cols:
        w = F.col(f"_w_{c}")
        set_c = w.isNotNull() & after_del(w["s"]) & ~is_delete
        v = w["v"]
        if c in unorderable:
            v = F.from_json(v, events.schema[c].dataType)
        out_cols.append(F.when(set_c, v).alias(c))
        out_cols.append(set_c.alias(set_flag_col(c)))
        out_cols.append(F.when(set_c, w["s"]).alias(col_seq_col(c)))
    out_cols.append(F.col(_DEL_SEQ).alias("_bdel"))
    # max non-DELETE event seq — key existence under the contract is
    # "any non-DELETE event after the last DELETE", which an empty-set
    # PATCH satisfies without setting a single column
    out_cols.append(F.col(_LIVE_SEQ).alias("_btouch"))
    out_cols.append(F.col(_DEL_SEQ).isNotNull().alias("_wipe_base"))
    return g.select(*out_cols)
