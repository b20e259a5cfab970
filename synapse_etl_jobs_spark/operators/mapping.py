"""Schema-driven projection: the engine's ``apply_mapping`` (reference P1).

The reference's central transform is Glue's ``apply_mapping`` — a list of
``(source, source_type, target, target_type)`` tuples that flattens nested
fields, renames, casts, and may map one source column to several targets
with different types (src/scripts/glue_jobs/glue_job.py:63-68; 24-column
example process_access_record.py:199-224; dual mapping of one timestamp
into both a ``timestamp`` and a partition-date ``bigint``
node_snapshots.py:46-48).

Here it is ONE ``select`` — Catalyst folds the flatten+rename+cast into the
scan, so column pruning reaches the parquet reader (check ``ReadSchema`` in
``df.explain``). Nested access uses ``F.col("a.b.c")``; epoch-ms → timestamp
uses ``timestamp_millis`` (Glue's bigint→timestamp cast semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Glue type name → Spark SQL type name (identity for most).
_TYPE_ALIASES = {
    "bigint": "long",
    "int": "integer",
    "integer": "integer",
    "smallint": "short",
    "tinyint": "byte",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "date": "date",
}


def _cast(col: Column, src_type: str, dst_type: str) -> Column:
    src, dst = src_type.lower(), dst_type.lower()
    if src in ("bigint", "long", "int", "integer") and dst == "timestamp":
        # Glue interprets bigint→timestamp as epoch milliseconds.
        return F.timestamp_millis(col.cast("long"))
    if src == "timestamp" and dst in ("bigint", "long"):
        return F.unix_millis(col.cast("timestamp"))  # NTZ-tolerant (UTC session)
    if dst in ("array", "struct", "choice") or src == dst:
        return col  # keep as-is; complex shapes are handled by the caller
    return col.cast(_TYPE_ALIASES.get(dst, dst))


def apply_mapping(
    df: DataFrame,
    mapping: Sequence[tuple[str, str, str, str]],
    *,
    keep_missing_as_null: bool = True,
) -> DataFrame:
    """Project ``df`` to exactly the mapped columns.

    ``mapping`` rows are ``(src_path, src_type, dst_name, dst_type)``.
    A source path absent from the schema yields a typed null column when
    ``keep_missing_as_null`` (the reference tolerates drift by defaulting
    missing fields per record — P6; here missing-at-schema-level becomes a
    null column, value-level defaulting is ``with_defaults``).
    """
    def has_path(path: str) -> bool:
        parts = path.split(".")
        schema = df.schema
        for p in parts:
            names = {f.name: f for f in schema.fields}
            if p not in names:
                return False
            dt = names[p].dataType
            schema = dt if hasattr(dt, "fields") else None
            if schema is None and p != parts[-1]:
                return False
        return True

    cols: list[Column] = []
    for src, src_t, dst, dst_t in mapping:
        if has_path(src):
            cols.append(_cast(F.col(src), src_t, dst_t).alias(dst))
        elif keep_missing_as_null:
            # use the REAL target type so present/absent batches produce
            # the same schema (string-nulling a decimal(10,2) would break
            # later unionByName/MERGE); bare complex keywords have no
            # parseable type — fall back to string for those only
            dst_l = dst_t.lower()
            spark_t = (
                "string"
                if dst_l in ("array", "struct", "choice")
                else _TYPE_ALIASES.get(dst_l, dst_t)
            )
            cols.append(F.lit(None).cast(spark_t).alias(dst))
        else:
            raise ValueError(f"mapping source not in schema: {src}")
    return df.select(*cols)


def with_defaults(df: DataFrame, defaults: dict[str, Column]) -> DataFrame:
    """Value-level drift defaulting (reference P6): for each ``col → expr``,
    replace nulls with the fallback expression.

    Mirrors e.g. ``downloaded_file_handle_id ← file_handle_id``
    (file_download_records.py:31-32) and ``certified ← passed``
    (certified_quiz_snapshots.py:28-38) — expressed as ``coalesce`` so it
    stays in codegen.
    """
    out = df
    for name, fallback in defaults.items():
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), fallback))
        else:
            out = out.withColumn(name, fallback)
    return out
