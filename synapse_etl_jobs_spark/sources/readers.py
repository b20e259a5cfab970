"""File sources with the reference's scan semantics (SURVEY.md S1-S6).

The reference reads multiline JSON and quoted headerless CSV from S3 via
Glue DynamicFrames with schema-on-read (glue_job.py:47-60,
backfill_node_snapshots.py:28-43). Here: native Spark readers with an
EXPLICIT schema by default — at 100 TB, schema inference is a full extra
pass over the data; pass ``schema=None`` only for exploration. Corrupt
records are routed to ``_corrupt_record`` (PERMISSIVE) instead of the
reference's silent drop-in-Python (quarantine, SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    multiline: bool = False,
    recursive: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON scan (S1). ``multiline=True`` matches the Glue option; note
    multiline JSON files are NOT splittable — one task per file — so
    line-delimited JSON is strongly preferred at scale."""
    reader = spark.read.option("recursiveFileLookup", str(recursive).lower())
    reader = reader.option("multiLine", str(multiline).lower())
    reader = reader.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", corrupt_col
    )
    if schema is not None:
        if corrupt_col not in schema.fieldNames():
            schema = StructType(schema.fields[:]).add(corrupt_col, "string", True)
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    header: bool = False,
    quote: str = '"',
    sep: str = ",",
    multiline: bool = True,
    recursive: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan (S2): quoted, headerless, multiline, recursive — the
    backfill reader (backfill_node_snapshots.py:28-43, ``recurse``
    connection option). Malformed rows are routed to ``corrupt_col``
    (PERMISSIVE) like the JSON scan, feeding ``quarantine_split``
    instead of silently becoming all-null rows."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("recursiveFileLookup", str(recursive).lower())
        .option("quote", quote)
        .option("sep", sep)
        .option("multiLine", str(multiline).lower())
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        if corrupt_col not in schema.fieldNames():
            schema = StructType(schema.fields[:]).add(corrupt_col, "string", True)
        reader = reader.schema(schema)
    return reader.csv(path)


def with_provenance(df: DataFrame, col_name: str = "filename") -> DataFrame:
    """File-provenance column (S6): source file per row, feeding lineage
    (reference: ``input_file_name()``, backfill_node_snapshots.py:46)."""
    return df.withColumn(col_name, F.input_file_name())


def quarantine_split(df: DataFrame, corrupt_col: str = "_corrupt_record"):
    """(good, bad) split — bad records routed to a quarantine sink instead
    of silently dropped (reference drops them in Python try/except,
    backfill_kinesis_file_download_records.py:26-30)."""
    if corrupt_col not in df.columns:
        return df, None
    df = df.cache()  # both branches scan once
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return good, bad
