"""Named-table catalog + SQL INSERT surface.

Reference parity:

- S3 — catalog scan with pushdown predicate: Glue jobs read governed
  tables by NAME with a predicate STRING that prunes partitions before
  the scan (``create_dynamic_frame.from_catalog(database, table_name,
  push_down_predicate=...)``,
  /root/reference/src/scripts/backfill_jobs/backfill_kinesis_file_download_records.py:34-39,
  backfill_process_access_record.py:40-44). Here: ``Catalog.table(name,
  push_down_predicate="...")`` — the predicate is parsed into the plan
  before any action, so Catalyst pushes partition-column conjuncts into
  PartitionFilters (directory pruning, no file listing of pruned
  partitions) and the rest into parquet PushedFilters.
- S11 — SQL INSERT into a partitioned table: the Athena backfills are
  ``INSERT INTO backfill.transformed_* SELECT ...``
  (/root/reference/src/scripts/backfill_jobs/backfill_acl_snapshots_athena.sql:67-105).
  Here: ``Catalog.insert_into(name, select_sql)`` — the SELECT runs as
  Spark SQL over the registered views and appends hive-partitioned
  parquet. No 100-partition insert limit (the workaround the reference
  documents at backfill_acl_snapshots_athena.sql:66 is unnecessary).

Partition-column types are taken from the REGISTERED schema, not
re-inferred from directory names — the reference partitions by
zero-padded month/day strings ('03'), which Spark's partition-type
inference would silently turn into integers (3), breaking round-trips.

This registry is in-process; on a cluster the same name→location+schema
mapping lives in a metastore/catalog service — ``Catalog`` is the seam
where that lookup plugs in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake.table import LakeTable


@dataclass
class _Entry:
    kind: str                       # "parquet" | "hive" | "lake"
    path: str
    schema: StructType | None = None          # hive: data + partition cols
    partition_keys: list[str] | None = None   # hive only


class Catalog:
    """name → table location/schema registry with pushdown reads and a
    SQL INSERT surface."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._entries: dict[str, _Entry] = {}

    # ------------------------------------------------------------ register

    def register_parquet(self, name: str, path: str) -> None:
        """A plain parquet file/dir (schema from the footers)."""
        self._entries[name] = _Entry("parquet", path)

    def register_hive(
        self,
        name: str,
        path: str,
        schema: StructType,
        partition_keys: list[str],
    ) -> None:
        """A hive-layout partitioned parquet dir. ``schema`` must contain
        the partition columns with their EXPLICIT types (never inferred
        from directory names — see module docstring)."""
        missing = [k for k in partition_keys if k not in schema.fieldNames()]
        if missing:
            raise ValueError(f"partition keys {missing} not in schema")
        self._entries[name] = _Entry("hive", path, schema, list(partition_keys))

    def register_lake(self, name: str, path: str) -> None:
        """A LakeTable root (read = current snapshot)."""
        self._entries[name] = _Entry("lake", path)

    # ---------------------------------------------------------------- read

    def table(self, name: str, push_down_predicate: str | None = None) -> DataFrame:
        """Read a registered table by name; ``push_down_predicate`` is a
        SQL boolean expression string applied BEFORE any action so the
        optimizer plans it into the scan (partition pruning for
        partition-column conjuncts, parquet row-group pruning for the
        rest) — the Glue ``push_down_predicate`` contract."""
        e = self._entries.get(name)
        if e is None:
            raise KeyError(f"table {name!r} not registered")
        if e.kind == "parquet":
            df = self.spark.read.parquet(e.path)
        elif e.kind == "hive":
            df = self._read_hive(e)
        else:
            df = LakeTable.load(self.spark, e.path).read()
        if push_down_predicate:
            df = df.where(F.expr(push_down_predicate))
        return df

    def _read_hive(self, e: _Entry) -> DataFrame:
        import os

        has_data = os.path.isdir(e.path) and any(
            not d.startswith(("_", ".")) for d in os.listdir(e.path)
        )
        if not has_data:  # registered but never inserted into
            return self.spark.createDataFrame([], e.schema)
        df = self.spark.read.schema(e.schema).option("basePath", e.path).parquet(e.path)
        # normalize to the registered column order (partition cols land
        # last in scan order; SQL INSERT semantics are positional-free
        # here but readers deserve a stable shape)
        return df.select(*[f.name for f in e.schema.fields])

    def create_view(self, name: str) -> None:
        """Expose a registered table to Spark SQL under its name."""
        self.table(name).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        """Run arbitrary Spark SQL with EVERY registered table exposed
        as a view — the read-side SQL surface matching ``insert_into``
        (Athena-style: users query tables by name, pruning and pushdown
        included)."""
        for name in self._entries:
            self.create_view(name)
        return self.spark.sql(query)

    # -------------------------------------------------------------- insert

    def insert_into(self, name: str, select_sql: str) -> int:
        """``INSERT INTO name SELECT ...`` (S11): run the SELECT as Spark
        SQL over the registered views and append the result to a
        hive-partitioned target. Columns are matched BY NAME against the
        registered schema (every schema column must be present) and cast
        to the declared types — the resolveChoice('match_catalog')
        write-side contract. Returns the number of rows inserted (from
        the written files' footers, no second scan)."""
        e = self._entries.get(name)
        if e is None:
            raise KeyError(f"table {name!r} not registered")
        if e.kind != "hive":
            raise ValueError(
                f"insert_into targets a hive-partitioned table; {name!r} is {e.kind}"
            )
        out = self.spark.sql(select_sql)
        missing = [f.name for f in e.schema.fields if f.name not in out.columns]
        if missing:
            raise ValueError(f"INSERT SELECT missing columns: {missing}")
        aligned = out.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in e.schema.fields]
        )
        before = self._count_rows(e)
        aligned.write.mode("append").partitionBy(*e.partition_keys).parquet(e.path)
        return self._count_rows(e) - before

    @staticmethod
    def _count_rows(e: _Entry) -> int:
        """Row count from parquet footers (metadata-only, no data scan)."""
        import os

        import pyarrow.parquet as pq

        total = 0
        for dirpath, _dirs, files in os.walk(e.path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(dirpath, fn)).metadata.num_rows
        return total
