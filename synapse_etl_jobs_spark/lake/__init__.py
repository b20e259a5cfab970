"""A minimal snapshot-versioned lake-table format in pure PySpark.

The north rule targets Iceberg ``MERGE INTO``; this sandbox has no Iceberg
(or Delta) runtime jar and no network, so the engine ships its own table
layer implementing the same published architecture (Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020; Apache Iceberg table spec): immutable parquet data
files + a versioned JSON manifest + an atomically-swapped pointer, giving
snapshot isolation, time travel, schema evolution, and idempotent commits.

Scale design:
- data files are hash-bucketed by key (``bucket(N, repo)`` analog), so a
  MERGE rewrites only the buckets its update batch touches and the merge
  reduction never joins across buckets;
- the manifest is O(#files) JSON on the driver — the same driver-side
  metadata scale as Iceberg manifests;
- commits are append-only: old snapshots stay readable (replay / audit),
  and a failed job never corrupts the table (the pointer flips last).
"""

from synapse_etl_jobs_spark.lake.incremental import IncrementalAggView  # noqa: F401
from synapse_etl_jobs_spark.lake.table import LakeTable  # noqa: F401
from synapse_etl_jobs_spark.lake.txn import TxnLog  # noqa: F401
