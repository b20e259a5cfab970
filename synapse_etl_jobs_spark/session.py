"""SparkSession factory with the engine's required session settings.

The reference runs on AWS Glue (Spark 3.1) with implicit session config;
here we pin everything the engine's semantics depend on:

- UTC session timezone (the reference's ``utils.py:19-21`` converts epoch
  millis with ``datetime.utcfromtimestamp`` — all date derivations are UTC),
- Arrow execution for pandas UDFs (the vectorization axis),
- AQE with coalescing + skew-join handling (scale axis),
- a shuffle-partition default sized for local[32]; override via env or
  argument for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "synapse-etl-jobs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is supplied — on a real cluster, pass
    ``master=None`` and set the master via spark-submit instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"

    # Executor-side Python workers must be able to import this package:
    # pandas-UDF / mapInPandas kernels defined in our modules are
    # cloudpickled BY REFERENCE, so the worker does `import
    # synapse_etl_jobs_spark...`. A driver-side sys.path tweak does not
    # reach workers — export PYTHONPATH before the JVM (and its worker
    # daemon) starts. On a real cluster ship the package instead:
    # `spark-submit --py-files synapse_etl_jobs_spark.zip`.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # advisory shuffle-partition size: the 64m default coalesces the
        # modest per-batch shuffles of local runs down to 2-3 tasks and
        # caps parallelism (benched: 1.5x on CDC replay at local[32]).
        # On a real cluster at 100 TB, raise via SPARK_GRAFT_ADVISORY.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "8m"),
        )
        # Python DataSource readers (sources/lake_datasource.py) implement
        # pushFilters; the reader refuses to initialize unless enabled
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # parquet scans: large splits keep task overhead low at 100 TB
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # driver UI off for CI/bench determinism + startup speed
        .config("spark.ui.enabled", "false")
        # local mode runs every task in the driver JVM: size the heap for
        # 32 concurrent tasks + long suites (8g measured GC-bound by the
        # end of a 35-query bench run — the trailing workload degraded 6x)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
