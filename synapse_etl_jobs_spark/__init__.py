"""synapse_etl_jobs_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference repo
(marcomarasca/Synapse-ETL-Jobs, AWS Glue snapshot/backfill jobs) as an
idiomatic PySpark engine:

- change-event envelope ingestion (op / seq / ts / payload), dedup with
  last-writer-wins by max event sequence, key-partitioned MERGE upserts
  into a snapshot-versioned lake table (``lake/``),
- schema evolution (added / renamed payload columns) with Arrow-backed
  normalization (``lake/evolve.py``),
- exactly-once replay via idempotent high-watermark batch markers
  (``streaming/replay.py``) and per-partition lineage rows
  (``streaming/lineage.py``),
- a vectorized transform library (``functions/``) porting every scalar
  the reference implements as row-at-a-time Python maps — zero per-row
  Python: native Catalyst expressions where Java regex semantics match,
  Arrow-batched pandas UDFs where Python regex semantics are pinned by
  the reference's test corpus,
- large-scale training-data operators (``operators/``): exact/fuzzy
  dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity
  search, text quality/language-id/tokenization, multimodal plumbing.

Everything is DataFrame-first: plans are declared via pyspark.sql and
optimized by Catalyst; no RDDs, no driver-side row loops.
"""

__version__ = "0.1.0"
