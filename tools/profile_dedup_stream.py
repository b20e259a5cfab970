"""Wall-clock phase profile of the streaming dedup ingest (verdict r3 #5).

Runs the exact `dedup_stream_state` bench shape (documents + verbatim
copies as a 2-file FileStreamSource, maxFilesPerTrigger=1) standalone in
a fresh process and attributes wall time to engine phases by wrapping
the load-bearing calls with timers:

- ``probe+verify`` — materializing the survivor set (`kept.count()`
  forced right after persist, so the dedup compute is not billed to the
  first merge that would otherwise trigger it)
- ``index_merge`` / ``docs_merge`` — the two exactly-once MERGEs
- ``scan_keys`` + ``prune_collect`` — the storage-pruned index read
- ``is_batch_applied`` — marker checks
- ``stream_overhead`` — total stream wall minus everything attributed
  (Structured-Streaming machinery: source listing, offset log, planning)

Usage: python tools/profile_dedup_stream.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.monotonic()
        try:
            return fn(*a, **k)
        finally:
            dt = time.monotonic() - t0
            PHASES[name] = PHASES.get(name, 0.0) + dt
            COUNTS[name] = COUNTS.get(name, 0) + 1
    return wrap


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    from pyspark.sql import functions as F

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.session import get_spark
    from synapse_etl_jobs_spark.streaming import dedup_stream
    from synapse_etl_jobs_spark.operators import dedup_text

    t_start = time.monotonic()
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    PHASES["spark_startup"] = time.monotonic() - t_start

    # --- instrument engine phases -------------------------------------
    LakeTable.merge = timed("merge_total", LakeTable.merge)
    LakeTable.scan_keys = timed("scan_keys", LakeTable.scan_keys)
    LakeTable.is_batch_applied = timed("is_batch_applied", LakeTable.is_batch_applied)
    LakeTable.read = timed("table_read_plan", LakeTable.read)

    # finer grain: every eager localCheckpoint inside the dedup
    # construction, attributed to its CALLER (function:line)
    import inspect

    # Spark 4: the runtime class is the classic subclass, which
    # overrides localCheckpoint — patch IT, not the abstract base
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    inner_ckpt = _DF.localCheckpoint

    def ckpt_timed(self, *a, **k):
        fr = inspect.stack()[1]
        key = f"ckpt {os.path.basename(fr.filename)}:{fr.lineno} ({fr.function})"
        t0 = time.monotonic()
        out = inner_ckpt(self, *a, **k)
        PHASES[key] = PHASES.get(key, 0.0) + time.monotonic() - t0
        COUNTS[key] = COUNTS.get(key, 0) + 1
        return out

    _DF.localCheckpoint = ckpt_timed

    inner_dedup = dedup_text.minhash_dedup_incremental

    def dedup_and_force(*a, **k):
        t0 = time.monotonic()
        out = inner_dedup(*a, **k)
        PHASES["dedup_plan"] = PHASES.get("dedup_plan", 0.0) + time.monotonic() - t0
        out = out.persist()
        t1 = time.monotonic()
        out.count()  # force probe+verify here, not inside the first merge
        PHASES["probe_verify"] = PHASES.get("probe_verify", 0.0) + time.monotonic() - t1
        COUNTS["probe_verify"] = COUNTS.get("probe_verify", 0) + 1
        return out

    dedup_stream.minhash_dedup_incremental = dedup_and_force

    # --- the bench shape (mirror of q_dedup_stream_state) --------------
    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text", "lang", "n_chars")
    )
    aug = d.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        "text", "lang", "n_chars",
    )
    base = tempfile.mkdtemp(prefix="profile_dedup_")
    src = os.path.join(base, "src")
    t0 = time.monotonic()
    d.coalesce(1).write.parquet(src)
    now = time.time()
    for fp in glob.glob(os.path.join(src, "*.parquet")):
        os.utime(fp, (now - 100, now - 100))
    aug.coalesce(1).write.mode("append").parquet(src)
    PHASES["source_setup"] = time.monotonic() - t0

    docs, index = dedup_stream.create_dedup_tables(
        spark, os.path.join(base, "docs"), os.path.join(base, "ix"),
        d.schema, num_buckets=8,
    )
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.monotonic()
    dedup_stream.dedup_stream_into_table(
        docs, index, stream, os.path.join(base, "ckpt"),
        threshold=1.0, shingle_k=5, num_hashes=32, bands=8,
        collapse_exact=True, broadcast_probe=True, prune_index_scan=True,
    )
    stream_wall = time.monotonic() - t0
    PHASES["stream_total"] = stream_wall

    n = docs.read().count()
    # ckpt-* and scan_keys run INSIDE dedup_plan — summing them too
    # would double-count and push the overhead negative
    attributed = sum(v for k, v in PHASES.items()
                     if k not in ("stream_total", "spark_startup",
                                  "source_setup", "scan_keys")
                     and not k.startswith("ckpt "))
    report = {
        "sf_dir": sf_dir,
        "corpus_rows": n,
        "phases_sec": {k: round(v, 3) for k, v in sorted(PHASES.items())},
        "calls": COUNTS,
        "stream_overhead_sec": round(stream_wall - attributed, 3),
        "total_sec": round(stream_wall, 3),
    }
    print(json.dumps(report, indent=2))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f)


if __name__ == "__main__":
    main()
