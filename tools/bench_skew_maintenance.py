"""Skew stress for row maintenance + filtered replication (VERDICT r4 #5).

The salted-LWW A/B covers skewed MERGE batches; this harness covers the
two round-4 surfaces that had no dedicated skew measurement:

1. ``delete_where`` whose predicate matches ONE hot storage bucket
   (table bucketed by ``repo``, power-law repos — the hot repo owns a
   large share of rows) vs a same-cardinality predicate spread
   uniformly over all buckets.
2. a FILTERED replica whose key predicate selects the hot repo (one
   storage bucket of the changelog's rows) vs an IN-list of cold repos
   totalling the same row share.

Pass/fail shape per the verdict: hot wall within 2x of the uniform
wall, or the mitigation documented. The mitigation under test is the
engine's salted bucket write (``write_salt`` table property): a hot
bucket's rewrite fans out over ``write_salt`` writer tasks instead of
one straggler.

Usage:
  python tools/bench_skew_maintenance.py [n_events] [write_salt]
Defaults: 8_000_000 events, write_salt=8. The verdict-shape run is
  python tools/bench_skew_maintenance.py 64000000 8
Prints one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    write_salt = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.session import get_spark
    from synapse_etl_jobs_spark.sources.synth import (
        flatten_events, synth_change_events,
    )
    from synapse_etl_jobs_spark.streaming import ReplayDriver
    from synapse_etl_jobs_spark.streaming.replicate import replicate_once

    spark = get_spark(app_name="skew-maintenance")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="skewmaint-")
    schema = (StructType().add("repo", "string").add("path", "string")
              .add("commit", "string").add("lang", "string")
              .add("content", "string"))
    # bucket by repo ONLY: co-locates a repo's rows (the realistic
    # hot-tenant layout) — the power-law synth makes repo org0/repo0 own
    # the largest share, i.e. one hot storage bucket
    t = LakeTable.create(
        spark, os.path.join(root, "t"), schema, ["repo", "path", "commit"],
        bucket_cols=["repo"], num_buckets=32, write_mode="mor",
        write_salt=write_salt,
    )
    # the synth's power law skews EVENTS per key, but LWW collapses to
    # one row per key and keys are uniform over repos — so build the hot
    # BUCKET explicitly: remap half the keyspace into one repo
    # (deterministic on (path, commit), so keys stay consistent).
    # Result: one storage bucket holds ~50% of the table's final rows.
    hot = "org0/hotrepo"
    # spill the event stream to parquet once instead of caching 64M wide
    # rows in executor memory (persist() thrashes the block manager at
    # this size on one JVM); range-partition by seq so each replay batch
    # maps to many active scan tasks
    ev_path = os.path.join(root, "events")
    flatten_events(
        synth_change_events(spark, n, seed=42, n_keys=n // 4)
    ).withColumn(
        "repo",
        F.when(F.pmod(F.xxhash64("path", "commit"), F.lit(2)) == 0,
               F.lit(hot)).otherwise(F.col("repo")),
    ).repartitionByRange(max(64, n // 250_000), "seq").write.parquet(ev_path)
    ev = spark.read.parquet(ev_path)
    ReplayDriver(t, batch_events=max(n // 8, 1)).replay(
        ev, seq_start=0, seq_end=n
    )
    t = LakeTable.load(spark, t.path)
    base_version = t.manifest.table_version

    total = t.read().count()
    hot_rows_live = t.read().filter(F.col("repo") == hot).count()
    hot_share = hot_rows_live / total
    # uniform predicate with ~the same matched-row count, spread over
    # every bucket: a deterministic hash cut on the key columns
    pct = max(int(round(hot_share * 100)), 1)
    uni_pred = f"pmod(xxhash64(repo, path, commit), 100) < {pct}"
    hot_pred = f"repo = '{hot}'"

    # -- filtered replication FIRST (the changelog reader refuses
    # rollback commits, which the delete phase below introduces):
    # hot repo vs same-share cold IN-list --------------------------------
    # uniform replica filter: the complementary ~50% spread over every
    # other repo/bucket — same selected share, no hot bucket
    uni_repl_pred = f"repo <> '{hot}'"

    def timed_replica(tag: str, where: str) -> float:
        rep = LakeTable.create(
            spark, os.path.join(root, f"rep-{tag}"), schema,
            ["repo", "path", "commit"], bucket_cols=["repo"],
            num_buckets=32, write_mode="mor", write_salt=write_salt,
        )
        t0 = time.time()
        replicate_once(spark, t.path, rep.path,
                       os.path.join(root, f"ck-{tag}"), where=where)
        return time.time() - t0

    r_hot, r_uni = [], []
    for i in range(2):
        r_hot.append(timed_replica(f"hot{i}", hot_pred))
        r_uni.append(timed_replica(f"uni{i}", uni_repl_pred))

    # -- row maintenance: hot-bucket delete vs uniform delete ----------
    def timed_delete(pred: str) -> tuple[float, int]:
        tb = LakeTable.load(spark, t.path)
        t0 = time.time()
        res = tb.delete_where(pred)
        wall = time.time() - t0
        rows = res.get("source_events", 0)
        tb.rollback(base_version)  # restore for the next scenario
        return wall, rows

    # interleave reps (host-noise control), report min per scenario
    d_hot, d_uni = [], []
    for _ in range(2):
        w, hot_rows = timed_delete(hot_pred)
        d_hot.append(w)
        w, uni_rows = timed_delete(uni_pred)
        d_uni.append(w)

    out = {
        "events": n, "write_salt": write_salt,
        "hot_repo": hot, "hot_share": round(hot_share, 4),
        "delete_hot_rows": hot_rows, "delete_uniform_rows": uni_rows,
        "delete_hot_sec": [round(x, 2) for x in d_hot],
        "delete_uniform_sec": [round(x, 2) for x in d_uni],
        "delete_hot_over_uniform": round(min(d_hot) / min(d_uni), 3),
        "replica_hot_sec": [round(x, 2) for x in r_hot],
        "replica_uniform_sec": [round(x, 2) for x in r_uni],
        "replica_hot_over_uniform": round(min(r_hot) / min(r_uni), 3),
        "within_2x": bool(min(d_hot) / min(d_uni) <= 2.0
                          and min(r_hot) / min(r_uni) <= 2.0),
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
