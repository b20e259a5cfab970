"""Sustained-ingest evidence: per-batch merge wall over a LONG replay.

The north rule's 10^10-event claim rests on per-batch cost staying flat
as the table grows. A MoR ``merge`` never reads stored data, so the
merge itself is O(batch) by construction — but two growth terms live
OUTSIDE the merge job and only a long replay exposes them:

1. the manifest commit — touched buckets' side files list every live
   file entry of that bucket, so the per-commit JSON rewrite grows with
   the delta count until compaction folds files;
2. the read side — ``read()`` LWW-reduces over every delta file, so
   query latency climbs with batches-since-compaction.

This harness replays B seq-window batches one window at a time and
prints one JSON line per batch: the merge wall (from ReplayDriver's
per-batch ``wall_sec`` stat), the table's live file-entry count, and —
every ``--read-every`` batches — a timed full ``read().count()``.
``--compact-every K`` turns on the driver's own scheduled maintenance
(``ReplayDriver(compact_every=K)`` — timed, tombstones kept: mid-ingest
maintenance must not GC tombstones while stale events may still be
redelivered), showing both walls return to their floor afterwards.
``--vacuum-every K`` adds the metadata/disk half
(``vacuum_every=K``): every row reports ``meta_files`` (manifest
roots + side files + markers on disk), the growth term vacuum bounds.

The final line is a summary with total events/sec and the same
order-independent per-row sha256 xor checksum the scaling harness uses
(`tools/bench_scaling.py`), so compact-every-K and never-compact runs
can be asserted bit-identical in final state.

``--replica`` closes the loop on the full production shape: a second
table tails the source through the ``synlake_cdc`` stream (one
availableNow pass per ingest cycle, Spark-checkpointed offsets) and the
summary asserts the replica's sha-xor equals the source's — ingest +
scheduled maintenance + a live changelog consumer, all in one clock.
With maintenance on, the consumer's lag window is bounded by vacuum
retention (see LakeCdcStreamReader's docstring): a compact cycle moves
the head 2 versions while the replica's checkpoint is 1 cycle behind,
so ``--retain-versions`` must be ≥ 4 when both ``--vacuum-every`` and
``--replica`` are set (the harness refuses a losing combination rather
than failing mid-run).

Usage:
  python tools/sustained_ingest.py [--events N] [--batches B]
      [--mode mor|cow] [--compact-every K] [--read-every R]
      [--cores C] [--buckets NB] [--workdir DIR]
      [--replica] [--retain-versions V]

Run each variant in its own process (fresh JVM) and never co-run two —
same bench hygiene as every other harness here.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=64_000_000)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--mode", choices=("mor", "cow"), default="mor")
    p.add_argument("--compact-every", type=int, default=0,
                   help="compact() after every K batches (0 = never)")
    p.add_argument("--vacuum-every", type=int, default=0,
                   help="vacuum(retain_versions=2) after every K batches "
                        "(0 = never) — bounds the manifest chain + dead files")
    p.add_argument("--read-every", type=int, default=4,
                   help="time a full read().count() every R batches (0 = never)")
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--workdir", default=None,
                   help="table + source dir (default: a fresh tempdir; "
                        "put it on tmpfs to take disk out of the clock)")
    p.add_argument("--replica", action="store_true",
                   help="tail the source through a synlake_cdc stream "
                        "into a replica table after every ingest cycle; "
                        "the summary asserts sha-xor equality")
    p.add_argument("--retain-versions", type=int, default=2,
                   help="vacuum retention (must cover the replica's lag "
                        "window: >= 4 with --replica + --vacuum-every)")
    args = p.parse_args()
    if args.replica and args.vacuum_every and args.retain_versions < 4:
        p.error("--replica with --vacuum-every needs --retain-versions >= 4 "
                "(a compact cycle moves the head 2 versions while the "
                "replica is 1 cycle behind)")
    if args.replica and args.mode == "cow":
        p.error("--replica needs --mode mor: copy-on-write commits carry "
                "no per-row change record for the synlake_cdc stream to "
                "tail (it would fail at the first sync, minutes in)")

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.session import get_spark
    from synapse_etl_jobs_spark.sources.synth import (
        flatten_events,
        synth_change_events,
    )
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    spark = get_spark(
        app_name=f"sustained-{args.mode}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = args.workdir or tempfile.mkdtemp(prefix="sustained_")
    os.makedirs(tmp, exist_ok=True)
    src = os.path.join(tmp, "events_src")
    try:
        # source files outside the clock — same shape as bench.py /
        # bench_scaling.py: range-partitioned by seq so every window
        # maps to many scan tasks
        n_files = max(64, args.events // 250_000)
        (
            flatten_events(
                synth_change_events(
                    spark, args.events, seed=42, n_keys=args.events // 4
                )
            )
            .repartitionByRange(n_files, "seq")
            .write.mode("overwrite").parquet(src)
        )
        events = spark.read.parquet(src)

        schema = (
            StructType().add("repo", "string").add("path", "string")
            .add("commit", "string").add("lang", "string")
            .add("content", "string")
        )
        table = LakeTable.create(
            spark, os.path.join(tmp, "t"), schema,
            ["repo", "path", "commit"],
            num_buckets=args.buckets, write_mode=args.mode,
        )
        driver = ReplayDriver(
            table,
            batch_events=(args.events + args.batches - 1) // args.batches,
            compact_every=args.compact_every or None,
            vacuum_every=args.vacuum_every or None,
            vacuum_opts={"retain_versions": args.retain_versions},
        )
        b = driver.batch_events

        rep_path = os.path.join(tmp, "replica")
        if args.replica:
            from synapse_etl_jobs_spark.sources.lake_datasource import register

            register(spark)
            LakeTable.create(
                spark, rep_path, schema, ["repo", "path", "commit"],
                num_buckets=args.buckets, write_mode="mor",
            )
            rep_ckpt = os.path.join(tmp, "rep_ckpt")

            def sync_replica() -> float:
                """One availableNow catch-up pass through the packaged
                replication loop (streaming/replicate.py); returns the
                wall. Offsets live in the Spark checkpoint — each pass
                resumes where the last stopped."""
                from synapse_etl_jobs_spark.streaming import replicate_once

                t0 = time.monotonic()
                replicate_once(
                    spark, os.path.join(tmp, "t"), rep_path, rep_ckpt,
                )
                return round(time.monotonic() - t0, 3)

        def live_files() -> int:
            return sum(len(v) for v in table.manifest.buckets.values())

        def meta_files() -> int:
            # manifest roots + side files + markers on disk: the
            # metadata growth term vacuum_every bounds (local paths
            # only — the harness always runs on a local workdir)
            n = 0
            for _, _, fns in os.walk(
                os.path.join(os.path.join(tmp, "t"), "_manifests")
            ):
                n += sum(1 for f in fns if f.endswith(".json"))
            return n

        t_total0 = time.monotonic()
        merge_walls: list[float] = []
        for i in range(args.batches):
            stats = driver.replay(
                events, seq_start=i * b, seq_end=min((i + 1) * b, args.events)
            )
            applied = [s for s in stats if s.get("applied", True)]
            row: dict = {"batch": i, "files": live_files(),
                         "meta_files": meta_files()}
            if applied:
                row["merge_wall_sec"] = applied[0]["wall_sec"]
                merge_walls.append(applied[0]["wall_sec"])
                v = applied[0].get("vacuum")
                if v is not None:
                    row["vacuum_wall_sec"] = v["wall_sec"]
                    row["vacuum_deleted_files"] = v["deleted_data_files"]
                    row["meta_files_after_vacuum"] = meta_files()
                c = applied[0].get("compact")
                if c is not None:
                    # driver-native maintenance (ReplayDriver
                    # compact_every; tombstones kept) — the harness
                    # measures the engine feature, not its own loop
                    row["compact_wall_sec"] = c["wall_sec"]
                    row["compact_rewrote_buckets"] = len(
                        c.get("compacted_buckets", [])
                    )
                    row["files_after_compact"] = live_files()
            if args.read_every and (i + 1) % args.read_every == 0:
                t0 = time.monotonic()
                n = table.read().count()
                row["read_wall_sec"] = round(time.monotonic() - t0, 3)
                row["table_rows"] = n
            if args.replica:
                row["replica_wall_sec"] = sync_replica()
            print(json.dumps(row), flush=True)
        total_wall = time.monotonic() - t_total0

        chk = table.read().agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr(
                "bit_xor(xxhash64(repo, path, commit, lang,"
                " sha2(content, 256)))"
            ).alias("sha_xor"),
        ).collect()[0]
        summary = {
            "summary": True,
            "mode": args.mode,
            "events": args.events,
            "batches": args.batches,
            "cores": args.cores,
            "compact_every": args.compact_every,
            "total_wall_sec": round(total_wall, 2),
            "events_per_sec": round(args.events / total_wall, 1),
            "merge_wall_first4_sec": [round(w, 2) for w in merge_walls[:4]],
            "merge_wall_last4_sec": [round(w, 2) for w in merge_walls[-4:]],
            "final_rows": chk["rows"],
            "final_state_sha_xor": chk["sha_xor"],
        }
        if args.replica:
            rchk = LakeTable.load(spark, rep_path).read().agg(
                F.count(F.lit(1)).alias("rows"),
                F.expr(
                    "bit_xor(xxhash64(repo, path, commit, lang,"
                    " sha2(content, 256)))"
                ).alias("sha_xor"),
            ).collect()[0]
            summary["replica_rows"] = rchk["rows"]
            summary["replica_sha_xor"] = rchk["sha_xor"]
            summary["replica_matches_source"] = (
                rchk["rows"] == chk["rows"]
                and rchk["sha_xor"] == chk["sha_xor"]
            )
            assert summary["replica_matches_source"], (
                "replica diverged from source", summary
            )
        print(json.dumps(summary), flush=True)
    finally:
        if args.workdir is None:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
