"""Partial-update (patch) merge throughput vs the full-row merge path.

Same synthetic change stream, two replays into fresh MoR tables:

1. full-row baseline — every event carries the whole row
   (``LakeTable.merge``);
2. patch stream — two thirds of the upserts are converted to
   PARTIAL-column PATCH events (half set only ``lang``, half only
   ``content``) and applied with ``LakeTable.merge_patches``.

The patch path pays for per-column aggregation buffers plus the
stored-row inheritance join; this measures that overhead at replay
scale so BENCH docs can report the cost of sparse updates honestly.
Each level runs in ONE process (sequential, fresh tables) — comparing
the two numbers from the same process is fine because both run after
warm-up; cross-boot comparisons are not (see BENCH/BASELINE.md noise
notes).

Usage: python tools/bench_patch.py [n_events] [n_batches] [cores]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.session import get_spark
    from synapse_etl_jobs_spark.sources.synth import (
        flatten_events, synth_change_events,
    )

    spark = get_spark(app_name="bench-patch", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    schema = (
        StructType().add("repo", "string").add("path", "string")
        .add("commit", "string").add("lang", "string").add("content", "string")
    )
    tmp = tempfile.mkdtemp(prefix="bench_patch_")
    src = os.path.join(tmp, "src")
    ev = flatten_events(synth_change_events(spark, n, seed=42, n_keys=n // 4))
    # patch derivation: upserts split 1/3 full : 1/3 lang-only : 1/3
    # content-only, deterministically by seq
    mod = F.pmod(F.col("seq"), F.lit(3))
    patched = ev.select(
        "repo", "path", "commit", "lang", "content", "seq",
        F.when(F.col("op") == "DELETE", "DELETE")
        .when(mod == 0, "UPSERT").otherwise("PATCH").alias("op"),
        F.when(F.col("op") == "DELETE",
               F.lit(None).cast("array<string>"))
        .when(mod == 1, F.array(F.lit("lang")))
        .when(mod == 2, F.array(F.lit("content")))
        .otherwise(F.lit(None).cast("array<string>")).alias("set_cols"),
    )
    n_files = max(64, n // 250_000)
    patched.repartitionByRange(n_files, "seq").write.parquet(src)
    stream = spark.read.parquet(src)

    # semantics-preserving full-row twin: column c of the event at seq s
    # must carry the value of the LAST event <= s that SET c (reset at
    # each DELETE — a patch after a delete inherits nothing). With that,
    # full-row replay of `stream_full` and patch replay of `stream` are
    # PROVABLY the same final state, so the fingerprint check below is a
    # real n-event differential test of merge_patches vs merge. The
    # window prep is untimed (offline stream derivation, not the engine).
    from pyspark.sql import Window

    key = ["repo", "path", "commit"]
    is_del = F.col("op") == "DELETE"
    run = Window.partitionBy(*key).orderBy("seq").rowsBetween(
        Window.unboundedPreceding, 0)
    pe = stream.withColumn(
        "_epoch", F.sum(F.when(is_del, 1).otherwise(0)).over(run))
    we = Window.partitionBy(*key, "_epoch").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, 0)

    def eff(c):
        # DELETE rows never set (their payload is ignored by collapse)
        sets = (F.col("op") == "UPSERT") | (
            (F.col("op") == "PATCH")
            & F.coalesce(F.array_contains("set_cols", c), F.lit(False))
        )
        return F.last(F.when(sets, F.col(c)), ignorenulls=True).over(we)

    src_full = os.path.join(tmp, "src_full")
    pe.select(
        *key, eff("lang").alias("lang"), eff("content").alias("content"),
        "seq", F.when(is_del, "DELETE").otherwise("UPSERT").alias("op"),
    ).repartitionByRange(n_files, "seq").write.parquet(src_full)
    stream_full = spark.read.parquet(src_full)

    b = (n + batches - 1) // batches
    out = {"events": n, "batches": batches, "cores": cores}

    # untimed warm-up: JIT/codegen/Arrow init would otherwise bias
    # against whichever label runs first
    warm = LakeTable.create(
        spark, os.path.join(tmp, "t_warm"), schema,
        ["repo", "path", "commit"], num_buckets=cores, write_mode="mor",
    )
    warm.merge(stream.drop("set_cols").limit(100_000), stream_id="w", batch_id=0)
    warm.merge_patches(stream.limit(100_000), stream_id="w", batch_id=1)

    for label, patches in (("full_row", False), ("patch", True)):
        t = LakeTable.create(
            spark, os.path.join(tmp, f"t_{label}"), schema,
            ["repo", "path", "commit"], num_buckets=cores, write_mode="mor",
        )
        t0 = time.time()
        for i in range(batches):
            lo, hi = i * b, min((i + 1) * b, n)
            if patches:
                chunk = stream.filter(
                    (F.col("seq") >= lo) & (F.col("seq") < hi))
                t.merge_patches(chunk, stream_id="s", batch_id=i)
            else:
                chunk = stream_full.filter(
                    (F.col("seq") >= lo) & (F.col("seq") < hi))
                t.merge(chunk, stream_id="s", batch_id=i)
        wall = time.time() - t0
        final = t.read()
        # order-independent whole-table fingerprint: the patch replay
        # must reconverge to the BYTE-identical state of the full-row
        # replay (north-rule final-state equality, not just row count)
        agg = final.select(
            F.sha2(F.concat_ws("\x01", *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in final.columns
            ]), 256).alias("h")
        ).agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.conv(F.substring("h", 1, 15), 16, 10).cast("long")).alias("fp"),
        ).collect()[0]
        out[label] = {
            "wall_sec": round(wall, 2),
            "events_per_sec": round(n / wall, 1),
            "final_rows": agg["rows"],
            "state_fingerprint": agg["fp"],
        }

    out["patch_vs_full_row"] = round(
        out["patch"]["events_per_sec"] / out["full_row"]["events_per_sec"], 3
    )
    out["state_match"] = (
        out["patch"]["state_fingerprint"] == out["full_row"]["state_fingerprint"]
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
