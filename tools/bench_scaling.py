"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so per BASELINE.md the proxy is
the same CDC replay job at two parallelism levels — local[8] and
local[32] — on the same input. Each level runs in its OWN subprocess
(fresh JVM) so nothing is shared. Reports throughput at both levels and
efficiency = (T_small / T_big) / (cores_big / cores_small)... i.e.
speedup / core-ratio.

Usage: python tools/bench_scaling.py [n_events] [n_batches] [n_cores] [4n_cores]
Prints one JSON line; also meant to be pasted into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from synapse_etl_jobs_spark.session import get_spark
from synapse_etl_jobs_spark.sources.synth import flatten_events, synth_change_events
spark = get_spark(app_name="scale-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
n, out = int(sys.argv[1]), sys.argv[2]
# Range-partition by seq into many small-ish files: a seq-window batch
# then maps to (files/batches) ACTIVE scan tasks — with the default 32+32
# union output files, one batch touched only ~8 contiguous files (one
# row group each = one task each), capping scan parallelism at 8 threads
# no matter the core count. ~250k events/file keeps every batch wide.
n_files = max(64, n // 250_000)
flatten_events(synth_change_events(spark, n, seed=42, n_keys=n//4)) \
    .repartitionByRange(n_files, "seq") \
    .write.mode("overwrite").parquet(out)
"""

CHILD = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql.types import StructType
from synapse_etl_jobs_spark.session import get_spark
from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.streaming import ReplayDriver

cores, n, batches, src = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
master = sys.argv[5] if len(sys.argv) > 5 else f"local[{{cores}}]"
import os
stage_stats_out = os.environ.get("SCALE_STAGE_STATS")
extra = {{"spark.ui.enabled": "true", "spark.ui.port": "0"}} if stage_stats_out else None
if master.startswith("local-cluster"):
    # separate executor JVMs (real shuffle + serialization over
    # loopback — the closest single-box analog of a multi-executor
    # cluster): keep per-executor memory inside the worker allowance
    extra = dict(extra or {{}})
    extra.setdefault("spark.executor.memory",
                     os.environ.get("SCALE_EXEC_MEM", "4g"))
spark = get_spark(app_name=f"scale{{cores}}", master=master,
                  shuffle_partitions=cores, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
schema = (StructType().add("repo","string").add("path","string")
          .add("commit","string").add("lang","string").add("content","string"))
ev = spark.read.parquet(src)   # same files at both levels — the real ingest shape
tmp = tempfile.mkdtemp()
# table layout must be IDENTICAL at both parallelism levels — the
# measurement is core scaling, not bucket-count effects
t = LakeTable.create(spark, tmp+"/t", schema, ["repo","path","commit"],
                     num_buckets=32, write_mode="mor")
# SCALE_COMPACT_EVERY / SCALE_VACUUM_EVERY: run the pair in the
# SUSTAINED configuration (driver-native maintenance in the clock) —
# maintenance must scale with the cores too, not just the merges
ce = int(os.environ.get("SCALE_COMPACT_EVERY", "0")) or None
ve = int(os.environ.get("SCALE_VACUUM_EVERY", "0")) or None
t0 = time.time()
ReplayDriver(t, batch_events=(n+batches-1)//batches,
             compact_every=ce, vacuum_every=ve).replay(ev, seq_start=0, seq_end=n)
wall = time.time() - t0
# north-rule check: final-state equality ACROSS PARALLELISM LEVELS by
# per-row content sha256 — xor of row hashes is an order-independent
# set checksum (final state is unique per key, so xor can't cancel)
from pyspark.sql import functions as F
chk = t.read().agg(
    F.count(F.lit(1)).alias("rows"),
    F.expr("bit_xor(xxhash64(repo, path, commit, lang, sha2(content, 256)))")
     .alias("sha_xor"),
).collect()[0]
if stage_stats_out:
    # per-stage I/O + shuffle volumes from the live UI REST API — the
    # evidence a reader needs to sanity-check 10^10-event extrapolation
    # (what actually crosses the "wire" per replayed batch)
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(base + "/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        base + f"/api/v1/applications/{{app_id}}/stages?status=complete"))
    rows_out = [{{
        "stage": s["stageId"], "name": s["name"].split(" at ")[0],
        "tasks": s["numCompleteTasks"],
        "input_mb": round(s["inputBytes"] / 1e6, 1),
        "output_mb": round(s["outputBytes"] / 1e6, 1),
        "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
        "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
    }} for s in sorted(stages, key=lambda s: s["stageId"])]
    with open(stage_stats_out.format(cores=cores), "w") as f:
        json.dump(rows_out, f, indent=1)
shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({{"cores": cores, "wall_sec": round(wall,2),
                  "events_per_sec": round(n/wall,1), "rows": chk["rows"],
                  "final_state_sha_xor": chk["sha_xor"]}}))
"""


def run_level(cores: int, n: int, batches: int, src: str,
              master: str | None = None) -> dict:
    code = CHILD.format(repo=HERE)
    argv = [sys.executable, "-c", code, str(cores), str(n), str(batches), src]
    if master is not None:
        argv.append(master)
    out = subprocess.run(argv, capture_output=True, text=True, timeout=2400)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    c_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    c_big = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * c_small
    src = os.path.join(os.environ.get("TMPDIR", "/tmp"), f"scale_events_{n}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=HERE), str(n), src],
            check=True, capture_output=True, text=True, timeout=2400,
        )
    # SCALE_MODE=executors: N vs 4N separate EXECUTOR JVMs
    # (local-cluster) at a fixed per-executor core count — the north
    # rule's "N and 4N executors" shape, with real executor-to-executor
    # shuffle serialization that thread-local mode skips. c_small is
    # reinterpreted as cores PER EXECUTOR; worker count scales 1 → 4.
    masters = (None, None)
    if os.environ.get("SCALE_MODE") == "executors":
        per_exec = c_small
        mem_mb = int(os.environ.get("SCALE_WORKER_MEM_MB", "6144"))
        masters = (
            f"local-cluster[1,{per_exec},{mem_mb}]",
            f"local-cluster[4,{per_exec},{mem_mb}]",
        )
        c_big = 4 * c_small
    small = run_level(c_small, n, batches, src, masters[0])
    big = run_level(c_big, n, batches, src, masters[1])
    assert small["rows"] == big["rows"], "parallelism changed the result!"
    assert small["final_state_sha_xor"] == big["final_state_sha_xor"], \
        "parallelism changed final-state content (sha256 checksum differs)!"
    speedup = small["wall_sec"] / big["wall_sec"]
    eff = speedup / (c_big / c_small)
    print(json.dumps({
        "events": n, "batches": batches,
        "mode": os.environ.get("SCALE_MODE", "threads"),
        **({"masters": list(masters)} if masters[0] else {}),
        "small": small, "big": big,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "final_state_sha_equal": True,
    }))


if __name__ == "__main__":
    main()
