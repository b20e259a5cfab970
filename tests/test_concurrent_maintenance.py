"""Concurrent maintenance: compaction/rebucket racing a live writer.

Round-4 proved the commit CAS cross-process (test_commit_cas.py): no
interleaving can lose data. This file pins the round-5 LIVENESS story —
the maintenance op no longer just dies when it loses the race:

- ``compact`` REBASES past a rival MoR merge at commit time (the
  rewrite replaces exactly the entries it read; rival deltas stack on
  top) — no recompute, one extra manifest read.
- Non-rebasable conflicts (CoW rewrite of a victim bucket) raise, and
  ``compact_with_retry`` recomputes over the new parent and converges.
- ``rebucket_with_retry`` recomputes (a rebucket can never rebase).
- ``vacuum(grace_seconds=...)`` shields an in-flight commit's freshly
  staged files from a concurrent vacuum (Iceberg ``older_than`` analog).

The flagship test runs the merge in a SEPARATE OS process with its own
SparkSession, landing it genuinely mid-compaction (between the
compaction's manifest read and its commit), via a file barrier.
"""

import json
import multiprocessing
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.lake.fs import LocalFS
from synapse_etl_jobs_spark.lake.table import ConcurrentWriteError

SCHEMA = StructType().add("k", "long").add("v", "string")
EV = "k long, v string, op string, seq long"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV)


def _state(t):
    return {(r["k"], r["v"]) for r in t.read().collect()}


def _mk(spark, path, mode="mor"):
    return LakeTable.create(spark, path, SCHEMA, ["k"], num_buckets=4,
                            write_mode=mode)


def _no_unreferenced_files(t):
    """Every parquet under data/ is referenced by the current manifest
    (call right after vacuum(retain_versions=1))."""
    referenced = {
        os.path.realpath(e["path"])
        for lst in t.manifest.buckets.values()
        for e in lst
    }
    on_disk = {
        os.path.realpath(fp)
        for fp, _sz in t.fs.list_files(os.path.join(t.path, "data"), ".parquet")
    }
    assert on_disk == referenced, (on_disk - referenced, referenced - on_disk)


def _hook_merge_mid_compaction(victim, fire):
    """Patch ``victim._salted_bucket_write`` so ``fire()`` runs once,
    after the compaction has read its manifest but before its commit."""
    orig = victim._salted_bucket_write
    state = {"fired": False}

    def hooked(df, dest, **kw):
        if not state["fired"]:
            state["fired"] = True
            fire()
        return orig(df, dest, **kw)

    victim._salted_bucket_write = hooked


def test_compact_rebases_past_inflight_mor_merge(spark, tmp_path):
    """A MoR merge lands mid-compaction: the compaction rebases (no
    recompute) and commits; nothing the rival wrote is lost, and vacuum
    leaves no unreferenced files behind."""
    path = str(tmp_path / "t")
    t1 = _mk(spark, path)
    for i in range(3):  # several delta layers: compaction has real work
        t1.merge(_ev(spark, [(j, f"v{i}.{j}", "UPSERT", 10 * i + j)
                             for j in range(8)]),
                 batch_id=i)
    t2 = LakeTable.load(spark, path)

    def rival():
        t2.merge(_ev(spark, [(100, "rival", "UPSERT", 1000),
                             (1, None, "DELETE", 1001)]), batch_id=99)

    _hook_merge_mid_compaction(t1, rival)
    res = t1.compact(drop_tombstones=False)
    assert res["applied"] and res["rebased_commits"] == 1

    final = LakeTable.load(spark, path)
    expect = {(j, f"v2.{j}") for j in range(8)} - {(1, "v2.1")}
    expect |= {(100, "rival")}
    assert _state(final) == expect
    final.vacuum()
    _no_unreferenced_files(final)
    assert _state(LakeTable.load(spark, path)) == expect


def test_compact_cow_conflict_recomputes_via_retry(spark, tmp_path):
    """A CoW merge rewrites a victim bucket mid-compaction: the read
    entries are gone from HEAD, the rebase refuses, plain compact()
    raises — and compact_with_retry recomputes over the new parent."""
    path = str(tmp_path / "t")
    t1 = _mk(spark, path, mode="cow")
    t1.merge(_ev(spark, [(j, f"a{j}", "UPSERT", j) for j in range(8)]),
             batch_id=0)
    t2 = LakeTable.load(spark, path)

    def rival():
        t2.merge(_ev(spark, [(0, "COW", "UPSERT", 100)]), batch_id=1)

    _hook_merge_mid_compaction(t1, rival)
    with pytest.raises(ConcurrentWriteError):
        t1.compact()

    # retry wrapper: reloads and recomputes (hook re-fires nothing)
    t1.manifest = LakeTable.load(spark, path).manifest
    res = t1.compact_with_retry()
    assert res["applied"]
    expect = {(0, "COW")} | {(j, f"a{j}") for j in range(1, 8)}
    assert _state(LakeTable.load(spark, path)) == expect


def test_rebucket_with_retry_converges(spark, tmp_path):
    path = str(tmp_path / "t")
    t1 = _mk(spark, path)
    t1.merge(_ev(spark, [(j, f"a{j}", "UPSERT", j) for j in range(8)]),
             batch_id=0)
    # rival lands AFTER t1 captured its manifest: t1's rebucket commits
    # against a stale parent, loses the CAS, and the wrapper recomputes
    # over the new parent (a rebucket can never rebase)
    t2 = LakeTable.load(spark, path)
    t2.merge(_ev(spark, [(50, "late", "UPSERT", 100)]), batch_id=1)
    with pytest.raises(ConcurrentWriteError):
        t1.rebucket(8)
    res = t1.rebucket_with_retry(8)
    assert res["applied"] and res["num_buckets"] == 8
    final = LakeTable.load(spark, path)
    assert final.manifest.num_buckets == 8
    assert _state(final) == {(j, f"a{j}") for j in range(8)} | {(50, "late")}


def test_vacuum_grace_shields_inflight_files(spark, tmp_path):
    """grace_seconds: an unreferenced-but-fresh parquet (an in-flight
    commit's staged data) survives a concurrent vacuum; with the
    default grace 0 it is reclaimed."""
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    t.merge(_ev(spark, [(1, "a", "UPSERT", 1)]), batch_id=0)
    t.merge(_ev(spark, [(1, "b", "UPSERT", 2)]), batch_id=1)

    inflight = os.path.join(path, "data", "c-inflight", "b0000",
                            "part-race.parquet")
    os.makedirs(os.path.dirname(inflight))
    with open(inflight, "wb") as f:
        f.write(b"PAR1fake")
    staging = os.path.join(path, "_staging", "s-race")
    os.makedirs(staging)

    t.vacuum(retain_versions=1, grace_seconds=3600)
    assert os.path.exists(inflight) and os.path.isdir(staging)

    t.vacuum(retain_versions=1)  # maintenance-window semantics unchanged
    assert not os.path.exists(inflight) and not os.path.isdir(staging)
    _no_unreferenced_files(t)


# --------------------------------------------------------------------------
# flagship: the merge lands from a SECOND OS PROCESS mid-compaction
# --------------------------------------------------------------------------

def _merge_worker(table_path: str, flag_dir: str) -> None:
    """Separate OS process: own SparkSession, waits until the parent's
    compaction is past its manifest read, then lands a MoR merge."""
    from synapse_etl_jobs_spark.session import get_spark

    spark = get_spark(app_name="race-merger", master="local[2]",
                      shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "2g"})
    t = LakeTable.load(spark, table_path)
    deadline = time.time() + 120
    while not os.path.exists(os.path.join(flag_dir, "compact_started")):
        if time.time() > deadline:  # pragma: no cover
            raise TimeoutError("compaction never signalled")
        time.sleep(0.01)
    t.merge(
        spark.createDataFrame([(777, "from-other-process", "UPSERT", 5000)],
                              EV),
        batch_id=777,
    )
    open(os.path.join(flag_dir, "merged"), "w").close()
    spark.stop()



def test_two_process_merge_lands_mid_compaction(spark, tmp_path):
    """VERDICT r4 'Next round' #2, done-criterion: a merge from another
    OS process lands mid-compaction; the compaction rebases and commits,
    final state is sha-equal to the serial compact-then-merge history,
    and vacuum leaves no orphaned files."""
    path = str(tmp_path / "t")
    flag_dir = str(tmp_path / "flags")
    os.makedirs(flag_dir)
    t1 = _mk(spark, path)
    rows = [(j, f"x{j}", "UPSERT", j) for j in range(64)]
    t1.merge(_ev(spark, rows[:32]), batch_id=0)
    t1.merge(_ev(spark, rows[32:]), batch_id=1)

    ctx = multiprocessing.get_context("spawn")
    proc = ctx.Process(target=_merge_worker, args=(path, flag_dir))
    proc.start()

    orig = t1._salted_bucket_write
    state = {"fired": False}

    def hooked(df, dest, **kw):
        out = orig(df, dest, **kw)
        if not state["fired"]:
            state["fired"] = True
            open(os.path.join(flag_dir, "compact_started"), "w").close()
            deadline = time.time() + 150
            while not os.path.exists(os.path.join(flag_dir, "merged")):
                if time.time() > deadline:  # pragma: no cover
                    raise TimeoutError("rival merge never landed")
                time.sleep(0.01)
        return out

    t1._salted_bucket_write = hooked
    # tombstones KEPT: the rebase is unconditional for content-complete
    # rewrites (the sustained-ingest/auto-compaction shape); a
    # tombstone-DROPPING rewrite refuses to rebase past victim-bucket
    # rivals — pinned by test_tombstone_dropping_compact_refuses_rebase
    res = t1.compact(drop_tombstones=False)
    proc.join(timeout=180)
    assert proc.exitcode == 0
    assert res["applied"] and res["rebased_commits"] >= 1

    final = LakeTable.load(spark, path)
    expect = {(j, f"x{j}") for j in range(64)} | {(777, "from-other-process")}
    assert _state(final) == expect

    # sha-equality against the serial history on a fresh table
    serial = _mk(spark, str(tmp_path / "serial"))
    serial.merge(_ev(spark, rows[:32]), batch_id=0)
    serial.merge(_ev(spark, rows[32:]), batch_id=1)
    serial.compact()
    serial.merge(_ev(spark, [(777, "from-other-process", "UPSERT", 5000)]),
                 batch_id=777)

    def sha(tb):
        return tb.read().select(
            F.sha2(F.concat_ws("\x1f", F.col("k").cast("string"), "v"), 256)
            .alias("h")
        ).agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256)
              .alias("s")).collect()[0]["s"]

    assert sha(final) == sha(serial)

    final.vacuum()
    _no_unreferenced_files(LakeTable.load(spark, path))


def test_tombstone_dropping_compact_refuses_rebase(spark, tmp_path):
    """drop_tombstones=True + a rival delta in a victim bucket must NOT
    rebase: my rewrite erased a tombstone the rival's (possibly stale)
    delta needs, and the stacked result would change state under a
    state-preserving "compact" stamp. The conflict recomputes instead —
    and the stale event still cannot resurrect the deleted key."""
    path = str(tmp_path / "t")
    t1 = _mk(spark, path)
    t1.merge(_ev(spark, [(1, "a", "UPSERT", 1), (2, "b", "UPSERT", 2)]),
             batch_id=0)
    t1.merge(_ev(spark, [(1, None, "DELETE", 10)]), batch_id=1)
    t2 = LakeTable.load(spark, path)

    def rival():  # redelivered STALE pre-delete event, fresh batch id
        t2.merge(_ev(spark, [(1, "stale", "UPSERT", 5)]), batch_id=99)

    _hook_merge_mid_compaction(t1, rival)
    with pytest.raises(ConcurrentWriteError):
        t1.compact()  # drop_tombstones=True default

    res = t1.compact_with_retry()
    assert res["applied"] and res["rebased_commits"] == 0
    # the recompute folded the stale delta against the tombstone: the
    # deleted key stays deleted
    assert _state(LakeTable.load(spark, path)) == {(2, "b")}


def test_maintenance_honors_legacy_shared_markers(spark, tmp_path):
    """Upgrade continuity: a batch id recorded under the old shared
    "maintenance" stream must short-circuit the namespaced ops (no
    double-apply of a pre-upgrade batch on redelivery)."""
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    t.merge(_ev(spark, [(1, "a", "UPSERT", 1)]), batch_id=0)
    # simulate a pre-upgrade marker: apply under the legacy stream id
    t.delete_where("k = 1", stream_id="maintenance", batch_id="legacy-7")
    assert _state(t) == set()
    # redelivery after the upgrade, namespaced defaults: both ops skip
    r1 = t.delete_where("k = 1", batch_id="legacy-7")
    r2 = t.update_where("k = 1", {"v": "'zz'"}, batch_id="legacy-7")
    assert not r1["applied"] and not r2["applied"]
    assert r1["reason"] == r2["reason"] == "batch_already_applied"
