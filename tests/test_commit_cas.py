"""Commit concurrency: the version-file create is the atomic arbiter.

Two writers racing the same parent version must resolve to exactly one
committed manifest — enforced by create-no-overwrite semantics on
``v{N}.json`` (``write_text_if_absent``), not by the best-effort
check-then-replace the pointer CAS alone would give. Reference parity
note: the reference's Glue jobs assume a single writer per table
(glue_job.py runs one job per source); this hardening is what removes
that assumption for the lake engine.
"""

import json
import multiprocessing
import os
import time

import pytest

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.lake.fs import LocalFS
from synapse_etl_jobs_spark.lake.table import ConcurrentWriteError, Manifest


def _mk_manifest(version: int, parent, tag: str) -> Manifest:
    return Manifest(
        table_version=version,
        key_cols=["k"],
        bucket_cols=["k"],
        num_buckets=2,
        current_schema_id=0,
        schemas={"0": {"schema": {"type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}}
        ]}, "rename": {}}},
        buckets={},
        applied_batches={},
        parent_version=parent,
        props={"write_mode": "mor", "winner": tag},
    )


def _race_worker(table_path: str, tag: str, ready_dir: str, out_dir: str) -> None:
    """Runs in a SEPARATE OS process (spawn): load the current manifest,
    rendezvous with the other racer, then commit version parent+1."""
    fs = LocalFS()
    cur = LakeTable._resolve_current(table_path, fs)
    child = _mk_manifest(cur + 1, cur, tag)
    # file barrier: announce ready, spin until both racers are ready
    open(os.path.join(ready_dir, tag), "w").close()
    deadline = time.time() + 30
    while len(os.listdir(ready_dir)) < 2:
        if time.time() > deadline:  # pragma: no cover
            raise TimeoutError("barrier")
        time.sleep(0.0005)
    try:
        LakeTable._commit_manifest(table_path, child, fs)
        outcome = "ok"
    except ConcurrentWriteError:
        outcome = "conflict"
    with open(os.path.join(out_dir, tag), "w") as f:
        f.write(outcome)


@pytest.mark.parametrize("round_no", range(5))
def test_two_process_commit_race_exactly_one_wins(tmp_path, round_no):
    """Two OS processes race a commit from the same parent: exactly one
    wins, the other raises ConcurrentWriteError, the committed manifest
    is the winner's (no torn/merged state), and the table stays
    readable at the winning version."""
    table_path = str(tmp_path / "t")
    fs = LocalFS()
    fs.mkdirs(LakeTable._manifest_dir(table_path), exist_ok=False)
    LakeTable._commit_manifest(table_path, _mk_manifest(0, None, "seed"), fs)

    ready = tmp_path / "ready"
    out = tmp_path / "out"
    ready.mkdir()
    out.mkdir()
    ctx = multiprocessing.get_context("spawn")
    procs = [
        ctx.Process(target=_race_worker,
                    args=(table_path, tag, str(ready), str(out)))
        for tag in ("A", "B")
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    results = {tag: (out / tag).read_text() for tag in ("A", "B")}
    assert sorted(results.values()) == ["conflict", "ok"], results
    winner = next(tag for tag, r in results.items() if r == "ok")

    assert LakeTable._resolve_current(table_path, fs) == 1
    committed = LakeTable._read_manifest(table_path, 1, fs)
    assert committed.props["winner"] == winner
    assert committed.parent_version == 0


def test_version_file_create_is_the_arbiter(tmp_path):
    """Even when BOTH writers pass the optimistic fast-fail check (the
    round-3 race window), the version-file create lets only one through:
    commit the same version twice with the pointer swap suppressed on
    the first, so the second's fast-fail check still sees the parent."""
    table_path = str(tmp_path / "t")
    fs = LocalFS()
    fs.mkdirs(LakeTable._manifest_dir(table_path), exist_ok=False)
    LakeTable._commit_manifest(table_path, _mk_manifest(0, None, "seed"), fs)

    class _NoSwapFS(LocalFS):
        """write_text_atomic on CURRENT becomes a no-op: simulates the
        first writer pausing (or crashing) after the commit point."""
        def write_text_atomic(self, path, text):
            if os.path.basename(path) == "CURRENT":
                return
            super().write_text_atomic(path, text)

    LakeTable._commit_manifest(table_path, _mk_manifest(1, 0, "first"),
                               _NoSwapFS())
    # pointer still says 0, so the fast-fail check passes for a second
    # writer parented at 0 — the arbiter must still reject it
    assert fs.read_text(os.path.join(
        LakeTable._manifest_dir(table_path), "CURRENT")).strip() == "0"
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        # bypass the (now accurate) resolve-forward fast-fail by using a
        # manifest whose parent matches the resolved head: parent=1 would
        # pass resolve, so attack the arbiter directly with parent=None
        LakeTable._commit_manifest(table_path, _mk_manifest(1, None, "second"),
                                   fs)
    # the committed v1 is the first writer's, untouched
    assert LakeTable._read_manifest(table_path, 1, fs).props["winner"] == "first"


def test_crashed_writer_pointer_lag_is_repaired(spark, tmp_path):
    """A writer that crashed between creating its version file and the
    pointer swap leaves CURRENT lagging the head. Readers must adopt the
    durable commit (probe forward), and the NEXT writer must parent from
    it instead of wedging on an existing version file."""
    path = str(tmp_path / "t")
    from pyspark.sql.types import StructType
    t = LakeTable.create(
        spark, path,
        StructType().add("k", "long").add("v", "string"), ["k"],
        num_buckets=2, write_mode="mor")
    ev = spark.createDataFrame([("UPSERT", 1, 1, "a")],
                               "op string, seq long, k long, v string")
    t.merge(ev, stream_id="s", batch_id=0)
    head = t.manifest.table_version
    # simulate the crash: roll the POINTER back one commit
    cur = os.path.join(LakeTable._manifest_dir(path), "CURRENT")
    LocalFS().write_text_atomic(cur, str(head - 1))

    reloaded = LakeTable.load(spark, path)
    assert reloaded.manifest.table_version == head
    assert {r["k"] for r in reloaded.read().collect()} == {1}

    # datasource resolution agrees
    from synapse_etl_jobs_spark.sources.lake_datasource import _current_version
    assert _current_version(path) == head

    # next commit parents from the repaired head and succeeds
    reloaded.merge(spark.createDataFrame([("UPSERT", 2, 2, "b")],
                                         "op string, seq long, k long, v string"),
                   stream_id="s", batch_id=1)
    assert reloaded.manifest.table_version == head + 1
    assert {r["k"] for r in reloaded.read().collect()} == {1, 2}


def test_write_text_if_absent_local(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "f.json")
    assert fs.write_text_if_absent(p, "one") is True
    assert fs.write_text_if_absent(p, "two") is False
    assert fs.read_text(p) == "one"
    # tmp staging files are cleaned up in both branches
    assert os.listdir(tmp_path) == ["f.json"]


def test_write_text_if_absent_hadoop(spark, tmp_path):
    """Same contract through the Hadoop FileSystem layer (file: URI) —
    the code path HDFS table locations take."""
    from synapse_etl_jobs_spark.lake.fs import HadoopFS

    fs = HadoopFS(spark)
    p = "file:" + str(tmp_path / "f.json")
    assert fs.write_text_if_absent(p, "one") is True
    assert fs.write_text_if_absent(p, "two") is False
    assert fs.read_text(p) == "one"
    # no staging tmp files remain (Hadoop's local FS adds .crc sidecars)
    assert not [f for f in os.listdir(tmp_path) if ".tmp-" in f]


def test_uri_table_concurrent_commit_detected(spark, tmp_path):
    """End-to-end conflict on a file: URI table (HadoopFS commit path):
    second stale handle must conflict, retry after reload succeeds."""
    from pyspark.sql.types import StructType

    path = "file:" + str(tmp_path / "t")
    t = LakeTable.create(
        spark, path, StructType().add("k", "long").add("v", "string"),
        ["k"], num_buckets=2, write_mode="mor")

    def ev(*rows):
        return spark.createDataFrame(list(rows),
                                     "op string, seq long, k long, v string")

    t.merge(ev(("UPSERT", 1, 1, "a")), stream_id="s", batch_id=0)
    h1 = LakeTable.load(spark, path)
    h2 = LakeTable.load(spark, path)
    h1.merge(ev(("UPSERT", 2, 2, "b")), stream_id="s", batch_id=1)
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        h2.merge(ev(("UPSERT", 3, 3, "c")), stream_id="s", batch_id=2)
    h3 = LakeTable.load(spark, path)
    h3.merge(ev(("UPSERT", 3, 3, "c")), stream_id="s", batch_id=2)
    assert {(r["k"], r["v"]) for r in h3.read().collect()} \
        == {(1, "a"), (2, "b"), (3, "c")}


def test_losing_committer_cannot_clobber_winner_side_files(tmp_path):
    """Side files are staged BEFORE the version-file arbiter decides, so
    a losing committer's staging must never touch the winner's committed
    bucket file lists. Side-file names carry a commit-unique token:
    replay the round-4 race window (both writers past the fast-fail
    check, same version, same touched bucket) and assert the committed
    manifest still resolves to the WINNER's entries."""
    table_path = str(tmp_path / "t")
    fs = LocalFS()
    fs.mkdirs(LakeTable._manifest_dir(table_path), exist_ok=False)
    LakeTable._commit_manifest(table_path, _mk_manifest(0, None, "seed"), fs)

    class _NoSwapFS(LocalFS):
        def write_text_atomic(self, path, text):
            if os.path.basename(path) == "CURRENT":
                return
            super().write_text_atomic(path, text)

    first = _mk_manifest(1, 0, "first")
    first.buckets = {"0": [{"path": "data/first.parquet", "rows": 1}]}
    LakeTable._commit_manifest(table_path, first, _NoSwapFS())

    # the loser stages the SAME bucket of the SAME version, then loses
    # the arbiter (parent=None bypasses the now-accurate fast-fail)
    second = _mk_manifest(1, None, "second")
    second.buckets = {"0": [{"path": "data/EVIL.parquet", "rows": 9}]}
    with pytest.raises(ConcurrentWriteError):
        LakeTable._commit_manifest(table_path, second, fs)

    committed = LakeTable._read_manifest(table_path, 1, fs)
    assert committed.props["winner"] == "first"
    assert [e["path"] for e in committed.buckets["0"]] \
        == ["data/first.parquet"]


def test_merge_with_retry_recovers_from_rival_commit(spark, tmp_path):
    """Two handles loaded at the same version: the second's plain merge
    conflicts; merge_with_retry rebases onto the rival's commit and
    lands, losing neither batch."""
    from pyspark.sql.types import StructType

    schema = StructType().add("k", "long").add("v", "string")
    path = str(tmp_path / "t")
    h1 = LakeTable.create(spark, path, schema, ["k"], num_buckets=2,
                          write_mode="mor")
    h2 = LakeTable.load(spark, path)

    def _ev(rows):
        return spark.createDataFrame(rows, "op string, seq long, k long, v string")

    h1.merge(_ev([("UPSERT", 1, 1, "a")]), batch_id=0)
    with pytest.raises(ConcurrentWriteError):
        h2.merge(_ev([("UPSERT", 2, 2, "b")]), batch_id=1)
    s = h2.merge_with_retry(_ev([("UPSERT", 2, 2, "b")]), batch_id=1)
    assert s["applied"]
    got = {(r["k"], r["v"]) for r in LakeTable.load(spark, path).read().collect()}
    assert got == {(1, "a"), (2, "b")}
    # marker dedup still applies through the wrapper
    s2 = h2.merge_with_retry(_ev([("UPSERT", 3, 2, "b2")]), batch_id=1)
    assert not s2["applied"]


def test_merge_with_retry_exhausts_and_raises(spark, tmp_path):
    """Sustained contention (a rival commits before every attempt) ends
    in the last ConcurrentWriteError, not an infinite spin."""
    from pyspark.sql.types import StructType

    schema = StructType().add("k", "long").add("v", "string")
    path = str(tmp_path / "t")
    h1 = LakeTable.create(spark, path, schema, ["k"], num_buckets=2,
                          write_mode="mor")
    h2 = LakeTable.load(spark, path)

    def _ev(rows):
        return spark.createDataFrame(rows, "op string, seq long, k long, v string")

    calls = {"n": 0}
    real_merge = LakeTable.merge

    def rival_always_wins(updates, **kw):
        # a rival lands a commit right before THIS handle's attempt
        # (instance-level patch: h1's calls use the real class method)
        h1.merge(_ev([("UPSERT", 100 + calls["n"], 50 + calls["n"], "x")]),
                 batch_id=f"rival-{calls['n']}")
        calls["n"] += 1
        return real_merge(h2, updates, **kw)

    h2.merge = rival_always_wins
    with pytest.raises(ConcurrentWriteError):
        h2.merge_with_retry(_ev([("UPSERT", 1, 1, "a")]),
                            batch_id="mine", max_retries=2)
    assert calls["n"] == 3  # initial attempt + 2 retries, then raise
