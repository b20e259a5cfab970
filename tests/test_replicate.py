"""replicate_once / replicate_stream: tail a table's changelog into a
replica through the packaged loop (streaming/replicate.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.streaming import replicate_once

SCHEMA = StructType().add("k", "long").add("v", "string")


def _ev(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def _state(t):
    return {(r["k"], r["v"]) for r in t.read().collect()}


def _mk_pair(spark, tmp_path, replica_buckets=4):
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, ["k"],
                           num_buckets=4, write_mode="mor")
    rep = LakeTable.create(spark, str(tmp_path / "rep"), SCHEMA, ["k"],
                           num_buckets=replica_buckets, write_mode="mor")
    return src, rep


def test_replicate_catches_up_and_resumes(spark, tmp_path):
    src, rep = _mk_pair(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    src.merge(_ev(spark, [("UPSERT", 1, 1, "a"), ("UPSERT", 2, 2, "b")]),
              batch_id=0)
    replicate_once(spark, src.path, rep.path, ckpt)
    assert _state(LakeTable.load(spark, rep.path)) == _state(src)

    # more source commits, SAME checkpoint: only the new versions flow,
    # and deletes/updates replicate exactly
    src = LakeTable.load(spark, src.path)
    src.merge(_ev(spark, [("DELETE", 3, 1, None), ("UPSERT", 4, 3, "c")]),
              batch_id=1)
    src.delete_where("v = 'b'")
    replicate_once(spark, src.path, rep.path, ckpt)
    got = _state(LakeTable.load(spark, rep.path))
    assert got == _state(src) == {(3, "c")}

    # nothing new: a third pass is a no-op (replica version unchanged)
    v = LakeTable.load(spark, rep.path).manifest.table_version
    replicate_once(spark, src.path, rep.path, ckpt)
    assert LakeTable.load(spark, rep.path).manifest.table_version == v


def test_replicate_survives_maintenance_and_rebuckets(spark, tmp_path):
    """Compaction on the source is invisible to the follower (stamp
    skip), and a replica with a DIFFERENT bucket count converges —
    events re-bucket on merge."""
    src, rep = _mk_pair(spark, tmp_path, replica_buckets=2)
    ckpt = str(tmp_path / "ckpt")
    src.merge(_ev(spark, [("UPSERT", i, i, f"v{i}") for i in range(1, 9)]),
              batch_id=0)
    src.compact(drop_tombstones=False)
    src.merge(_ev(spark, [("UPSERT", 10, 1, "V1"), ("DELETE", 11, 2, None)]),
              batch_id=1)
    replicate_once(spark, src.path, rep.path, ckpt)
    rep2 = LakeTable.load(spark, rep.path)
    assert _state(rep2) == _state(src)
    assert rep2.manifest.num_buckets == 2


def test_replicate_chain(spark, tmp_path):
    """A replica is a normal table: a second follower can tail the
    replica's own changelog (A -> B -> C)."""
    a, b = _mk_pair(spark, tmp_path)
    c = LakeTable.create(spark, str(tmp_path / "c"), SCHEMA, ["k"],
                         num_buckets=4, write_mode="mor")
    a.merge(_ev(spark, [("UPSERT", 1, 1, "a"), ("UPSERT", 2, 2, "b")]),
            batch_id=0)
    replicate_once(spark, a.path, b.path, str(tmp_path / "ck_ab"))
    replicate_once(spark, b.path, c.path, str(tmp_path / "ck_bc"))
    assert _state(LakeTable.load(spark, c.path)) == _state(a)


def test_replicate_source_with_op_and_seq_payload_columns(spark, tmp_path):
    """A source whose PAYLOAD schema contains columns named op/seq must
    replicate without corrupting them (envelope names are picked
    collision-free)."""
    schema = (StructType().add("k", "long").add("op", "string")
              .add("seq", "long").add("v", "string"))
    src = LakeTable.create(spark, str(tmp_path / "src"), schema, ["k"],
                           num_buckets=2, write_mode="mor")
    rep = LakeTable.create(spark, str(tmp_path / "rep"), schema, ["k"],
                           num_buckets=2, write_mode="mor")
    ev = spark.createDataFrame(
        [("UPSERT", 1, 1, "user-op", 42, "x"),
         ("UPSERT", 2, 2, "other", 7, "y")],
        "_op string, _seq long, k long, op string, seq long, v string",
    )
    src.merge(ev, op_col="_op", seq_col="_seq", batch_id=0)
    from synapse_etl_jobs_spark.streaming import replicate_once
    replicate_once(spark, src.path, rep.path, str(tmp_path / "ckpt"))
    got = {r["k"]: (r["op"], r["seq"], r["v"])
           for r in LakeTable.load(spark, rep.path).read().collect()}
    assert got == {1: ("user-op", 42, "x"), 2: ("other", 7, "y")}


def test_fresh_checkpoint_does_not_collide_with_stale_markers(spark, tmp_path):
    """The re-sync flow: replicate, then restart with a NEW checkpoint
    against the same replica — the new incarnation's batch 0 must NOT be
    swallowed by the previous incarnation's batch-0 marker."""
    from synapse_etl_jobs_spark.streaming import replicate_once

    src, rep = _mk_pair(spark, tmp_path)
    src.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    replicate_once(spark, src.path, rep.path, str(tmp_path / "ck1"))
    src = LakeTable.load(spark, src.path)
    src.merge(_ev(spark, [("UPSERT", 2, 2, "b")]), batch_id=1)
    # fresh checkpoint: its availableNow pass renumbers batches from 0
    replicate_once(spark, src.path, rep.path, str(tmp_path / "ck2"))
    assert _state(LakeTable.load(spark, rep.path)) == _state(src)
    # and resuming ck2 is still exactly-once (same incarnation token)
    v = LakeTable.load(spark, rep.path).manifest.table_version
    replicate_once(spark, src.path, rep.path, str(tmp_path / "ck2"))
    assert LakeTable.load(spark, rep.path).manifest.table_version == v


def test_replicate_follows_source_schema_evolution(spark, tmp_path):
    """Source adds a column; the next replication pass (fresh reader, new
    schema) grows the replica's schema instead of dropping the values."""
    from synapse_etl_jobs_spark.streaming import replicate_once

    src, rep = _mk_pair(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    src.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    replicate_once(spark, src.path, rep.path, ckpt)

    src = LakeTable.load(spark, src.path)
    src.evolve_schema(add_columns=[("stars", "long")])
    src.merge(
        spark.createDataFrame(
            [("UPSERT", 5, 2, "b", 42)],
            "op string, seq long, k long, v string, stars long",
        ),
        batch_id=1,
    )
    replicate_once(spark, src.path, rep.path, ckpt)
    rep2 = LakeTable.load(spark, rep.path)
    assert "stars" in rep2.read().columns
    got = {r["k"]: (r["v"], r["stars"]) for r in rep2.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 42)}


def test_filtered_partial_replica(spark, tmp_path):
    """where= routes a slice of the firehose into a partial replica —
    upserts AND deletes for matching keys flow, everything else is
    dropped; non-key predicates are refused (filtered-CDC divergence)."""
    from synapse_etl_jobs_spark.streaming import replicate_once

    src, rep = _mk_pair(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    src.merge(_ev(spark, [("UPSERT", 1, 1, "a"), ("UPSERT", 2, 2, "b"),
                          ("UPSERT", 3, 11, "c")]), batch_id=0)
    replicate_once(spark, src.path, rep.path, ckpt, where="k >= 10")
    assert _state(LakeTable.load(spark, rep.path)) == {(11, "c")}

    src = LakeTable.load(spark, src.path)
    src.merge(_ev(spark, [("DELETE", 4, 11, None), ("UPSERT", 5, 12, "d"),
                          ("UPSERT", 6, 3, "x")]), batch_id=1)
    replicate_once(spark, src.path, rep.path, ckpt, where="k >= 10")
    assert _state(LakeTable.load(spark, rep.path)) == {(12, "d")}

    with pytest.raises(ValueError, match="KEY columns only"):
        replicate_once(spark, src.path, rep.path, str(tmp_path / "ck2"),
                       where="v = 'a'")
    with pytest.raises(ValueError, match="KEY columns only"):
        replicate_once(spark, src.path, rep.path, str(tmp_path / "ck3"),
                       where="not_a_column > 1")


def test_replicate_stream_continuous_mode(spark, tmp_path):
    """trigger_once=False returns a RUNNING query that keeps following
    the source until stopped."""
    import time

    from synapse_etl_jobs_spark.streaming import replicate_stream

    src, rep = _mk_pair(spark, tmp_path)
    src.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    q = replicate_stream(
        spark, src.path, rep.path, str(tmp_path / "ckpt"),
        trigger_once=False,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if _state(LakeTable.load(spark, rep.path)) == {(1, "a")}:
                break
            time.sleep(0.5)
        assert _state(LakeTable.load(spark, rep.path)) == {(1, "a")}
        # a commit made while the query is live flows without any new pass
        LakeTable.load(spark, src.path).merge(
            _ev(spark, [("UPSERT", 2, 2, "b")]), batch_id=1
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            if len(_state(LakeTable.load(spark, rep.path))) == 2:
                break
            time.sleep(0.5)
        assert _state(LakeTable.load(spark, rep.path)) == {(1, "a"), (2, "b")}
    finally:
        q.stop()
