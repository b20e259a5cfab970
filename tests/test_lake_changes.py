"""Time travel + incremental CDC-out (LakeTable.read_version / changes):
version isolation, changelog exactness, tombstone passthrough,
replication roundtrip, and the copy-on-write guard."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable

SCHEMA = StructType().add("k", "long").add("v", "string")


def _ev(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def _mk(spark, tmp_path, name, mode="mor"):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], num_buckets=4, write_mode=mode
    )


def test_read_version_isolates_snapshots(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a"), ("UPSERT", 2, 2, "b")]), batch_id=0)
    t.merge(_ev(spark, [("UPSERT", 3, 1, "a2"), ("DELETE", 4, 2, None)]), batch_id=1)
    v1 = {(r["k"], r["v"]) for r in t.read_version(1).collect()}
    v2 = {(r["k"], r["v"]) for r in t.read_version(2).collect()}
    assert v1 == {(1, "a"), (2, "b")}
    assert v2 == {(1, "a2")}
    assert {(r["k"], r["v"]) for r in t.read().collect()} == v2


def test_changes_exact_window_and_tombstones(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a"), ("UPSERT", 2, 2, "b")]), batch_id=0)
    t.merge(_ev(spark, [("UPSERT", 3, 1, "a2")]), batch_id=1)
    t.merge(_ev(spark, [("DELETE", 4, 2, None), ("UPSERT", 5, 3, "c")]), batch_id=2)
    ch = {(r["k"], r["v"], r["_seq"], r["_deleted"])
          for r in t.changes(since_version=1).collect()}
    # only versions 2-3: k=1 updated, k=2 tombstoned, k=3 inserted
    assert ch == {(1, "a2", 3, False), (2, None, 4, True), (3, "c", 5, False)}
    # LWW across the selected versions: an update superseded within the
    # range appears once, with the winning seq
    ch23 = t.changes(since_version=0)
    assert ch23.filter(F.col("k") == 1).count() == 1
    assert ch23.filter(F.col("k") == 1).first()["_seq"] == 3
    # empty range → empty frame with the changelog schema
    empty = t.changes(since_version=t.manifest.table_version)
    assert empty.count() == 0 and "_deleted" in empty.columns


def test_changes_feed_replicates_table(spark, tmp_path):
    """Applying the changes() feed to a second table reproduces the
    source state — changes() IS a valid CDC stream."""
    src = _mk(spark, tmp_path, "src")
    src.merge(_ev(spark, [("UPSERT", 1, 1, "a"), ("UPSERT", 2, 2, "b")]), batch_id=0)
    dst = _mk(spark, tmp_path, "dst")
    dst.merge(
        src.changes(0).withColumn(
            "op", F.when(F.col("_deleted"), "DELETE").otherwise("UPSERT")
        ),
        op_col="op", seq_col="_seq", batch_id="sync0",
    )
    src.merge(_ev(spark, [("DELETE", 3, 1, None), ("UPSERT", 4, 3, "c")]), batch_id=1)
    dst.merge(
        src.changes(1).withColumn(
            "op", F.when(F.col("_deleted"), "DELETE").otherwise("UPSERT")
        ),
        op_col="op", seq_col="_seq", batch_id="sync1",
    )
    a = src.read().select("k", "v")
    b = dst.read().select("k", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert b.count() == 2


def test_changes_rejects_cow_versions(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", mode="cow")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    with pytest.raises(ValueError, match="rewrote base files"):
        t.changes(0)


def test_changes_skips_compaction_versions(spark, tmp_path):
    """Compaction versions are stamped state-preserving and skipped:
    a consumer tailing changes() across a maintained-ingest window
    (merge → compact → merge) gets exactly the merge versions' deltas —
    the folded delta files are still on disk for the read."""
    m = _mk(spark, tmp_path, "m")
    m.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    m.compact()
    ch = {(r["k"], r["v"]) for r in m.changes(0).collect()}
    assert ch == {(1, "a")}

    m.merge(_ev(spark, [("UPSERT", 2, 2, "b"), ("DELETE", 3, 1, None)]),
            batch_id=1)
    m.compact(drop_tombstones=False)
    v_after_first_compact = 2
    ch = {(r["k"], r["_deleted"]) for r in m.changes(v_after_first_compact).collect()}
    assert ch == {(2, False), (1, True)}

    # replication across the maintained window reproduces the state
    dst = _mk(spark, tmp_path, "dst")
    dst.merge(
        m.changes(0).withColumn(
            "op", F.when(F.col("_deleted"), "DELETE").otherwise("UPSERT")
        ),
        op_col="op", seq_col="_seq", batch_id="sync",
    )
    a = m.read().select("k", "v")
    b = dst.read().select("k", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_changes_rejects_rollback_versions(spark, tmp_path):
    """A rollback reverts rows while REMOVING files — the version walk
    would otherwise read it as an empty changelog and a replica would
    silently diverge. The stamp makes it fail loudly."""
    t = _mk(spark, tmp_path, "t")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    t.merge(_ev(spark, [("UPSERT", 2, 2, "b")]), batch_id=1)
    t.rollback(1)
    with pytest.raises(ValueError, match="rollback"):
        t.changes(0)
    # a window strictly before the rollback still works
    assert t.changes(0, to_version=2).count() == 2
    # ... and tailing from AFTER the rollback works again
    t.merge(_ev(spark, [("UPSERT", 3, 3, "c")]), batch_id=2)
    ch = {(r["k"], r["v"]) for r in t.changes(3).collect()}
    assert ch == {(3, "c")}


def test_changes_bad_range(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    with pytest.raises(ValueError, match="invalid version range"):
        t.changes(5)


def test_load_missing_version_clear_error(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    with pytest.raises(ValueError, match="does not exist"):
        LakeTable.load(spark, str(tmp_path / "t"), version=99)
    with pytest.raises(ValueError, match="does not exist"):
        t.read_version(99)


def test_concurrent_commit_detected(spark, tmp_path):
    """Two handles loaded at the same version: the second committer must
    fail with a clear conflict error, and a reloaded retry succeeds
    (merges stay idempotent under markers + LWW)."""
    from synapse_etl_jobs_spark.lake.table import ConcurrentWriteError

    t = _mk(spark, tmp_path, "t")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    h1 = LakeTable.load(spark, str(tmp_path / "t"))
    h2 = LakeTable.load(spark, str(tmp_path / "t"))
    h1.merge(_ev(spark, [("UPSERT", 2, 2, "b")]), batch_id=1)
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        h2.merge(_ev(spark, [("UPSERT", 3, 3, "c")]), batch_id=2)
    # reload + retry applies cleanly and loses nothing
    h3 = LakeTable.load(spark, str(tmp_path / "t"))
    h3.merge(_ev(spark, [("UPSERT", 3, 3, "c")]), batch_id=2)
    assert {(r["k"], r["v"]) for r in h3.read().collect()} \
        == {(1, "a"), (2, "b"), (3, "c")}


def test_merge_auto_evolve_adds_new_columns(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.merge(_ev(spark, [("UPSERT", 1, 1, "a")]), batch_id=0)
    widened = spark.createDataFrame(
        [("UPSERT", 2, 2, "b", 99), ("UPSERT", 3, 1, "a2", 7)],
        "op string, seq long, k long, v string, stars int",
    )
    # without auto_evolve the new column is silently not stored; with it,
    # the schema widens additively before the merge
    t.merge(widened, batch_id=1, auto_evolve=True)
    got = {r["k"]: (r["v"], r["stars"]) for r in t.read().collect()}
    assert got == {1: ("a2", 7), 2: ("b", 99)}
    assert "stars" in t.read().columns
    # a later batch WITHOUT the new column still merges (nulls)
    t.merge(_ev(spark, [("UPSERT", 4, 3, "c")]), batch_id=2, auto_evolve=True)
    assert t.read().filter("k = 3").first()["stars"] is None
    # op/seq envelope columns are never promoted to table columns
    assert {"op", "seq"}.isdisjoint(set(t.read().columns))


def test_merge_auto_evolve_widens_drifted_types(spark, tmp_path):
    """A batch carrying a safely-wider type for a KNOWN payload column
    widens the table column before the merge — without it the
    normalization cast silently narrows and an out-of-range value wraps
    (non-ANSI cast)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        StructType().add("k", "long").add("n", "integer").add("f", "float"),
        ["k"], num_buckets=4, write_mode="mor",
    )
    t.merge(
        spark.createDataFrame([("UPSERT", 1, 1, 5, 1.5)],
                              "op string, seq long, k long, n int, f float"),
        batch_id=0,
    )
    big = 2**40  # far beyond int32 — would wrap under the narrowing cast
    drifted = spark.createDataFrame(
        [("UPSERT", 2, 2, big, 2.5)],
        "op string, seq long, k long, n bigint, f double",
    )
    t.merge(drifted, batch_id=1, auto_evolve=True)
    sch = {f.name: f.dataType.simpleString() for f in t.read().schema.fields}
    assert sch["n"] == "bigint" and sch["f"] == "double"
    got = {r["k"]: r["n"] for r in t.read().collect()}
    assert got == {1: 5, 2: big}  # old epoch-0 row reads at the wide type
    # key columns are NEVER widened (bucket hashes the physical type):
    # a long-typed key batch against a long key is fine, but an int key
    # table refuses via the explicit evolve path only — auto path skips
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"),
        StructType().add("k", "integer").add("v", "string"),
        ["k"], num_buckets=4, write_mode="mor",
    )
    t2.merge(
        spark.createDataFrame([("UPSERT", 1, 1, "a")],
                              "op string, seq long, k bigint, v string"),
        batch_id=0, auto_evolve=True,
    )
    assert t2.manifest.current_schema()["k"].dataType.simpleString() == "int"
