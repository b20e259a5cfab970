"""Python DataSource surface tests: the pure-Python xxhash64 port is
bit-verified against Spark, the batch reader matches LakeTable.read()
row-for-row (CoW, MoR, time travel, schema evolution), bucket pruning
prunes partitions, and the streaming CDC reader replicates table A into
table B bit-identically across multiple trigger cycles through Spark's
own checkpoint/offset machinery."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.sources import lake_datasource as lds
from synapse_etl_jobs_spark.sources.lake_datasource import (
    LakeBatchReader,
    bucket_of,
    register,
    spark_xxhash64,
)

SCHEMA = (
    StructType()
    .add("repo", "string")
    .add("path", "string")
    .add("value", "double")
)
KEYS = ["repo", "path"]


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "value", "op", "seq"])
    )


def _sorted_pdf(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def assert_same(a, b):
    pd.testing.assert_frame_equal(_sorted_pdf(a), _sorted_pdf(b), check_dtype=False)


# ---------------------------------------------------------------------------
# xxhash64 port
# ---------------------------------------------------------------------------


def test_xxhash64_matches_spark(spark):
    """The offline hash MUST equal F.xxhash64 bit-for-bit — bucket pruning
    reads the wrong bucket otherwise."""
    rows = [
        (0, "", b""),
        (1, "a", b"\x00"),
        (-1, "repo/alpha", b"0123456789abcdef0123456789abcdef0123"),
        (2**63 - 1, "x" * 100, bytes(range(256))),
        (-(2**63), "é中文 mixed", b"exactly-32-bytes-padded-to-32!!!"),
        (42, "exactly-8", b"12345678"),
        (7, "len-is-twelve", b"1234"),
    ]
    df = spark.createDataFrame(rows, "l long, s string, b binary")
    got = df.select(
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s").alias("hs"),
        F.xxhash64("b").alias("hb"),
        F.xxhash64("l", "s").alias("hls"),
        F.xxhash64("s", "l", "b").alias("hslb"),
    ).collect()
    for (l, s, b), r in zip(rows, got):
        assert spark_xxhash64([(l, "long")]) == r["hl"]
        assert spark_xxhash64([(s, "string")]) == r["hs"]
        assert spark_xxhash64([(b, "binary")]) == r["hb"]
        assert spark_xxhash64([(l, "long"), (s, "string")]) == r["hls"]
        assert (
            spark_xxhash64([(s, "string"), (l, "long"), (b, "binary")])
            == r["hslb"]
        )


def test_xxhash64_null_skips(spark):
    got = spark.createDataFrame([(None, "x")], "l long, s string").select(
        F.xxhash64("l", "s").alias("h")
    ).first()["h"]
    assert spark_xxhash64([(None, "long"), ("x", "string")]) == got


def test_bucket_of_matches_engine(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=16)
    df = spark.createDataFrame(
        [(f"repo-{i}",) for i in range(50)], "repo string"
    ).withColumn("b", t._bucket_expr())
    for r in df.collect():
        assert bucket_of([(r["repo"], "string")], 16) == r["b"]


# ---------------------------------------------------------------------------
# batch reads
# ---------------------------------------------------------------------------


@pytest.fixture()
def mor_table(spark, tmp_table_path):
    t = LakeTable.create(
        spark, tmp_table_path, SCHEMA, KEYS, num_buckets=4, write_mode="mor"
    )
    t.merge(
        _events(
            spark,
            [
                ("r1", "a", 1.0, "INSERT", 1),
                ("r1", "b", 2.0, "INSERT", 2),
                ("r2", "a", 3.0, "INSERT", 3),
            ],
        ),
        batch_id=0,
    )
    t.merge(
        _events(
            spark,
            [
                ("r1", "a", 10.0, "UPDATE", 4),   # update wins over seq 1
                ("r1", "b", 0.0, "DELETE", 5),    # tombstone
                ("r3", "c", 4.0, "INSERT", 6),
            ],
        ),
        batch_id=1,
    )
    return t


def test_batch_read_matches_table_read(spark, mor_table):
    register(spark)
    via_ds = (
        spark.read.format("synlake").option("path", mor_table.path).load()
    )
    assert_same(via_ds, mor_table.read())
    assert via_ds.schema == mor_table.read().schema


def test_batch_read_cow(spark, tmp_table_path):
    t = LakeTable.create(
        spark, tmp_table_path, SCHEMA, KEYS, num_buckets=4, write_mode="cow"
    )
    t.merge(_events(spark, [("r1", "a", 1.0, "INSERT", 1)]), batch_id=0)
    t.merge(_events(spark, [("r1", "a", 2.0, "UPDATE", 2)]), batch_id=1)
    register(spark)
    via_ds = spark.read.format("synlake").option("path", t.path).load()
    assert_same(via_ds, t.read())


def test_time_travel_option(spark, mor_table):
    register(spark)
    v1 = (
        spark.read.format("synlake")
        .option("path", mor_table.path)
        .option("version", "1")
        .load()
    )
    assert_same(v1, mor_table.read_version(1))


def test_schema_evolution_read(spark, mor_table):
    mor_table.evolve_schema(add_columns=[("stars", "long")])
    t = LakeTable.load(mor_table.spark, mor_table.path)
    t.merge(
        t.spark.createDataFrame(
            [("r4", "d", 9.0, 99, "INSERT", 7)],
            "repo string, path string, value double, stars long, op string, seq long",
        ),
        batch_id=2,
    )
    register(t.spark)
    via_ds = t.spark.read.format("synlake").option("path", t.path).load()
    assert "stars" in via_ds.columns
    assert_same(via_ds, t.read())


def test_bucket_pruning_partitions(spark, mor_table):
    """pushFilters(EqualTo on the bucket col) must cut partitions() to the
    one bucket that can hold the key — the offline point-scan path."""
    from pyspark.sql.datasource import EqualTo

    reader = LakeBatchReader({"path": mor_table.path})
    all_parts = reader.partitions()
    reader.pushFilters([EqualTo(("repo",), "r1")])
    pruned = reader.partitions()
    assert len(pruned) < len(all_parts) or len(all_parts) == 1
    want_bucket = bucket_of([("r1", "string")], 4)
    want_files = {
        e["path"]
        for e in reader._man["buckets"].get(str(want_bucket), [])
    }
    got_files = {f["path"] for p in pruned for f in p.files}
    assert got_files == want_files

    # end-to-end: the pruned read still returns exactly the right rows
    register(spark)
    got = (
        spark.read.format("synlake")
        .option("path", mor_table.path)
        .load()
        .filter(F.col("repo") == "r1")
    )
    assert_same(got, mor_table.read().filter(F.col("repo") == "r1"))


def test_pure_base_buckets_read_per_file(spark, tmp_table_path):
    t = LakeTable.create(
        spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2, write_mode="cow"
    )
    t.merge(
        _events(spark, [(f"r{i}", "p", float(i), "INSERT", i) for i in range(20)]),
        batch_id=0,
    )
    reader = LakeBatchReader({"path": t.path})
    parts = reader.partitions()
    n_files = sum(len(lst) for lst in reader._man["buckets"].values())
    assert len(parts) == n_files          # file-level parallelism
    assert all(not p.needs_reduce for p in parts)


# ---------------------------------------------------------------------------
# streaming CDC replication
# ---------------------------------------------------------------------------


def test_cdc_stream_replicates_table(spark, tmp_path):
    """A → (readStream synlake_cdc / foreachBatch merge) → B converges to
    A's exact state across two trigger cycles sharing one checkpoint —
    the binlog-tail → lake-upsert loop of the north rule, driven entirely
    by Spark's streaming offset log."""
    a_path, b_path = str(tmp_path / "A"), str(tmp_path / "B")
    ckpt = str(tmp_path / "ckpt")
    a = LakeTable.create(spark, a_path, SCHEMA, KEYS, num_buckets=4, write_mode="mor")
    b = LakeTable.create(spark, b_path, SCHEMA, KEYS, num_buckets=4, write_mode="mor")
    register(spark)

    def apply_to_b(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        tb = LakeTable.load(spark, b_path)
        updates = batch_df.withColumn(
            "op",
            F.when(F.coalesce(F.col("_deleted"), F.lit(False)), "DELETE").otherwise(
                "UPSERT"
            ),
        ).withColumnRenamed("_seq", "seq").drop("_deleted")
        tb.merge(updates, batch_id=int(batch_id), stream_id="repl")

    def run_stream():
        q = (
            spark.readStream.format("synlake_cdc")
            .option("path", a_path)
            .load()
            .writeStream.foreachBatch(apply_to_b)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    a.merge(
        _events(
            spark,
            [
                ("r1", "a", 1.0, "INSERT", 1),
                ("r2", "b", 2.0, "INSERT", 2),
            ],
        ),
        batch_id=0,
    )
    run_stream()
    assert_same(
        LakeTable.load(spark, b_path).read(), LakeTable.load(spark, a_path).read()
    )

    # more commits, same checkpoint — only the NEW versions flow
    a = LakeTable.load(spark, a_path)
    a.merge(
        _events(
            spark,
            [
                ("r1", "a", 10.0, "UPDATE", 3),
                ("r2", "b", 0.0, "DELETE", 4),
                ("r3", "c", 5.0, "INSERT", 5),
            ],
        ),
        batch_id=1,
    )
    run_stream()
    got = LakeTable.load(spark, b_path).read()
    want = LakeTable.load(spark, a_path).read()
    assert_same(got, want)
    assert got.count() == 2  # r2/b deleted, r1/a updated, r3/c inserted


def test_stream_rejects_cow_versions(spark, tmp_path):
    from synapse_etl_jobs_spark.sources.lake_datasource import LakeCdcStreamReader

    path = str(tmp_path / "T")
    t = LakeTable.create(spark, path, SCHEMA, KEYS, num_buckets=2, write_mode="cow")
    t.merge(_events(spark, [("r1", "a", 1.0, "INSERT", 1)]), batch_id=0)
    rdr = LakeCdcStreamReader({"path": path})
    with pytest.raises(ValueError, match="rewrote base files"):
        rdr.partitions({"version": 0}, {"version": 1})


def test_cseq_keys_follow_rename_through_datasource(spark, tmp_table_path):
    """include_internal reads must translate the per-column CRDT map
    keys through epoch renames exactly like LakeTable.read does — an
    internal-state consumer seeing ``_cseq`` keyed by a DEAD column
    name would treat the winner seq as orphaned."""
    schema = StructType().add("k", "long").add("a", "string")
    t = LakeTable.create(spark, tmp_table_path, schema, ["k"],
                         num_buckets=2, write_mode="mor")
    t.merge_patches(
        spark.createDataFrame(
            [(1, "x", "PATCH", 10, ["a"])],
            "k long, a string, op string, seq long, set_cols array<string>",
        ),
        stream_id="s", batch_id=0,
    )
    t.evolve_schema(renames={"a": "a2"})
    register(spark)
    via_ds = (
        spark.read.format("synlake")
        .option("path", t.path)
        .option("include_internal", "true")
        .load()
    )
    [row] = via_ds.collect()
    ds_keys = set((row[lds.CSEQ_COL] or {}).keys())
    assert "a2" in ds_keys and "a" not in ds_keys
    # and bit-equal to the JVM read path's translation
    [jvm_row] = LakeTable.load(spark, t.path).read(
        include_internal=True
    ).collect()
    assert dict(row[lds.CSEQ_COL]) == dict(jvm_row[lds.CSEQ_COL])


def test_lww_reduce_arrow_exact_above_2_53():
    """Seq comparison must be exact int64 — 2^53 + 1 vs 2^53 differ."""
    import pyarrow as pa

    base = 1 << 53
    t = pa.table(
        {
            "k": ["a", "a"],
            lds.SEQ_COL: pa.array([base + 1, base], pa.int64()),
            "v": [1, 2],
        }
    )
    out = lds._lww_reduce_arrow(t, ["k"])
    assert out.num_rows == 1
    assert out.column("v").to_pylist() == [1]


def test_stream_max_versions_per_trigger(spark, tmp_path):
    """Backpressure: maxVersionsPerTrigger=1 must catch up a 3-commit
    backlog in ≥3 bounded micro-batches (never one giant batch) and
    still converge to the source state."""
    a_path, b_path = str(tmp_path / "A"), str(tmp_path / "B")
    ckpt = str(tmp_path / "ckpt")
    a = LakeTable.create(spark, a_path, SCHEMA, KEYS, num_buckets=2, write_mode="mor")
    b = LakeTable.create(spark, b_path, SCHEMA, KEYS, num_buckets=2, write_mode="mor")
    for i in range(3):
        a = LakeTable.load(spark, a_path)
        a.merge(
            _events(spark, [(f"r{i}", "p", float(i), "INSERT", i + 1)]),
            batch_id=i,
        )
    register(spark)
    batch_ids = []

    def apply_to_b(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        tb = LakeTable.load(spark, b_path)
        updates = batch_df.withColumn(
            "op",
            F.when(F.coalesce(F.col("_deleted"), F.lit(False)), "DELETE").otherwise(
                "UPSERT"
            ),
        ).withColumnRenamed("_seq", "seq").drop("_deleted")
        tb.merge(updates, batch_id=int(batch_id), stream_id="repl")
        batch_ids.append(int(batch_id))  # AFTER the merge lands

    # NOTE availableNow would capture the target offset once and run ONE
    # batch to it (admission control isn't consulted) — pacing applies to
    # continuous micro-batch triggers, so poll until caught up, then stop
    q = (
        spark.readStream.format("synlake_cdc")
        .option("path", a_path)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(apply_to_b)
        .option("checkpointLocation", ckpt)
        .start()
    )
    import time

    deadline = time.time() + 180
    while time.time() < deadline:
        if LakeTable.load(spark, b_path).read().count() == 3:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)
    assert len(batch_ids) >= 3, f"backlog not paced: {batch_ids}"
    assert_same(
        LakeTable.load(spark, b_path).read(), LakeTable.load(spark, a_path).read()
    )


def test_batch_reader_pickles_without_manifest(spark, mor_table):
    """The executor-side pickle must not carry the manifest (O(files)
    payload per task at scale); read(partition) still works on the
    restored copy."""
    import pickle

    reader = LakeBatchReader({"path": mor_table.path})
    parts = reader.partitions()
    restored = pickle.loads(pickle.dumps(reader))
    assert not hasattr(restored, "_man")
    rows = sum(b.num_rows for p in parts for b in restored.read(p))
    assert rows == mor_table.read().count()


def test_stream_skips_stamped_compactions(spark, tmp_path):
    """A merge → compact → merge window yields exactly the merge deltas
    (compaction is state-preserving; its folded delta files stay on disk
    until vacuum), so a stream tailing a maintained table survives
    ReplayDriver(compact_every=K)."""
    from synapse_etl_jobs_spark.sources.lake_datasource import LakeCdcStreamReader

    path = str(tmp_path / "T")
    t = LakeTable.create(spark, path, SCHEMA, KEYS, num_buckets=2,
                         write_mode="mor")
    t.merge(_events(spark, [("r1", "a", 1.0, "INSERT", 1)]), batch_id=0)
    t.compact(drop_tombstones=False)
    t.merge(_events(spark, [("r2", "b", 2.0, "INSERT", 2)]), batch_id=1)
    hi = t.manifest.table_version

    rdr = LakeCdcStreamReader({"path": path})
    parts = rdr.partitions({"version": 0}, {"version": hi})
    files = [f["path"] for p in parts for f in p.files]
    assert len(files) == 2  # the two merge deltas, nothing from compact
    # end-to-end: replicate across the compaction window
    register(spark)
    b_path = str(tmp_path / "B")
    b = LakeTable.create(spark, b_path, SCHEMA, KEYS, num_buckets=2,
                         write_mode="mor")

    def apply_to_b(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        tb = LakeTable.load(spark, b_path)
        updates = batch_df.withColumn(
            "op",
            F.when(F.coalesce(F.col("_deleted"), F.lit(False)), "DELETE")
            .otherwise("UPSERT"),
        ).withColumnRenamed("_seq", "seq").drop("_deleted")
        tb.merge(updates, batch_id=int(batch_id), stream_id="repl")

    q = (
        spark.readStream.format("synlake_cdc")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(apply_to_b)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert_same(LakeTable.load(spark, b_path).read(),
                LakeTable.load(spark, path).read())


def test_stream_fails_loudly_on_rollback(spark, tmp_path):
    """A rollback inside the window reverts rows with no per-row record —
    the stream must raise (a silent empty batch would diverge replicas)."""
    from synapse_etl_jobs_spark.sources.lake_datasource import LakeCdcStreamReader

    path = str(tmp_path / "T")
    t = LakeTable.create(spark, path, SCHEMA, KEYS, num_buckets=2,
                         write_mode="mor")
    t.merge(_events(spark, [("r1", "a", 1.0, "INSERT", 1)]), batch_id=0)
    t.merge(_events(spark, [("r2", "b", 2.0, "INSERT", 2)]), batch_id=1)
    t.rollback(1)
    hi = t.manifest.table_version
    rdr = LakeCdcStreamReader({"path": path})
    with pytest.raises(ValueError, match="rollback"):
        rdr.partitions({"version": 0}, {"version": hi})
    # windows strictly before the rollback still plan fine
    assert rdr.partitions({"version": 0}, {"version": 2})


def test_stream_fails_with_expiry_error_after_vacuum(spark, tmp_path):
    """A consumer that falls behind the source's vacuum retention gets an
    explicit expiry error (re-sync guidance), not a raw FileNotFound."""
    from synapse_etl_jobs_spark.sources.lake_datasource import LakeCdcStreamReader

    path = str(tmp_path / "T")
    t = LakeTable.create(spark, path, SCHEMA, KEYS, num_buckets=2,
                         write_mode="mor")
    for i in range(5):
        t.merge(_events(spark, [(f"r{i}", "a", 1.0, "INSERT", i + 1)]),
                batch_id=i)
    t.vacuum(retain_versions=2)
    hi = t.manifest.table_version
    rdr = LakeCdcStreamReader({"path": path})
    with pytest.raises(ValueError, match="expired by vacuum"):
        rdr.partitions({"version": 1}, {"version": hi})
