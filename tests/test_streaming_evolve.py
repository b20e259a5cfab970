"""Replay driver (bookmarks/exactly-once), Structured Streaming ingestion,
and schema evolution — SURVEY.md §5 tests 3-4."""

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.sources.synth import flatten_events, synth_change_events
from synapse_etl_jobs_spark.streaming import ReplayDriver, stream_into_table

SCHEMA = StructType().add("repo", "string").add("path", "string") \
    .add("commit", "string").add("lang", "string").add("content", "string")
KEYS = ["repo", "path", "commit"]


def _events(spark, n=3000, seed=5):
    return flatten_events(synth_change_events(spark, n, seed=seed, n_keys=600))


def test_replay_driver_resume(spark, tmp_table_path):
    """Kill-and-restart: a second full replay skips applied batches via
    markers and converges to the same state."""
    ev = _events(spark)
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    d = ReplayDriver(t, batch_events=1000)
    # first attempt "dies" after 2 batches
    d.replay(ev, seq_start=0, seq_end=2000)
    assert d.high_watermark() is not None
    v_mid = t.manifest.table_version
    # restart: full range — first 2 batches short-circuit
    stats = d.replay(ev)
    skipped = [s for s in stats if not s.get("applied", True)]
    assert len(skipped) == 2
    final = t.read().count()
    # a fresh single-shot table agrees
    t2 = LakeTable.create(spark, tmp_table_path + "_b", SCHEMA, KEYS, num_buckets=8)
    ReplayDriver(t2, batch_events=10_000).replay(ev)
    assert t2.read().count() == final
    assert t.manifest.table_version > v_mid


def test_structured_streaming_ingest(spark, tmp_path):
    """File-source streaming → foreachBatch merge: end state equals batch
    replay; re-running the stream with the same checkpoint applies nothing
    new (exactly-once)."""
    ev = _events(spark, n=2000)
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)

    t = LakeTable.create(
        spark, str(tmp_path / "tbl"), SCHEMA, KEYS, num_buckets=8, write_mode="mor"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    ckpt = str(tmp_path / "ckpt")
    stream_into_table(t, stream, ckpt, stream_id="s1")
    t = LakeTable.load(spark, str(tmp_path / "tbl"))
    count1 = t.read().count()
    assert count1 > 0

    # batch-replay oracle
    t2 = LakeTable.create(spark, str(tmp_path / "tbl2"), SCHEMA, KEYS, num_buckets=8)
    ReplayDriver(t2, batch_events=10_000).replay(ev)
    assert t2.read().count() == count1

    # same checkpoint again: stream has nothing new; state unchanged
    stream_into_table(t, stream, ckpt, stream_id="s1")
    t = LakeTable.load(spark, str(tmp_path / "tbl"))
    assert t.read().count() == count1


def test_schema_evolution_mid_stream(spark, tmp_table_path):
    """Add + rename columns between batches; old-epoch rows stay readable
    under the new names with nulls for added columns."""
    ev = _events(spark, n=2000)
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    t.merge(ev.filter(F.col("seq") < 1000), batch_id=0)
    rows_before = t.read().count()

    t.evolve_schema(add_columns=[("size_bytes", "long")], renames={"lang": "language"})
    assert t.manifest.key_cols == KEYS  # keys unaffected by this rename

    ev2 = (
        ev.filter(F.col("seq") >= 1000)
        .withColumnRenamed("lang", "language")
        .withColumn("size_bytes", F.length("content").cast("long"))
    )
    t.merge(ev2, batch_id=1)

    out = t.read()
    assert set(["repo", "path", "commit", "language", "content", "size_bytes"]) <= set(out.columns)
    # old-epoch rows: language populated (rename map), size_bytes null
    old_rows = out.filter(F.col("size_bytes").isNull())
    assert old_rows.count() > 0
    assert old_rows.filter(F.col("language").isNotNull()).count() > 0
    new_rows = out.filter(F.col("size_bytes").isNotNull())
    assert new_rows.count() > 0
    # reload from disk mid-epoch works
    t3 = LakeTable.load(spark, tmp_table_path)
    assert t3.read().count() == out.count() >= rows_before


def test_key_column_rename(spark, tmp_table_path):
    """Renaming a KEY column updates key/bucket specs and future merges."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=4)
    ddl = ("op string, seq long, repo string, path string, commit string, "
           "lang string, content string")
    t.merge(spark.createDataFrame(
        [("INSERT", 1, "r1", "a.py", "c1", "python", "v1")], ddl), batch_id=0)
    t.evolve_schema(renames={"repo": "repository"})
    assert t.manifest.key_cols == ["repository", "path", "commit"]
    ddl2 = ddl.replace("repo string", "repository string")
    t.merge(spark.createDataFrame(
        [("UPDATE", 2, "r1", "a.py", "c1", "python", "v2")], ddl2), batch_id=1)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v2"
    assert rows[0]["repository"] == "r1"
