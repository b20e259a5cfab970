"""Incremental materialized-view maintenance (lake/incremental.py):
the view must stay bit-equal to a from-scratch re-aggregation of the
source after every advance, across inserts / updates / deletes / group
migration, and must refuse windows crossed by base-file rewrites."""

import random

import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import IncrementalAggView, LakeTable

SCHEMA = (
    StructType()
    .add("repo", "string")
    .add("path", "string")
    .add("lang", "string")
    .add("n_bytes", "long")
)
GROUPS = ["lang"]
SUMS = {"bytes": "n_bytes", "files2x": "n_bytes * 0 + 2"}


def _recompute(source):
    return {
        (r["lang"],): (r["n"], r["b"], r["f"])
        for r in source.read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("b"),
            F.sum(F.lit(2)).alias("f"),
        )
        .collect()
    }


def _view_state(view):
    return {
        (r["lang"],): (r["n_rows"], r["bytes"], r["files2x"])
        for r in view.read().collect()
    }


def _batch(spark, rows):
    # rows: (op, seq, repo, path, lang, n_bytes)
    return spark.createDataFrame(
        rows, "op string, seq long, repo string, path string, lang string, n_bytes long"
    )


def test_advance_matches_recompute_random_batches(spark, tmp_path):
    rng = random.Random(7)
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=8, write_mode="mor",
    )
    langs = ["py", "rs", "go", "sql"]
    keys = [(f"r{i % 5}", f"f{i}") for i in range(40)]
    live = set()
    seq = 0

    def random_batch(n):
        nonlocal seq
        rows = []
        for _ in range(n):
            seq += 1
            repo, path = rng.choice(keys)
            if (repo, path) in live and rng.random() < 0.25:
                rows.append(("DELETE", seq, repo, path, None, None))
                live.discard((repo, path))
            else:
                rows.append(
                    ("UPSERT", seq, repo, path, rng.choice(langs), rng.randrange(1, 500))
                )
                live.add((repo, path))
        return rows

    source.merge(_batch(spark, random_batch(30)), batch_id=0)
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), source, GROUPS, SUMS
    )
    assert _view_state(view) == _recompute(source)

    for b in range(1, 4):
        source.merge(_batch(spark, random_batch(25)), batch_id=b)
        stats = view.advance()
        assert stats["affected_buckets"] >= 1
        assert _view_state(view) == _recompute(source)

    # advance with nothing new is a no-op
    assert view.advance()["reason"] == "up_to_date"
    assert view.applied_version == source.manifest.table_version


def test_group_migration_and_disappearance(spark, tmp_path):
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )
    source.merge(
        _batch(spark, [("UPSERT", 1, "r", "a", "py", 10), ("UPSERT", 2, "r", "b", "rs", 20)]),
        batch_id=0,
    )
    view = IncrementalAggView.create(spark, str(tmp_path / "view"), source, GROUPS, SUMS)

    # 'a' migrates py -> rs; 'b' deleted: py group vanishes, rs has only 'a'
    source.merge(
        _batch(spark, [("UPSERT", 3, "r", "a", "rs", 11), ("DELETE", 4, "r", "b", None, None)]),
        batch_id=1,
    )
    view.advance()
    assert _view_state(view) == {("rs",): (1, 11, 2)} == _recompute(source)


def test_view_tails_streaming_ingest(spark, tmp_path):
    """Composition with the streaming path: Structured-Streaming
    ingestion (foreachBatch exactly-once merge) feeds the source;
    advancing the view after each availableNow pass keeps it equal to a
    full recompute — the continuously-maintained-view loop."""
    import json
    import os

    from synapse_etl_jobs_spark.streaming import stream_into_table

    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )

    def put(name, rows):
        with open(os.path.join(src_dir, name), "w") as f:
            for op, seq, repo, path, lang, nb in rows:
                f.write(json.dumps({"op": op, "seq": seq, "repo": repo,
                                    "path": path, "lang": lang, "n_bytes": nb}) + "\n")

    def ingest():
        stream = spark.readStream.schema(
            "op string, seq long, repo string, path string, lang string, n_bytes long"
        ).json(src_dir)
        stream_into_table(source, stream, ckpt)

    put("b1.json", [("UPSERT", 1, "r", "a", "py", 10), ("UPSERT", 2, "r", "b", "rs", 20)])
    ingest()
    view = IncrementalAggView.create(spark, str(tmp_path / "view"), source, GROUPS, SUMS)

    put("b2.json", [("UPSERT", 3, "r", "a", "go", 30), ("DELETE", 4, "r", "b", None, None),
                    ("UPSERT", 5, "s", "c", "py", 7)])
    ingest()
    view.advance()
    assert _view_state(view) == _recompute(source) == {
        ("go",): (1, 30, 2), ("py",): (1, 7, 2),
    }


def test_cow_window_rejected_and_refresh_recovers(spark, tmp_path):
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )
    source.merge(_batch(spark, [("UPSERT", 1, "r", "a", "py", 5)]), batch_id=0)
    view = IncrementalAggView.create(spark, str(tmp_path / "view"), source, GROUPS, SUMS)

    # a COPY-ON-WRITE merge rewrites the affected buckets' base files
    # with no state-preserving stamp — advance() must refuse the window
    # (compaction, by contrast, is stamped and skipped — see
    # test_compaction_window_skipped)
    source.merge(_batch(spark, [("UPSERT", 2, "r", "b", "go", 7)]),
                 batch_id=1, mode="cow")
    source = LakeTable.load(spark, str(tmp_path / "src"))

    try:
        view.advance()
        raised = False
    except ValueError as e:
        raised = True
        assert "refresh()" in str(e)
    assert raised

    view.refresh()
    assert _view_state(view) == _recompute(source)
    # after refresh the watermark is current again; advance is a no-op
    assert view.advance()["reason"] == "up_to_date"


def test_rollback_window_rejected_and_refresh_recovers(spark, tmp_path):
    """A rollback reverts source rows with no bucket-delta record:
    advance() must refuse the window loudly (not silently misapply) and
    refresh() must recover."""
    import pytest

    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )
    source.merge(_batch(spark, [("UPSERT", 1, "r", "a", "py", 5)]), batch_id=0)
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), source, GROUPS, SUMS)
    source.merge(_batch(spark, [("UPSERT", 2, "r", "b", "go", 7)]), batch_id=1)
    source.rollback(1)
    with pytest.raises(ValueError, match="rollback"):
        view.advance()
    view.refresh()
    source = LakeTable.load(spark, str(tmp_path / "src"))
    assert _view_state(view) == _recompute(source)


def test_null_group_key_accumulates(spark, tmp_path):
    """A NULL group value is one legal group (GROUP BY semantics): the
    advance adjustment join and the refresh anti-join must use
    null-safe equality — plain equi-joins never match null, so the
    adjustment OVERWRITES the stored null-group value instead of
    accumulating (observed via an end-to-end drive) and refresh
    tombstones a live null group."""
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )
    source.merge(_batch(spark, [
        ("UPSERT", 1, "r", "a", None, 5),
        ("UPSERT", 2, "r", "b", "py", 7),
        ("UPSERT", 3, "r", "c", None, 11),
    ]), batch_id=0)
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), source, GROUPS, SUMS)
    assert _view_state(view) == _recompute(source)

    # second batch touches the null group again: must ACCUMULATE
    source.merge(_batch(spark, [
        ("UPSERT", 4, "r", "d", None, 2),
        ("DELETE", 5, "r", "a", None, None),
    ]), batch_id=1)
    view.advance()
    assert _view_state(view) == _recompute(source)
    assert _view_state(view)[(None,)][0] == 2  # c + d

    # refresh must not tombstone the live null group
    view.refresh()
    assert _view_state(view) == _recompute(source)

    # and must tombstone it once it truly vanishes
    source.merge(_batch(spark, [
        ("DELETE", 6, "r", "c", None, None),
        ("DELETE", 7, "r", "d", None, None),
    ]), batch_id=2)
    view.advance()
    assert (None,) not in _view_state(view)
    assert _view_state(view) == _recompute(source)


def test_compaction_window_skipped(spark, tmp_path):
    """Compaction versions carry commit_kind='compact' and are
    state-preserving: advance() must skip them and keep advancing
    incrementally — the maintained-ingest source
    (ReplayDriver(compact_every=K)) must not force refresh()."""
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )
    source.merge(_batch(spark, [
        ("UPSERT", 1, "r", "a", "py", 5),
        ("UPSERT", 2, "r", "b", "go", 7),
    ]), batch_id=0)
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), source, GROUPS, SUMS)

    # window: merge + tombstone-GC'ing compaction + merge + compaction
    source.merge(_batch(spark, [
        ("UPSERT", 3, "r", "c", "py", 11),
        ("DELETE", 4, "r", "b", None, None),
    ]), batch_id=1)
    source.compact()  # drop_tombstones=True — live rows unchanged
    source.merge(_batch(spark, [
        ("UPSERT", 5, "r", "b", "go", 2),
        ("UPSERT", 6, "r", "a", "rs", 5),   # group migration py→rs
    ]), batch_id=2)
    source.compact(drop_tombstones=False)
    assert source.manifest.commit_kind == "compact"

    stats = view.advance()
    assert stats["applied"] is not False
    assert _view_state(view) == _recompute(source)
    assert view.advance()["reason"] == "up_to_date"

    # the driver-native maintained-ingest shape end to end
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    drv = ReplayDriver(source, batch_events=2, compact_every=1,
                       op_col="op", seq_col="seq")
    more = _batch(spark, [
        ("UPSERT", 7, "r", "d", "sql", 3),
        ("UPSERT", 8, "r", "e", "py", 9),
        ("DELETE", 9, "r", "c", None, None),
        ("UPSERT", 10, "r", "f", "go", 1),
    ])
    drv.replay(more, seq_start=7, seq_end=11)
    stats = view.advance()
    assert stats["applied"] is not False
    assert _view_state(view) == _recompute(source)
