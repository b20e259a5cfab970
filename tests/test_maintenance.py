"""Lake maintenance policies: auto-compaction under sustained MoR
ingest, and bucket-spec evolution (rebucket)."""

import pytest
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable

SCHEMA = StructType().add("k", "long").add("v", "string")
EV = "k long, v string, op string, seq long"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV)


def _state(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


def _delta_counts(t):
    return {
        b: sum(1 for e in lst if e.get("kind", "base") == "delta")
        for b, lst in t.manifest.buckets.items()
    }


def test_auto_compact_bounds_delta_count(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2,
                         write_mode="mor", write_salt=1,
                         auto_compact_min_deltas=3)
    saw_auto = False
    for i in range(8):
        r = t.merge(
            _ev(spark, [(j, f"v{i}", "UPSERT", i * 100 + j) for j in range(20)]),
            stream_id="s", batch_id=i,
        )
        saw_auto = saw_auto or "auto_compacted" in r
        # the policy invariant: no bucket ever ACCUMULATES >= threshold
        # deltas past a merge (the follow-on commit folded them)
        assert all(n < 3 for n in _delta_counts(t).values()), _delta_counts(t)
    assert saw_auto
    assert _state(t) == {j: "v7" for j in range(20)}
    # tombstones survive the auto path: delete, auto-compact, then a
    # stale pre-delete update must not resurrect
    t.merge(_ev(spark, [(0, None, "DELETE", 10_000)]), stream_id="s", batch_id=100)
    for i in range(3):  # push the bucket past the threshold again
        t.merge(_ev(spark, [(2, f"x{i}", "UPSERT", 20_000 + i)]),
                stream_id="s", batch_id=200 + i)
    t.merge(_ev(spark, [(0, "stale", "UPSERT", 500)]), stream_id="s", batch_id=300)
    assert 0 not in _state(t)


def test_auto_compact_off_by_default(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2,
                         write_mode="mor", write_salt=1)
    for i in range(5):
        r = t.merge(_ev(spark, [(1, f"v{i}", "UPSERT", i)]),
                    stream_id="s", batch_id=i)
        assert "auto_compacted" not in r
    assert max(_delta_counts(t).values()) == 5


def test_rebucket_preserves_state_and_history(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2,
                         write_mode="mor", write_salt=1)
    t.merge(_ev(spark, [(j, f"v{j}", "UPSERT", j) for j in range(50)]),
            stream_id="s", batch_id=0)
    t.merge(_ev(spark, [(7, None, "DELETE", 1000)]), stream_id="s", batch_id=1)
    before = _state(t)
    v_old = t.manifest.table_version

    r = t.rebucket(8)
    assert r["applied"] and t.manifest.num_buckets == 8
    assert _state(t) == before
    assert set(t.manifest.buckets) <= {str(b) for b in range(8)}
    # time travel across the spec boundary: old manifest keeps old spec
    old = LakeTable.load(spark, tmp_table_path, version=v_old)
    assert old.manifest.num_buckets == 2
    assert {r["k"]: r["v"] for r in old.read().collect()} == before

    # merges keep working under the new spec; tombstone survived the
    # rewrite (stale pre-delete update loses)
    t.merge(_ev(spark, [(7, "stale", "UPSERT", 500)]), stream_id="s", batch_id=2)
    assert 7 not in _state(t)
    t.merge(_ev(spark, [(60, "new", "UPSERT", 2000)]), stream_id="s", batch_id=3)
    assert _state(t)[60] == "new"
    # fresh handle agrees
    assert {r["k"]: r["v"] for r in
            LakeTable.load(spark, tmp_table_path).read().collect()} == _state(t)


def test_rebucket_validates_spec(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2)
    with pytest.raises(ValueError):
        t.rebucket(4, bucket_cols=["v"])  # not a key column
    with pytest.raises(ValueError):
        t.rebucket(0)


def test_binpack_compact_sizes_files_per_bucket(spark, tmp_table_path):
    """compact(target_file_mb=...) sizes each bucket's output file count
    from its bytes: a bucket holding ~N x target emits ~N files, a tiny
    bucket exactly one — and the state is unchanged."""
    from pyspark.sql import functions as F

    schema = StructType().add("k", "long").add("v", "string")
    t = LakeTable.create(spark, tmp_table_path, schema, ["k"], num_buckets=2,
                         write_mode="mor", write_salt=1)
    # ~100 KB of payload per row-group-ish chunk; several merges → several files
    rows = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        # incompressible payload (~256 B/row) so on-disk bytes track rows
        F.concat(*[F.sha2(F.concat(F.col("id").cast("string"), F.lit(i)), 256)
                   for i in range(4)]).alias("v"),
        F.lit("UPSERT").alias("op"), F.col("id").alias("seq"),
    )
    t.merge(rows, stream_id="s", batch_id=0)
    before = t.read().count()
    r = t.compact(target_file_mb=0.05)  # ~50 KB target → multiple files/bucket
    assert r["applied"]
    per_bucket = {b: len(lst) for b, lst in t.manifest.buckets.items()}
    assert all(n >= 2 for n in per_bucket.values()), per_bucket
    assert t.read().count() == before
    # re-compact with a huge target folds each bucket to ONE file
    t.merge(rows.withColumn("seq", F.col("seq") + 10_000), stream_id="s", batch_id=1)
    t.compact(target_file_mb=1024)
    per_bucket = {b: len(lst) for b, lst in t.manifest.buckets.items()}
    assert all(n == 1 for n in per_bucket.values()), per_bucket
    assert t.read().count() == before


def test_type_widening_reads_old_files_and_guards(spark, tmp_table_path):
    """evolve_schema(widen_types=...): old int files read back as bigint
    without rewrite; post-widen merges hold values beyond int range; LWW
    across the widening boundary still applies; unsafe/key widenings are
    rejected."""
    schema = StructType().add("k", "long").add("n", "integer").add("f", "float")
    t = LakeTable.create(spark, tmp_table_path, schema, ["k"], num_buckets=2,
                         write_mode="mor", write_salt=1)
    ev = "k long, n int, f float, op string, seq long"
    t.merge(spark.createDataFrame([(1, 100, 1.5, "UPSERT", 1),
                                   (2, 200, 2.5, "UPSERT", 2)], ev),
            stream_id="s", batch_id=0)

    t.evolve_schema(widen_types={"n": "bigint", "f": "double"})
    got = {f.name: f.dataType.simpleString() for f in t.read().schema.fields}
    assert got["n"] == "bigint" and got["f"] == "double"
    assert {r["k"]: r["n"] for r in t.read().collect()} == {1: 100, 2: 200}

    big = 3_000_000_000  # > int range
    ev2 = "k long, n long, f double, op string, seq long"
    t.merge(spark.createDataFrame([(1, big, 9.25, "UPSERT", 10)], ev2),
            stream_id="s", batch_id=1)
    state = {r["k"]: (r["n"], r["f"]) for r in t.read().collect()}
    assert state == {1: (big, 9.25), 2: (200, 2.5)}
    # stale pre-widen event loses to the post-widen row
    t.merge(spark.createDataFrame([(1, 7, 0.0, "UPSERT", 5)], ev2),
            stream_id="s", batch_id=2)
    assert {r["k"]: r["n"] for r in t.read().collect()}[1] == big

    with pytest.raises(ValueError):
        t.evolve_schema(widen_types={"n": "int"})   # narrowing
    with pytest.raises(ValueError):
        t.evolve_schema(widen_types={"k": "bigint"})  # key column
    with pytest.raises(ValueError):
        t.evolve_schema(widen_types={"missing": "bigint"})


def test_rebucket_empty_table(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2)
    r = t.rebucket(16)
    assert r["applied"]
    assert t.read().count() == 0
    t.merge(_ev(spark, [(1, "a", "UPSERT", 1)]), stream_id="s", batch_id=0)
    assert _state(t) == {1: "a"}
