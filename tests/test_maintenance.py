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


def test_rebucket_empty_table(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2)
    r = t.rebucket(16)
    assert r["applied"]
    assert t.read().count() == 0
    t.merge(_ev(spark, [(1, "a", "UPSERT", 1)]), stream_id="s", batch_id=0)
    assert _state(t) == {1: "a"}
