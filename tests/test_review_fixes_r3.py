"""Regression tests for the round-2 review findings (ADVICE.md):

1. IncrementalAggView.advance() refuses windows containing a rebucket
   (bucket-spec change) or a vanished populated bucket — previously a
   non-overlapping rebucket slipped past the rewrite check and the view
   silently double-counted;
2. bloom point-index probes DEGRADE (scan instead of prune) on key
   types the driver-side xxhash64 port can't hash, instead of bricking
   every lookup on a table whose write path happily built blooms;
3. the Python DataSource's LWW reducer keeps int64 keys exact — the
   default pandas conversion made nullable int64 float64, colliding
   distinct keys above 2^53;
4. z-order boundary sampling is uniform over ROWS, not distinct values
   (a skewed column's heavy hitter must appear among the cuts).
"""

import pyarrow as pa
import pytest
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import IncrementalAggView, LakeTable

SCHEMA = (
    StructType()
    .add("repo", "string")
    .add("path", "string")
    .add("lang", "string")
    .add("n_bytes", "long")
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, repo string, path string, lang string, n_bytes long"
    )


def test_advance_refuses_rebucket_window(spark, tmp_path):
    source = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["repo", "path"],
        num_buckets=8, write_mode="mor",
    )
    source.merge(
        _batch(spark, [("UPSERT", 1, "r1", "a", "py", 10)]), batch_id=0
    )
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), source, ["lang"], {"bytes": "n_bytes"}
    )
    # the trap from ADVICE.md: data lives in ONE old bucket; rebucket to
    # a spec whose populated bucket ids need not overlap the old one
    source.rebucket(2)
    source.merge(
        _batch(spark, [("UPSERT", 2, "r1", "b", "py", 20)]), batch_id=1
    )
    with pytest.raises(ValueError, match="rebucket|refresh"):
        view.advance()
    # refresh() is the documented recovery
    view.refresh()
    got = {r["lang"]: (r["n_rows"], r["bytes"]) for r in view.view.read().collect()}
    assert got == {"py": (2, 30)}


def test_bloom_lookup_degrades_on_unhashable_key_type(spark, tmp_path):
    # double key: JVM xxhash64 builds blooms at write time, but the
    # driver-side port raises NotImplementedError for doubles — the
    # probe must fall back to scanning, not crash
    schema = StructType().add("kd", "double").add("v", "string")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["kd"],
        num_buckets=2, write_mode="mor", point_index_bits=1024,
    )
    t.merge(
        spark.createDataFrame(
            [(1.5, "a", "UPSERT", 1), (2.5, "b", "UPSERT", 2)],
            "kd double, v string, op string, seq long",
        ),
        batch_id=0,
    )
    got = {r["kd"]: r["v"] for r in t.lookup_keys([(1.5,)]).collect()}
    assert got == {1.5: "a"}


def test_lww_reduce_arrow_int64_keys_exact_above_2_53():
    from synapse_etl_jobs_spark.sources.lake_datasource import (
        DELETED_COL, SEQ_COL, _lww_reduce_arrow,
    )

    big = 2**53
    # two DISTINCT keys that collide after float64 rounding
    k1, k2 = big, big + 1
    assert float(k1) == float(k2)
    t = pa.table({
        "k": pa.array([k1, k2, None], type=pa.int64()),
        "v": ["a", "b", "c"],
        SEQ_COL: pa.array([1, 2, 3], type=pa.int64()),
        DELETED_COL: pa.array([False, False, False]),
    })
    out = _lww_reduce_arrow(t, ["k"])
    # all three keys are distinct (incl. the null key row): nothing drops
    assert out.num_rows == 3
    assert sorted(out.column("v").to_pylist()) == ["a", "b", "c"]


def test_zorder_sample_uniform_over_rows(spark):
    from synapse_etl_jobs_spark.lake.zorder import sample_boundaries

    # 95% of rows share one value; a row-uniform sample's evenly spaced
    # cuts must therefore include the heavy hitter. The old value-hash
    # ordering gave ALL duplicates one draw — the heavy value was in or
    # out of the sample atomically, skewing every boundary.
    rows = [(7, i) for i in range(950)] + [(i, 1000 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "c long, other long")
    bounds = sample_boundaries(df, ["c"], bits=3, sample_rows=200, seed=1)["c"]
    assert 7 in bounds
    # determinism: same data, same seed, same cuts
    assert bounds == sample_boundaries(df, ["c"], bits=3, sample_rows=200, seed=1)["c"]
