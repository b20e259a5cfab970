"""Z-order compaction: Morton clustering narrows per-file min/max on
EVERY clustered column (not just a sort leader), the manifest records
per-file column stats, and scan_range file-prunes against them while
returning exactly read().filter(...)."""

import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.lake.zorder import (
    morton_expr,
    quantize_expr,
    sample_boundaries,
)

SCHEMA = (
    StructType().add("k", "long").add("x", "long").add("y", "long")
)
DOMAIN = 1024
N = 20_000


def _build(spark, path, **compact_kw):
    t = LakeTable.create(
        spark, path, SCHEMA, ["k"], num_buckets=2, write_salt=8,
        write_mode="mor",
    )
    # x, y independent uniform in [0, DOMAIN) — the worst case for a
    # linear sort (clustering x tells you nothing about y)
    ev = (
        spark.range(N)
        .select(
            F.lit("UPSERT").alias("op"),
            F.col("id").alias("seq"),
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOMAIN)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(DOMAIN)).alias("y"),
        )
    )
    t.merge(ev, batch_id=0)
    s = t.compact(**compact_kw)
    assert s["applied"]
    return t


def _file_spans(t, col):
    """Per-file (max-min)/DOMAIN coverage of ``col`` from manifest stats."""
    spans = []
    for lst in t.manifest.buckets.values():
        for e in lst:
            lo, hi = e["stats"][col]
            spans.append((hi - lo) / DOMAIN)
    return spans


def test_zorder_narrows_every_column(spark, tmp_path):
    zt = _build(spark, str(tmp_path / "z"), zorder_cols=["x", "y"])
    st = _build(spark, str(tmp_path / "s"), sort_cols=["x"])

    # both rewrites record stats for their clustered columns
    zx, zy = _file_spans(zt, "x"), _file_spans(zt, "y")
    sx = _file_spans(st, "x")
    assert len(zx) >= 8

    # z-order: BOTH columns narrowed per FILE (contiguous curve ranges
    # per file). 8 files/bucket over a 2-D curve → ~1/sqrt(8) ≈ 0.35 per
    # side; assert the loose bound 0.6 (sampling + boundary dedup slack)
    assert sum(zx) / len(zx) < 0.6, zx
    assert sum(zy) / len(zy) < 0.6, zy
    # linear sort range-splits files on its LEADING column (contiguous
    # sampled-boundary ranges per file), so x narrows per file too —
    # what it cannot do is narrow a SECOND column: y stats aren't even
    # recorded (below), and a sort on x leaves y unclustered; narrowing
    # every clustered column at once is the gap z-order closes
    assert sum(sx) / len(sx) < 0.6, sx
    for lst in st.manifest.buckets.values():
        for e in lst:
            assert "x" in e["stats"]
    for lst in st.manifest.buckets.values():
        for e in lst:
            assert "y" not in e["stats"]


def test_scan_range_prunes_and_matches_filter(spark, tmp_path):
    t = _build(spark, str(tmp_path / "z"), zorder_cols=["x", "y"])
    bounds = {"y": (100, 160)}
    _, prune = t._range_pruned_entries(bounds)
    # a y-predicate prunes files even though y is the SECOND z column
    assert prune["files_kept"] < prune["files_total"], prune

    got = {tuple(r) for r in t.scan_range(bounds).collect()}
    want = {
        tuple(r)
        for r in t.read().filter(F.col("y").between(100, 160)).collect()
    }
    assert got == want and len(want) > 0


def test_scan_range_keeps_mor_buckets_whole(spark, tmp_path):
    """After fresh deltas land, affected buckets must be read whole
    (LWW needs every key version) — and results stay exact."""
    t = _build(spark, str(tmp_path / "z"), zorder_cols=["x", "y"])
    up = spark.createDataFrame(
        [("UPSERT", N + 1, 7, 999, 5), ("DELETE", N + 2, 8, 0, 0)],
        "op string, seq long, k long, x long, y long",
    )
    t.merge(up, batch_id=1)
    got = {tuple(r) for r in t.scan_range({"y": (0, 50)}).collect()}
    want = {
        tuple(r) for r in t.read().filter(F.col("y").between(0, 50)).collect()
    }
    assert got == want
    # the updated row is found through the pruned path
    assert (7, 999, 5) in {tuple(r) for r in t.scan_range({"x": (999, 999)}).collect()}


def test_scan_range_survives_reload(spark, tmp_path):
    t = _build(spark, str(tmp_path / "z"), zorder_cols=["x", "y"])
    t2 = LakeTable.load(spark, t.path)
    _, prune = t2._range_pruned_entries({"x": (0, 63)})
    assert prune["files_kept"] < prune["files_total"]
    assert t2.scan_range({"x": (0, 63)}).count() == \
        t2.read().filter("x <= 63").count()


def test_morton_quantize_expressions(spark):
    """morton_expr interleaves bits exactly; quantize_expr counts
    boundaries <= value with nulls at the origin."""
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    # a=5 (101), b=3 (011), bits=3 → interleave a into even, b into odd:
    # code = sum a_i<<(2i) + b_i<<(2i+1) = (1<<0)+(0<<2)+(1<<4) + (1<<1)+(1<<3)+(0<<5) = 27
    code = df.select(
        morton_expr([F.col("a"), F.col("b")], 3).alias("c")
    ).collect()[0]["c"]
    assert code == 27

    q = spark.createDataFrame(
        [(None,), (1,), (10,), (25,)], "v long"
    ).select(quantize_expr("v", [5, 20]).alias("q")).collect()
    assert [r["q"] for r in q] == [0, 0, 1, 2]


def test_sample_boundaries_bounded_and_ordered(spark):
    df = spark.range(50_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v")
    )
    b = sample_boundaries(df, ["v"], bits=4, sample_rows=5_000)["v"]
    assert 1 <= len(b) <= 15 and b == sorted(b)
