"""Grouped analytics entry queries: exact percentiles (linear
interpolation, ANSI quantile_cont semantics) and rollup grouping sets
(Expand-based multi-level aggregation with grouping_id bitmask)."""

import pyspark.sql.functions as F


def test_group_percentiles_interpolation(spark):
    # p50 of [1, 2, 3, 4] = 2.5 (linear interpolation between ranks),
    # p90 = 3.7 — pins quantile_cont semantics, not nearest-rank
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)], "event_type string, value double"
    )
    row = df.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    ).collect()[0]
    assert row["p50"] == 2.5
    assert abs(row["p90"] - 3.7) < 1e-9


def test_rollup_grouping_id(spark):
    df = spark.createDataFrame(
        [("x", "A", 1.0), ("x", "B", 2.0), ("y", "A", 4.0)],
        "p string, s string, v double",
    )
    out = {
        (r["p"], r["s"], r["gid"]): r["total"]
        for r in df.rollup("p", "s")
        .agg(F.sum("v").alias("total"), F.grouping_id().cast("int").alias("gid"))
        .collect()
    }
    # leaf rows gid=0, per-p subtotals gid=1 (s masked), grand total gid=3
    assert out[("x", "A", 0)] == 1.0
    assert out[("x", None, 1)] == 3.0
    assert out[("y", None, 1)] == 4.0
    assert out[(None, None, 3)] == 7.0
    assert len(out) == 3 + 2 + 1
