"""Rollup cascade mergeability and HLL sketch union semantics."""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.operators.rollup import (
    rollup_cascade, sketch_distinct, sketch_union_estimate,
)


def test_cascade_equals_direct_aggregation(spark):
    ev = spark.range(5000).select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_dt_interval(mins=F.col("id") % 2000)).alias("ts"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    measures = {"n": ("count", None), "s": ("sum", "v"),
                "mn": ("min", "v"), "mx": ("max", "v")}
    minute, hour, day = rollup_cascade(
        ev, "ts", measures, ["5 minutes", "1 hour", "1 day"], keys=["k"]
    )
    # each level re-aggregates the previous; all must equal direct aggs
    for lvl_df, dur in ((hour, "1 hour"), (day, "1 day")):
        direct = (
            ev.groupBy(F.window("ts", dur).alias("_w"), "k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
                 F.min("v").alias("mn"), F.max("v").alias("mx"))
            .select(F.col("_w.start").alias("bucket"), "k", "n", "s", "mn", "mx")
        )
        assert lvl_df.exceptAll(direct).count() == 0
        assert direct.exceptAll(lvl_df).count() == 0
    assert minute.count() > hour.count() > day.count()
    with pytest.raises(ValueError, match="not mergeable"):
        rollup_cascade(ev, "ts", {"a": ("avg", "v")}, ["1 hour"])


def test_sketch_union_matches_global_sketch_and_exact(spark):
    df = spark.range(200_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 10_000).alias("v"),
        (F.col("id") % 16).alias("shard"),
    )
    # sharded sketches unioned == one global sketch per group (merge law)
    sharded = sketch_union_estimate(
        sketch_distinct(df, "v", keys=["g", "shard"]), keys=["g"]
    )
    direct = sketch_union_estimate(
        sketch_distinct(df, "v", keys=["g"]), keys=["g"]
    )
    a = {r["g"]: r["distinct_est"] for r in sharded.collect()}
    b = {r["g"]: r["distinct_est"] for r in direct.collect()}
    assert a == b  # sketch union is exact w.r.t. the merged sketch state
    exact = {r["g"]: r["n"] for r in df.groupBy("g")
             .agg(F.countDistinct("v").alias("n")).collect()}
    for g, est in a.items():
        assert abs(est - exact[g]) / exact[g] < 0.05
