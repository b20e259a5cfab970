"""Stream-stream interval join (streaming/joins.py): inner and
left-outer attribution across micro-batches with watermarked state
eviction, and batch/stream definition parity."""

import json
import os

import pyspark.sql.functions as F

from synapse_etl_jobs_spark.streaming import interval_join

SCHEMA_L = "k string, ts timestamp, imp string"
SCHEMA_R = "k string, ts timestamp, click string"
T = "2024-01-01 10:{m:02d}:00"


def _write(src, name, rows, field):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for k, minute, v in rows:
            f.write(json.dumps({"k": k, "ts": T.format(m=minute), field: v}) + "\n")


def _run(spark, lsrc, rsrc, ckpt, out, how):
    left = spark.readStream.schema(SCHEMA_L).json(lsrc)
    right = spark.readStream.schema(SCHEMA_R).json(rsrc)
    j = interval_join(
        left, right, ["k"], lower="0 seconds", upper="10 minutes",
        watermark="5 minutes", how=how,
    )
    q = (
        j.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()


def _rows(spark, out):
    return {
        (r["k"], str(r["l_ts"]), str(r["r_ts"]), r["l_imp"], r["r_click"])
        for r in spark.read.parquet(out).collect()
    }


def test_inner_interval_join_across_batches(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    # batch 1: impression at 10:01; click arrives in batch 2 at 10:08 —
    # the join must buffer the impression across micro-batches
    _write(lsrc, "b1.json", [("a", 1, "i1")], "imp")
    _write(rsrc, "b1.json", [], "click")
    _run(spark, lsrc, rsrc, ckpt, out, "inner")
    _write(lsrc, "b2.json", [], "imp")
    _write(rsrc, "b2.json", [("a", 8, "c1"), ("a", 30, "c-late")], "click")
    _run(spark, lsrc, rsrc, ckpt, out, "inner")
    got = _rows(spark, out)
    # c1 is within [ts, ts+10m] of i1 → matched; c-late (10:30) is not
    assert got == {("a", T.format(m=1), T.format(m=8), "i1", "c1")}


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    # impression with NO click; a much later right-side event advances
    # the watermark past the interval so the unmatched row finalizes
    _write(lsrc, "b1.json", [("a", 1, "i1")], "imp")
    _write(rsrc, "b1.json", [("b", 2, "cx")], "click")
    _run(spark, lsrc, rsrc, ckpt, out, "left_outer")
    _write(lsrc, "b2.json", [("a", 40, "i2")], "imp")
    _write(rsrc, "b2.json", [("b", 40, "cy")], "click")
    _run(spark, lsrc, rsrc, ckpt, out, "left_outer")
    got = _rows(spark, out)
    # i1 emitted with null click once watermark (40-5=10:35) passed
    # ts(i1)+upper = 10:11; i2's own window is still open → not emitted
    assert ("a", T.format(m=1), "None", "i1", None) in got
    assert not any(r[3] == "i2" for r in got)


def test_batch_parity_same_definition(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01 10:01:00", "i1"), ("a", "2024-01-01 11:00:00", "i2")],
        "k string, ts string, imp string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:08:00", "c1"), ("a", "2024-01-01 10:30:00", "c2")],
        "k string, ts string, click string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["k"], r["l_imp"], r["r_click"])
        for r in interval_join(left, right, ["k"], upper="10 minutes").collect()
    }
    assert got == {("a", "i1", "c1")}
    # batch plan must be a hash join on the equi key, not a cartesian
    plan = interval_join(left, right, ["k"], upper="10 minutes")._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
