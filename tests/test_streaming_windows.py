"""True STREAMING behavior of the windowed aggregations: watermarked
append-mode emission across micro-batches, late-data dropping past the
watermark, and batch/stream definition parity (the lambda-architecture
unification claim in streaming/windows.py)."""

import json
import os

import pyspark.sql.functions as F

from synapse_etl_jobs_spark.streaming import tumbling_agg

SCHEMA = "k string, ts timestamp, v long"
T0 = "2024-01-01 10:{m:02d}:00"


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for k, minute, v in rows:
            f.write(json.dumps({"k": k, "ts": T0.format(m=minute), "v": v}) + "\n")


def _run_stream(spark, src, ckpt, out):
    """availableNow pass: file sink (append mode) + checkpoint, so a
    SECOND pass resumes from the same state (memory sink cannot)."""
    stream = spark.readStream.schema(SCHEMA).json(src)
    agg = tumbling_agg(
        stream, "ts", "10 minutes",
        {"n": F.count("*"), "sum_v": F.sum("v")},
        keys=["k"], watermark="5 minutes",
    )
    q = (
        agg.writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()


def _emitted(spark, out):
    df = spark.read.parquet(out)
    return {
        (r["k"], str(r["window_start"]), r["n"], r["sum_v"])
        for r in df.collect()
    }


def test_watermark_drops_late_rows_and_emits_closed_windows(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # batch 1: window [10:00,10:10) gets 2 events; watermark advances to
    # max(ts) - 5m = 10:25 after the second window's event at 10:30
    _write_batch(src, "b1.json", [("a", 1, 10), ("a", 5, 20), ("a", 30, 1)])
    out = str(tmp_path / "out")
    _run_stream(spark, src, ckpt, out)
    emitted = _emitted(spark, out)
    # the [10:00,10:10) window is closed (watermark 10:25 past its end)
    assert ("a", "2024-01-01 10:00:00", 2, 30) in emitted
    # the [10:30,10:40) window is still OPEN — not emitted in append mode
    assert not any(s.startswith("2024-01-01 10:30") for _, s, _, _ in emitted)

    # batch 2: a LATE event for the closed window (10:07, far behind the
    # 10:25 watermark) must be DROPPED — no duplicate/updated emission —
    # while a fresh event at 10:50 closes the 10:30 window
    _write_batch(src, "b2.json", [("a", 7, 999), ("a", 50, 5)])
    _run_stream(spark, src, ckpt, out)
    emitted2 = _emitted(spark, out) - emitted  # newly emitted rows only
    assert ("a", "2024-01-01 10:30:00", 1, 1) in emitted2  # closed now
    # late row contributed to nothing: no re-emission of 10:00 window
    assert not any(s.startswith("2024-01-01 10:00") for _, s, _, _ in emitted2)


def test_batch_and_stream_same_definition_agree_on_ontime_data(spark, tmp_path):
    """The SAME tumbling_agg definition over the same on-time events:
    batch recompute == union of streaming emissions."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = [("a", 1, 1), ("b", 2, 2), ("a", 12, 3), ("b", 25, 4), ("a", 45, 5)]
    _write_batch(src, "b1.json", rows)
    out = str(tmp_path / "out")
    _run_stream(spark, src, ckpt, out)
    streamed = _emitted(spark, out)
    batch = tumbling_agg(
        spark.read.schema(SCHEMA).json(src), "ts", "10 minutes",
        {"n": F.count("*"), "sum_v": F.sum("v")}, keys=["k"],
        watermark="5 minutes",  # no-op on batch
    )
    full = {
        (r["k"], str(r["window_start"]), r["n"], r["sum_v"])
        for r in batch.collect()
    }
    # append-mode emits only windows the watermark closed; those must
    # match the batch recompute exactly
    assert streamed <= full
    closed = {w for w in full if w[1] < "2024-01-01 10:40"}
    assert streamed == closed
