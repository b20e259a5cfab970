"""Event-time windowed aggregation: batch semantics, streaming parity,
watermark late-data handling (SURVEY.md §2.8 engine surface)."""

import pyspark.sql.functions as F

from synapse_etl_jobs_spark.streaming import session_agg, sliding_agg, tumbling_agg


def _events(spark):
    rows = [
        # (user, ts, value): two 1-h windows; user 1 has two sessions
        (1, "2024-01-01 00:05:00", 10.0),
        (1, "2024-01-01 00:20:00", 20.0),
        (2, "2024-01-01 00:50:00", 30.0),
        (1, "2024-01-01 01:10:00", 40.0),   # >30min gap for user 1 → new session
        (2, "2024-01-01 01:59:00", 50.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))


def test_tumbling_batch(spark):
    out = tumbling_agg(
        _events(spark), "ts", "1 hour",
        {"n": F.count("*"), "s": F.sum("value")},
    ).orderBy("window_start").collect()
    assert [(r["n"], r["s"]) for r in out] == [(3, 60.0), (2, 90.0)]
    assert out[0]["window_start"].minute == 0


def test_sliding_batch(spark):
    out = sliding_agg(
        _events(spark), "ts", "1 hour", "30 minutes", {"n": F.count("*")},
    ).collect()
    # every event lands in exactly 2 overlapping windows
    assert sum(r["n"] for r in out) == 2 * 5


def test_session_batch(spark):
    out = session_agg(
        _events(spark), "ts", "30 minutes", {"n": F.count("*")}, keys=["user_id"],
    ).orderBy("user_id", "window_start").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: (00:05,00:20) then (01:10) — two sessions
    assert [r["n"] for r in by_user[1]] == [2, 1]
    # session end = last event + gap
    assert by_user[1][0]["window_end"].minute == 50
    # user 2: two isolated events, 69-minute gap → two sessions
    assert [r["n"] for r in by_user[2]] == [1, 1]


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """The same tumbling_agg over a file stream (availableNow) equals the
    batch result — the backfill/tail unification property."""
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = tumbling_agg(
        stream, "ts", "1 hour", {"n": F.count("*")}, watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory").queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["n"])
        for r in spark.table("win_out").collect()
    }
    want = {
        (r["window_start"], r["n"])
        for r in tumbling_agg(ev, "ts", "1 hour", {"n": F.count("*")}).collect()
    }
    assert got == want


def test_watermark_is_noop_on_batch(spark):
    """Watermark parameter must not alter batch results (no state to bound)."""
    ev = _events(spark)
    with_wm = tumbling_agg(ev, "ts", "1 hour", {"n": F.count("*")}, watermark="1 minute")
    without = tumbling_agg(ev, "ts", "1 hour", {"n": F.count("*")})
    assert sorted(map(tuple, with_wm.collect())) == sorted(map(tuple, without.collect()))


def test_stateful_lww_filter_drops_stale_across_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: batch 2 re-delivers
    batch 1's events (plus one genuinely newer) — only the newer event
    survives the filter."""
    import os

    from synapse_etl_jobs_spark.streaming import stateful_lww_filter

    ddl = "k string, seq long, v string"
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [("a", 1, "a1"), ("a", 3, "a3"), ("b", 2, "b2")], ddl)
    b1.coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        # foreachBatch sink: supports checkpoint recovery (memory sink
        # does not), and hands us the emitted rows directly
        emitted = []
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful_lww_filter(stream, ["k"], "seq")
            .writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r["k"], r["seq"]) for r in emitted}

    got1 = run_stream()
    assert got1 == {("a", 1), ("a", 3), ("b", 2)}

    # batch 2: full re-delivery of b1 + one genuinely newer event for b;
    # resumed stream (same checkpoint → same state store) drops the stale
    b2 = spark.createDataFrame(
        [("a", 1, "a1"), ("a", 3, "a3"), ("b", 2, "b2"), ("b", 9, "b9")], ddl)
    b2.coalesce(1).write.mode("append").parquet(src)
    got2 = run_stream()
    assert got2 == {("b", 9)}
