"""Property-based exactly-once tests (hypothesis): replay of the same
stream under ANY batch split — including overlapping re-delivery —
reconverges to the identical final table state (SURVEY.md §5 tests 2-3).
"""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.operators.dedup import dedup_lww
from synapse_etl_jobs_spark.sources.synth import flatten_events, synth_change_events
from synapse_etl_jobs_spark.streaming import ReplayDriver

SCHEMA = StructType().add("repo", "string").add("path", "string") \
    .add("commit", "string").add("lang", "string").add("content", "string")
KEYS = ["repo", "path", "commit"]
N = 800


def _state_fingerprint(df):
    """Order-insensitive content hash of the visible table state."""
    row = df.select(
        F.sha2(F.concat_ws("\x01", *KEYS, F.coalesce("lang", F.lit("")),
                           F.sha2("content", 256)), 256).alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return (row["n"], str(row["s"]))


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.integers(min_value=97, max_value=N),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       mode=st.sampled_from(["cow", "mor"]))
def test_any_batch_split_converges(spark, tmp_path_factory, batch, seed, mode):
    ev = flatten_events(
        synth_change_events(spark, N, seed=seed, n_keys=N // 4)
    ).persist()
    try:
        root = tmp_path_factory.mktemp("prop")
        t = LakeTable.create(spark, str(root / "t"), SCHEMA, KEYS,
                             num_buckets=4, write_mode=mode)
        ReplayDriver(t, batch_events=batch).replay(ev, seq_start=0, seq_end=N)
        # oracle: one-shot LWW reduction of the full stream
        latest = dedup_lww(ev, KEYS, "seq").filter(F.col("op") != "DELETE") \
            .select(*KEYS, "lang", "content")
        assert _state_fingerprint(t.read().select(*KEYS, "lang", "content")) \
            == _state_fingerprint(latest)

        # replay an arbitrary suffix AGAIN under fresh batch ids — no drift
        t.merge(ev.filter(F.col("seq") >= batch // 2), batch_id="re-delivery")
        assert _state_fingerprint(t.read().select(*KEYS, "lang", "content")) \
            == _state_fingerprint(latest)
    finally:
        ev.unpersist()


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.integers(min_value=97, max_value=N),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_changes_feed_replicates_for_any_split(spark, tmp_path_factory, batch, seed):
    """For ANY batch split of a merge-on-read replay: applying the full
    changes(0) feed to a fresh table reproduces the source state, and
    read_version after the first applied batch equals the prefix
    reduction — time travel + CDC-out hold under arbitrary batching."""
    ev = flatten_events(
        synth_change_events(spark, N, seed=seed, n_keys=N // 4)
    ).persist()
    try:
        root = tmp_path_factory.mktemp("chprop")
        src = LakeTable.create(spark, str(root / "src"), SCHEMA, KEYS,
                               num_buckets=4, write_mode="mor")
        stats = ReplayDriver(src, batch_events=batch).replay(
            ev, seq_start=0, seq_end=N
        )
        applied = [s for s in stats if s.get("applied")]
        assert applied

        # CDC-out replication
        dst = LakeTable.create(spark, str(root / "dst"), SCHEMA, KEYS,
                               num_buckets=4, write_mode="mor")
        feed = src.changes(0).withColumn(
            "op", F.when(F.col("_deleted"), "DELETE").otherwise("UPSERT")
        )
        dst.merge(feed, op_col="op", seq_col="_seq", batch_id="sync")
        a = src.read().select(*KEYS, "lang", "content")
        b = dst.read().select(*KEYS, "lang", "content")
        assert _state_fingerprint(a) == _state_fingerprint(b)

        # time travel: version after batch 1 == reduction of its window
        first = applied[0]
        v1 = src.read_version(first["table_version"]).select(*KEYS, "lang", "content")
        lo_batch = first["batch_id"]
        prefix = ev.filter(
            (F.col("seq") >= lo_batch * batch) & (F.col("seq") < (lo_batch + 1) * batch)
        )
        oracle = dedup_lww(prefix, KEYS, "seq").filter(F.col("op") != "DELETE") \
            .select(*KEYS, "lang", "content")
        assert _state_fingerprint(v1) == _state_fingerprint(oracle)
    finally:
        ev.unpersist()
