"""Regression tests for the round-3 close code-review findings:

1. ``cap_probed_index`` must honor ``broadcast_probe=False`` — the flag
   exists because a giant batch cannot be broadcast, and the cap's
   probed-keys semijoin scales with the batch too, so it must fall back
   to a shuffle join in the same regime (previously it broadcast
   unconditionally, reintroducing the driver-OOM the flag was added to
   avoid). Pinned structurally (no BroadcastExchange in the probe plan
   when the flag is off) and behaviorally (identical results either
   way).
2. z-order boundary sampling must not crash when the table has a real
   column named ``_v`` (the sampled-value alias now dodges collisions),
   and accepts ``hash_cols`` so a lake table's sampling scans hash only
   the row-unique key columns instead of the full row width.
3. the streaming dedup metrics block reuses the batch digest frame that
   ``minhash_dedup_incremental`` already checkpointed (``observe_digests``
   hook) instead of re-digesting the batch text; the hook fires with one
   row per RAW batch document (pre-collapse).
"""

import pytest
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.operators.dedup_text import (
    cap_probed_index,
    minhash_dedup_incremental,
    minhash_index,
    minhash_index_probe,
)


def _docs(spark, n=30, prefix="d"):
    rows = [
        (f"{prefix}{i}", f"document body {prefix} number {i} with shared text")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture
def no_auto_broadcast(spark):
    """Disable the planner's SIZE-based auto-broadcast so the
    no-BroadcastExchange assertions pin the HINT behavior (what the
    code controls), not this Spark version's stats estimates — a tiny
    test frame could otherwise be auto-broadcast on a different
    version and flip the structural check spuriously."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cap_probed_index_honors_broadcast_flag(spark, no_auto_broadcast):
    corpus = _docs(spark, 40, "c")
    batch = _docs(spark, 10, "n")
    index = minhash_index(corpus)

    def probe(broadcast_probe):
        return minhash_index_probe(
            batch, index, max_bucket_size=50, broadcast_probe=broadcast_probe
        )

    no_bcast = probe(False)
    plan = no_bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, (
        "broadcast_probe=False must leave no broadcast anywhere in the "
        "capped probe plan (the cap semijoin scales with the batch)"
    )
    with_bcast = probe(True)
    assert sorted(map(tuple, no_bcast.collect())) == sorted(
        map(tuple, with_bcast.collect())
    )


def test_cap_probed_index_shuffle_fallback_direct(spark, no_auto_broadcast):
    index_rows = spark.createDataFrame(
        [(f"c{i}", b, i % 4) for i in range(40) for b in range(3)],
        "doc_id string, band int, bucket int",
    )
    probe_rows = spark.createDataFrame(
        [(b, s) for b in range(3) for s in range(4)], "band int, bucket int"
    )
    capped = cap_probed_index(index_rows, probe_rows, 1000, broadcast_probe=False)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert capped.count() == index_rows.count()  # nothing over the cap


def test_sample_boundaries_survives_column_named_v(spark):
    from synapse_etl_jobs_spark.lake.zorder import sample_boundaries

    df = spark.createDataFrame(
        [(i, i % 5, f"p{i}") for i in range(100)],
        "id long, _v long, payload string",
    )
    bounds = sample_boundaries(df, ["_v"], bits=2, sample_rows=100)
    assert bounds["_v"], "expected non-empty boundaries for a column named _v"
    assert all(0 <= b <= 4 for b in bounds["_v"])


def test_sample_boundaries_hash_cols_narrow_and_deterministic(spark):
    from synapse_etl_jobs_spark.lake.zorder import sample_boundaries

    df = spark.createDataFrame(
        [(i, i % 11, "x" * 50) for i in range(500)],
        "id long, val long, big_payload string",
    )
    b1 = sample_boundaries(df, ["val"], bits=3, sample_rows=200, hash_cols=["id"])
    b2 = sample_boundaries(df, ["val"], bits=3, sample_rows=200, hash_cols=["id"])
    assert b1 == b2, "key-hashed sampling must be deterministic"
    assert b1["val"] and all(0 <= b <= 10 for b in b1["val"])
    # row-uniformity sanity: with sample >= rows the boundaries are the
    # exact quantiles regardless of the hash, so hash_cols and full-row
    # agree when the sample saturates
    full = sample_boundaries(df, ["val"], bits=3, sample_rows=500)
    keyed = sample_boundaries(df, ["val"], bits=3, sample_rows=500, hash_cols=["id"])
    assert full == keyed


def test_observe_digests_fires_with_raw_batch_rows(spark):
    corpus = _docs(spark, 20, "c")
    # batch with exact clones: digests must cover the RAW batch
    base = _docs(spark, 5, "n").collect()
    rows = [(r["doc_id"], r["text"]) for r in base]
    rows += [(f"clone{i}", rows[0][1]) for i in range(3)]
    batch = spark.createDataFrame(rows, "doc_id string, text string")

    seen = {}
    minhash_dedup_incremental(
        batch, corpus, collapse_exact=True,
        observe_digests=lambda dg: seen.__setitem__("dg", dg),
    ).collect()
    assert "dg" in seen, "observe_digests must fire when digests are computed"
    dg = seen["dg"]
    assert dg.count() == batch.count(), "one digest row per RAW batch doc"
    # the 4 identical texts (n0 + 3 clones) share one digest class
    top = (
        dg.groupBy("_dg").count().orderBy(F.desc("count")).first()["count"]
    )
    assert top == 4
