"""End-to-end CDC tests: synthesize a change stream, replay it through
LakeTable.merge, and compare the final table state (row set + per-row
sha256(content)) against a brute-force pandas oracle — SURVEY.md §5 test 2,
the north rule's correctness invariant."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.sources.synth import flatten_events, synth_change_events

SCHEMA = StructType().add("repo", "string").add("path", "string") \
    .add("commit", "string").add("lang", "string").add("content", "string")
KEYS = ["repo", "path", "commit"]


def pandas_oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Brute-force LWW reduction: per key keep the max-seq event; drop keys
    whose winner is a DELETE."""
    idx = events_pdf.groupby(["repo", "path", "commit"])["seq"].idxmax()
    final = events_pdf.loc[idx]
    final = final[final["op"] != "DELETE"]
    out = final[["repo", "path", "commit", "lang", "content"]].reset_index(drop=True)
    out["content_sha"] = out["content"].map(
        lambda c: hashlib.sha256(c.encode()).hexdigest()
    )
    return out.sort_values(KEYS).reset_index(drop=True)


def table_state(table: LakeTable) -> pd.DataFrame:
    df = table.read().withColumn("content_sha", F.sha2(F.col("content"), 256))
    pdf = df.toPandas()
    return pdf.sort_values(KEYS).reset_index(drop=True)[
        ["repo", "path", "commit", "lang", "content", "content_sha"]
    ]


def assert_states_equal(actual: pd.DataFrame, expected: pd.DataFrame):
    assert len(actual) == len(expected), (len(actual), len(expected))
    pd.testing.assert_frame_equal(actual, expected, check_dtype=False)


@pytest.fixture(scope="module")
def events(spark):
    ev = flatten_events(synth_change_events(spark, 4000, seed=7, n_keys=800))
    ev.persist()
    yield ev
    ev.unpersist()


def test_merge_single_batch(spark, events, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    stats = t.merge(events, batch_id=0)
    assert stats["applied"]
    assert_states_equal(table_state(t), pandas_oracle(events.toPandas()))


def test_merge_multi_batch_replay(spark, events, tmp_table_path):
    """Replay in 4 seq-ordered batches → same final state as one batch."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    for i in range(4):
        batch = events.filter(
            (F.col("seq") >= i * 1000) & (F.col("seq") < (i + 1) * 1000)
        )
        t.merge(batch, batch_id=i)
    assert_states_equal(table_state(t), pandas_oracle(events.toPandas()))


def test_merge_idempotent_re_merge(spark, events, tmp_table_path):
    """Re-merging an already-applied batch (even WITHOUT the marker) is a
    no-op on table state — LWW on stored _seq wins over replayed events."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    t.merge(events, batch_id=0)
    before = table_state(t)
    # marker path: same batch_id → short-circuit
    stats = t.merge(events, batch_id=0)
    assert not stats["applied"]
    # no-marker path: replay a stale suffix with a fresh batch_id
    stale = events.filter(F.col("seq") < 2000)
    stats2 = t.merge(stale, batch_id=99)
    assert stats2["applied"]
    assert_states_equal(table_state(t), before)


def test_merge_out_of_order_batches(spark, events, tmp_table_path):
    """Batches applied out of seq order reconverge to the same state."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    for i in [2, 0, 3, 1]:
        batch = events.filter(
            (F.col("seq") >= i * 1000) & (F.col("seq") < (i + 1) * 1000)
        )
        t.merge(batch, batch_id=i)
    assert_states_equal(table_state(t), pandas_oracle(events.toPandas()))


def test_salted_merge_same_result(spark, events, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    t.merge(events, batch_id=0, salt_buckets=8)
    assert_states_equal(table_state(t), pandas_oracle(events.toPandas()))


def test_delete_semantics(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=4)
    rows = [
        ("INSERT", 1, "r1", "a.py", "c1", "python", "v1"),
        ("UPDATE", 2, "r1", "a.py", "c1", "python", "v2"),
        ("DELETE", 3, "r1", "a.py", "c1", None, None),
        ("INSERT", 4, "r1", "b.py", "c2", "python", "x1"),
        ("DELETE", 5, "r9", "ghost.py", "c9", None, None),  # delete of absent key
    ]
    updates = spark.createDataFrame(
        rows, "op string, seq long, repo string, path string, commit string, "
        "lang string, content string"
    )
    t.merge(updates, batch_id=0)
    state = t.read().collect()
    assert len(state) == 1
    assert state[0]["path"] == "b.py" and state[0]["content"] == "x1"
    # late-arriving stale update for the deleted key must stay dead
    late = spark.createDataFrame(
        [("UPDATE", 2, "r1", "a.py", "c1", "python", "v2-late")],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string",
    )
    t.merge(late, batch_id=1)
    assert t.read().count() == 1


def test_lineage_rows(spark, events, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    t.merge(events, batch_id=0, stream_id="s1")
    lin = t.lineage().toPandas()
    assert (lin["stream_id"] == "s1").all()
    # lineage counts stored rows, which include tombstones
    assert lin["rows"].sum() == t.read(include_internal=True).count()
    assert lin["seq_max"].max() >= 3999


def test_bucket_pruned_scan(spark, events, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    t.merge(events, batch_id=0)
    full = table_state(t)
    one_repo = full[full["repo"] == full["repo"].iloc[0]]
    got = t.scan_keys([(one_repo["repo"].iloc[0],)]).filter(
        F.col("repo") == one_repo["repo"].iloc[0]
    )
    assert got.count() == len(one_repo)


def test_mor_multi_batch_replay(spark, events, tmp_table_path):
    """Merge-on-read: merges append deltas only; reads LWW-reduce; state
    equals the oracle; compaction folds deltas without changing state."""
    t = LakeTable.create(
        spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8, write_mode="mor"
    )
    for i in range(4):
        batch = events.filter(
            (F.col("seq") >= i * 1000) & (F.col("seq") < (i + 1) * 1000)
        )
        s = t.merge(batch, batch_id=i)
        assert s["mode"] == "mor"
    expected = pandas_oracle(events.toPandas())
    assert_states_equal(table_state(t), expected)
    # deltas accumulated: >1 file per bucket before compaction
    n_entries = sum(len(v) for v in t.manifest.buckets.values())
    assert n_entries > 8
    t.compact()
    assert all(
        e["kind"] == "base" for v in t.manifest.buckets.values() for e in v
    )
    assert_states_equal(table_state(t), expected)


def test_mor_delete_and_stale_update(spark, tmp_table_path):
    t = LakeTable.create(
        spark, tmp_table_path, SCHEMA, KEYS, num_buckets=4, write_mode="mor"
    )
    ddl = ("op string, seq long, repo string, path string, commit string, "
           "lang string, content string")
    t.merge(spark.createDataFrame(
        [("INSERT", 1, "r1", "a.py", "c1", "python", "v1")], ddl), batch_id=0)
    t.merge(spark.createDataFrame(
        [("DELETE", 3, "r1", "a.py", "c1", None, None)], ddl), batch_id=1)
    t.merge(spark.createDataFrame(
        [("UPDATE", 2, "r1", "a.py", "c1", "python", "zombie")], ddl), batch_id=2)
    assert t.read().count() == 0


def test_time_travel(spark, events, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=8)
    t.merge(events.filter(F.col("seq") < 2000), batch_id=0)
    v1_count = t.read().count()
    t.merge(events.filter(F.col("seq") >= 2000), batch_id=1)
    old = LakeTable.load(spark, tmp_table_path, version=1)
    assert old.read().count() == v1_count


def test_dedup_strategies_identical(spark, events):
    """"agg", "semijoin" (broadcast and plain-join), and salted dedup all
    produce the same winner set — including on exact-duplicate delivery
    (the synth stream re-emits every 17th event verbatim)."""
    from synapse_etl_jobs_spark.operators.dedup import (
        dedup_lww, dedup_lww_salted, dedup_lww_semijoin,
    )

    base = dedup_lww(events, KEYS, "seq")
    for variant in (
        dedup_lww(events, KEYS, "seq", strategy="semijoin"),
        dedup_lww_semijoin(events, KEYS, "seq", broadcast=False),
        dedup_lww_salted(events, KEYS, "seq", salt_buckets=8),
    ):
        assert variant.exceptAll(base).isEmpty()
        assert base.exceptAll(variant).isEmpty()


def test_merge_dedup_strategy_param(spark, events, tmp_table_path):
    """merge(dedup_strategy="agg") and the default semijoin path agree."""
    t1 = LakeTable.create(spark, tmp_table_path + "_sj", SCHEMA, KEYS, num_buckets=4)
    t1.merge(events, batch_id=0)
    t2 = LakeTable.create(spark, tmp_table_path + "_agg", SCHEMA, KEYS, num_buckets=4)
    t2.merge(events, batch_id=0, dedup_strategy="agg")
    assert_states_equal(table_state(t1), table_state(t2))


def test_vacuum_expires_old_versions(spark, events, tmp_table_path):
    """vacuum keeps the newest N versions' files, deletes superseded CoW
    rewrites and expired manifests; current reads are unaffected and
    time travel to expired versions fails."""
    import glob
    import os

    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=4)
    for i in range(3):
        t.merge(events.filter(
            (F.col("seq") >= i * 1300) & (F.col("seq") < (i + 1) * 1300)
        ), batch_id=i)
    before_files = len(glob.glob(os.path.join(tmp_table_path, "data", "**", "*.parquet"),
                                 recursive=True))
    state_before = table_state(t)

    stats = t.vacuum(retain_versions=1)
    assert stats["deleted_data_files"] > 0
    assert stats["expired_manifests"] == 3  # v0..v2 gone, v3 kept
    after_files = len(glob.glob(os.path.join(tmp_table_path, "data", "**", "*.parquet"),
                                recursive=True))
    assert after_files < before_files

    # current snapshot unaffected (state identical), fresh load works
    assert_states_equal(table_state(LakeTable.load(spark, tmp_table_path)), state_before)
    # expired version is really gone (clear time-travel error)
    with pytest.raises(ValueError, match="does not exist"):
        LakeTable.load(spark, tmp_table_path, version=1)


def test_vacuum_retains_mor_deltas(spark, events, tmp_table_path):
    """In MoR mode every delta file is still referenced by the current
    manifest — vacuum must delete nothing until compaction supersedes."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS,
                         num_buckets=4, write_mode="mor")
    t.merge(events.filter(F.col("seq") < 1000), batch_id=0)
    t.merge(events.filter(F.col("seq") >= 1000), batch_id=1)
    assert t.vacuum(retain_versions=1)["deleted_data_files"] == 0
    state = table_state(t)
    t.compact()
    stats = t.vacuum(retain_versions=1)
    assert stats["deleted_data_files"] > 0  # pre-compaction deltas expired
    assert_states_equal(table_state(LakeTable.load(spark, tmp_table_path)), state)


def test_extreme_skew_correctness(spark, tmp_table_path):
    """SURVEY §5 test 5: one hot repo owns ~half the events — replay
    correctness is unchanged through both the semijoin (default) and the
    salted-agg dedup paths."""
    ev = flatten_events(
        synth_change_events(spark, 6000, seed=13, n_keys=1500, skew_exp=8.0)
    ).persist()
    try:
        n_ev = ev.count()  # includes dup_every re-deliveries (> 6000)
        top = (ev.groupBy("repo").count().orderBy(F.col("count").desc()).first())
        assert top["count"] / n_ev > 0.4  # genuinely pathological skew

        oracle = pandas_oracle(ev.toPandas())
        t1 = LakeTable.create(spark, tmp_table_path + "_sj", SCHEMA, KEYS, num_buckets=4)
        t1.merge(ev, batch_id=0)  # semijoin default
        assert_states_equal(table_state(t1), oracle)

        t2 = LakeTable.create(spark, tmp_table_path + "_salt", SCHEMA, KEYS, num_buckets=4)
        t2.merge(ev, batch_id=0, salt_buckets=8)  # salted two-phase agg
        assert_states_equal(table_state(t2), oracle)
    finally:
        ev.unpersist()


def test_nested_payload_columns(spark, tmp_table_path):
    """Payload columns may be structs/arrays (reference N4: typed nested
    snapshots) — they round-trip through merge, LWW, and tombstones."""
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType as ST,
    )

    schema = ST([
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("meta", ST([
            StructField("stars", LongType()),
            StructField("topics", ArrayType(StringType())),
        ])),
    ])
    ddl = ("op string, seq long, repo string, path string, commit string, "
           "meta struct<stars:bigint, topics:array<string>>")
    t = LakeTable.create(spark, tmp_table_path, schema, KEYS, num_buckets=2)
    t.merge(spark.createDataFrame([
        ("INSERT", 1, "r", "a.py", "c1", (5, ["etl"])),
        ("INSERT", 2, "r", "b.py", "c1", (9, ["spark", "cdc"])),
    ], ddl), batch_id=0)
    t.merge(spark.createDataFrame([
        ("UPDATE", 3, "r", "a.py", "c1", (6, ["etl", "lake"])),
        ("DELETE", 4, "r", "b.py", "c1", None),
    ], ddl), batch_id=1)
    rows = {r["path"]: r for r in t.read().collect()}
    assert set(rows) == {"a.py"}
    assert rows["a.py"]["meta"]["stars"] == 6
    assert rows["a.py"]["meta"]["topics"] == ["etl", "lake"]


def test_scan_keys_int_bucket_column(spark, tmp_table_path):
    """Probe values must be hashed with the TABLE's column type — an
    IntegerType bucket column probed via pandas-inferred int64 would
    compute a different xxhash64 bucket and silently miss rows."""
    from pyspark.sql.types import StructType as ST

    schema = ST().add("id", "integer").add("v", "string")
    t = LakeTable.create(spark, tmp_table_path, schema, ["id"], num_buckets=8)
    t.merge(spark.createDataFrame(
        [("INSERT", i, i, f"v{i}") for i in range(50)],
        "op string, seq long, id int, v string"), batch_id=0)
    got = {r["id"]: r["v"] for r in t.scan_keys([(7,), (23,)]).collect()
           if r["id"] in (7, 23)}
    assert got == {7: "v7", 23: "v23"}


def test_scan_keys_column_pruned_point_read(spark, tmp_table_path):
    """scan_keys(columns=...) returns keys + the named columns with the
    SAME LWW winners as the full read (exact whenever stored versions
    don't tie on (_seq, _fold) — distinct seqs here; see _current_view
    for the equal-seq-tie caveat), and the pruning reaches the parquet
    scan (the plan's ReadSchema excludes unrequested payload) — a wide
    text/blob column never leaves disk on a slim point read. Unknown
    column names raise, and the empty-bucket branch returns the same
    column order as the non-empty one."""
    from pyspark.sql.types import StructType as ST

    schema = ST().add("id", "long").add("small", "string").add("big", "string")
    t = LakeTable.create(spark, tmp_table_path, schema, ["id"],
                         num_buckets=4, write_mode="mor")
    t.merge(spark.createDataFrame(
        [("INSERT", i, i, f"s{i}", "x" * 50) for i in range(40)],
        "op string, seq long, id long, small string, big string"),
        batch_id=0)
    # second batch updates some keys and deletes one: the pruned read
    # must resolve the MoR multi-version winners identically
    t.merge(spark.createDataFrame(
        [("UPDATE", 100, 7, "S7", "y"), ("DELETE", 101, 9, None, None)],
        "op string, seq long, id long, small string, big string"),
        batch_id=1)
    keys = [(7,), (9,), (11,)]
    full = {r["id"]: r["small"] for r in t.scan_keys(keys).collect()
            if r["id"] in (7, 9, 11)}
    slim_df = t.scan_keys(keys, columns=["small"])
    assert set(slim_df.columns) == {"id", "small"}
    slim = {r["id"]: r["small"] for r in slim_df.collect()
            if r["id"] in (7, 9, 11)}
    assert slim == full == {7: "S7", 11: "s11"}  # 9 deleted
    plan = slim_df._jdf.queryExecution().executedPlan().toString()
    assert "big:string" not in plan, "unrequested column leaked into the scan"
    assert "small:string" in plan  # the requested one did reach the scan
    # unknown columns are rejected regardless of bucket content
    with pytest.raises(ValueError, match="not in the table schema"):
        t.scan_keys(keys, columns=["nope"])
    # empty-bucket branch: same (keys, requested) column order as the
    # non-empty branch — probe a key whose bucket holds no files
    empty = LakeTable.create(
        spark, tmp_table_path + "_empty", schema, ["id"], num_buckets=4
    )
    e = empty.scan_keys([(1,)], columns=["big", "small"])
    assert e.columns == ["id", "big", "small"]
    assert t.scan_keys(keys, columns=["big", "small"]).columns == \
        ["id", "big", "small"]


def test_lineage_empty_before_first_merge(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2)
    assert t.lineage().count() == 0


def test_evolve_add_column_accepts_ddl_type_strings(spark, tmp_table_path):
    """add_columns type strings are DDL ("int", "array<string>"), not
    StructType.add's JSON-only names ("integer") — a user writing the
    natural DDL name must not crash (found by a verify drive)."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2)
    t.evolve_schema(add_columns=[("stars", "int"), ("tags", "array<string>")])
    fields = {f.name: f.dataType.simpleString()
              for f in t.manifest.current_schema().fields}
    assert fields["stars"] == "int" and fields["tags"] == "array<string>"
    assert {"stars", "tags"} <= set(t.read().columns)


def test_evolve_rename_collision_rejected(spark, tmp_table_path):
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2)
    with pytest.raises(ValueError, match="collides"):
        t.evolve_schema(renames={"lang": "content"})
    with pytest.raises(ValueError, match="same target"):
        t.evolve_schema(renames={"lang": "x", "content": "x"})
    with pytest.raises(ValueError, match="not in schema"):
        t.evolve_schema(renames={"nope": "x"})


def test_evolve_drop_column(spark, tmp_table_path):
    """drop_columns removes a column without rewrite: reads project it
    away across epochs, merges continue with the new shape, time travel
    still sees it, and the NAME is permanently retired (re-adding or
    renaming onto it would resurrect old files' values by name)."""
    ddl = ("op string, seq long, repo string, path string, commit string, "
           "lang string, content string")
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2)
    t.merge(spark.createDataFrame(
        [("UPSERT", 1, "r", "a.py", "c", "python", "v1")], ddl), batch_id=0)
    v_before = t.manifest.table_version

    t.evolve_schema(drop_columns=["lang"])
    assert "lang" not in t.read().columns
    # old-epoch row still readable, minus the dropped column
    assert t.read().select("repo", "content").collect()[0]["content"] == "v1"
    # time travel to the pre-drop version still sees it
    assert t.read_version(v_before).select("lang").collect()[0][0] == "python"

    # merges continue; a batch still carrying the column is ignored
    t.merge(spark.createDataFrame(
        [("UPSERT", 2, "r", "b.py", "c", "go", "v2")], ddl), batch_id=1)
    assert t.read().count() == 2 and "lang" not in t.read().columns

    # the name is retired
    with pytest.raises(ValueError, match="dropped"):
        t.evolve_schema(add_columns=[("lang", "string")])
    with pytest.raises(ValueError, match="dropped"):
        t.evolve_schema(renames={"content": "lang"})
    # auto-evolve must skip the retired name, not crash or resurrect
    t.merge(spark.createDataFrame(
        [("UPSERT", 3, "r", "c.py", "c", "rs", "v3")], ddl),
        batch_id=2, auto_evolve=True)
    assert "lang" not in t.read().columns

    # guard-rails
    with pytest.raises(ValueError, match="key/bucket"):
        t.evolve_schema(drop_columns=["repo"])
    with pytest.raises(ValueError, match="not in schema"):
        t.evolve_schema(drop_columns=["nope"])
    with pytest.raises(ValueError, match="one call"):
        t.evolve_schema(drop_columns=["content"], renames={"content": "c2"})

    # drop composes with rename of ANOTHER column in the same call
    t.evolve_schema(drop_columns=["content"], renames={"commit": "sha"})
    assert set(t.read().columns) == {"repo", "path", "sha"}
    # fresh handle sees the same schema + retired set
    t2 = LakeTable.load(spark, tmp_table_path)
    assert set(t2.read().columns) == {"repo", "path", "sha"}
    assert set(t2.manifest.props["dropped_cols"]) == {"lang", "content"}


def test_sparse_seq_replay_skips_empty_windows(spark, tmp_table_path):
    """A sparse seq space (e.g. epoch-ms sequences) must not commit a
    table version per empty window."""
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ddl = ("op string, seq long, repo string, path string, commit string, "
           "lang string, content string")
    ev = spark.createDataFrame([
        ("INSERT", 5, "r", "a.py", "c", "python", "v1"),
        ("INSERT", 10_000_007, "r", "b.py", "c", "python", "v2"),
    ], ddl)
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2)
    stats = ReplayDriver(t, batch_events=1000).replay(ev)
    applied = [s for s in stats if s.get("applied")]
    empty = [s for s in stats if s.get("reason") == "empty_window"]
    assert len(applied) == 2
    assert len(empty) == 10_000 - 1
    assert t.manifest.table_version == 2  # one commit per NON-empty window
    assert t.read().count() == 2


def test_vacuum_reclaims_orphaned_staging(spark, tmp_table_path):
    import os

    t = LakeTable.create(spark, tmp_table_path, SCHEMA, KEYS, num_buckets=2)
    t.merge(spark.createDataFrame(
        [("INSERT", 1, "r", "a.py", "c", "python", "v")],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string"), batch_id=0)
    orphan = os.path.join(tmp_table_path, "_staging", "s_dead")
    os.makedirs(orphan)
    open(os.path.join(orphan, "junk.parquet"), "w").write("x")
    t.vacuum()
    assert not os.path.exists(orphan)
    assert t.read().count() == 1


def test_dedup_semijoin_null_seq_keys_survive(spark):
    """A key whose every seq is null must not vanish from the semijoin
    strategy (null-safe join) — strategies stay aligned on bad input."""
    from synapse_etl_jobs_spark.operators.dedup import dedup_lww, dedup_lww_semijoin

    ddl = "k string, seq long, v string"
    df = spark.createDataFrame(
        [("a", None, "a_null"), ("b", 1, "b1"), ("b", None, "b_null")], ddl)
    agg = {(r["k"], r["v"]) for r in dedup_lww(df, ["k"], "seq").collect()}
    sj = {(r["k"], r["v"]) for r in dedup_lww_semijoin(df, ["k"], "seq").collect()}
    assert agg == sj
    assert ("a", "a_null") in sj       # all-null key kept
    assert ("b", "b1") in sj           # non-null seq beats null
