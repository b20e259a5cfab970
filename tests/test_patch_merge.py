"""Partial-column CDC patches (operators/patch.py + merge_patches) and
snapshot rollback.

Reference parity note: the reference's jobs only ever ship full rows
(/root/reference/src/scripts/glue_jobs/glue_job.py re-snapshots whole
records), so the semantics here are pinned against hand-applied event
sequences instead: apply events one by one in seq order — per-column
last writer wins, DELETE resets the row — and the merged table must
match.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.operators.patch import collapse_patches

SCHEMA = StructType().add("k", "long").add("a", "string").add("b", "double")
EV_SCHEMA = "k long, a string, b double, op string, seq long, set_cols array<string>"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _apply_oracle(event_rows):
    """Drive the contract by hand: one row at a time, in seq order."""
    state = {}
    for k, a, b, op, seq, set_cols in sorted(event_rows, key=lambda r: r[4]):
        if op == "DELETE":
            state.pop(k, None)
        elif op == "UPSERT":
            state[k] = {"a": a, "b": b}
        else:  # PATCH
            row = state.setdefault(k, {"a": None, "b": None})
            if "a" in (set_cols or []):
                row["a"] = a
            if "b" in (set_cols or []):
                row["b"] = b
    return {k: (v["a"], v["b"]) for k, v in state.items()}


def _read_state(t):
    return {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}


B1 = [
    (1, "a1", 1.0, "UPSERT", 1, None),
    (2, "a2", 2.0, "UPSERT", 2, None),
    (3, "a3", 3.0, "UPSERT", 3, None),
    (2, "A2", None, "PATCH", 4, ["a"]),
    (3, None, None, "DELETE", 5, None),
    (3, None, 33.0, "PATCH", 6, ["b"]),   # patch re-creates after delete
    (4, None, 44.0, "PATCH", 7, ["b"]),   # patch creates a brand-new row
]
B2 = [
    (1, None, 11.0, "PATCH", 10, ["b"]),  # inherits a from stored batch-1 row
    (2, None, None, "PATCH", 11, ["a"]),  # explicit null: a named in set_cols
    (4, None, None, "DELETE", 12, None),
]


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_table_path, request):
    return LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"],
                            num_buckets=4, write_mode=request.param)


def test_collapse_patches_single_batch(spark):
    out = collapse_patches(_ev(spark, B1), ["k"], ["a", "b"])
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["op"] == "UPSERT" and rows[1]["a"] == "a1"
    assert rows[2]["a"] == "A2" and rows[2]["_set_a"] and rows[2]["_set_b"]
    # delete-then-patch: only b set, base wiped
    assert rows[3]["op"] == "UPSERT" and rows[3]["_wipe_base"]
    assert rows[3]["b"] == 33.0 and not rows[3]["_set_a"]
    assert rows[4]["_set_b"] and not rows[4]["_set_a"]
    # null-seq events can never win
    noisy = B1 + [(1, "ghost", None, "PATCH", None, ["a"])]
    out2 = {r["k"]: r["a"] for r in
            collapse_patches(_ev(spark, noisy), ["k"], ["a", "b"]).collect()}
    assert out2[1] == "a1"


def test_patch_merge_two_batches_matches_hand_applied(spark, table):
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=0)
    assert _read_state(table) == _apply_oracle(B1)
    table.merge_patches(_ev(spark, B2), stream_id="s", batch_id=1)
    assert _read_state(table) == _apply_oracle(B1 + B2)
    # the explicit-null patch really nulled a while keeping stored b
    assert _read_state(table)[2] == (None, 2.0)


def test_patch_merge_stale_and_marker_idempotency(spark, table):
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=0)
    table.merge_patches(_ev(spark, B2), stream_id="s", batch_id=1)
    final = _read_state(table)
    # whole-batch redelivery under a NEW id: every key is stale → no-op
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=99)
    assert _read_state(table) == final
    # same id: marker short-circuit
    r = table.merge_patches(_ev(spark, B2), stream_id="s", batch_id=1)
    assert r["applied"] is False


def test_patch_only_stream_inserts_sparse_rows(spark, table):
    patches = [
        (9, "x", None, "PATCH", 1, ["a"]),
        (9, None, 9.5, "PATCH", 2, ["b"]),
    ]
    table.merge_patches(_ev(spark, patches), stream_id="s", batch_id=0)
    assert _read_state(table) == {9: ("x", 9.5)}


def test_delete_tombstone_survives_patch_resurrection_guard(spark, table):
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=0)
    # next batch deletes k=1; a later batch patches it → fresh row
    table.merge_patches(
        _ev(spark, [(1, None, None, "DELETE", 20, None)]), stream_id="s", batch_id=1)
    assert 1 not in _read_state(table)
    table.merge_patches(
        _ev(spark, [(1, None, 99.0, "PATCH", 30, ["b"])]), stream_id="s", batch_id=2)
    assert _read_state(table)[1] == (None, 99.0)  # a NOT resurrected


B3 = [
    (1, None, None, "DELETE", 15, None),
    (5, "a5", 5.0, "UPSERT", 16, None),
    (2, None, 22.0, "PATCH", 17, ["b"]),
]


def test_patch_merge_order_insensitive(spark, tmp_path_factory):
    """Patch batches converge to the same state in ANY application
    order (per-column CRDT state persisted with each row — the merge is
    a join-semilattice pointwise max, see LakeTable.merge_patches)."""
    import itertools

    expect = _apply_oracle(B1 + B2 + B3)
    for mode in ("cow", "mor"):
        for perm in itertools.permutations([B1, B2, B3]):
            root = tmp_path_factory.mktemp("ooo")
            t = LakeTable.create(spark, str(root / "t"), SCHEMA, ["k"],
                                 num_buckets=2, write_mode=mode)
            for bid, batch in enumerate(perm):
                t.merge_patches(_ev(spark, batch), stream_id="s", batch_id=bid)
            assert _read_state(t) == expect, (mode, perm)


def test_patch_redelivery_fresh_id_writes_zero_rows(spark, table):
    """A redelivered batch under a NEW batch id contributes nothing to
    any key's CRDT state, so zero rows are written (not merely 'the
    values happen to match')."""
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=0)
    table.merge_patches(_ev(spark, B2), stream_id="s", batch_id=1)
    final = _read_state(table)
    r = table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=99)
    assert r["rows_written"] == 0
    assert _read_state(table) == final


def test_stale_patch_cannot_clobber_newer_column(spark, table):
    """The round-3 gap this algebra closes: a stale patch arriving in a
    LATER batch (lower seq, higher batch id) must not overwrite a newer
    column value — including values written by the FULL-ROW merge path."""
    table.merge(
        spark.createDataFrame([(1, "new", 10.0, "UPSERT", 10)],
                              "k long, a string, b double, op string, seq long"),
        stream_id="s", batch_id=0)
    # stale patch to a (seq 9 < 10) in a later batch: must lose
    table.merge_patches(_ev(spark, [(1, "stale", None, "PATCH", 9, ["a"])]),
                        stream_id="s", batch_id=1)
    # fresh patch to b (seq 11): must win, a keeps the full-row value
    table.merge_patches(_ev(spark, [(1, None, 11.5, "PATCH", 11, ["b"])]),
                        stream_id="s", batch_id=2)
    assert _read_state(table) == {1: ("new", 11.5)}


def test_negative_seq_delete_not_lost_on_fold_tie(spark, tmp_path_factory):
    """_fold must strictly increase for ANY seq values (it is a write
    counter, not a sum of seq terms): with negative event seqs a
    sum-of-entries fold could DECREASE on a write that clamps a column
    to a negative delete seq, so the equal-_seq read-time tie resolved
    to the STALE stored row and the column delete was silently lost."""
    b1 = [
        (1, "x", None, "PATCH", 10, ["a"]),
        (1, None, 5.0, "PATCH", -3, ["b"]),
    ]
    b2 = [(1, None, None, "DELETE", -2, None)]
    expect = _apply_oracle(b1 + b2)
    assert expect == {1: ("x", None)}  # the delete kills only column b
    for mode in ("cow", "mor"):
        root = tmp_path_factory.mktemp("negseq")
        t = LakeTable.create(spark, str(root / "t"), SCHEMA, ["k"],
                             num_buckets=2, write_mode=mode)
        t.merge_patches(_ev(spark, b1), stream_id="s", batch_id=0)
        t.merge_patches(_ev(spark, b2), stream_id="s", batch_id=1)
        assert _read_state(t) == expect, mode


def test_stale_predelete_patch_cannot_resurrect(spark, table):
    """A DELETE's seq bounds every column: a pre-delete patch delivered
    AFTER the delete batch must not resurrect the key or any column."""
    table.merge_patches(_ev(spark, [(1, "x", 1.0, "UPSERT", 1, None),
                                    (1, None, None, "DELETE", 20, None)]),
                        stream_id="s", batch_id=0)
    table.merge_patches(_ev(spark, [(1, "ghost", None, "PATCH", 5, ["a"])]),
                        stream_id="s", batch_id=1)
    assert 1 not in _read_state(table)
    # but a post-delete patch DOES re-create the key sparsely
    table.merge_patches(_ev(spark, [(1, None, 9.0, "PATCH", 21, ["b"])]),
                        stream_id="s", batch_id=2)
    assert _read_state(table)[1] == (None, 9.0)


def test_patch_cseq_survives_column_rename(spark, table):
    """Epoch renames must translate the per-column CRDT map keys: after
    renaming a -> a2, a stale out-of-order patch to a2 must still lose
    to the pre-rename write (whose winner seq was recorded under 'a')."""
    table.merge_patches(_ev(spark, [(1, "newer", 1.0, "UPSERT", 10, None)]),
                        stream_id="s", batch_id=0)
    table.evolve_schema(renames={"a": "a2"})
    # stale patch (seq 9 < 10) to the RENAMED column arrives late
    table.merge_patches(
        spark.createDataFrame([(1, "stale", 9)],
                              "k long, a2 string, seq long")
        .select("k", "a2", F.lit(None).cast("double").alias("b"),
                F.lit("PATCH").alias("op"), "seq",
                F.array(F.lit("a2")).alias("set_cols")),
        stream_id="s", batch_id=1)
    rows = {r["k"]: (r["a2"], r["b"]) for r in table.read().collect()}
    assert rows == {1: ("newer", 1.0)}
    # and a genuinely fresh patch to the renamed column still wins
    table.merge_patches(
        spark.createDataFrame([(1, "fresh", 11)],
                              "k long, a2 string, seq long")
        .select("k", "a2", F.lit(None).cast("double").alias("b"),
                F.lit("PATCH").alias("op"), "seq",
                F.array(F.lit("a2")).alias("set_cols")),
        stream_id="s", batch_id=2)
    rows = {r["k"]: (r["a2"], r["b"]) for r in table.read().collect()}
    assert rows == {1: ("fresh", 1.0)}


def test_patch_property_out_of_order_batches(spark, tmp_path_factory):
    """Property: RANDOM patch streams split into chunks and applied in
    a RANDOM batch order converge to the in-seq-order hand-applied
    state (hypothesis-driven; the OOO analog of the in-order property
    test above)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    event_st = st.tuples(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["x", "y", "z"]),
        st.sampled_from([1.0, 2.5, None]),
        st.sampled_from(["UPSERT", "PATCH", "PATCH", "DELETE"]),
        st.just(0),
        st.sampled_from([["a"], ["b"], ["a", "b"]]),
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(raw=st.lists(event_st, min_size=2, max_size=24),
           cuts=st.tuples(st.integers(1, 23), st.integers(1, 23)),
           order=st.permutations([0, 1, 2]),
           seq_base=st.integers(min_value=-25, max_value=1),
           mode=st.sampled_from(["cow", "mor"]))
    def run(raw, cuts, order, seq_base, mode):
        # negative seq domains included — see the in-order property test
        events = [
            (k, a, b, op, seq_base + i, set_cols if op == "PATCH" else None)
            for i, (k, a, b, op, _s, set_cols) in enumerate(raw)
        ]
        c1, c2 = sorted(min(c, len(events)) for c in cuts)
        chunks = [events[:c1], events[c1:c2], events[c2:]]
        root = tmp_path_factory.mktemp("patchooo")
        t = LakeTable.create(spark, str(root / "t"), SCHEMA, ["k"],
                             num_buckets=2, write_mode=mode)
        for bid, ci in enumerate(order):
            if chunks[ci]:
                t.merge_patches(_ev(spark, chunks[ci]), stream_id="s",
                                batch_id=bid)
        assert _read_state(t) == _apply_oracle(events)

    run()


def test_rollback_restores_state_and_markers(spark, table):
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=0)
    v1 = table.manifest.table_version
    table.merge_patches(_ev(spark, B2), stream_id="s", batch_id=1)
    r = table.rollback(v1)
    assert r["applied"] and table.manifest.table_version > v1
    assert _read_state(table) == _apply_oracle(B1)
    # markers restored → the undone batch re-applies and reconverges
    assert not table.is_batch_applied("s", 1)
    table.merge_patches(_ev(spark, B2), stream_id="s", batch_id=1)
    assert _read_state(table) == _apply_oracle(B1 + B2)
    # fresh handle sees the rolled-forward pointer chain
    reloaded = LakeTable.load(spark, table.path)
    assert _read_state(reloaded) == _apply_oracle(B1 + B2)


def test_rollback_noop_at_current_version(spark, table):
    table.merge_patches(_ev(spark, B1), stream_id="s", batch_id=0)
    r = table.rollback(table.manifest.table_version)
    assert r["applied"] is False


def test_patch_property_random_streams(spark, tmp_path_factory):
    """Property: for RANDOM patch streams and ANY contiguous batch
    split, sequential merge_patches equals applying the events one by
    one in seq order (hypothesis-driven)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    event_st = st.tuples(
        st.integers(min_value=0, max_value=4),                      # key
        st.sampled_from(["x", "y", "z"]),                           # a
        st.sampled_from([1.0, 2.5, None]),                          # b
        st.sampled_from(["UPSERT", "PATCH", "PATCH", "DELETE"]),    # op
        st.just(0),                                                 # seq (assigned below)
        st.sampled_from([["a"], ["b"], ["a", "b"]]),                # set_cols
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(raw=st.lists(event_st, min_size=1, max_size=24),
           split=st.integers(min_value=1, max_value=23),
           seq_base=st.integers(min_value=-25, max_value=1),
           mode=st.sampled_from(["cow", "mor"]))
    def run(raw, split, seq_base, mode):
        # seq_base shifts the seq domain below zero: event seqs are
        # arbitrary longs, and the _fold tie-break must hold for
        # negative values too (it is a write counter, not a seq sum)
        events = [
            (k, a, b, op, seq_base + i, set_cols if op == "PATCH" else None)
            for i, (k, a, b, op, _s, set_cols) in enumerate(raw)
        ]
        root = tmp_path_factory.mktemp("patchprop")
        t = LakeTable.create(spark, str(root / "t"), SCHEMA, ["k"],
                             num_buckets=2, write_mode=mode)
        cut = min(split, len(events))
        for bid, chunk in enumerate([events[:cut], events[cut:]]):
            if chunk:
                t.merge_patches(_ev(spark, chunk), stream_id="s", batch_id=bid)
        assert _read_state(t) == _apply_oracle(events)

    run()


def test_streaming_patch_ingest_exactly_once(spark, tmp_path):
    """File-source stream of PARTIAL-column events → foreachBatch
    merge_patches: final state matches the hand-applied contract, and
    re-running the stream on the same checkpoint applies nothing new."""
    import glob as _glob
    import shutil as _shutil

    from synapse_etl_jobs_spark.streaming import stream_into_table

    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate([B1, B2]):
        staging = str(tmp_path / f"stage{i}")
        _ev(spark, batch).coalesce(1).write.parquet(staging)
        part = _glob.glob(staging + "/part-*.parquet")[0]
        # one file per batch, named AND timestamped in seq order so the
        # file source's micro-batches respect the in-order contract
        _shutil.copy(part, str(src / f"{i}.parquet"))

    t = LakeTable.create(spark, str(tmp_path / "tbl"), SCHEMA, ["k"],
                         num_buckets=4, write_mode="mor")
    stream = (
        spark.readStream.schema(_ev(spark, B1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ckpt = str(tmp_path / "ckpt")
    stream_into_table(t, stream, ckpt, stream_id="ps", patches=True)
    assert _read_state(t) == _apply_oracle(B1 + B2)
    v = t.manifest.table_version
    # same checkpoint, no new files: nothing applied
    stream2 = (
        spark.readStream.schema(_ev(spark, B1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stream_into_table(t, stream2, ckpt, stream_id="ps", patches=True)
    assert t.manifest.table_version == v
    assert _read_state(t) == _apply_oracle(B1 + B2)


def test_write_time_stats_prune_mor_key_range(spark, tmp_table_path):
    """Write-time key-column stats prune fresh MoR delta files: each
    batch's deltas cover only that batch's key range, so a key-range
    scan skips the other batches' files WITHOUT a compaction — sound
    because key values are immutable across a key's versions."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=4,
                         write_mode="mor", stats_cols=["k"])
    for b, lo in enumerate([0, 1000, 2000]):
        rows = [(lo + i, f"a{lo + i}", float(i), "UPSERT", lo + i, None)
                for i in range(200)]
        t.merge(_ev(spark, rows), stream_id="s", batch_id=b)
    _entries, prune = t._range_pruned_entries({"k": (1005, 1010)})
    assert prune["files_kept"] < prune["files_total"]
    got = {r["k"] for r in t.scan_range({"k": (1005, 1010)}).collect()}
    assert got == set(range(1005, 1011))


def test_mor_nonkey_bounds_never_prune_deltas(spark, tmp_table_path):
    """A non-key bound must NOT prune delta files: the out-of-range LWW
    winner of a key would otherwise resurrect an older in-range version."""
    t = LakeTable.create(spark, tmp_table_path, SCHEMA, ["k"], num_buckets=2,
                         write_mode="mor", stats_cols=["k", "b"])
    t.merge(_ev(spark, [(1, "old", 5.0, "UPSERT", 1, None)]),
            stream_id="s", batch_id=0)
    t.merge(_ev(spark, [(1, "new", 500.0, "UPSERT", 2, None)]),
            stream_id="s", batch_id=1)
    # the winner (b=500) is outside the scanned band; the stale b=5 row
    # must not reappear
    assert t.scan_range({"b": (0.0, 10.0)}).count() == 0
    _entries, prune = t._range_pruned_entries({"b": (0.0, 10.0)})
    assert prune["files_kept"] == prune["files_total"]
