"""Round-5 ADVICE fixes, regression-pinned.

1. (high) Replicating a patch-enabled source must NOT evolve the CRDT
   internal columns (``_cseq``/``_fold``) into the replica's user
   schema, and must converge the replica to the source's exact
   per-column state — including catch-up micro-batches that bundle
   several source versions whose rows tie on ``_seq`` and differ only
   by ``_fold``.
2. (low) ``update_where`` SET expressions resolving safely wider than
   the column widen the schema instead of silently wrapping under the
   non-ANSI cast (both the plain and the patch-mode path).
3. (low) ``delete_where`` and ``update_where`` default to DISTINCT
   stream ids, so the same ``batch_id`` across op kinds never dedupes.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable
from synapse_etl_jobs_spark.lake.table import INTERNAL_COLS
from synapse_etl_jobs_spark.streaming import replicate_once

SCHEMA = StructType().add("k", "long").add("a", "string").add("b", "double")
EV = "k long, a string, b double, op string, seq long, set_cols array<string>"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV)


def _state(t):
    return {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}


def _mk(spark, path, **kw):
    return LakeTable.create(spark, path, SCHEMA, ["k"], num_buckets=4,
                            write_mode="mor", **kw)


def _assert_clean_schema(t):
    user = set(t.manifest.current_schema().fieldNames())
    assert not user & set(INTERNAL_COLS), user


def test_replicate_patch_mode_source(spark, tmp_path):
    """Replicating a merge_patches/update_where source: replica schema
    stays clean of internal columns, state converges, and the replica
    itself lands in patch mode with working CRDT state (a later stale
    patch cannot resurrect through the replica)."""
    src = _mk(spark, str(tmp_path / "src"))
    rep = _mk(spark, str(tmp_path / "rep"))
    ckpt = str(tmp_path / "ckpt")

    src.merge(
        spark.createDataFrame(
            [(1, "a1", 1.0, "UPSERT", 1), (2, "a2", 2.0, "UPSERT", 2)],
            "k long, a string, b double, op string, seq long",
        ),
        batch_id=0,
    )
    src.merge_patches(_ev(spark, [(1, "A1", None, "PATCH", 3, ["a"]),
                                  (2, None, 22.0, "PATCH", 4, ["b"])]),
                      batch_id=1)
    src.update_where("k = 2", {"a": "'U2'"})
    src.delete_where("k = 1")

    replicate_once(spark, src.path, rep.path, ckpt)
    rep = LakeTable.load(spark, rep.path)
    _assert_clean_schema(rep)
    assert _state(rep) == _state(src) == {2: ("U2", 22.0)}
    assert rep._patch_enabled

    # second cycle over the SAME checkpoint: more patches flow and the
    # replica's stored CRDT state resolves them per-column
    src = LakeTable.load(spark, src.path)
    src.merge_patches(_ev(spark, [(2, "ZZ", None, "PATCH", 10, ["a"]),
                                  (3, None, 33.0, "PATCH", 11, ["b"])]),
                      batch_id=2)
    replicate_once(spark, src.path, rep.path, ckpt)
    rep = LakeTable.load(spark, rep.path)
    _assert_clean_schema(rep)
    assert _state(rep) == _state(src) == {2: ("ZZ", 22.0), 3: (None, 33.0)}


def test_replicate_patch_catchup_fold_tiebreak(spark, tmp_path):
    """Several source patch versions bundled into ONE catch-up
    micro-batch, ties on max ``_seq`` between physical versions broken
    by ``_fold``: two patch merges at the same event seq touch different
    columns — the replica must keep the later fold (which subsumes
    both), not a payload-order winner."""
    src = _mk(spark, str(tmp_path / "src"))
    rep = _mk(spark, str(tmp_path / "rep"))

    # b set at seq 2; then a at seq 5 (row _seq becomes 5); then a LATE
    # patch to b at seq 3 — entry 3 > 2 flips b to 10.0 WITHOUT raising
    # the row's max seq. Physical versions 2 and 3 tie at _seq=5 and the
    # stale one carries the LARGER payload value (50.0), so a
    # payload-order tie-break picks the wrong version — only _fold
    # orders them correctly.
    src.merge_patches(_ev(spark, [(1, None, 50.0, "PATCH", 2, ["b"])]),
                      batch_id=0)
    src.merge_patches(_ev(spark, [(1, "xx", None, "PATCH", 5, ["a"])]),
                      batch_id=1)
    src.merge_patches(_ev(spark, [(1, None, 10.0, "PATCH", 3, ["b"])]),
                      batch_id=2)
    assert _state(src) == {1: ("xx", 10.0)}

    # one availableNow pass delivers ALL versions in one micro-batch
    replicate_once(spark, src.path, rep.path, str(tmp_path / "ckpt"))
    rep = LakeTable.load(spark, rep.path)
    _assert_clean_schema(rep)
    assert _state(rep) == {1: ("xx", 10.0)}


def test_replicate_filtered_patch_source(spark, tmp_path):
    """Key-filtered partial replica over a patch-mode source."""
    src = _mk(spark, str(tmp_path / "src"))
    rep = _mk(spark, str(tmp_path / "rep"))
    src.merge_patches(_ev(spark, [(1, "a1", 1.0, "UPSERT", 1, None),
                                  (2, "a2", 2.0, "UPSERT", 2, None),
                                  (1, "P1", None, "PATCH", 3, ["a"])]),
                      batch_id=0)
    replicate_once(spark, src.path, rep.path, str(tmp_path / "ckpt"),
                   where="k = 1")
    rep = LakeTable.load(spark, rep.path)
    _assert_clean_schema(rep)
    assert _state(rep) == {1: ("P1", 1.0)}


@pytest.mark.parametrize("patch_mode", [False, True])
def test_update_where_widens_instead_of_wrapping(spark, tmp_path, patch_mode):
    """A SET expression resolving to bigint on an int column widens the
    column (int→bigint) instead of wrapping under the non-ANSI cast."""
    schema = StructType().add("k", "long").add("n", "integer")
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["k"],
                         num_buckets=2, write_mode="mor")
    t.merge(
        spark.createDataFrame([(1, 7, "UPSERT", 1)],
                              "k long, n int, op string, seq long"),
        batch_id=0,
    )
    if patch_mode:
        # flip to patch mode first so update_where takes the patch path
        t.merge_patches(
            spark.createDataFrame(
                [(1, 7, "PATCH", 2, ["n"])],
                "k long, n int, op string, seq long, set_cols array<string>",
            ),
            batch_id=1,
        )
    big = 2**40  # far outside int range; wraps to garbage under cast
    t.update_where("k = 1", {"n": f"CAST({big} AS BIGINT)"})
    t = LakeTable.load(spark, t.path)
    assert t.manifest.current_schema()["n"].dataType.simpleString() == "bigint"
    assert {r["n"] for r in t.read().collect()} == {big}


def test_maintenance_ops_do_not_share_markers(spark, tmp_path):
    """delete_where and update_where with the SAME batch_id both apply —
    their default stream ids are namespaced per op kind."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame(
            [(1, "a", 1.0, "UPSERT", 1), (2, "b", 2.0, "UPSERT", 2)],
            "k long, a string, b double, op string, seq long",
        ),
        batch_id=0,
    )
    r1 = t.delete_where("k = 1", batch_id=7)
    r2 = t.update_where("k = 2", {"a": "'B'"}, batch_id=7)
    assert r1["applied"] and r2["applied"]
    assert _state(t) == {2: ("B", 2.0)}
    # redelivery of each op under its own id still short-circuits
    assert not t.delete_where("k = 2", batch_id=7)["applied"]
    assert not t.update_where("k = 2", {"a": "'C'"}, batch_id=7)["applied"]
