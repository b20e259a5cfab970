"""Row-level maintenance ops: DELETE WHERE / UPDATE WHERE
(LakeTable.delete_where / update_where).

Iceberg row-level-delete / update analogs, issued as first-class CDC
merge batches so exactly-once markers, tombstone order-insensitivity,
lineage, and changelog consumers all compose. The reference has no
predicate maintenance surface (its Glue jobs only ever apply upstream
change streams); semantics here are pinned against SQL UPDATE/DELETE
applied to the LWW final state.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.lake import LakeTable

SCHEMA = (
    StructType()
    .add("repo", "string")
    .add("path", "string")
    .add("lang", "string")
    .add("stars", "long")
    .add("content", "string")
)
KEYS = ["repo", "path"]

ROWS = [
    ("r1", "a.py", "python", 10, "print(1)"),
    ("r1", "b.rs", "rust", 5, "fn main() {}"),
    ("r2", "c.py", "python", 7, "print(2)"),
    ("r2", "d.go", "go", 3, "package main"),
    ("r3", "e.py", "python", 0, "pass"),
]


def _seed(spark, path, mode="mor"):
    t = LakeTable.create(spark, path, SCHEMA, KEYS, num_buckets=4,
                         write_mode=mode)
    ev = spark.createDataFrame(
        [(*r, "UPSERT", i + 1) for i, r in enumerate(ROWS)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(ev, batch_id=0)
    return t


def _state(t):
    return {
        (r["repo"], r["path"]): (r["lang"], r["stars"], r["content"])
        for r in t.read().collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_basic(spark, tmp_path, mode):
    t = _seed(spark, str(tmp_path / mode), mode)
    stats = t.delete_where("lang = 'python'")
    assert stats["applied"]
    assert stats["source_events"] == 3  # matched keys = tombstones written
    state = _state(t)
    assert set(state) == {("r1", "b.rs"), ("r2", "d.go")}
    # tombstones stored (order-insensitivity), hidden from reads
    internal = t.read(include_internal=True)
    assert internal.filter(F.col("_deleted")).count() == 3


def test_delete_where_is_a_cdc_event(spark, tmp_path):
    """Per-key seq+1: the delete beats everything stored; a LATER upstream
    event recreates the key; a STALE pre-delete event cannot resurrect."""
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where("repo = 'r1'")
    assert set(_state(t)) == {("r2", "c.py"), ("r2", "d.go"), ("r3", "e.py")}
    late = spark.createDataFrame(
        [("r1", "a.py", "python", 99, "print(3)", "UPSERT", 100)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    stale = spark.createDataFrame(
        [("r1", "b.rs", "rust", 1, "old", "UPSERT", 1)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(late, batch_id=10)
    t.merge(stale, batch_id=11)
    state = _state(t)
    assert state[("r1", "a.py")] == ("python", 99, "print(3)")  # recreated
    assert ("r1", "b.rs") not in state  # stale event lost to the tombstone


def test_delete_where_exactly_once_and_empty_match(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    s1 = t.delete_where("stars > 100")  # matches nothing
    assert s1["applied"] and s1["source_events"] == 0
    assert len(_state(t)) == 5
    s2 = t.delete_where("lang = 'go'", batch_id="purge-go")
    assert s2["applied"] and s2["source_events"] == 1
    s3 = t.delete_where("lang = 'go'", batch_id="purge-go")  # redelivery
    assert not s3["applied"] and s3["reason"] == "batch_already_applied"


def test_delete_where_scan_pruning(spark, tmp_path):
    """A string predicate over slim columns prunes the scan to keys +
    referenced columns before the MoR reduce — content never read."""
    t = _seed(spark, str(tmp_path / "t"))
    assert t._sql_refs("lang = 'python' AND stars > 2") == ["lang", "stars"]
    view, _ = t._matched_view("lang = 'python'", t._sql_refs("lang = 'python'"))
    assert "content" not in view.columns
    assert set(KEYS).issubset(view.columns)
    # Column predicates / unparseable refs fall back to full width
    assert t._sql_refs(F.col("lang") == "python") is None
    assert t._sql_refs("nope = 1") is None
    t.delete_where(F.col("lang") == "go")
    assert ("r2", "d.go") not in _state(t)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_where_basic(spark, tmp_path, mode):
    t = _seed(spark, str(tmp_path / mode), mode)
    stats = t.update_where(
        "lang = 'python'",
        {"lang": "'py3'", "stars": "stars + 1", "content": "upper(content)"},
    )
    assert stats["applied"] and stats["source_events"] == 3
    state = _state(t)
    assert state[("r1", "a.py")] == ("py3", 11, "PRINT(1)")
    assert state[("r3", "e.py")] == ("py3", 1, "PASS")
    assert state[("r1", "b.rs")] == ("rust", 5, "fn main() {}")  # untouched


def test_update_where_validation(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="key/bucket"):
        t.update_where("true", {"repo": "'x'"})
    with pytest.raises(ValueError, match="not in the table schema"):
        t.update_where("true", {"nope": "1"})
    with pytest.raises(ValueError, match="at least one SET"):
        t.update_where("true", {})


def test_update_where_loses_to_later_event(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.update_where("repo = 'r3'", {"stars": "1000"})
    late = spark.createDataFrame(
        [("r3", "e.py", "python", 2, "pass", "UPSERT", 50)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(late, batch_id=5)
    assert _state(t)[("r3", "e.py")] == ("python", 2, "pass")


def test_changes_consumer_sees_row_maintenance(spark, tmp_path):
    """delete/update are merge versions with per-row records: a replica
    tailing changes() reproduces the post-maintenance state."""
    src = _seed(spark, str(tmp_path / "src"))
    v0 = src.manifest.table_version
    src.delete_where("lang = 'go'")
    src.update_where("repo = 'r1'", {"stars": "stars * 2"})
    ch = src.changes(v0)
    assert ch.filter(F.col("_deleted")).count() == 1
    replica = LakeTable.create(
        spark, str(tmp_path / "rep"), SCHEMA, KEYS, num_buckets=4,
        write_mode="mor",
    )
    replica.merge(src.changes(0).withColumn("op", F.when(
        F.col("_deleted"), F.lit("DELETE")).otherwise(F.lit("UPSERT"))
    ).withColumn("seq", F.col("_seq")), batch_id="sync")
    assert _state(replica) == _state(src)


def _seed_patch(spark, path):
    """A patch-enabled table (per-column CRDT state)."""
    t = LakeTable.create(spark, path, SCHEMA, KEYS, num_buckets=4,
                         write_mode="mor")
    ev = spark.createDataFrame(
        [(*r, "UPSERT", i + 1, None) for i, r in enumerate(ROWS)],
        "repo string, path string, lang string, stars long, content string, "
        "op string, seq long, set_cols array<string>",
    )
    t.merge_patches(ev, batch_id=0)
    assert t._patch_enabled
    return t


def test_update_where_patch_table_writes_only_set_columns(spark, tmp_path):
    t = _seed_patch(spark, str(tmp_path / "t"))
    t.update_where("lang = 'python'", {"stars": "stars + 1"})
    state = _state(t)
    assert state[("r1", "a.py")] == ("python", 11, "print(1)")
    # a later upstream patch to ANOTHER column composes per-column
    patch = spark.createDataFrame(
        [("r1", "a.py", None, None, "new", "PATCH", 200, ["content"])],
        "repo string, path string, lang string, stars long, content string, "
        "op string, seq long, set_cols array<string>",
    )
    t.merge_patches(patch, batch_id=2)
    assert _state(t)[("r1", "a.py")] == ("python", 11, "new")


def test_delete_where_patch_table_records_crdt_delete(spark, tmp_path):
    """On a patch table the delete must set the CRDT delete seq: a stale
    partial patch (seq below the delete) cannot resurrect the key; a
    fresh patch (seq above) legitimately recreates it."""
    t = _seed_patch(spark, str(tmp_path / "t"))
    t.delete_where("repo = 'r1'")
    assert ("r1", "a.py") not in _state(t)
    stale = spark.createDataFrame(
        [("r1", "a.py", None, 7, None, "PATCH", 1, ["stars"])],
        "repo string, path string, lang string, stars long, content string, "
        "op string, seq long, set_cols array<string>",
    )
    t.merge_patches(stale, batch_id=3)
    assert ("r1", "a.py") not in _state(t)  # stale patch stays dead
    fresh = spark.createDataFrame(
        [("r1", "a.py", None, 8, None, "PATCH", 500, ["stars"])],
        "repo string, path string, lang string, stars long, content string, "
        "op string, seq long, set_cols array<string>",
    )
    t.merge_patches(fresh, batch_id=4)
    assert _state(t)[("r1", "a.py")] == (None, 8, None)  # recreated


def test_update_where_explicit_seq_pins_global_order(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.update_where("repo = 'r2'", {"stars": "0"}, seq=1000)
    late_but_below = spark.createDataFrame(
        [("r2", "c.py", "python", 7, "print(2)", "UPSERT", 999)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(late_but_below, batch_id=9)
    assert _state(t)[("r2", "c.py")][1] == 0  # seq=1000 still wins


# -- manifest-level file skipping for maintenance scans ---------------------

def test_predicate_bounds_derivation(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    b = t._predicate_bounds("stars >= 3 AND stars < 9 AND lang = 'python'")
    assert b == {"stars": (3, 9), "lang": ("python", "python")}
    # flipped literal-first comparisons
    assert t._predicate_bounds("5 <= stars") == {"stars": (5, None)}
    assert t._predicate_bounds("10 > stars") == {"stars": (None, 10)}
    # OR at the top level: no conjunct bounds (sound: nothing derivable)
    assert t._predicate_bounds("stars > 3 OR lang = 'go'") == {}
    # but an AND above an OR still yields the AND-side bound
    assert t._predicate_bounds(
        "stars > 3 AND (lang = 'go' OR lang = 'rust')"
    ) == {"stars": (3, None)}
    # non-schema names, type mismatches, Columns: nothing
    assert t._predicate_bounds("nope = 1") == {}
    assert t._predicate_bounds("stars = 'high'") == {}  # str vs long
    assert t._predicate_bounds(F.col("stars") > 3) == {}
    # contradictory equality conjuncts intersect (empty range prunes all)
    lo, hi = t._predicate_bounds("stars = 3 AND stars = 5")["stars"]
    assert lo > hi


def test_delete_where_skips_files_by_stats(spark, tmp_path):
    """After compact(sort_cols=...) records per-file [min,max], a ranged
    delete prunes the maintenance scan at the manifest level and still
    produces the exact SQL DELETE result."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=2,
        write_mode="mor", stats_cols=["stars"],
    )
    ev = spark.createDataFrame(
        [(f"r{i}", f"f{i}.py", "python", i, f"c{i}", "UPSERT", i)
         for i in range(200)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(ev, batch_id=0)
    t.compact(sort_cols=["stars"], target_file_mb=0.001)
    files_total = sum(len(v) for v in t.manifest.buckets.values())
    assert files_total > 2  # several base files per bucket, stars-sorted

    s = t.delete_where("stars >= 190")
    assert s["source_events"] == 10
    pr = s.get("scan_pruning")
    assert pr is not None and pr["files_kept"] < pr["files_total"]
    assert t.read().count() == 190
    # correctness unchanged when nothing is derivable (no pruning);
    # stars >= 195 is already deleted, so only stars < 5 matches
    s2 = t.update_where("stars < 5 OR stars >= 195", {"lang": "'hot'"})
    assert "scan_pruning" not in s2 and s2["source_events"] == 5
    assert t.read().filter("lang = 'hot'").count() == 5


def test_read_where_matches_plain_filter_and_prunes(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=2,
        write_mode="mor", stats_cols=["stars"],
    )
    ev = spark.createDataFrame(
        [(f"r{i}", f"f{i}.py", "python", i, f"c{i}", "UPSERT", i)
         for i in range(100)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(ev, batch_id=0)
    t.compact(sort_cols=["stars"], target_file_mb=0.001)
    pred = "stars >= 90 AND lang = 'python'"
    a = t.read_where(pred)
    b = t.read().filter(pred)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == 10
    kept, st = t._range_pruned_entries(t._predicate_bounds(pred))
    assert st["files_kept"] < st["files_total"]
    # no derivable bounds → still exact
    assert t.read_where("stars >= 90 OR stars < 2").count() == 12


def test_predicate_bounds_fractional_and_kwarg_guard(spark, tmp_path):
    """Plain fractional literals (parsed as Decimal by Spark) must bound
    float/double columns, and the fixed envelope kwargs are refused with
    an explanation instead of an opaque TypeError."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        StructType().add("k", "long").add("v", "double"),
        ["k"], num_buckets=2, write_mode="mor",
    )
    assert t._predicate_bounds("v > 0.5") == {"v": (0.5, None)}
    assert t._predicate_bounds("v >= 0.25 AND v < 1.75") == {"v": (0.25, 1.75)}
    # fractional literal against an integral column: skipped (type guard)
    assert t._predicate_bounds("k = 1.5") == {}
    with pytest.raises(ValueError, match="op_col is fixed"):
        t.delete_where("v > 0.5", op_col="operation")
    with pytest.raises(ValueError, match="seq_col is fixed"):
        t.update_where("v > 0.5", {"v": "v + 1"}, seq_col="s")


def test_predicate_bounds_in_and_between(spark, tmp_path):
    """IN lists bound by [min, max] of the members; BETWEEN is expanded
    by the parser into the two comparisons and already bounds."""
    t = _seed(spark, str(tmp_path / "t"))
    assert t._predicate_bounds("stars IN (7, 3, 5)") == {"stars": (3, 7)}
    assert t._predicate_bounds("lang IN ('go', 'rust')") == \
        {"lang": ("go", "rust")}
    assert t._predicate_bounds("stars BETWEEN 2 AND 8") == {"stars": (2, 8)}
    # non-literal member / type mismatch: contribute nothing
    assert t._predicate_bounds("stars IN (1, stars)") == {}
    assert t._predicate_bounds("stars IN ('a', 'b')") == {}


# -- property pin: bounds-pruned reads == plain filtered reads --------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_CMP = ["=", "<", "<=", ">", ">="]
_conjunct = st.one_of(
    st.tuples(st.just("stars"), st.sampled_from(_CMP),
              st.integers(min_value=-5, max_value=205)),
    st.tuples(st.just("lang"), st.sampled_from(_CMP),
              st.sampled_from(["python", "go", "rust", "zz"])),
    st.tuples(st.just("stars"), st.just("IN"),
              st.lists(st.integers(min_value=-5, max_value=205),
                       min_size=1, max_size=4)),
    st.tuples(st.just("stars"), st.just("BETWEEN"),
              st.tuples(st.integers(min_value=-5, max_value=205),
                        st.integers(min_value=-5, max_value=205))),
)


def _render(conj):
    col, op, val = conj
    if op == "IN":
        return f"{col} IN ({', '.join(str(v) for v in val)})"
    if op == "BETWEEN":
        return f"{col} BETWEEN {val[0]} AND {val[1]}"
    lit = f"'{val}'" if isinstance(val, str) else str(val)
    return f"{col} {op} {lit}"


@pytest.fixture(scope="module")
def sorted_table(spark, tmp_path_factory):
    """200 rows, stars-sorted + binpacked so per-file [min,max] stats are
    live and pruning actually fires for most generated predicates."""
    t = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("prop") / "t"), SCHEMA, KEYS,
        num_buckets=2, write_mode="mor", stats_cols=["stars"],
    )
    langs = ["python", "go", "rust"]
    ev = spark.createDataFrame(
        [(f"r{i}", f"f{i}.py", langs[i % 3], i, f"c{i}", "UPSERT", i)
         for i in range(200)],
        "repo string, path string, lang string, stars long, "
        "content string, op string, seq long",
    )
    t.merge(ev, batch_id=0)
    t.compact(sort_cols=["stars"], target_file_mb=0.001)
    return t


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(conjs=st.lists(_conjunct, min_size=1, max_size=3))
def test_read_where_soundness_property(sorted_table, conjs):
    """For ANY conjunction of comparisons (including empty ranges,
    out-of-domain literals, IN lists, inverted BETWEENs), the
    bounds-pruned read returns EXACTLY the rows of the plain filtered
    read — the superset contract can drop files, never rows."""
    pred = " AND ".join(_render(c) for c in conjs)
    t = sorted_table
    a = {tuple(r) for r in t.read_where(pred).collect()}
    b = {tuple(r) for r in t.read().filter(pred).collect()}
    assert a == b, pred


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(perm=st.permutations(range(3)))
def test_maintenance_interleaves_with_permuted_patches(spark, tmp_path_factory, perm):
    """Order-insensitivity survives maintenance ops: a delete_where +
    update_where issued against the same base state, with the upstream's
    partial-patch batches redelivered in ANY order afterwards, converges
    to one identical final state (per-column CRDT + per-key maintenance
    seqs compose)."""
    base = tmp_path_factory.mktemp("mperm")
    patches = [
        [(("r1", "a.py"), 50, "stars", 100)],   # beats the maintenance seq
        [(("r2", "c.py"), 2, "stars", 999)],    # stale: loses everywhere
        [(("r3", "e.py"), 60, "content", "NEW")],
    ]

    def run(order, path):
        t = _seed_patch(spark, str(path))
        t.delete_where("repo = 'r2'")
        t.update_where("lang = 'python'", {"stars": "stars + 1"})
        for j, bi in enumerate(order):
            rows = [
                (k[0], k[1], None,
                 v if c == "stars" else None,
                 v if c == "content" else None,
                 "PATCH", seq, [c])
                for (k, seq, c, v) in patches[bi]
            ]
            t.merge_patches(
                spark.createDataFrame(
                    rows,
                    "repo string, path string, lang string, stars long, "
                    "content string, op string, seq long, "
                    "set_cols array<string>",
                ),
                batch_id=f"p{bi}",
            )
        return _state(t)

    ref = run(range(3), base / "ref")
    got = run(perm, base / "got")
    assert got == ref
    # sanity on the converged content: the late patch beat the update,
    # the stale patch could not resurrect the deleted key
    assert ref[("r1", "a.py")][1] == 100
    assert ("r2", "c.py") not in ref
