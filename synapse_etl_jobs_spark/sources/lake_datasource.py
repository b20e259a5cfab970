"""Python DataSource (Spark 4 ``pyspark.sql.datasource``) exposing the
lake format as a first-class ``spark.read.format("synlake")`` source and
a ``spark.readStream.format("synlake_cdc")`` changelog tailer.

Why this exists: ``LakeTable`` (lake/table.py) is a library object — a
consumer has to import this package and call ``.read()``.  Mounting the
format as a registered data source makes the table readable by ANY Spark
job (SQL included, via ``CREATE TABLE ... USING synlake`` semantics) and
— the CDC half of the north rule — lets Structured Streaming tail the
table's merge-on-read changelog with ordinary ``readStream`` machinery:
offsets are table versions, each micro-batch is exactly the delta files
committed in ``(start, end]``, and exactly-once comes from Spark's own
offset log plus the idempotent LWW merge a downstream ``LakeTable``
applies (pytest: kill-free replication A → B converges bit-identically).

Scale design (executor-side, driver does only manifest JSON reads):

- one ``InputPartition`` per bucket when deltas force an LWW reduction
  (keys never cross buckets, so per-bucket dedup is globally correct);
  one partition per FILE for pure-base buckets (CoW/compacted tables get
  file-level parallelism — no reduction needed, the merge already ran);
- executors read ONLY their partition's parquet files with pyarrow and
  yield Arrow record batches (zero row-at-a-time Python);
- equality filters on the bucket column prune partitions BEFORE launch
  via a pure-Python port of Spark's ``xxhash64`` (bit-verified against
  ``F.xxhash64`` in tests/test_lake_datasource.py) — a point scan
  touches 1/num_buckets of the table with no Spark job to plan it;
- schema epochs are resolved per file exactly like
  ``LakeTable._read_files`` (rename map → null-fill added columns →
  cast), so readers see the CURRENT logical schema regardless of when a
  file was written.

Reference parity: the reference's jobs read governed tables through the
Glue catalog (`/root/reference/src/scripts/glue_jobs/node_snapshots.py`
``create_dynamic_frame.from_catalog``); this module is the Spark-native
equivalent surface for the lake tables this engine maintains.

LWW tie-break caveat: within one micro-batch/partition the reduction
keeps, among rows sharing the maximum ``_seq`` of a key, the row from
the latest-committed file (input order).  ``dedup_lww`` breaks such ties
by payload ordering instead.  Well-formed CDC streams have unique seqs
per key (the property every replay test pins), so the two agree on any
input the engine itself produced.
"""

from __future__ import annotations

import json
import os
import struct as _struct
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

SEQ_COL = "_seq"
DELETED_COL = "_deleted"
CSEQ_COL = "_cseq"
FOLD_COL = "_fold"

# ---------------------------------------------------------------------------
# Pure-Python Spark xxhash64 (XXH64, Spark's per-type specialization).
# Public algorithm (Yann Collet's xxHash, BSD); constants from the spec.
# Needed driver-side for bucket pruning where no SparkSession exists
# (DataSource planning runs in a separate Python worker process).
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_long(value: int, seed: int) -> int:
    """Spark ``XXH64.hashLong``: the 8-byte specialization."""
    h = (seed + _P5 + 8) & _M
    k1 = _rotl((value & _M) * _P2 & _M, 31) * _P1 & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _xxh64_int(value: int, seed: int) -> int:
    """Spark ``XXH64.hashInt``: the 4-byte specialization."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _xxh64_bytes(data: bytes, seed: int) -> int:
    """Full-stream XXH64 (Spark ``hashUnsafeBytes`` — string columns)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            w = _struct.unpack_from("<4Q", data, off)
            v1 = (_rotl((v1 + w[0] * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + w[1] * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + w[2] * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + w[3] * _P2) & _M, 31) * _P1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        (w,) = _struct.unpack_from("<Q", data, off)
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        (w,) = _struct.unpack_from("<I", data, off)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def spark_xxhash64(values: list[tuple[Any, str]], seed: int = 42) -> int:
    """``F.xxhash64(c1, c2, ...)`` as a signed 64-bit int.  ``values`` is
    ``[(value, spark_type_name), ...]``; nulls leave the seed unchanged
    (Spark's null rule)."""
    h = seed
    for value, tname in values:
        if value is None:
            continue
        if tname in ("long", "bigint"):
            h = _xxh64_long(int(value), h)
        elif tname in ("int", "integer", "short", "smallint", "byte", "tinyint"):
            # Spark widens byte/short to int for hashing
            h = _xxh64_int(int(value), h)
        elif tname == "string":
            h = _xxh64_bytes(str(value).encode("utf-8"), h)
        elif tname == "binary":
            h = _xxh64_bytes(bytes(value), h)
        else:
            raise NotImplementedError(
                f"offline xxhash64 for type {tname!r} not implemented "
                "(supported: integral, string, binary)"
            )
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(values: list[tuple[Any, str]], num_buckets: int) -> int:
    """``pmod(xxhash64(*bucket_cols), num_buckets)`` — the engine's bucket
    assignment (lake/table.py:_bucket_expr), computed without Spark."""
    return spark_xxhash64(values) % num_buckets


# ---------------------------------------------------------------------------
# Manifest access (driver-side planning; local-FS like lake/table.py — the
# cluster-side swap is the same FileSystem abstraction the table names)
# ---------------------------------------------------------------------------


def _local(path: str) -> str:
    """Python DataSource workers run without a JVM, so manifest access is
    pyarrow/posix: accept bare paths and file: URIs (strip the scheme);
    hdfs:/s3a: tables need the LakeTable API, which has the Hadoop FS."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:/"):
        return path[len("file:"):]
    return path


def _load_manifest(path: str, version: int | None = None) -> dict:
    mdir = os.path.join(_local(path), "_manifests")
    if version is None:
        version = _current_version(path)
    with open(os.path.join(mdir, f"v{version:012d}.json")) as f:
        d = json.load(f)
    if "buckets" not in d:
        # sharded root (Iceberg manifest-list analog): per-bucket file
        # lists live in immutable side files — resolve the references
        bdir = os.path.join(mdir, "buckets")
        buckets = {}
        for b, ref in d.get("bucket_refs", {}).items():
            with open(os.path.join(bdir, ref)) as f:
                buckets[b] = json.load(f)
        d["buckets"] = buckets
    return d


def _current_version(path: str) -> int:
    """Head version = highest committed version file, probing forward
    from the CURRENT pointer (a hint that can lag one commit behind a
    crashed writer — mirrors LakeTable._resolve_current)."""
    mdir = os.path.join(_local(path), "_manifests")
    with open(os.path.join(mdir, "CURRENT")) as f:
        version = int(f.read().strip())
    while os.path.exists(os.path.join(mdir, f"v{version + 1:012d}.json")):
        version += 1
    return version


def _logical_schema(man: dict) -> StructType:
    sid = str(man["current_schema_id"])
    return StructType.fromJson(man["schemas"][sid]["schema"])


def _physical_schema(man: dict) -> StructType:
    """Logical schema + internal columns, matching
    LakeTable._stored_schema: patch-enabled tables (props.patch_seqs)
    additionally store the per-column CRDT state (_cseq/_fold)."""
    st = StructType.fromJson(_logical_schema(man).jsonValue())
    st = st.add(SEQ_COL, "long", True).add(DELETED_COL, "boolean", True)
    if (man.get("props") or {}).get("patch_seqs"):
        from pyspark.sql.types import LongType, MapType, StringType

        st = st.add(CSEQ_COL, MapType(StringType(), LongType()), True)
        st = st.add(FOLD_COL, "long", True)
    return st


def _file_plan(man: dict, entries: list[dict]) -> list[dict]:
    """Per-file read plan: path + the rename map of its schema epoch."""
    plan = []
    for e in entries:
        sid = str(e["schema_id"])
        plan.append(
            {"path": e["path"], "rename": man["schemas"][sid].get("rename", {})}
        )
    return plan


# ---------------------------------------------------------------------------
# Executor-side Arrow kernel
# ---------------------------------------------------------------------------


def _arrow_schema_of(spark_schema: StructType) -> "pa.Schema":
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def _translate_cseq_keys(t: "pa.Table", rename: dict) -> "pa.Table":
    """Translate ``_cseq`` map KEYS through an epoch rename map — the
    Arrow mirror of LakeTable._read_files' ``transform_keys`` step: the
    per-column CRDT state keys columns by name, so a renamed column's
    stored winner seq must follow the rename or it is orphaned.
    Vectorized: keys are dictionary-encoded, only the (tiny) dictionary
    goes through Python; row validity is preserved via null offsets."""
    import pyarrow as pa
    import pyarrow.compute as pc

    idx = t.column_names.index(CSEQ_COL)
    out_chunks = []
    for ma in t.column(idx).chunks:
        n = len(ma)
        if n == 0 or len(ma.keys) == 0:
            out_chunks.append(ma)
            continue
        enc = pc.dictionary_encode(ma.keys)
        new_dict = pa.array(
            [rename.get(k.as_py(), k.as_py()) for k in enc.dictionary],
            type=pa.string(),
        )
        new_keys = pc.take(new_dict, enc.indices)
        off = ma.offsets
        head = pc.if_else(
            ma.is_valid(), off.slice(0, n), pa.scalar(None, pa.int32())
        )
        offsets = pa.concat_arrays([head, off.slice(n, 1)])
        out_chunks.append(pa.MapArray.from_arrays(offsets, new_keys, ma.items))
    return t.set_column(
        idx, CSEQ_COL, pa.chunked_array(out_chunks, type=t.column(idx).type)
    )


def _read_files_arrow(
    files: list[dict], target: "pa.Schema"
) -> "pa.Table":
    """Read parquet files, resolve schema epochs (rename → null-fill →
    cast), return one Arrow table in ``target`` column order.  Mirrors
    LakeTable._read_files exactly (lake/table.py:322), including the
    ``_cseq`` key translation through epoch rename maps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for f in files:
        t = pq.read_table(f["path"])
        rename = f.get("rename") or {}
        if rename:
            t = t.rename_columns([rename.get(c, c) for c in t.column_names])
            if CSEQ_COL in t.column_names:
                t = _translate_cseq_keys(t, rename)
        cols = []
        for field in target:
            if field.name in t.column_names:
                col = t.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
            else:
                col = pa.nulls(t.num_rows, field.type)
            cols.append(col)
        tables.append(pa.Table.from_arrays(cols, schema=target))
    if not tables:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in target], schema=target
        )
    return pa.concat_tables(tables)


def _lww_reduce_arrow(t: "pa.Table", key_cols: list[str]) -> "pa.Table":
    """Keep, per key, the row with max ``_seq`` (ties: latest-file row —
    see module docstring).  Winner selection runs over keys+seq ONLY
    (payload columns never leave Arrow), then ``take`` pulls winners."""
    import numpy as np
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return t
    # EXACT int64 comparison (float64 would round above 2^53 — snowflake
    # ids, epoch-nanos); null seq = MIN_LONG (never beats a real seq)
    seq = pc.fill_null(t.column(SEQ_COL), -(1 << 63)).to_numpy(
        zero_copy_only=False
    )
    # Deduplicate on Arrow-side DICTIONARY CODES, never raw key values
    # through pandas: the default to_pandas turns nullable int64 into
    # float64 (keys above 2^53 collide after rounding), and even
    # ArrowDtype-backed frames factorize through float for
    # drop_duplicates. Codes are small ints — exact by construction.
    # Nulls encode to null indices → -1, i.e. all-null keys group
    # together (same semantics pandas had).
    import pandas as pd

    codes = {}
    for c in key_cols:
        enc = pc.dictionary_encode(t.column(c).combine_chunks())
        codes[c] = np.asarray(
            pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
        )
    small = pd.DataFrame(codes)
    # stable ordering: sort by (seq, fold, original position), keep last
    # per key. The fold counter exists on patch-enabled tables only: two
    # versions of a key can tie on _seq there, and the strictly-increasing
    # fold picks the latest written CRDT state (see LakeTable._lww_stored).
    if FOLD_COL in t.column_names:
        fold = pc.fill_null(
            pc.coalesce(t.column(FOLD_COL), t.column(SEQ_COL)), -(1 << 63)
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((np.arange(len(seq)), fold, seq))
    else:
        order = np.lexsort((np.arange(len(seq)), seq))
    winners = small.iloc[order].drop_duplicates(subset=key_cols, keep="last").index
    idx = np.sort(winners.to_numpy())
    return t.take(idx)


def _drop_tombstones(t: "pa.Table") -> "pa.Table":
    import pyarrow.compute as pc

    mask = pc.invert(pc.fill_null(t.column(DELETED_COL), False))
    t = t.filter(mask)
    drop = [c for c in (SEQ_COL, DELETED_COL, CSEQ_COL, FOLD_COL)
            if c in t.column_names]
    return t.drop_columns(drop)


@dataclass
class LakePartition(InputPartition):
    files: list[dict]
    needs_reduce: bool


class _LakeReaderBase:
    """Shared executor read: files → Arrow → (reduce) → record batches."""

    def __init__(
        self,
        arrow_schema: "pa.Schema",
        key_cols: list[str],
        drop_internal: bool,
    ):
        self._arrow_schema = arrow_schema
        self._key_cols = key_cols
        self._drop_internal = drop_internal

    def read(self, partition: LakePartition) -> Iterator["pa.RecordBatch"]:
        t = _read_files_arrow(partition.files, self._arrow_schema)
        if partition.needs_reduce:
            t = _lww_reduce_arrow(t, self._key_cols)
        if self._drop_internal:
            t = _drop_tombstones(t)
        yield from t.to_batches(max_chunksize=1 << 16)


# ---------------------------------------------------------------------------
# Batch reader: spark.read.format("synlake").option("path", p).load()
# ---------------------------------------------------------------------------


class LakeBatchReader(_LakeReaderBase, DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("synlake requires .option('path', <table dir>)")
        version = options.get("version")
        self._path = path
        self._man = _load_manifest(path, int(version) if version is not None else None)
        # Pin the resolved version so a reload after pickling (Spark may
        # round-trip the reader between planning calls) sees the SAME
        # snapshot even if a concurrent commit moved CURRENT.
        self._pinned_version = int(self._man["table_version"])
        self._include_internal = (
            str(options.get("include_internal", "false")).lower() == "true"
        )
        logical = _logical_schema(self._man)
        physical = _physical_schema(self._man)
        super().__init__(
            _arrow_schema_of(physical),
            list(self._man["key_cols"]),
            drop_internal=not self._include_internal,
        )
        self._logical = logical
        self._pruned_bucket: int | None = None

    def spark_schema(self) -> StructType:
        if self._include_internal:
            return _physical_schema(self._manifest())
        return self._logical

    def __getstate__(self):
        """Executors only run ``read(partition)`` — ship the Arrow schema
        and key list, NOT the manifest (O(files) JSON that would ride
        along with every task at 100 TB). Planning calls (pushFilters /
        partitions) that land on a fresh worker lazily reload the pinned
        manifest version via ``_manifest()``."""
        state = dict(self.__dict__)
        state.pop("_man", None)
        return state

    def _manifest(self) -> dict:
        man = getattr(self, "_man", None)
        if man is None:
            man = _load_manifest(self._path, self._pinned_version)
            self._man = man
        return man

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Bucket pruning on bucket-column equality.  All filters are
        returned as unhandled (Spark re-applies them — pruning is partial
        filtering, never row-exact), but an ``EqualTo`` on the single
        bucket column narrows ``partitions()`` to one bucket."""
        bucket_cols = list(self._manifest()["bucket_cols"])
        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(bucket_cols) == 1
                and len(f.attribute) == 1
                and f.attribute[0] == bucket_cols[0]
            ):
                try:
                    tname = self._logical[bucket_cols[0]].dataType.typeName()
                    self._pruned_bucket = bucket_of(
                        [(f.value, tname)], int(self._manifest()["num_buckets"])
                    )
                except NotImplementedError:
                    pass
            remaining.append(f)
        return remaining

    def partitions(self) -> list[LakePartition]:
        man = self._manifest()
        out = []
        for bid, entries in man["buckets"].items():
            if self._pruned_bucket is not None and int(bid) != self._pruned_bucket:
                continue
            if not entries:
                continue
            has_delta = any(e.get("kind", "base") == "delta" for e in entries)
            if has_delta:
                # the bucket reduces as one unit (keys never cross buckets)
                out.append(
                    LakePartition(_file_plan(man, entries), True)
                )
            else:
                # pure-base bucket: already merged — file-level parallelism
                out.extend(
                    LakePartition(_file_plan(man, [e]), False)
                    for e in entries
                )
        return out


# ---------------------------------------------------------------------------
# Streaming CDC reader: spark.readStream.format("synlake_cdc")
# ---------------------------------------------------------------------------


class LakeCdcStreamReader(_LakeReaderBase, DataSourceStreamReader):
    """Tails the table's merge-on-read changelog.  Offset = table
    version; batch (start, end] = exactly the delta files those commits
    appended (Iceberg incremental-scan semantics) — cost is O(changed
    data) regardless of table size.  Rows carry ``_seq``/``_deleted`` so
    the batch IS a change-event batch a downstream LWW consumer (e.g.
    ``LakeTable.merge``) applies directly.

    Retention contract (same as ``LakeTable.changes`` and the
    incremental views): the stream's lag window is bounded by the
    source's ``vacuum`` retention — planning needs the manifest at the
    checkpointed offset and the delta files of every un-consumed
    version, and vacuum reclaims both past ``retain_versions``. A
    consumer that falls further behind than the source retains fails
    with an explicit expiry error (below) and must re-sync from a
    snapshot; size ``vacuum(retain_versions=...)`` / the driver's
    ``vacuum_opts`` to cover the slowest consumer's lag (Iceberg
    expire-snapshots vs incremental-consumer semantics)."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("synlake_cdc requires .option('path', <table dir>)")
        self._start = int(options.get("startingversion", options.get("startingVersion", 0)))
        # backpressure: cap how many table versions one micro-batch may
        # span (Delta's maxFilesPerTrigger analog) — a stream started on a
        # long-lived table catches up in bounded batches instead of one
        # giant first batch that overwhelms the sink
        mvpt = options.get("maxversionspertrigger", options.get("maxVersionsPerTrigger"))
        self._max_versions = int(mvpt) if mvpt is not None else None
        man = _load_manifest(self._path)
        physical = _physical_schema(man)
        super().__init__(
            _arrow_schema_of(physical), list(man["key_cols"]), drop_internal=False
        )
        self._physical = physical

    def spark_schema(self) -> StructType:
        return self._physical

    def initialOffset(self) -> dict:  # noqa: N802
        return {"version": self._start}

    _cursor: int | None = None  # highest version this reader has planned

    def latestOffset(self) -> dict:  # noqa: N802
        cur = _current_version(self._path)
        if self._max_versions is not None:
            base = self._cursor if self._cursor is not None else self._start
            # advance at most max_versions past the last planned end, and
            # NEVER regress (a restarted reader learns the true position
            # from the first partitions() call, recorded below)
            cur = max(min(cur, base + self._max_versions), base)
        self._cursor = cur
        return {"version": cur}

    def partitions(self, start: dict, end: dict) -> list[LakePartition]:  # noqa: N802
        lo, hi = int(start["version"]), int(end["version"])
        self._cursor = max(self._cursor or 0, hi)
        try:
            prev = _load_manifest(self._path, lo)
        except FileNotFoundError as e:
            raise ValueError(
                f"stream offset {lo} has been expired by vacuum (manifest "
                "gone) — the consumer fell behind the source's retention "
                "window; re-sync from a snapshot and restart with a fresh "
                "checkpoint (raise the source's vacuum retain_versions to "
                "cover consumer lag)"
            ) from e
        by_bucket: dict[int, list[tuple[dict, dict]]] = {}

        def paths(man: dict) -> set[str]:
            return {e["path"] for lst in man["buckets"].values() for e in lst}

        seen = paths(prev)
        for v in range(lo + 1, hi + 1):
            cur = _load_manifest(self._path, v)
            kind = cur.get("commit_kind")
            if kind == "compact":
                # state-preserving rewrite (same contract as
                # LakeTable.changes): the deltas it folded were already
                # collected from the merge versions that appended them,
                # and those delta FILES stay on disk UNTIL VACUUM — the
                # reads planned above stay valid only while the consumer
                # stays inside the source's vacuum retention window (the
                # class-docstring lag contract); just rebase the path
                # baseline here. Without this skip a source ingesting
                # under ReplayDriver(compact_every=K) would kill the
                # stream every K batches.
                seen = paths(cur)
                continue
            if kind == "rollback":
                # state-CHANGING with no per-row record: undoing a merge
                # REMOVES files, which this walk would read as "nothing
                # added" — a silently empty micro-batch for a version
                # that reverted rows, diverging every downstream replica.
                raise ValueError(
                    f"table version {v} is a rollback — it reverts rows "
                    "without a per-row change record; re-sync the consumer "
                    "from a snapshot and restart the stream with "
                    f"startingVersion={v}"
                )
            for bid, lst in cur["buckets"].items():
                for e in lst:
                    if e["path"] in seen:
                        continue
                    if e.get("kind", "base") != "delta":
                        raise ValueError(
                            f"table version {v} rewrote base files "
                            "(copy-on-write merge, rebucket, or an unstamped "
                            "legacy compaction) — no per-row change record "
                            "exists for the stream to tail; start the stream "
                            "past it or keep the table in 'mor' mode"
                        )
                    by_bucket.setdefault(int(bid), []).append((e, cur))
            seen = paths(cur)
        out = []
        for _bid, pairs in sorted(by_bucket.items()):
            files = []
            for e, man in pairs:
                files.extend(_file_plan(man, [e]))
            # reduce within the batch: multiple versions of a key across
            # the window collapse to the winner (LWW), tombstones kept
            out.append(LakePartition(files, True))
        if not out:
            # zero-progress batch: one empty partition keeps Spark's
            # micro-batch planner happy without reading anything
            out.append(LakePartition([], False))
        return out

    def commit(self, end: dict) -> None:  # noqa: N802
        pass  # offsets live in Spark's checkpoint offset log


# ---------------------------------------------------------------------------
# DataSource registrations
# ---------------------------------------------------------------------------


class LakeDataSource(DataSource):
    """Batch: ``spark.read.format("synlake").option("path", p).load()``.
    Options: ``path`` (required), ``version`` (time travel),
    ``include_internal`` ('true' exposes ``_seq``/``_deleted``)."""

    def __init__(self, options: dict):
        super().__init__(options)
        self._reader = LakeBatchReader(options)

    @classmethod
    def name(cls) -> str:
        return "synlake"

    def schema(self) -> StructType:
        return self._reader.spark_schema()

    def reader(self, schema: StructType) -> DataSourceReader:
        return self._reader


class LakeCdcDataSource(DataSource):
    """Streaming: ``spark.readStream.format("synlake_cdc").option("path",
    p).load()``.  Options: ``path`` (required), ``startingVersion``
    (default 0 = replay the full changelog)."""

    def __init__(self, options: dict):
        super().__init__(options)
        self._options = options

    @classmethod
    def name(cls) -> str:
        return "synlake_cdc"

    def schema(self) -> StructType:
        return LakeCdcStreamReader(self._options).spark_schema()

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:  # noqa: N802
        return LakeCdcStreamReader(self._options)


def register(spark) -> None:
    """Register both formats on the session (idempotent).  Also enables
    Python-data-source filter pushdown — a reader that implements
    ``pushFilters`` REFUSES to initialize while the conf is false, and
    sessions built outside ``session.get_spark`` (e.g. a host harness)
    won't have set it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeDataSource)
    spark.dataSource.register(LakeCdcDataSource)
