"""Cross-table transaction log: one arbiter record per multi-table commit.

The engine's multi-table writers (the streaming dedup path commits an
LSH-index table and a corpus table per micro-batch; a replication chain
commits several followers) are crash-SAFE by commit ordering — every
interleaving reconverges on redelivery — but a reader loading the two
tables independently can still OBSERVE the intermediate state (index
committed, docs not yet). This module makes that window invisible to
readers that want a consistent multi-table snapshot, without giving up
the per-table commit protocol:

- after ALL component commits of a logical transaction land, the writer
  records ``{table path → table version}`` in ONE atomically-created
  record (same create-no-overwrite CAS as the manifest protocol,
  ``lake/fs.py write_text_if_absent``);
- readers resolve the LATEST record and load each table pinned at its
  recorded version (manifest time travel) — they see either all of a
  transaction or none of it, by construction.

This is the Iceberg-REST / Nessie multi-table-commit shape reduced to
its core: the catalog row is a JSON file, the CAS is the atomic create.
Each record is O(#tables) bytes and one driver-side write per
transaction — nothing on the row path.

Consumer-lag contract: pinned loads are time travel, so each table's
``vacuum`` retention must cover the lag between its newest version and
the newest txn record referencing it (the same rule every changelog
consumer here follows). The writer updates the record every
transaction, so the lag is normally zero-to-one commit.
"""

from __future__ import annotations

import json
import os
from typing import Any

from synapse_etl_jobs_spark.lake.fs import filesystem_for


class TxnLog:
    """A directory of monotonically numbered transaction records.

    Concurrency: ``commit`` loops on the create-no-overwrite CAS, so
    multiple writers appending transactions interleave without loss
    (records are facts about already-committed table versions — order
    between independent writers is arbitrary and harmless). ``CURRENT``
    is a hint; readers probe forward like the manifest protocol.
    """

    def __init__(self, path: str, spark=None, *, retain_records: int = 100):
        self.path = path
        self.fs = filesystem_for(path, spark)
        self.retain_records = max(int(retain_records), 1)

    # ------------------------------------------------------------ internals

    def _rec_path(self, txn_id: int) -> str:
        return os.path.join(self.path, f"t{txn_id:012d}.json")

    def _resolve_current(self) -> int | None:
        cur_path = os.path.join(self.path, "CURRENT")
        txn_id = None
        if self.fs.exists(cur_path):
            txn_id = int(self.fs.read_text(cur_path).strip())
        if txn_id is not None and not self.fs.exists(self._rec_path(txn_id)):
            # pathological: CURRENT fell below the retention floor (a
            # writer crashed before every pointer swap for > retain
            # commits). Recover from the directory — without this,
            # commit() would REUSE an expired id below the floor and
            # break id monotonicity.
            ids = [
                int(os.path.basename(p)[1:-5])
                for p, _sz in self.fs.list_files(self.path, ".json")
                if os.path.basename(p).startswith("t")
            ]
            txn_id = max(ids) if ids else None
        probe = 0 if txn_id is None else txn_id + 1
        # probe forward: a writer crash between record create and the
        # pointer swap leaves a committed record the hint misses
        while self.fs.exists(self._rec_path(probe)):
            txn_id = probe
            probe += 1
        return txn_id

    # ------------------------------------------------------------- writing

    def commit(
        self, tables: "dict[str, int]", meta: "dict[str, Any] | None" = None
    ) -> int:
        """Append one transaction record mapping each table PATH to the
        VERSION at which this transaction's state is visible. Call only
        after every component commit landed. Returns the txn id."""
        if not tables:
            raise ValueError("a transaction must name at least one table")
        self.fs.mkdirs(self.path, exist_ok=True)
        body = {"tables": {str(p): int(v) for p, v in tables.items()},
                "meta": dict(meta or {})}
        while True:
            cur = self._resolve_current()
            txn_id = 0 if cur is None else cur + 1
            rec = dict(body, txn_id=txn_id)
            if self.fs.write_text_if_absent(
                self._rec_path(txn_id), json.dumps(rec, sort_keys=True)
            ):
                break
            # another writer took this id: re-probe and try the next
        self.fs.write_text_atomic(
            os.path.join(self.path, "CURRENT"), str(txn_id)
        )
        # bounded log: reclaim records older than the retention window
        # (readers use only the latest; history is observability)
        victim = txn_id - self.retain_records
        while victim >= 0 and self.fs.exists(self._rec_path(victim)):
            self.fs.delete(self._rec_path(victim))
            victim -= 1
        return txn_id

    # ------------------------------------------------------------- reading

    def latest(self) -> "dict[str, Any] | None":
        """The newest committed record (``{"txn_id", "tables", "meta"}``)
        or None if no transaction has ever committed."""
        for _ in range(4):
            cur = self._resolve_current()
            if cur is None:
                return None
            try:
                return json.loads(self.fs.read_text(self._rec_path(cur)))
            except (FileNotFoundError, OSError):
                # a concurrent commit's retention sweep reclaimed the
                # record between resolve and read — newer records exist
                # by construction; re-resolve and read the newer one
                continue
        raise RuntimeError(
            "txn log churned through its whole retention window during a "
            "single read — raise retain_records for this writer rate"
        )

    def load_tables(self, spark) -> "dict[str, Any]":
        """Load every table of the latest transaction PINNED at its
        recorded version — a consistent cross-table snapshot (all of the
        transaction or, before the first record, an empty dict)."""
        from synapse_etl_jobs_spark.lake.table import LakeTable

        rec = self.latest()
        if rec is None:
            return {}
        return {
            p: LakeTable.load(spark, p, version=v)
            for p, v in rec["tables"].items()
        }
