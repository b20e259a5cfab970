"""Per-batch probe cost vs corpus size: the index-digest win, isolated.

The streaming dedup probe at threshold 1.0 has two verification modes,
selected by whether the index table stores shingle digests
(``create_dedup_tables(store_digests=...)``):

- **off**: candidate text is re-read from the corpus table every
  micro-batch (a full-table LWW read → O(corpus) per batch);
- **on**: verification runs ``max_by(_dg, _batch)`` off the pruned
  index rows — O(batch + probed index rows), no corpus-size term.

This harness ingests a corpus of C documents, then measures the wall
of ingesting ONE fixed-size batch (B docs, half exact duplicates of
corpus docs, half fresh) at each mode. Sweeping C with B fixed shows
the off-mode wall growing with C while the on-mode wall stays flat —
the property that matters at a 100 TB corpus.

Each (C, mode) cell runs in a FRESH subprocess (own JVM) so JVM heap
history can't leak across cells. Usage:

    python tools/bench_dedup_corpus_scaling.py [batch_docs] [corpus_sizes...]

Defaults: batch 500; corpus sizes 5000 25000 50000. Docs are synthetic
(deterministic token text, unique per id) — no external data.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from synapse_etl_jobs_spark.session import get_spark
from synapse_etl_jobs_spark.streaming.dedup_stream import (
    create_dedup_tables, dedup_stream_into_table,
)

corpus_n, batch_n, store_digests = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3] == "on"
spark = get_spark(app_name="dedup-scale", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

def synth_docs(start, n):
    # ~40 deterministic pseudo-words per doc, unique per id
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.concat(F.lit("w"), F.pmod(
                F.xxhash64(F.col("id"), i), F.lit(99991)).cast("string")),
        )).alias("text"),
    )

root = tempfile.mkdtemp()
schema = synth_docs(0, 1).schema
docs, index = create_dedup_tables(
    spark, root + "/docs", root + "/ix", schema,
    id_col="doc_id", num_buckets=8, store_digests=store_digests,
)
src = root + "/src"
import glob as _glob, os as _os
_os.makedirs(src, exist_ok=True)

def stage(df, tag):
    # FileStreamSource lists FILES under the source root (it does not
    # recurse into write.parquet output dirs) — write aside, move in
    d = root + "/stage_" + tag
    df.write.parquet(d)
    for i, f in enumerate(sorted(_glob.glob(d + "/part-*.parquet"))):
        _os.rename(f, src + "/" + tag + "_" + str(i) + ".parquet")

stage(synth_docs(0, corpus_n).repartition(8), "seed")
# batch: half exact copies of corpus docs (new ids), half fresh
dups = synth_docs(0, batch_n // 2).withColumn(
    "doc_id", F.col("doc_id") + 1_000_000_000)
fresh = synth_docs(2_000_000_000, batch_n - batch_n // 2)

def run():
    stream = spark.readStream.schema(schema).parquet(src)
    dedup_stream_into_table(
        docs, index, stream, root + "/ckpt",
        id_col="doc_id", text_col="text",
        collapse_exact=True, max_bucket_size=64,
    )
run()  # batch 0: the corpus
base_rows = docs.read().count()
assert base_rows == corpus_n, (base_rows, corpus_n)

stage(dups.unionByName(fresh).repartition(4), "probe")
t0 = time.monotonic()
run()  # batch 1: the measured fixed-size probe batch
probe_wall = time.monotonic() - t0
final_rows = docs.read().count()
# every dup dropped, every fresh doc kept — both modes must agree
assert final_rows == corpus_n + (batch_n - batch_n // 2), (final_rows,)
shutil.rmtree(root, ignore_errors=True)
print(json.dumps(dict(corpus=corpus_n, batch=batch_n,
                      store_digests=store_digests,
                      probe_batch_wall_sec=round(probe_wall, 2))))
"""


def cell(corpus: int, batch: int, mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=HERE),
         str(corpus), str(batch), mode],
        capture_output=True, text=True, timeout=2400,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed ({corpus}, {mode}):\n{out.stderr[-2000:]}")


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sizes = [int(a) for a in sys.argv[2:]] or [5_000, 25_000, 50_000]
    rows = []
    for c in sizes:
        # interleave modes within each size so host drift hits both
        for mode in ("off", "on"):
            r = cell(c, batch, mode)
            rows.append(r)
            print(json.dumps(r), flush=True)
    print(json.dumps({"cells": rows}))


if __name__ == "__main__":
    main()
