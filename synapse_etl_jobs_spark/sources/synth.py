"""Deterministic distributed change-event synthesizer.

Generates the CDC input stream of the north rule — insert/update/delete
events over a source-code table keyed by ``(repo, path, commit)`` — as a
pure function of ``spark.range(n)``: every column is a JVM-side expression
of the row id and the seed, so generation is embarrassingly parallel (no
shuffle, no driver data, no Python) and bit-identical across runs and
cluster sizes. At 10^10 events this synthesizes at scan speed.

Shape mirrors FIXTURES.md §2 / the reference's change-event envelope
(src/scripts/glue_jobs/node_snapshots.py:43-48):
``op, seq, ts, source_partition, offset, payload(repo, path, commit,
lang, content)``.

Skew: key ids follow a power law (u^skew_exp), and the key→repo map sends
the hottest key range to repo 0 — so one repo owns a large share of events
(the salted-dedup test/bench case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_LANG = [
    ("py", "python"), ("java", "java"), ("rs", "rust"), ("go", "go"),
    ("js", "javascript"), ("ts", "typescript"), ("c", "c"), ("cpp", "cpp"),
    ("rb", "ruby"), ("md", None),
]

_WORDS = (
    "spark merge table scan filter join window stream batch commit schema "
    "bucket shuffle salt event replay upsert delete insert update lineage "
    "checkpoint manifest parquet arrow pandas vector column row partition"
).split()


def synth_change_events(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_keys: int | None = None,
    n_repos: int = 100,
    skew_exp: float = 3.0,
    delete_pct: int = 5,
    dup_every: int | None = 17,
    n_shards: int = 8,
    base_ts_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """Return the event DataFrame. ``seq`` is the global event sequence
    (= row id); ``dup_every`` re-emits every k-th event verbatim (exact
    duplicates — the at-least-once delivery case)."""
    n_keys = n_keys or max(n_events // 4, 1)

    def h(*cols):
        return F.xxhash64(*cols, F.lit(seed))

    base = spark.range(n_events).withColumnRenamed("id", "seq")
    u = (F.pmod(h(F.col("seq")), F.lit(1_000_003)) / 1_000_003.0)
    key_id = F.least(
        F.floor(F.lit(n_keys) * F.pow(u, F.lit(skew_exp))).cast("long"),
        F.lit(n_keys - 1),
    )

    df = base.withColumn("key_id", key_id)
    repo_id = F.floor(F.col("key_id") * n_repos / n_keys).cast("long")
    ext_idx = F.pmod(h(F.col("key_id"), F.lit(1)), F.lit(len(_EXT_LANG))).cast("int")
    exts = F.array(*[F.lit(e) for e, _ in _EXT_LANG])
    langs = F.array(*[F.lit(l) for _, l in _EXT_LANG])

    opsel = F.pmod(h(F.col("seq"), F.lit(2)), F.lit(100))
    # content: 10-60 words drawn deterministically from the token table,
    # varying with seq so UPDATEs actually change the row
    n_words = (F.pmod(h(F.col("key_id"), F.col("seq"), F.lit(3)), F.lit(51)) + 10).cast("int")
    words = F.array(*[F.lit(w) for w in _WORDS])
    content = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                words,
                (F.pmod(F.xxhash64(i, F.col("key_id"), F.col("seq"), F.lit(seed)),
                        F.lit(len(_WORDS))) + 1).cast("int"),
            ),
        ),
    )

    events = df.select(
        F.when(opsel < delete_pct, F.lit("DELETE"))
        .when(opsel < 40, F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
        .alias("op"),
        F.col("seq"),
        (F.lit(base_ts_ms) + F.col("seq") * 1000).alias("ts_ms"),
        F.pmod(h(F.col("seq"), F.lit(4)), F.lit(n_shards)).cast("int").alias("source_partition"),
        F.col("seq").alias("offset"),
        F.struct(
            F.concat(F.lit("org"), (repo_id % 10).cast("string"),
                     F.lit("/repo"), repo_id.cast("string")).alias("repo"),
            F.concat(
                F.lit("src/m"), F.pmod(F.col("key_id"), F.lit(97)).cast("string"),
                F.lit("/f"), F.col("key_id").cast("string"),
                F.lit("."), F.element_at(exts, ext_idx + 1),
            ).alias("path"),
            F.substring(F.sha2(F.concat(F.lit("c"), F.col("key_id").cast("string"),
                                        F.lit(str(seed))), 256), 1, 40).alias("commit"),
            F.element_at(langs, ext_idx + 1).alias("lang"),
            content.alias("content"),
        ).alias("payload"),
    )

    if dup_every:
        dups = events.filter(F.pmod(F.col("seq"), F.lit(dup_every)) == 0)
        events = events.unionByName(dups)
    return events


def flatten_events(events: DataFrame) -> DataFrame:
    """Envelope → flat update rows for ``LakeTable.merge`` (one select)."""
    return events.select(
        "op", "seq", "ts_ms", "source_partition", "offset",
        "payload.repo", "payload.path", "payload.commit",
        "payload.lang", "payload.content",
    )
