"""Driver contract for the spark-graft builder (PySpark target).

Every implemented operator from SURVEY.md §2 (plus the training-data
operator set) is exposed as a ``queries()`` entry; each oracle in
``oracle_sql()`` is the equivalent ANSI SQL for DuckDB over the same
parquet tables. Non-SQL-expressible ops (MinHash-LSH, SimHash,
fingerprints, LSH-ANN) are exposed without oracles → rows-only checks.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable


def _tmpdir(prefix: str) -> str:
    """Temp dir for query-local tables/sinks, removed at interpreter
    exit. Cleanup can't happen inside the query callable: the returned
    DataFrame is lazy, so the files must outlive the call — but repeated
    gate/bench runs must not accumulate table copies in /tmp either.
    """
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# CDC core (SURVEY.md §2.3-2.4, north rule): events table as a change stream
# keyed by user_id: op = DELETE on 'error' events, else upsert; seq = event_id
# ---------------------------------------------------------------------------

def _cdc_events(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPSERT"))
        .alias("op"),
        F.col("event_id").alias("seq"),
        F.col("user_id"),
        F.col("event_type"),
        F.round(F.col("value"), 2).alias("value"),
    )


_CDC_ORACLE = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
         event_id AS seq, user_id, event_type, round(value, 2) AS value
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM ev
)
SELECT user_id, event_type, value, seq
FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""


def q_cdc_final_state(spark, sf_dir) -> DataFrame:
    """LWW dedup + delete filtering — the CDC reduction (A2/J2 semantics)
    computed via the engine's max_by dedup operator."""
    from synapse_etl_jobs_spark.operators.dedup import dedup_lww

    ev = _cdc_events(spark, sf_dir)
    latest = dedup_lww(ev, ["user_id"], "seq")
    return latest.filter(F.col("op") != "DELETE").select(
        "user_id", "event_type", "value", "seq"
    )


def q_cdc_final_state_salted(spark, sf_dir) -> DataFrame:
    """Same reduction through the salted two-phase dedup (skew path)."""
    from synapse_etl_jobs_spark.operators.dedup import dedup_lww_salted

    ev = _cdc_events(spark, sf_dir)
    latest = dedup_lww_salted(ev, ["user_id"], "seq", salt_buckets=8)
    return latest.filter(F.col("op") != "DELETE").select(
        "user_id", "event_type", "value", "seq"
    )


def q_cdc_lake_merge(spark, sf_dir) -> DataFrame:
    """The FULL engine path: replay the change stream in 3 batches through
    LakeTable.merge (bucketed copy-on-write upserts, tombstones, markers)
    and read back the final state. Oracle = the same window reduction."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_entry_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=8)
    # num_batches sizes windows from the seq span inside the driver (one
    # column-pruned min/max agg) — no driver-side count() scan here
    ReplayDriver(table, num_batches=3).replay(ev)
    # _seq is the stored event id — exposed for the oracle comparison
    return table.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "value", F.col("_seq").alias("seq")
    )


def q_lake_point_lookup(spark, sf_dir) -> DataFrame:
    """Bloom-indexed point lookup: replay the change stream into a
    merge-on-read table with per-file key blooms (point_index_bits),
    then ``lookup_keys`` three users — bucket pruning and bloom file
    skipping happen driver-side before one key-filtered scan
    (lake/bloom.py). Oracle = the LWW final state filtered to the same
    keys."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lookup_entry_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8,
        write_mode="mor", point_index_bits=4096,
    )
    for b in range(3):
        table.merge(ev.filter(F.col("seq") % 3 == b), batch_id=b)
    return table.lookup_keys([(1,), (2,), (3,)])


def q_stream_interval_join(spark, sf_dir) -> DataFrame:
    """Interval join, batch-parity form (streaming/joins.py): purchases
    attributed to the view events they followed within 30 minutes, per
    user. The SAME definition on two streams plans a watermarked
    StreamingSymmetricHashJoin with bounded state (pytest-pinned in
    tests/test_stream_join.py); on batch frames it is an equi-key hash
    join with the interval as a post-join filter — never a cartesian."""
    from synapse_etl_jobs_spark.streaming import interval_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    return interval_join(
        views, buys, ["user_id"], lower="0 seconds", upper="30 minutes",
    ).select(
        "user_id",
        F.col("l_event_id").alias("view_event"),
        F.col("r_event_id").alias("buy_event"),
        F.unix_millis(F.col("l_ts").cast("timestamp")).alias("view_ms"),
        F.unix_millis(F.col("r_ts").cast("timestamp")).alias("buy_ms"),
    )


def q_incremental_agg_view(spark, sf_dir) -> DataFrame:
    """Incremental materialized-view maintenance: replay the change
    stream into a merge-on-read source table in two batches; a grouped
    aggregate view (count + exact integer sum per event_type) is built
    after batch 1 and ADVANCED — not recomputed — after batch 2 by
    diffing only the affected buckets' pre/post contributions
    (lake/incremental.py). Batches split by seq parity: LWW merges are
    order-insensitive, so the maintained view must equal a from-scratch
    aggregation of the final state (the oracle)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import IncrementalAggView, LakeTable

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("ivm_entry_")
    source = LakeTable.create(
        spark, path + "/src", schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    source.merge(ev.filter(F.col("seq") % 2 == 0), batch_id=0)
    view = IncrementalAggView.create(
        spark, path + "/view", source, ["event_type"],
        {"value_cents": "CAST(round(value * 100) AS BIGINT)"},
    )
    source.merge(ev.filter(F.col("seq") % 2 == 1), batch_id=1)
    view.advance()
    return view.read()


# ---------------------------------------------------------------------------
# Reference relational operators (SURVEY.md §2.2, §2.5, §2.6)
# ---------------------------------------------------------------------------

def q_apply_mapping(spark, sf_dir) -> DataFrame:
    """P1 projection: flatten/rename/cast incl. the dual timestamp→
    (ms bigint, partition date) mapping; F1/F2 JSON extraction."""
    from synapse_etl_jobs_spark.functions.scalars import ms_to_partition_date
    from synapse_etl_jobs_spark.operators.mapping import apply_mapping

    ev = _t(spark, sf_dir, "events")
    mapped = apply_mapping(
        ev,
        [
            ("event_id", "bigint", "id", "bigint"),
            ("ts", "timestamp", "ts_ms", "bigint"),
            ("user_id", "bigint", "user_id", "bigint"),
            ("props", "string", "props", "string"),
        ],
    )
    return mapped.select(
        "id",
        "ts_ms",
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        ms_to_partition_date("ts_ms").alias("record_date"),
    )


def q_filter_rlike(spark, sf_dir) -> DataFrame:
    """P3 regex row filter + P4 predicate."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").rlike("^(click|view)$") & (F.col("value") > 100)
    ).select("event_id", "event_type", F.round("value", 2).alias("value"))


def q_union_conformed(spark, sf_dir) -> DataFrame:
    """J1: two conformed streams unioned by name, then aggregated."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("total"),
        F.lit("high").alias("band"),
    )
    lo = o.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("total"),
        F.lit("low").alias("band"),
    )
    return (
        hi.unionByName(lo)
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.round(F.sum("total"), 2).alias("revenue"))
    )


def q_explode_tokens(spark, sf_dir) -> DataFrame:
    """N1 explode over the engine tokenizer."""
    from synapse_etl_jobs_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(tokens("text")).alias("token"))


def q_first_token(spark, sf_dir) -> DataFrame:
    """N3 null-safe first element."""
    from synapse_etl_jobs_spark.functions.scalars import first_element
    from synapse_etl_jobs_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", first_element(tokens("text")).alias("first_token"))


def q_change_type_derivation(spark, sf_dir) -> DataFrame:
    """P8: op-type derivation from timestamp delta (>1s after the user's
    first event ⇒ UPDATE), aggregated by derived type."""
    from synapse_etl_jobs_spark.functions.scalars import change_type_from_timestamps

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    withdelta = ev.select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("changed_ms"),
        F.min(F.unix_millis(F.col("ts").cast("timestamp"))).over(w).alias("created_ms"),
    )
    return (
        withdelta.select(
            change_type_from_timestamps("created_ms", "changed_ms").alias("change_type")
        )
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
    )


def q_syn_id_parse(spark, sf_dir) -> DataFrame:
    """F3: syn-id normalization round-trip."""
    from synapse_etl_jobs_spark.functions.scalars import syn_id_string_to_int

    o = _t(spark, sf_dir, "orders")
    synth = o.select(
        "o_orderkey",
        F.concat(F.lit("syn"), F.col("o_orderkey").cast("string"), F.lit(".1")).alias("syn_str"),
    )
    return synth.select(
        "o_orderkey", "syn_str", syn_id_string_to_int("syn_str").alias("parsed")
    )


def q_partition_dates(spark, sf_dir) -> DataFrame:
    """F4 + F12: ms→partition date and zero-padded year/month/day."""
    from synapse_etl_jobs_spark.functions.scalars import (
        ms_to_partition_date, year_month_day,
    )

    ev = _t(spark, sf_dir, "events")
    y, m, d = year_month_day(F.col("ts"))
    return (
        ev.select(
            ms_to_partition_date(F.unix_millis(F.col("ts").cast("timestamp"))).alias("record_date"), y, m, d
        )
        .groupBy("record_date", "year", "month", "day")
        .agg(F.count("*").alias("n"))
    )


def q_instance_strip(spark, sf_dir) -> DataFrame:
    """F5: zero-pad then strip (reference instance normalization)."""
    from synapse_etl_jobs_spark.functions.scalars import remove_padded_leading_zeros

    c = _t(spark, sf_dir, "customer")
    padded = c.select(
        "c_custkey", F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("instance")
    )
    return padded.select(
        "c_custkey", "instance", remove_padded_leading_zeros("instance").alias("stripped")
    )


def q_access_normalize(spark, sf_dir) -> DataFrame:
    """F7/F10 via the Arrow-batched pandas UDFs: URL → normalized method
    signature + entity id, over synthesized request URLs."""
    from synapse_etl_jobs_spark.functions.access_record import (
        entity_id_udf, normalized_method_signature_udf,
    )

    o = _t(spark, sf_dir, "orders")
    urls = o.select(
        "o_orderkey",
        F.when(
            F.pmod("o_orderkey", F.lit(3)) == 0,
            F.concat(F.lit("repo/entity/syn"), F.col("o_orderkey").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("/repo/v1/entity/syn"),
                F.col("o_orderkey").cast("string"),
                F.lit("/wiki/"),
                F.col("o_custkey").cast("string"),
            )
        )
        .alias("request_url"),
    )
    return urls.select(
        "o_orderkey",
        normalized_method_signature_udf("request_url").alias("signature"),
        entity_id_udf("request_url").alias("entity_id"),
    )


def q_asof_join(spark, sf_dir) -> DataFrame:
    """As-of join (backward, exact-time inclusive): every event picks up
    the latest prior profile sample of its user — the union-and-window
    single-shuffle plan, no inequality join. Oracle: DuckDB's native
    ASOF JOIN."""
    from synapse_etl_jobs_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.select(
        "event_id", "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    right = (
        ev.filter(F.pmod("event_id", F.lit(20)) == 0)
        .select(
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("uts"),
            F.round("value", 2).alias("uval"),
        )
        .groupBy("user_id", "uts").agg(F.max("uval").alias("uval"))
    )
    return asof_join(
        left, right, on=["user_id"], left_ts="ts_ms", right_ts="uts"
    ).select("event_id", "user_id", "ts_ms", "uts_r", "uval_r")


def q_range_join(spark, sf_dir) -> DataFrame:
    """Range join via interval binning (equi-join on the bin + exact
    bounds filter — no inequality join, no cartesian): events bucketed
    into nation-derived value bands."""
    from synapse_etl_jobs_spark.operators.joins import range_join

    ev = _t(spark, sf_dir, "events")
    n = _t(spark, sf_dir, "nation")
    pts = ev.select("event_id", F.round("value", 2).alias("value"))
    bands = n.select(
        "n_nationkey", "n_name",
        (F.col("n_nationkey") * 40.0).alias("lo"),
        (F.col("n_nationkey") * 40.0 + 39.99).alias("hi"),
    )
    return range_join(
        pts, bands, point_col="value", lower_col="lo", upper_col="hi",
        bin_width=40.0,
    ).select("event_id", "value", "n_nationkey", "n_name")


# ---------------------------------------------------------------------------
# Analytical breadth (joins/aggregations the engine's users run on the lake)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_customers(spark, sf_dir) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


def q_broadcast_dim_join(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


# ---------------------------------------------------------------------------
# Training-data operators (dedup / text / similarity / multimodal)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir) -> DataFrame:
    from synapse_etl_jobs_spark.operators.dedup_text import dedup_exact

    d = _t(spark, sf_dir, "documents")
    return dedup_exact(d).select("doc_id", "lang", "n_chars")


def q_text_quality(spark, sf_dir) -> DataFrame:
    from synapse_etl_jobs_spark.operators.text import quality_features

    d = _t(spark, sf_dir, "documents")
    return quality_features(d).select(
        "doc_id", "n_char", "n_tokens", "mean_token_len",
        "punct_ratio", "digit_ratio", "stopword_ratio",
    )


def q_lang_id(spark, sf_dir) -> DataFrame:
    from synapse_etl_jobs_spark.operators.text import detect_language

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", detect_language("text").alias("lang_pred"))


def q_token_counts(spark, sf_dir) -> DataFrame:
    from synapse_etl_jobs_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


def q_repetition_features(spark, sf_dir) -> DataFrame:
    """Repetition metrics (duplicate-line/token fractions, top-token
    fraction) — the Gopher-family quality signals, row-local native
    expressions."""
    from synapse_etl_jobs_spark.operators.text import repetition_features

    d = _t(spark, sf_dir, "documents")
    return repetition_features(d).select(
        "doc_id", "dup_line_frac", "dup_token_frac", "top_token_frac"
    )


def q_gopher_rules(spark, sf_dir) -> DataFrame:
    """Gopher-style quality gate: per-rule verdicts fused into one
    select tree; keep + first-failed-rule reason per doc."""
    from synapse_etl_jobs_spark.operators.text import gopher_rules

    d = _t(spark, sf_dir, "documents")
    return gopher_rules(d).select(
        "doc_id", "n_tokens", "dup_line_frac", "top_token_frac",
        "keep", "drop_reason",
    )


def q_chunk_documents(spark, sf_dir) -> DataFrame:
    """Fixed-size overlapping character chunking (context-window prep):
    200-char chunks, 50 overlap — native sequence+posexplode, exactly
    mirrored in SQL."""
    from synapse_etl_jobs_spark.operators.text import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_chars=200, overlap=50).select(
        "doc_id", "chunk_idx", "chunk_start", "chunk_text"
    )


def q_decontaminate(spark, sf_dir) -> DataFrame:
    """Train/test decontamination: flag documents sharing an 8-token
    n-gram with a benchmark subset (every 50th doc plays the eval set).
    Broadcast-able distinct-gram-hash semi-join — no corpus shuffle, no
    all-pairs. Portable md5-derived gram hash so DuckDB mirrors it."""
    from synapse_etl_jobs_spark.operators.text import decontaminate, md5_hash48

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(
        train, bench, n=8, gram_hash=md5_hash48
    ).select("doc_id", "n_grams", "n_matched", "contaminated")


def q_document_frequency(spark, sf_dir) -> DataFrame:
    """Corpus vocabulary with doc frequency + smoothed IDF. Map-side
    partial aggregates off the exploded terms; N joins in as a broadcast
    single-row aggregate — no collect, no global window."""
    from synapse_etl_jobs_spark.operators.text import document_frequency

    d = _t(spark, sf_dir, "documents")
    return document_frequency(d).select("term", "doc_freq", "idf")


def q_tf_idf_topk(spark, sf_dir) -> DataFrame:
    """Top-5 TF-IDF keywords per document: fact (doc-term tf) × dim
    (vocab idf) join, then a per-document top-k window (millions of
    independent keys — full parallelism). Rank orders by the 6-dp
    rounded score so boundaries cannot drift between engines."""
    from synapse_etl_jobs_spark.operators.text import tf_idf_topk

    d = _t(spark, sf_dir, "documents")
    return tf_idf_topk(d, k=5).select("doc_id", "kw_rank", "term", "tf", "score")


def q_pack_sequences(spark, sf_dir) -> DataFrame:
    """Sequence packing into 2048-token bins via the DISTRIBUTED prefix
    sum (range partition → per-partition window → tiny offset window —
    never a global single-task window). Output is bit-stable across
    partition counts; the oracle is the plain SQL window cumsum."""
    from synapse_etl_jobs_spark.operators.packing import pack_sequences
    from synapse_etl_jobs_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return pack_sequences(d, "doc_id", "n_tokens", budget=2048).select(
        "doc_id", "n_tokens", "pack_id", "pack_offset"
    )


def q_weighted_mix(spark, sf_dir) -> DataFrame:
    """Dataset mixing: per-language mixture weights (en 2.5x up, zh 0.5x
    down, rest 1.0) realized as a pure hash function of (seed, doc_id) —
    map-side only, no shuffle, no RNG; the DuckDB oracle reproduces the
    exact multiset including copy indexes."""
    from synapse_etl_jobs_spark.operators.sampling import weighted_mix

    d = _t(spark, sf_dir, "documents")
    return weighted_mix(
        d.select("doc_id", "lang"),
        "doc_id",
        "lang",
        weights={"en": 2.5, "zh": 0.5},
        seed=42,
    ).select("doc_id", "lang", "copy_idx")


def q_mask_pii(spark, sf_dir) -> DataFrame:
    """PII scrubbing: ordered regexp chain (email → IPv4 → phone) over
    text with planted identifiers; patterns restricted to constructs
    Java regex and RE2 interpret identically, so the DuckDB oracle runs
    the same chain."""
    from synapse_etl_jobs_spark.operators.text import mask_pii

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    raw = F.concat(
        F.lit("contact u"), k.cast("string"),
        F.lit("@mail.example.org or call +1 555-010"),
        F.lpad(F.pmod(k, F.lit(100)).cast("string"), 2, "0"),
        F.lit(" from 10.0."), F.pmod(k, F.lit(256)).cast("string"),
        F.lit(".7 done"),
    )
    return c.select("c_custkey", raw.alias("raw"), mask_pii(raw).alias("masked"))


def q_hash_split(spark, sf_dir) -> DataFrame:
    """Deterministic leakage-safe train/val/test split labels from a
    stable key hash (portable md5 variant for the oracle; production
    default is xxhash64)."""
    from synapse_etl_jobs_spark.operators.text import hash_split, md5_hash48

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        hash_split(
            F.col("doc_id").cast("string"),
            {"train": 8, "val": 1, "test": 1},
            hash_fn=md5_hash48,
        ).alias("split"),
    )


def q_ngram_jaccard_adjacent(spark, sf_dir) -> DataFrame:
    """Exact 3-shingle Jaccard on (doc_id, doc_id+1) pairs — the
    verification primitive of the near-dup pipeline, SQL-checkable."""
    from synapse_etl_jobs_spark.operators.dedup_text import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
    # keep only pairs whose right side exists — a lazy semi-join, not a
    # driver-side max() collect (doc ids are dense, so this equals the
    # oracle's id_b <= max(doc_id) predicate)
    pairs = pairs.join(d.select(F.col("doc_id").alias("id_b")), "id_b", "leftsemi")
    return ngram_jaccard_pairs(d, pairs, k=3)


def _augmented_documents(spark, sf_dir) -> DataFrame:
    """Documents ∪ verbatim copies shifted by +10000000 — deterministic
    exact duplicates. Identical texts produce identical MinHash
    signatures, so they collide in EVERY LSH band: banding recall for
    them is exactly 1.0, which makes the LSH pipelines SQL-oracle-able
    (the oracle is the equal-shingle-set pair/representative set)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    dup = d.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang", "n_chars"
    )
    return d.unionByName(dup)


def q_minhash_lsh_pairs(spark, sf_dir) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verify at 1.0
    over the copy-augmented corpus. The banding path must RECALL every
    equal-shingle-set pair (identical signatures collide in all bands)
    and the verify must reject every unequal candidate — so the output
    equals the equal-shingle-set pair list, which the DuckDB oracle
    computes directly. Raw candidate behavior at lower thresholds is
    pinned in pytest (recall tests)."""
    from synapse_etl_jobs_spark.operators.dedup_text import (
        minhash_lsh_candidates, verify_exact_duplicates,
    )

    aug = _augmented_documents(spark, sf_dir)
    cands = minhash_lsh_candidates(aug, shingle_k=5, num_hashes=32, bands=8)
    return verify_exact_duplicates(aug, cands, k=5)


def q_simhash(spark, sf_dir) -> DataFrame:
    """48-bit SimHash per document through the explode+bit-vote
    aggregate, using the portable md5-derived token hash so a DuckDB
    oracle reproduces every signature bit-for-bit. Identical plan to the
    production 64-bit/xxhash64 default (pinned in pytest) — only the
    leaf hash expression differs."""
    from synapse_etl_jobs_spark.operators.dedup_text import simhash_signatures
    from synapse_etl_jobs_spark.operators.text import md5_hash48

    d = _t(spark, sf_dir, "documents")
    return simhash_signatures(d, bits=48, token_hash=md5_hash48)


def q_doc_fingerprint(spark, sf_dir) -> DataFrame:
    """Winnowing fingerprint per doc (count + min/max selected hash),
    portable md5 token hash → exact DuckDB oracle."""
    from synapse_etl_jobs_spark.operators.text import fingerprint, md5_hash48

    d = _t(spark, sf_dir, "documents")
    fp = fingerprint("text", window=8, token_hash=md5_hash48)
    return d.select(
        "doc_id",
        F.size(fp).alias("n_fingerprints"),
        F.array_min(fp).alias("fp_min"),
        F.array_max(fp).alias("fp_max"),
    )


def q_ann_bruteforce(spark, sf_dir) -> DataFrame:
    """Exact cosine top-3 for query vectors vec_id < 8."""
    from synapse_etl_jobs_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return brute_force_topk(e, q, k=3)


def _double_copied_embeddings(spark, sf_dir) -> DataFrame:
    """Embeddings ∪ two exact copies (+1000000, +2000000). For every
    query, its copies are cosine-1.0 neighbors that any signature/cell
    scheme MUST find (identical vectors get identical signatures and
    identical cell assignments), so approximate top-2 == exact top-2 and
    the brute-force SQL oracle gates the approximate plumbing."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.unionByName(
        e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    ).unionByName(
        e.select((F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding")
    )


def q_ann_lsh(spark, sf_dir) -> DataFrame:
    """Random-hyperplane LSH ANN over the copy-augmented corpus, k=2:
    deterministic (the two exact copies are always candidates and always
    rank 1-2), so the exact top-2 SQL oracle gates the multi-table
    signature join end-to-end. General-vector recall is pinned in
    pytest."""
    from synapse_etl_jobs_spark.operators.similarity import rp_lsh_topk

    aug = _double_copied_embeddings(spark, sf_dir)
    q = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8)
    return rp_lsh_topk(aug, q, k=2, bits=8, tables=4)


def _augmented_embeddings(spark, sf_dir) -> DataFrame:
    """Embeddings corpus ∪ exact copies shifted by +1000000 — deterministic
    near-duplicates (cosine 1.0) for the embedding-dedup oracle queries."""
    e = _t(spark, sf_dir, "embeddings")
    dup = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    return e.unionByName(dup)


_EMB_AUG = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]), label FROM embeddings
"""

_EMB_INCREMENTAL_ORACLE = """
WITH corp AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 3 <> 0
), newb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
  FROM embeddings WHERE vec_id % 3 = 0
  UNION ALL
  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]), label
  FROM embeddings WHERE vec_id % 3 <> 0 AND vec_id % 6 = 1
  UNION ALL
  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[]), label
  FROM embeddings WHERE vec_id % 3 = 0 AND vec_id % 6 = 0
)
SELECT a.vec_id, a.label FROM newb a
WHERE NOT EXISTS (
  SELECT 1 FROM corp c
  WHERE round(list_cosine_similarity(c.v, a.v), 6) >= 0.99
)
AND NOT EXISTS (
  SELECT 1 FROM newb o
  WHERE o.vec_id < a.vec_id
    AND round(list_cosine_similarity(o.v, a.v), 6) >= 0.99
)
"""

_EMB_DEDUP_ORACLE = f"""
WITH aug AS ({_EMB_AUG})
SELECT a.vec_id, a.label FROM aug a
WHERE NOT EXISTS (
  SELECT 1 FROM aug o
  WHERE o.vec_id < a.vec_id
    AND round(list_cosine_similarity(o.v, a.v), 6) >= 0.99
)
"""


def q_embedding_dedup_incremental(spark, sf_dir) -> DataFrame:
    """Incremental embedding near-dup removal: a new batch probed
    against the persisted RP-LSH index of an existing corpus (corpus
    vectors touched only for candidate ids). Batch = the vec_id%3==0
    slice plus exact copies of corpus vectors (+1M, dropped as corpus
    dups) and copies of batch vectors (+2M, dropped in-batch). At
    threshold 0.99 the only qualifying pairs on this data are exact
    copies, which collide in every signature table — recall 1.0, so the
    exact-cosine SQL anti-join is the oracle."""
    from synapse_etl_jobs_spark.operators.similarity import (
        embedding_dedup_incremental, rp_index,
    )

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    corpus = e.filter(F.col("vec_id") % 3 != 0)
    base_new = e.filter(F.col("vec_id") % 3 == 0)
    new = (
        base_new
        .unionByName(
            corpus.filter(F.col("vec_id") % 6 == 1).select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"),
                "embedding", "label",
            )
        )
        .unionByName(
            base_new.filter(F.col("vec_id") % 6 == 0).select(
                (F.col("vec_id") + 2_000_000).alias("vec_id"),
                "embedding", "label",
            )
        )
    )
    lsh = dict(bits=10, tables=4)
    ix = rp_index(corpus, **lsh)
    return embedding_dedup_incremental(
        new, corpus, index=ix, threshold=0.99, **lsh
    ).select("vec_id", "label")


def q_embedding_quantize(spark, sf_dir) -> DataFrame:
    """int8 scalar quantization round-trip: per-vector scale, first/last
    codes, and the cosine between original and dequantized vectors
    (reconstruction fidelity) — all SQL-mirrored exactly (both engines
    round half away from zero on doubles)."""
    from synapse_etl_jobs_spark.operators.similarity import (
        cosine, dequantize_embedding, quantize_embedding,
    )

    e = _t(spark, sf_dir, "embeddings")
    qd = dequantize_embedding(quantize_embedding(e))
    return qd.select(
        "vec_id",
        F.round("q_scale", 6).alias("q_scale"),
        F.element_at("q", 1).cast("int").alias("q_first"),
        F.element_at("q", -1).cast("int").alias("q_last"),
        F.round(cosine(F.col("embedding"), F.col("embedding_dq")), 4).alias("recon_cos"),
    )


def q_embedding_neardup_pairs(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact (verification path)."""
    from synapse_etl_jobs_spark.operators.similarity import embedding_neardup_pairs

    aug = _augmented_embeddings(spark, sf_dir)
    return embedding_neardup_pairs(aug, threshold=0.99, method="exact")


def q_embedding_dedup(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-dup removal, exact pair scoring."""
    from synapse_etl_jobs_spark.operators.similarity import dedup_embedding

    aug = _augmented_embeddings(spark, sf_dir)
    return dedup_embedding(aug, threshold=0.99, method="exact").select("vec_id", "label")


def q_embedding_dedup_lsh(spark, sf_dir) -> DataFrame:
    """Embedding near-dup removal through the random-hyperplane LSH scale
    path. Identical vectors collide in EVERY signature table, so for
    exact-copy duplicates LSH recall is 1.0 and the same SQL oracle
    applies — the gate checks the blocked-join path end-to-end."""
    from synapse_etl_jobs_spark.operators.similarity import dedup_embedding

    aug = _augmented_embeddings(spark, sf_dir)
    return dedup_embedding(
        aug, threshold=0.99, method="lsh", bits=10, tables=4
    ).select("vec_id", "label")


# ---------------------------------------------------------------------------
# Access-record client analytics (F6/F8/F9) — vectorized pandas UDFs with
# behavior pinned by the reference's 76-case corpus; oracles replicate the
# synthesized inputs with CASE arms.
# ---------------------------------------------------------------------------

_UA_CASES = [
    ("Synapse-Web-Client/435.0", "WEB", "435.0"),
    ("Mozilla/5.0 (compatible; bot)", "WEB", "5.0"),
    ("Synapse-Java-Client/512.1", "JAVA", "512.1"),
    ("synapseclient/2.7.0 python-requests/2.28", "PYTHON", "2.7.0"),
    ("synapser/0.11.7", "SYNAPSER", "0.11.7"),
    ("curl/7.68.0", "UNKNOWN", None),
]


def _synth_user_agents(spark, sf_dir) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    arms = F.when(F.pmod("c_custkey", F.lit(6)) == 0, F.lit(_UA_CASES[0][0]))
    for i in range(1, 6):
        arms = arms.when(F.pmod("c_custkey", F.lit(6)) == i, F.lit(_UA_CASES[i][0]))
    return c.select("c_custkey", arms.alias("user_agent"))


def _ua_case_sql(field: int, key: str = "c_custkey") -> str:
    arms = " ".join(
        f"WHEN {key} % 6 = {i} THEN "
        + ("NULL" if _UA_CASES[i][field] is None else f"'{_UA_CASES[i][field]}'")
        for i in range(6)
    )
    return f"CASE {arms} END"


def q_client_detection(spark, sf_dir) -> DataFrame:
    """F8: user-agent → client enum (ordered marker cascade, pandas UDF)."""
    from synapse_etl_jobs_spark.functions.access_record import client_udf

    ua = _synth_user_agents(spark, sf_dir)
    return ua.select("c_custkey", "user_agent", client_udf("user_agent").alias("client"))


def q_client_version(spark, sf_dir) -> DataFrame:
    """F9: (client, user-agent) → version (per-client regex, pandas UDF)."""
    from synapse_etl_jobs_spark.functions.access_record import (
        client_udf, client_version_udf,
    )

    ua = _synth_user_agents(spark, sf_dir)
    withc = ua.withColumn("client", client_udf("user_agent"))
    return withc.select(
        "c_custkey", "client",
        client_version_udf("client", "user_agent").alias("client_version"),
    )


def q_url_decode(spark, sf_dir) -> DataFrame:
    """F6: percent-decode + strip ALL whitespace (pandas UDF)."""
    from synapse_etl_jobs_spark.functions.access_record import decode_url_udf

    c = _t(spark, sf_dir, "customer")
    urls = c.select(
        "c_custkey",
        F.concat(
            F.lit("path%20with%09tabs/"), F.col("c_custkey").cast("string"),
            F.lit("%0A end"),
        ).alias("raw_url"),
    )
    return urls.select(
        "c_custkey", "raw_url", decode_url_udf("raw_url").alias("decoded")
    )


# ---------------------------------------------------------------------------
# Nested/array construction + reshaping (N1/N2/N4/N5)
# ---------------------------------------------------------------------------

def q_reshape_array(spark, sf_dir) -> DataFrame:
    """N2/N5: build an array from a sequence, reshape each element into a
    struct via a transform lambda, explode, and project struct fields."""
    from synapse_etl_jobs_spark.operators.nested import explode_array, reshape_array

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    built = ev.select(
        "event_id",
        reshape_array(
            F.sequence(F.lit(1), (F.pmod("event_id", F.lit(4)) + 1).cast("int")),
            lambda x: F.struct(x.alias("idx"), (x * x).alias("sq")),
        ).alias("items"),
    )
    exploded = explode_array(built, "items", "item")
    return exploded.select(
        "event_id", F.col("item.idx").alias("idx"), F.col("item.sq").alias("sq")
    )


def q_window_topk(spark, sf_dir) -> DataFrame:
    """Per-key top-k ranking window (the general form of the LWW dedup):
    top-3 events per user by value."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "rnk")
    )


def q_group_percentiles(spark, sf_dir) -> DataFrame:
    """Exact grouped quantiles (p50/p90/p99 of value per event type):
    Spark's exact ``percentile`` aggregate — linear interpolation,
    matching ANSI ``quantile_cont`` — with map-side partial aggregation
    (the per-group buffer shuffles, not the rows). For 100-TB inputs the
    engine swaps in ``percentile_approx`` (KLL-style mergeable sketch,
    same plan shape); the exact form is the oracle-gated baseline."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def q_rollup_grouping_sets(spark, sf_dir) -> DataFrame:
    """Multi-level aggregation in ONE pass: ``df.rollup(a, b)`` computes
    (a,b), (a), and grand-total groups via Catalyst's Expand operator —
    each input row fans out to the 3 grouping sets BEFORE the map-side
    partial aggregate, so the shuffle carries per-group buffers, not
    3x the rows, and no second job re-reads the source (vs the naive
    UNION ALL of three groupBys = 3 scans). ``grouping_id`` is the
    standard bitmask disambiguating a NULL group key from a subtotal
    row. Scale: identical shape to a flat groupBy — partial agg, one
    exchange on the grouping-set key."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.grouping_id().cast("int").alias("gid"),
    )


def q_pivot_events(spark, sf_dir) -> DataFrame:
    """Pivot (long→wide reshape): per-user event counts with one column
    per event type. The pivot VALUES are given explicitly — Spark then
    compiles this to a single groupBy with conditional aggregates (no
    extra pass to discover distinct values, the scale trap of
    `pivot(col)` without a value list) — one shuffle keyed by user, one
    conditional-sum per output column, all map-side partial."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    wide = ev.groupBy("user_id").pivot("event_type", types).agg(
        F.count(F.lit(1))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


def q_heavy_hitters(spark, sf_dir) -> DataFrame:
    """Frequent-item (heavy-hitter) sketch: ``approx_top_k`` is Spark's
    mergeable bounded-state frequency aggregate — each partition tracks
    at most maxItemsTracked counters and partial sketches merge, so at
    100 TB the wire carries fixed-size sketches instead of a full
    groupBy count of a high-cardinality column. Oracle gating uses the
    degenerate-to-exact trick (same as ann_ivf_full): k and the tracked
    capacity exceed the key cardinality at every gate scale (15k users
    at sf1), so sketch counts equal exact group counts and the row-set
    is deterministic. NOTE a saturated sketch (cardinality > tracked
    capacity) correctly returns ONLY items whose lower-bound count
    clears the purge error — on uniform data that is zero rows, which
    is the right production answer ("no heavy hitters") but can never
    match an exact GROUP BY oracle; hence the headroom."""
    ev = _t(spark, sf_dir, "events")
    return ev.selectExpr("inline(approx_top_k(user_id, 65536, 65536))").select(
        F.col("item").alias("user_id"), F.col("count").alias("n_events")
    )


def q_iso8601_roundtrip(spark, sf_dir) -> DataFrame:
    """F11: epoch-ms ↔ ISO-8601 conversions (second granularity, UTC)."""
    ev = _t(spark, sf_dir, "events")
    trunc = F.date_trunc("second", F.col("ts"))
    iso = F.date_format(trunc, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return ev.select(
        "event_id",
        iso.alias("iso"),
        F.unix_millis(trunc).alias("epoch_ms"),
        F.unix_millis(F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss'Z'")).alias(
            "parsed_ms"
        ),
    )


# ---------------------------------------------------------------------------
# Source/sink roundtrips (S1/S2/S8 + quarantine)
# ---------------------------------------------------------------------------

def q_json_gzip_roundtrip(spark, sf_dir) -> DataFrame:
    """S8 sink + S1 scan: write gzip NDJSON partitioned by zero-padded
    year/month/day (F12), read back recursively with an explicit schema."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.functions.scalars import year_month_day
    from synapse_etl_jobs_spark.sources.readers import read_json

    ev = _t(spark, sf_dir, "events")
    y, m, d = year_month_day(F.col("ts"))
    out = _tmpdir("json_sink_") + "/t"
    (
        ev.select("event_id", "user_id", "event_type", y, m, d)
        .write.partitionBy("year", "month", "day")
        .option("compression", "gzip")
        .json(out)
    )
    schema = (
        StructType()
        .add("event_id", "long")
        .add("user_id", "long")
        .add("event_type", "string")
    )
    back = read_json(spark, out, schema, multiline=False, recursive=True)
    return back.select("event_id", "user_id", "event_type")


def q_csv_roundtrip(spark, sf_dir) -> DataFrame:
    """S2: quoted headerless CSV write + scan."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.sources.readers import read_csv

    c = _t(spark, sf_dir, "customer")
    out = _tmpdir("csv_sink_") + "/t"
    (
        c.select("c_custkey", "c_name", "c_acctbal")
        .write.option("header", "false")
        .option("quoteAll", "true")
        .csv(out)
    )
    schema = (
        StructType()
        .add("c_custkey", "long")
        .add("c_name", "string")
        .add("c_acctbal", "double")
    )
    back = read_csv(spark, out, schema, header=False, multiline=False)
    return back.select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))


def q_filename_to_date(spark, sf_dir) -> DataFrame:
    """F13: derive per-row dates from the file path's second-to-last
    segment (the reference's backfill S3 layout `.../<yyyy-MM-dd>/<file>`),
    via input_file_name provenance."""
    import os

    from synapse_etl_jobs_spark.functions.scalars import filename_to_date
    from synapse_etl_jobs_spark.sources.readers import with_provenance

    ev = _t(spark, sf_dir, "events")
    out = _tmpdir("f13_") + "/t"
    (
        ev.select("event_id", "user_id", F.to_date("ts").alias("record_date"))
        .write.partitionBy("record_date")
        .parquet(out)
    )
    # hive layout writes record_date=<date>/ dirs; the reference layout is
    # bare <date>/ dirs — rename to match (test-harness reshaping only)
    for d in os.listdir(out):
        if d.startswith("record_date="):
            os.rename(os.path.join(out, d), os.path.join(out, d.split("=", 1)[1]))
    back = spark.read.option("recursiveFileLookup", "true").parquet(out)
    # string output: pandas has no date dtype, so a date column would
    # stringify differently on the two sides of the value-hash compare
    return with_provenance(back).select(
        "event_id", "user_id",
        F.date_format(filename_to_date("filename"), "yyyy-MM-dd").alias("record_date"),
    )


def q_json_quarantine(spark, sf_dir) -> DataFrame:
    """S1 + quarantine: corrupt records routed to ``_corrupt_record`` and
    split out (not silently dropped); good rows come back intact."""
    import os

    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.sources.readers import quarantine_split, read_json

    ev = _t(spark, sf_dir, "events")
    out = _tmpdir("json_q_") + "/t"
    ev.select("event_id", "user_id").write.json(out)
    with open(os.path.join(out, "part-corrupt.json"), "w") as f:
        f.write('{"event_id": not-json\n{broken\n')
    schema = StructType().add("event_id", "long").add("user_id", "long")
    good, bad = quarantine_split(read_json(spark, out, schema))
    n_bad = bad.count()
    assert n_bad == 2, f"expected 2 quarantined rows, got {n_bad}"
    return good.select("event_id", "user_id")


# ---------------------------------------------------------------------------
# Lake table: MoR + compaction, schema evolution, bucket-pruned point scan
# ---------------------------------------------------------------------------

def q_cdc_lake_merge_mor(spark, sf_dir) -> DataFrame:
    """Full replay through merge-on-read deltas, then compact() folds them
    into base files — same oracle as the CoW path (state convergence)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_mor_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    ReplayDriver(table, num_batches=3).replay(ev)
    table.compact(drop_tombstones=False)
    return table.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "value", F.col("_seq").alias("seq")
    )


def q_cdc_replay_maintained(spark, sf_dir) -> DataFrame:
    """Sustained-ingest shape: MoR replay with the driver's SCHEDULED
    maintenance (``ReplayDriver(compact_every=2)`` — compact after every
    2 applied batches, tombstones kept). Interleaved compaction must be
    invisible to final state: same oracle as the plain merge paths.
    Measured at 64M events/16 batches: bounded file count, full-read
    latency 15-30x lower than the uncompacted delta stack, maintenance
    pays for itself in total wall (BENCH/BASELINE.md §sustained
    ingest)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_maint_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    ReplayDriver(table, num_batches=4, compact_every=2).replay(ev)
    return table.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "value", F.col("_seq").alias("seq")
    )


def q_cdc_row_maintenance(spark, sf_dir) -> DataFrame:
    """Row-level maintenance ops (Iceberg DELETE / UPDATE analogs) issued
    as first-class CDC merge batches: replay the change stream into a
    merge-on-read table, then ``delete_where`` purges one event class and
    ``update_where`` rewrites a column for another — both at per-key
    seq+1, with exactly-once markers, tombstones, lineage and changelog
    records exactly like any upstream batch. The string predicates prune
    the maintenance scans to keys + referenced columns BEFORE the MoR
    reduce (scan_keys contract). Oracle = the LWW final state with SQL
    DELETE/UPDATE applied."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_rowmaint_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    ReplayDriver(table, num_batches=3).replay(ev)
    table.delete_where("event_type = 'click'", batch_id="purge-clicks")
    table.update_where(
        "event_type = 'purchase'", {"value": "value + 1"},
        batch_id="bump-purchases",
    )
    return table.read().select("user_id", "event_type", "value")


def q_cdc_replication(spark, sf_dir) -> DataFrame:
    """Tail-a-table replication through the packaged loop
    (streaming/replicate.py): replay the change stream into a source
    table (MoR, 3 batches), then ``replicate_once`` tails its changelog
    — the ``synlake_cdc`` stream + checkpointed offsets + foreachBatch
    merges — into a replica with a DIFFERENT bucket count (events
    re-bucket on merge). Returns the REPLICA's state; oracle = the same
    LWW reduction, so the gate proves source-equals-replica-equals-
    oracle. Each pass moves O(new deltas): the replica merge is the
    same O(batch) MoR merge the source ran (measured ≈ the source's own
    merge wall — BENCH/BASELINE.md ninth window)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver, replicate_once

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    base = _tmpdir("lake_repl_")
    src = LakeTable.create(
        spark, base + "/src", schema, ["user_id"], num_buckets=8,
        write_mode="mor",
    )
    ReplayDriver(src, num_batches=3).replay(ev)
    LakeTable.create(
        spark, base + "/rep", schema, ["user_id"], num_buckets=4,
        write_mode="mor",
    )
    replicate_once(spark, src.path, base + "/rep", base + "/ckpt")
    rep = LakeTable.load(spark, base + "/rep")
    return rep.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "value", F.col("_seq").alias("seq")
    )


def q_cdc_replication_filtered(spark, sf_dir) -> DataFrame:
    """Partial replica (fan-out routing): same replication loop as
    ``cdc_replication`` but with ``where`` restricted to a key-column
    slice — upserts AND tombstones for matching keys flow, everything
    else is dropped before the replica merge (the predicate is
    key-only by enforced contract, so filtered CDC cannot diverge).
    Oracle = the LWW final state filtered by the same predicate."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver, replicate_once

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    base = _tmpdir("lake_replf_")
    src = LakeTable.create(
        spark, base + "/src", schema, ["user_id"], num_buckets=8,
        write_mode="mor",
    )
    ReplayDriver(src, num_batches=3).replay(ev)
    LakeTable.create(
        spark, base + "/rep", schema, ["user_id"], num_buckets=4,
        write_mode="mor",
    )
    replicate_once(
        spark, src.path, base + "/rep", base + "/ckpt",
        where="user_id % 4 = 1",
    )
    rep = LakeTable.load(spark, base + "/rep")
    return rep.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "value", F.col("_seq").alias("seq")
    )


def q_lake_schema_evolution(spark, sf_dir) -> DataFrame:
    """Mid-stream schema evolution: merge epoch-0 batch, rename value→val
    and add column k, merge epoch-1 batch with the new shape; epoch-0
    files are resolved at read time via the rename map (no rewrite)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _cdc_events(spark, sf_dir)
    props = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    split = ev.agg(F.max("seq")).collect()[0][0] // 2
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_evo_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=8)
    table.merge(ev.filter(F.col("seq") <= split), batch_id=0)
    table.evolve_schema(add_columns=[("k", "integer")], renames={"value": "val"})
    batch2 = (
        ev.filter(F.col("seq") > split)
        .join(props, "seq")
        .select("op", "seq", "user_id", "event_type", F.col("value").alias("val"), "k")
    )
    table.merge(batch2, batch_id=1)
    return table.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "val", "k", F.col("_seq").alias("seq")
    )


def q_lake_time_travel(spark, sf_dir) -> DataFrame:
    """Time travel: replay in two batches, read the snapshot AS OF the
    first batch's commit — the second batch must be invisible (manifest
    immutability; Iceberg VERSION AS OF)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _cdc_events(spark, sf_dir)
    split = ev.agg(F.max("seq")).collect()[0][0] // 2  # batch boundary setup
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_tt_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=8)
    table.merge(ev.filter(F.col("seq") <= split), batch_id=0)
    table.merge(ev.filter(F.col("seq") > split), batch_id=1)
    return table.read_version(1).select("user_id", "event_type", "value")


def q_lake_changes(spark, sf_dir) -> DataFrame:
    """Incremental CDC-out: replay 3 merge-on-read batches, then read
    the net changes committed AFTER version 1 — exactly the LWW
    reduction of the last two seq windows, tombstones included (the
    changelog a downstream consumer would apply)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_ch_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    ReplayDriver(table, num_batches=3).replay(ev)
    return table.changes(since_version=1).select(
        "user_id", "event_type", "value",
        F.col("_seq").alias("seq"), F.col("_deleted").alias("deleted"),
    )


def q_datasource_read(spark, sf_dir) -> DataFrame:
    """Spark-4 Python DataSource surface: replay the stream into a
    merge-on-read table, then read it back through the REGISTERED format
    (``spark.read.format("synlake")``) — executors read only their
    bucket's files with pyarrow and LWW-reduce per bucket; the result
    must equal the library-path read (same CDC oracle)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.sources.lake_datasource import register
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_ds_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    ReplayDriver(table, num_batches=3).replay(ev)
    register(spark)
    return (
        spark.read.format("synlake")
        .option("path", path)
        .option("include_internal", "true")
        .load()
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .select("user_id", "event_type", "value", F.col("_seq").alias("seq"))
    )


def q_datasource_point_scan(spark, sf_dir) -> DataFrame:
    """Offline bucket pruning through the DataSource: an equality filter
    on the bucket column reaches ``pushFilters``, where a pure-Python
    port of Spark's xxhash64 prunes ``partitions()`` to the ONE bucket
    that can hold the key — a point scan plans without any Spark job and
    reads 1/num_buckets of the table (tests assert the partition count).
    """
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.sources.lake_datasource import register
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_dsp_") + "/t"
    table = LakeTable.create(
        spark, path, schema, ["user_id"], num_buckets=8, write_mode="mor"
    )
    ReplayDriver(table, num_batches=3).replay(ev)
    register(spark)
    return (
        spark.read.format("synlake")
        .option("path", path)
        .load()
        .filter(F.col("user_id") == 7)
        .select("user_id", "event_type", "value")
    )


def q_lake_point_scan(spark, sf_dir) -> DataFrame:
    """Bucket-pruned point lookup: scan_keys touches only the buckets the
    probe keys hash to (hash-bucket partition pruning)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_pt_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=16)
    ReplayDriver(table, batch_events=10**9).replay(ev)
    # scan_keys returns WHOLE buckets — filter to exactly the probed key
    # set (other users sharing a probed bucket must not leak through, and
    # the oracle predicate must match this set precisely)
    return table.scan_keys([(uid,) for uid in range(1, 11)]).filter(
        F.col("user_id").between(1, 10)
    ).select("user_id", "event_type", "value")


def q_lake_zorder_scan(spark, sf_dir) -> DataFrame:
    """Z-order clustered range scan (Delta ``OPTIMIZE ZORDER BY`` +
    stats-pruned read, lake/zorder.py): merge the CDC stream, rewrite
    with ``compact(zorder_cols=["user_id", "value"])`` so each file
    covers a small (user_id × value) hyper-rectangle and the manifest
    records per-file [min, max] for BOTH columns, then ``scan_range`` a
    band of the NON-leading z-column — the read that file-level stats
    pruning can only serve after a multi-column cluster (a linear sort
    would prune on the leading column alone). Result is exact: pruning
    skips files that cannot intersect, the predicate filters the rest."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_z_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=4)
    ReplayDriver(table, batch_events=10**9).replay(ev)
    table.compact(zorder_cols=["user_id", "value"], zorder_bits=4)
    return table.scan_range({"value": (25.0, 75.0)}).select(
        "user_id", "event_type", "value"
    )


def _patch_events(spark, sf_dir) -> DataFrame:
    """Partial-column change stream derived from the events table:
    every third event patches only ``event_type``, every third only
    ``value``, the rest are full upserts; event_id % 11 == 0 deletes."""
    ev = _t(spark, sf_dir, "events")
    mod11 = F.col("event_id") % 11 == 0
    mod3 = F.col("event_id") % 3
    return ev.select(
        F.col("user_id"),
        F.col("event_id").alias("seq"),
        F.when(mod11, F.lit("DELETE"))
        .when(mod3 < 2, F.lit("PATCH"))
        .otherwise(F.lit("UPSERT"))
        .alias("op"),
        F.when(mod11, F.lit(None).cast("array<string>"))
        .when(mod3 == 0, F.array(F.lit("event_type")))
        .when(mod3 == 1, F.array(F.lit("value")))
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("set_cols"),
        F.col("event_type"),
        F.round(F.col("value"), 2).alias("value"),
    )


def q_cdc_patch_merge(spark, sf_dir) -> DataFrame:
    """Partial-column CDC merge (Paimon-style partial-update merge
    engine, ``lake/table.py merge_patches`` + ``operators/patch.py``):
    a change stream where UPDATE events carry only the columns they
    touched (Debezium update-mask shape) is collapsed per key with
    per-column last-writer-wins, unset columns inherited from the stored
    row, DELETE resetting the row — applied in TWO in-order batches so
    the cross-batch inherit path (batch 2 patches filling from batch 1's
    merged rows) is what the oracle checks. The reference only ever
    ships full rows (glue_job.py re-snapshots whole records); this is
    the sparse-update capability a real change tailer needs."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _patch_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).collect()[0][0] or 0
    mid = hi // 2
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_patch_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=4,
                             write_mode="mor")
    table.merge_patches(ev.filter(F.col("seq") <= mid), stream_id="s", batch_id=0)
    table.merge_patches(ev.filter(F.col("seq") > mid), stream_id="s", batch_id=1)
    return table.read().select("user_id", "event_type", "value")


def q_cdc_patch_merge_ooo(spark, sf_dir) -> DataFrame:
    """Out-of-order partial-column CDC merge: the SAME patch stream as
    ``cdc_patch_merge``, split into three seq-range batches applied in
    the order [3rd, 1st, 2nd] — the final state must be identical to
    in-order application (same oracle). This pins the per-column CRDT
    state ``merge_patches`` persists with every row (``_cseq`` winner
    seqs + delete bound): batch merging is a join-semilattice pointwise
    max, so stale batches delivered late — checkpoint replays, retried
    writers, reordered queue partitions — cannot clobber newer column
    values or resurrect deleted keys. The reference has no analog (its
    jobs re-snapshot whole rows, glue_job.py); this is the hardening a
    change tailer needs when upstream delivery is not FIFO."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _patch_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).collect()[0][0] or 0
    c1, c2 = hi // 3, 2 * hi // 3
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_patch_ooo_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=4,
                             write_mode="mor")
    table.merge_patches(ev.filter(F.col("seq") > c2), stream_id="s", batch_id=0)
    table.merge_patches(ev.filter(F.col("seq") <= c1), stream_id="s", batch_id=1)
    table.merge_patches(ev.filter((F.col("seq") > c1) & (F.col("seq") <= c2)),
                        stream_id="s", batch_id=2)
    return table.read().select("user_id", "event_type", "value")


def q_cdc_replication_patch(spark, sf_dir) -> DataFrame:
    """Replication of a PATCH-MODE source (round-5 ADVICE high fix):
    the source applies the partial-column patch stream in three
    ``merge_patches`` batches, then ONE ``replicate_once`` pass tails
    its changelog — a single catch-up micro-batch bundling all three
    physical versions, whose rows carry the per-column CRDT state
    (``_cseq``/``_fold``). Pins two engine rules end-to-end: merge
    never auto-evolves internal columns into the replica's user schema,
    and the catch-up reduce orders multi-version keys by
    (``_seq``, ``_fold``) so the replica lands on the source's exact
    per-column state. Oracle = the same per-column LWW final state as
    ``cdc_patch_merge`` (source ≡ replica ≡ oracle)."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import replicate_once

    ev = _patch_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).collect()[0][0] or 0
    c1, c2 = hi // 3, 2 * hi // 3
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    base = _tmpdir("lake_repl_patch_")
    src = LakeTable.create(spark, base + "/src", schema, ["user_id"],
                           num_buckets=4, write_mode="mor")
    src.merge_patches(ev.filter(F.col("seq") <= c1), stream_id="s", batch_id=0)
    src.merge_patches(ev.filter((F.col("seq") > c1) & (F.col("seq") <= c2)),
                      stream_id="s", batch_id=1)
    src.merge_patches(ev.filter(F.col("seq") > c2), stream_id="s", batch_id=2)
    LakeTable.create(spark, base + "/rep", schema, ["user_id"],
                     num_buckets=8, write_mode="mor")
    replicate_once(spark, src.path, base + "/rep", base + "/ckpt")
    rep = LakeTable.load(spark, base + "/rep")
    assert rep._patch_enabled, "replica must inherit patch mode"
    internal = {"_seq", "_deleted", "_cseq", "_fold"}
    user = {f.name for f in rep.manifest.current_schema().fields}
    assert not user & internal, f"internal columns leaked into user schema: {user & internal}"
    return rep.read().select("user_id", "event_type", "value")


def q_lake_rebucket(spark, sf_dir) -> DataFrame:
    """Bucket-spec evolution under sustained ingest (``rebucket`` +
    ``auto_compact_min_deltas``, lake/table.py): replay the CDC stream
    in four batches into a deliberately under-bucketed MoR table whose
    auto-compaction policy folds any bucket reaching 2 delta files,
    then rebucket 2 → 8 (one shuffle on the new bucket hash, manifest
    swap; old versions keep the old spec for time travel) and read. The
    final state must be byte-identical to the plain LWW reduction — the
    maintenance machinery must never change query results."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable
    from synapse_etl_jobs_spark.streaming import ReplayDriver

    ev = _cdc_events(spark, sf_dir)
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_rbk_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=2,
                             write_mode="mor", auto_compact_min_deltas=2)
    ReplayDriver(table, num_batches=4).replay(ev)
    table.rebucket(8)
    return table.read().select("user_id", "event_type", "value")


def q_lake_clone(spark, sf_dir) -> DataFrame:
    """Zero-copy shallow clone (``LakeTable.clone`` — Delta SHALLOW
    CLONE / Iceberg snapshot-ref analog): merge the FIRST half of the
    change stream into a source table, fork it in one manifest commit
    (no data read or copied), merge the SECOND half into the FORK only,
    and return the fork's state. Oracle = the full-stream LWW final
    state — and the query asserts in-line that the SOURCE still holds
    exactly the first-half state (fork divergence is copy-on-write,
    the source never notices). The dev-branch primitive at 10^10 rows:
    fork, experiment, discard."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _cdc_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).collect()[0][0] or 0
    mid = hi // 2
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    base = _tmpdir("lake_clone_")
    src = LakeTable.create(spark, base + "/src", schema, ["user_id"],
                           num_buckets=4, write_mode="mor")
    src.merge(ev.filter(F.col("seq") <= mid), batch_id=0)
    v_fork = src.manifest.table_version
    fork = src.clone(base + "/fork")
    fork.merge(ev.filter(F.col("seq") > mid), batch_id=1)
    # the source is untouched by the fork's merge
    assert (LakeTable.load(spark, src.path).manifest.table_version
            == v_fork), "fork merge advanced the SOURCE"
    out = LakeTable.load(spark, fork.path)
    return out.read(include_internal=True).filter(~F.col("_deleted")).select(
        "user_id", "event_type", "value", F.col("_seq").alias("seq")
    )


def q_lake_rollback(spark, sf_dir) -> DataFrame:
    """Rollback to an earlier snapshot as a new commit (Iceberg
    ``rollback_to_snapshot``): merge two CDC batches, roll back to the
    version batch 1 committed, and read — the result must equal the LWW
    state of batch 1 alone. Manifest-only O(1) commit: history is not
    rewritten, batch markers are restored so a resumed replay re-applies
    the undone batch and reconverges."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.lake import LakeTable

    ev = _cdc_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).collect()[0][0] or 0
    mid = hi // 2
    schema = (
        StructType()
        .add("user_id", "long")
        .add("event_type", "string")
        .add("value", "double")
    )
    path = _tmpdir("lake_rb_") + "/t"
    table = LakeTable.create(spark, path, schema, ["user_id"], num_buckets=4)
    table.merge(ev.filter(F.col("seq") <= mid), stream_id="s", batch_id=0)
    v1 = table.manifest.table_version
    table.merge(ev.filter(F.col("seq") > mid), stream_id="s", batch_id=1)
    table.rollback(v1)
    return table.read().select("user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# Catalog scan with pushdown (S3), SQL INSERT (S11), full reference job port
# ---------------------------------------------------------------------------

def q_catalog_pushdown_scan(spark, sf_dir) -> DataFrame:
    """S3 parity: read a PARTITIONED table by catalog NAME with a
    pushdown-predicate string (the Glue ``from_catalog(...,
    push_down_predicate=...)`` contract,
    /root/reference/src/scripts/backfill_jobs/backfill_kinesis_file_download_records.py:34-39).
    The predicate's partition-column conjunct prunes record_date
    directories at planning time (PartitionFilters); the rest pushes to
    parquet. Predicate is sf-independent (day-of-month prefix)."""
    from synapse_etl_jobs_spark.catalog import Catalog
    from pyspark.sql.types import StructType

    ev = _t(spark, sf_dir, "events")
    path = _tmpdir("cat_scan_") + "/t"
    (
        ev.select(
            "event_id", "event_type", F.round("value", 2).alias("value"),
            F.date_format("ts", "yyyy-MM-dd").alias("record_date"),
        )
        .write.partitionBy("record_date")
        .parquet(path)
    )
    cat = Catalog(spark)
    cat.register_hive(
        "events_by_date", path,
        StructType()
        .add("event_id", "long").add("event_type", "string")
        .add("value", "double").add("record_date", "string"),
        ["record_date"],
    )
    return cat.table(
        "events_by_date",
        push_down_predicate=(
            "substring(record_date, 9, 2) <= '10' AND event_type = 'click'"
        ),
    ).select("event_id", "event_type", "value", "record_date")


def q_sql_insert_envelope(spark, sf_dir) -> DataFrame:
    """S11 parity: ``INSERT INTO <partitioned table> SELECT ...`` doing
    the Athena backfill's envelope reshape
    (/root/reference/src/scripts/backfill_jobs/backfill_acl_snapshots_athena.sql:67-105):
    literal stack injection (P7), changeType derivation from a timestamp
    delta (P8), JSON scalar extraction (F2), epoch conversions (F11),
    typed struct construction (N4), zero-padded year/month/day partition
    columns (F12). The SELECT runs as Spark SQL over a registered view;
    the read-back flattens the struct for the oracle compare."""
    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.catalog import Catalog

    cat = Catalog(spark)
    cat.register_parquet("events_src", f"{sf_dir}/events.parquet")
    cat.create_view("events_src")
    snap_t = (
        StructType()
        .add("k", "integer").add("event_type", "string").add("value", "double")
    )
    schema = (
        StructType()
        .add("stack", "string").add("change_type", "string")
        .add("change_timestamp", "long").add("user_id", "long")
        .add("snapshot", snap_t)
        .add("year", "string").add("month", "string").add("day", "string")
    )
    path = _tmpdir("sqlins_") + "/t"
    cat.register_hive("envelope", path, schema, ["year", "month", "day"])
    cat.insert_into("envelope", """
        SELECT 'prod' AS stack,
               CASE WHEN unix_millis(CAST(ts AS TIMESTAMP)) -
                         min(unix_millis(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id) >= 1000
                    THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
               unix_millis(CAST(ts AS TIMESTAMP)) AS change_timestamp,
               user_id,
               named_struct(
                 'k', CAST(get_json_object(props, '$.k') AS INT),
                 'event_type', event_type,
                 'value', round(value, 2)
               ) AS snapshot,
               CAST(year(ts) AS STRING) AS year,
               lpad(CAST(month(ts) AS STRING), 2, '0') AS month,
               lpad(CAST(day(ts) AS STRING), 2, '0') AS day
        FROM events_src
    """)
    return cat.table("envelope").select(
        "stack", "change_type", "change_timestamp", "user_id",
        F.col("snapshot.k").alias("k"),
        F.col("snapshot.event_type").alias("event_type"),
        F.col("snapshot.value").alias("value"),
        "year", "month", "day",
    )


def _node_change_events(spark, sf_dir) -> DataFrame:
    """Synthesize the node-snapshots change-event envelope (nested
    ``snapshot`` struct with all 30 fields incl. arrays/structs) from the
    events table — deterministic, so the DuckDB oracle can derive the
    job's output directly from events."""
    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))

    def syn(c):
        return F.concat(F.lit("syn"), c.cast("string"))

    eid, uid = F.col("event_id"), F.col("user_id")
    return ev.select(
        F.when(F.col("value") > 100, F.lit("UPDATE"))
        .otherwise(F.lit("CREATE")).alias("changeType"),
        ms.alias("changeTimestamp"),
        uid.alias("userId"),
        ms.alias("snapshotTimestamp"),
        F.struct(
            syn(eid).alias("id"),
            syn(uid).alias("benefactorId"),
            syn(F.pmod(eid, F.lit(97))).alias("projectId"),
            syn(F.pmod(eid, F.lit(31))).alias("parentId"),
            F.col("event_type").alias("nodeType"),
            ms.alias("createdOn"),
            uid.alias("createdByPrincipalId"),
            (ms + 5000).alias("modifiedOn"),
            uid.alias("modifiedByPrincipalId"),
            F.pmod(eid, F.lit(5)).alias("versionNumber"),
            syn(eid + 1).alias("fileHandleId"),
            F.concat(F.lit("node-"), eid.cast("string")).alias("name"),
            F.lit(None).cast("string").alias("versionComment"),
            F.concat(F.lit("v"), F.pmod(eid, F.lit(5)).cast("string")).alias("versionLabel"),
            F.lit(None).cast("string").alias("alias"),
            syn(F.pmod(eid, F.lit(11))).alias("activityId"),
            F.array(eid, eid + 1).alias("columnModelIds"),
            F.array(syn(uid)).alias("scopeIds"),
            F.array(
                F.struct(
                    syn(eid).alias("entityId"),
                    F.pmod(eid, F.lit(3)).alias("versionNumber"),
                )
            ).alias("items"),
            F.struct(
                syn(eid).alias("targetId"),
                F.pmod(eid, F.lit(7)).alias("targetVersionNumber"),
            ).alias("reference"),
            (F.pmod(eid, F.lit(2)) == 0).alias("isSearchEnabled"),
            F.when(
                F.col("event_type") == "view",
                F.concat(F.lit("SELECT * FROM syn"), eid.cast("string")),
            ).alias("definingSQL"),
            (F.pmod(uid, F.lit(2)) == 0).alias("isPublic"),
            (F.pmod(uid, F.lit(3)) == 0).alias("isControlled"),
            (F.pmod(uid, F.lit(5)) == 0).alias("isRestricted"),
            F.array(syn(F.pmod(eid, F.lit(13)))).alias("effectiveArs"),
            F.col("props").alias("annotations"),
            F.get_json_object("props", "$.k").alias("derivedAnnotations"),
            F.lit(None).cast("string").alias("internalAnnotations"),
            F.sequence(F.lit(1).cast("long"), F.pmod(eid, F.lit(3)) + 1).alias("versionHistory"),
            F.struct(
                uid.alias("storageLocationId"),
                F.floor(F.col("value") * 1000).cast("long").alias("sumFileSizesBytes"),
            ).alias("projectStorageUsage"),
        ).alias("snapshot"),
    )


def q_node_snapshots_job(spark, sf_dir) -> DataFrame:
    """The complete node-snapshots job port (34-column mapping incl. the
    dual timestamp mapping and nested arrays/structs, then partition-date
    + syn-id normalization — jobs/node_snapshots.py). The output
    projects arrays/structs to scalars (sizes, members) so the oracle
    compare is representation-stable; the job itself keeps them."""
    from synapse_etl_jobs_spark.jobs import node_snapshots

    out = node_snapshots(_node_change_events(spark, sf_dir))
    return out.select(
        "change_type",
        F.unix_millis("change_timestamp").alias("change_ms"),
        "change_user_id",
        F.unix_millis("snapshot_timestamp").alias("snapshot_ms"),
        "snapshot_date",
        "id", "benefactor_id", "project_id", "parent_id", "node_type",
        F.unix_millis("created_on").alias("created_ms"),
        "created_by",
        F.unix_millis("modified_on").alias("modified_ms"),
        "modified_by", "version_number", "file_handle_id",
        "name", "version_comment", "version_label", "alias", "activity_id",
        F.size("column_model_ids").alias("n_column_models"),
        F.size("scope_ids").alias("n_scope_ids"),
        F.element_at("items", 1)["versionNumber"].alias("first_item_version"),
        F.col("reference")["targetId"].alias("reference_target"),
        "is_search_enabled", "defining_sql",
        "is_public", "is_controlled", "is_restricted",
        F.size("effective_ars").alias("n_effective_ars"),
        "annotations", "derived_annotations", "internal_annotations",
        F.size("version_history").alias("n_version_history"),
        F.col("project_storage_usage")["sumFileSizesBytes"].alias("storage_bytes"),
    )


def q_access_record_job(spark, sf_dir) -> DataFrame:
    """The complete access-record job port (24-column payload mapping →
    signature/client/version/entity derivation → partition date +
    instance strip, jobs/process_access_record.py) over a synthesized
    payload envelope derived deterministically from events — so the
    oracle computes the same output straight from events."""
    from synapse_etl_jobs_spark.jobs import process_access_records

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    eid, uid = F.col("event_id"), F.col("user_id")
    ua = F.when(F.pmod(uid, F.lit(6)) == 0, F.lit(_UA_CASES[0][0]))
    for i in range(1, 6):
        ua = ua.when(F.pmod(uid, F.lit(6)) == i, F.lit(_UA_CASES[i][0]))
    url = F.when(
        F.pmod(eid, F.lit(3)) == 0,
        F.concat(F.lit("repo/entity/syn"), eid.cast("string")),
    ).otherwise(
        F.concat(
            F.lit("/repo/v1/entity/syn"), eid.cast("string"),
            F.lit("/wiki/"), uid.cast("string"),
        )
    )
    success = F.pmod(eid, F.lit(7)) != 0
    payload = ev.select(
        F.struct(
            F.concat(F.lit("sess-"), uid.cast("string")).alias("sessionId"),
            ms.alias("timestamp"),
            uid.alias("userId"),
            F.when(F.pmod(eid, F.lit(2)) == 0, F.lit("GET"))
            .otherwise(F.lit("POST")).alias("method"),
            url.alias("requestURL"),
            ua.alias("userAgent"),
            F.lit("api.example.org").alias("host"),
            F.lit(None).cast("string").alias("origin"),
            F.lit(None).cast("string").alias("xforwardedFor"),
            F.lit(None).cast("string").alias("via"),
            F.pmod(eid, F.lit(64)).alias("threadId"),
            F.pmod(eid, F.lit(1000)).alias("elapseMS"),
            success.alias("success"),
            F.lit("prod").alias("stack"),
            F.lpad(uid.cast("string"), 9, "0").alias("instance"),
            F.concat(F.lit("vm-"), F.pmod(eid, F.lit(16)).cast("string")).alias("vmId"),
            F.lit(None).cast("string").alias("returnObjectId"),
            F.lit(None).cast("string").alias("queryString"),
            F.when(success, F.lit(200)).otherwise(F.lit(500))
            .cast("long").alias("responseStatus"),
            F.lit(None).cast("string").alias("oauthClientId"),
            F.lit(None).cast("string").alias("basicAuthUsername"),
            F.lit(None).cast("string").alias("authenticationMethod"),
        ).alias("payload"),
    )
    out = process_access_records(payload)
    return out.select(
        "session_id",
        F.unix_millis("timestamp").alias("ts_ms"),
        "record_date", "user_id", "method", "request_url", "user_agent",
        "host", "thread_id", "elapse_ms", "success", "stack", "instance",
        "vm_id", "response_status",
        "normalized_method_signature", "client", "client_version", "entity_id",
    )


def q_backfill_node_snapshots(spark, sf_dir) -> DataFrame:
    """The node-snapshots BACKFILL script end to end
    (jobs/backfill_node_snapshots.py): headerless quoted CSV with a
    dated directory layout → provenance column → mapping → from_json
    with defaulting → changeType derivation (≥1s rule) → filename-date
    partition fields → partitioned gzip-JSON write → read back."""
    import os

    from synapse_etl_jobs_spark.jobs.backfill_node_snapshots import (
        backfill_node_snapshots,
    )

    ev = _t(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    iso = lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")  # noqa: E731
    created = F.date_trunc("second", F.col("ts"))
    modified = created + F.make_dt_interval(secs=F.pmod(eid, F.lit(3)))
    snap_json = F.to_json(F.struct(
        F.concat(F.lit("syn"), eid.cast("string")).alias("id"),
        F.concat(F.lit("node-"), eid.cast("string")).alias("name"),
        iso(created).alias("createdOn"),
        uid.alias("createdByPrincipalId"),
        iso(modified).alias("modifiedOn"),
        uid.alias("modifiedByPrincipalId"),
        F.col("event_type").alias("nodeType"),
        F.pmod(eid, F.lit(5)).alias("versionNumber"),
    ))
    src = _tmpdir("backfill_src_") + "/csv"
    (
        ev.select(
            F.unix_millis(F.col("ts").cast("timestamp")).cast("string").alias("c0"),
            F.lit("filler").alias("c1"),
            snap_json.alias("c2"),
            F.date_format("ts", "yyyy-MM-dd").alias("record_date"),
        )
        .write.partitionBy("record_date")
        .option("quoteAll", "true")
        .option("escape", '"')  # RFC-4180 doubled quotes, what read_csv expects
        .csv(src)
    )
    # reference layout is bare `<yyyy-MM-dd>/` dirs (harness reshaping)
    for dname in os.listdir(src):
        if dname.startswith("record_date="):
            os.rename(
                os.path.join(src, dname),
                os.path.join(src, dname.split("=", 1)[1]),
            )
    dest = _tmpdir("backfill_out_") + "/json"
    out = backfill_node_snapshots(
        spark, src, dest, release_number="000000123", stack="prod",
    )
    return out.select(
        F.col("changeTimestamp").alias("change_ms"),
        F.col("changeType").alias("change_type"),
        F.col("userId").alias("user_id"),
        F.col("objectType").alias("object_type"),
        "stack", "instance",
        F.col("snapshot.id").alias("syn_id"),
        F.col("snapshot.createdOn").alias("created_ms"),
        F.col("snapshot.modifiedOn").alias("modified_ms"),
        F.col("snapshot.nodeType").alias("node_type"),
        F.col("snapshot.versionNumber").alias("version_number"),
        F.col("snapshotTimestamp").alias("snapshot_ms"),
    )


def q_user_profile_job(spark, sf_dir) -> DataFrame:
    """user-profile snapshots port: 17-entry mapping, null-safe
    first-email selection, partition date (jobs/snapshot_jobs.py)."""
    from synapse_etl_jobs_spark.jobs import user_profile_snapshots

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    uid = F.col("user_id")
    src = ev.select(
        ms.alias("changeTimestamp"),
        F.when(F.col("value") > 100, F.lit("UPDATE"))
        .otherwise(F.lit("CREATE")).alias("changeType"),
        uid.alias("userId"),
        ms.alias("snapshotTimestamp"),
        F.struct(
            uid.cast("string").alias("ownerId"),
            F.concat(F.lit("user-"), uid.cast("string")).alias("userName"),
            F.lit(None).cast("string").alias("firstName"),
            F.lit(None).cast("string").alias("lastName"),
            F.when(F.pmod(uid, F.lit(5)) == 0, F.array().cast("array<string>"))
            .otherwise(
                F.array(
                    F.concat(F.lit("u"), uid.cast("string"), F.lit("@example.org")),
                    F.lit("alt@example.org"),
                )
            ).alias("emails"),
            F.lit(None).cast("string").alias("location"),
            F.lit(None).cast("string").alias("company"),
            F.lit(None).cast("string").alias("position"),
            F.lit(None).cast("string").alias("industry"),
            ms.alias("createdOn"),
            (F.pmod(uid, F.lit(2)) == 0).alias("twoFactorAuthEnabled"),
            F.array().cast("array<string>").alias("tosAgreements"),
        ).alias("snapshot"),
    )
    out = user_profile_snapshots(src)
    return out.select(
        "change_type",
        F.unix_millis("change_timestamp").alias("change_ms"),
        "change_user_id", "snapshot_date", "id", "user_name", "email",
        F.unix_millis("created_on").alias("created_ms"),
        "is_two_factor_auth_enabled",
    )


def q_quiz_question_job(spark, sf_dir) -> DataFrame:
    """certified-quiz-question port: nested corrections reshape →
    created_on drift default (passedOn fallback) → explode → output
    mapping (jobs/snapshot_jobs.py)."""
    from synapse_etl_jobs_spark.jobs import certified_quiz_question_snapshots

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    eid, uid = F.col("event_id"), F.col("user_id")
    corrections = F.transform(
        F.sequence(F.lit(0).cast("long"), F.pmod(eid, F.lit(3))),
        lambda i: F.struct(
            F.struct(i.cast("int").alias("questionIndex")).alias("question"),
            (F.pmod(eid + i, F.lit(2)) == 0).alias("isCorrect"),
        ),
    )
    src = ev.select(
        ms.alias("changeTimestamp"),
        F.when(F.col("value") > 100, F.lit("UPDATE"))
        .otherwise(F.lit("CREATE")).alias("changeType"),
        ms.alias("snapshotTimestamp"),
        F.lit("prod").alias("stack"),
        F.lit("123").alias("instance"),
        F.struct(
            uid.cast("string").alias("userId"),
            F.pmod(eid, F.lit(1000)).cast("int").alias("responseId"),
            corrections.alias("corrections"),
            F.when(F.pmod(eid, F.lit(4)) == 0, F.lit(None).cast("long"))
            .otherwise(ms).alias("createdOn"),
            (ms - 1000).alias("passedOn"),
        ).alias("snapshot"),
    )
    out = certified_quiz_question_snapshots(src)
    return out.select(
        F.unix_millis("change_timestamp").alias("change_ms"),
        "change_type", "change_user_id", "response_id",
        "question_index", "is_correct",
        F.date_format("snapshot_date", "yyyy-MM-dd").alias("snapshot_date"),
        F.unix_millis("created_on").alias("created_ms"),
    )


def q_file_download_job(spark, sf_dir) -> DataFrame:
    """file-download-records port: payload mapping, partition date,
    associate-id syn-strip, downloaded_file_handle_id defaulting
    (jobs/snapshot_jobs.py)."""
    from synapse_etl_jobs_spark.jobs import file_download_records

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    eid, uid = F.col("event_id"), F.col("user_id")
    src = ev.select(
        ms.alias("timestamp"),
        F.lit("prod").alias("stack"),
        F.lit("000042").alias("instance"),
        F.struct(
            uid.alias("userId"),
            F.pmod(eid, F.lit(97)).alias("projectId"),
            eid.cast("string").alias("fileHandleId"),
            F.when(F.pmod(eid, F.lit(3)) == 0, F.lit(None).cast("string"))
            .otherwise((eid + 5).cast("string")).alias("downloadedFileHandleId"),
            F.lit("FileEntity").alias("associateType"),
            F.concat(F.lit("syn"), eid.cast("string")).alias("associateId"),
            F.concat(F.lit("sess-"), uid.cast("string")).alias("sessionId"),
        ).alias("payload"),
    )
    out = file_download_records(src)
    return out.select(
        "user_id",
        F.unix_millis("timestamp").alias("ts_ms"),
        "record_date", "project_id", "file_handle_id",
        "downloaded_file_handle_id", "association_object_type",
        "association_object_id", "session_id", "stack", "instance",
    )


def q_certified_quiz_job(spark, sf_dir) -> DataFrame:
    """certified-quiz snapshots through the declarative job REGISTRY
    (jobs/registry.py): mapping + the PLFM drift defaults — revoked ←
    false, certified ← passed, created_on ← deprecated passed_on — with
    per-row nulls synthesized to exercise every default arm."""
    from synapse_etl_jobs_spark.jobs import run_job

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    eid, uid = F.col("event_id"), F.col("user_id")
    src = ev.select(
        ms.alias("changeTimestamp"),
        F.when(F.col("value") > 100, F.lit("UPDATE"))
        .otherwise(F.lit("CREATE")).alias("changeType"),
        ms.alias("snapshotTimestamp"),
        F.lit("prod").alias("stack"),
        F.lit("7").alias("instance"),
        F.struct(
            uid.cast("string").alias("userId"),
            F.pmod(eid, F.lit(1000)).alias("responseId"),
            (F.pmod(eid, F.lit(11)) != 0).alias("passed"),
            (ms - 1000).alias("passedOn"),
            F.when(F.pmod(eid, F.lit(2)) == 0, F.lit(None).cast("boolean"))
            .otherwise(F.pmod(eid, F.lit(5)) == 0).alias("revoked"),
            F.lit(None).cast("long").alias("revokedOn"),
            F.when(F.pmod(eid, F.lit(3)) == 0, F.lit(None).cast("boolean"))
            .otherwise(F.pmod(eid, F.lit(7)) == 0).alias("certified"),
            F.when(F.pmod(eid, F.lit(4)) == 0, F.lit(None).cast("long"))
            .otherwise(ms).alias("createdOn"),
        ).alias("snapshot"),
    )
    out = run_job("certified_quiz_snapshots", src)
    return out.select(
        F.unix_millis("change_timestamp").alias("change_ms"),
        "change_type", "user_id", "response_id", "passed",
        F.unix_millis("passed_on").alias("passed_on_ms"),
        "revoked", "certified",
        F.unix_millis("created_on").alias("created_ms"),
        "snapshot_date", "stack", "instance",
    )


def q_team_member_job(spark, sf_dir) -> DataFrame:
    """team-member snapshots through the registry: the 3-level nested
    flatten (snapshot.member.ownerId) plus string→bigint id casts."""
    from synapse_etl_jobs_spark.jobs import run_job

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    eid, uid = F.col("event_id"), F.col("user_id")
    src = ev.select(
        ms.alias("changeTimestamp"),
        F.when(F.col("value") > 100, F.lit("UPDATE"))
        .otherwise(F.lit("CREATE")).alias("changeType"),
        uid.alias("userId"),
        ms.alias("snapshotTimestamp"),
        F.struct(
            F.pmod(eid, F.lit(53)).cast("string").alias("teamId"),
            F.struct(uid.cast("string").alias("ownerId")).alias("member"),
            (F.pmod(eid, F.lit(9)) == 0).alias("isAdmin"),
        ).alias("snapshot"),
    )
    out = run_job("team_member_snapshots", src)
    return out.select(
        "change_type", "change_user_id", "snapshot_date",
        "team_id", "member_id", "is_admin",
    )


def q_rollup_cascade(spark, sf_dir) -> DataFrame:
    """Hypertable-style rollup cascade: the DAY level is re-aggregated
    from the HOUR level (mergeable measures), never from raw — the
    oracle computes day buckets directly from raw events, so the gate
    proves cascade == direct."""
    from synapse_etl_jobs_spark.operators.rollup import rollup_cascade

    ev = _t(spark, sf_dir, "events")
    hour, day = rollup_cascade(
        ev, "ts",
        {"n": ("count", None), "sum_v": ("sum", "value"),
         "min_v": ("min", "value"), "max_v": ("max", "value")},
        ["1 hour", "1 day"], keys=["event_type"],
    )
    return day.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type", "n",
        F.round("sum_v", 2).alias("sum_v"),
        F.round("min_v", 4).alias("min_v"),
        F.round("max_v", 4).alias("max_v"),
    )


def q_distinct_sketch(spark, sf_dir) -> DataFrame:
    """Mergeable HLL distinct-count rollup: per-(event_type, shard)
    sketches built independently, unioned per event_type, estimated —
    the pre-aggregated COUNT(DISTINCT) pattern. The gate checks the
    EXACT property that the merged estimate lands within 2% of the true
    distinct count (HLL is exact below the sparse threshold; a drift
    would flip the boolean and hash-mismatch)."""
    from synapse_etl_jobs_spark.operators.rollup import (
        sketch_distinct, sketch_union_estimate,
    )

    ev = _t(spark, sf_dir, "events")
    shards = ev.select(
        "event_type", "user_id", F.pmod("user_id", F.lit(8)).alias("shard")
    )
    sk = sketch_distinct(shards, "user_id", keys=["event_type", "shard"])
    est = sketch_union_estimate(sk, keys=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact",
        (
            F.abs(F.col("distinct_est") - F.col("n_exact"))
            / F.greatest(F.col("n_exact").cast("double"), F.lit(1.0))
            <= 0.02
        ).alias("within_2pct"),
    )


# ---------------------------------------------------------------------------
# Event-time windowed aggregation (streaming surface, batch-checked)
# ---------------------------------------------------------------------------

def q_tumbling_window(spark, sf_dir) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type — the same
    operator serves the watermarked streaming rollup (windows.py)."""
    from synapse_etl_jobs_spark.streaming import tumbling_agg

    ev = _t(spark, sf_dir, "events")
    return tumbling_agg(
        ev, "ts", "1 hour",
        {"n": F.count("*"), "sum_value": F.round(F.sum("value"), 2)},
        keys=["event_type"],
    )


def q_sliding_window(spark, sf_dir) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (each event in 2 windows)."""
    from synapse_etl_jobs_spark.streaming import sliding_agg

    ev = _t(spark, sf_dir, "events")
    return sliding_agg(
        ev, "ts", "1 hour", "30 minutes", {"n": F.count("*")},
    )


def q_session_window(spark, sf_dir) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (session end = last event + gap, Spark session_window semantics)."""
    from synapse_etl_jobs_spark.streaming import session_agg

    ev = _t(spark, sf_dir, "events")
    return session_agg(
        ev, "ts", "30 minutes", {"n": F.count("*")}, keys=["user_id"],
    )


# ---------------------------------------------------------------------------
# Remaining rows-only surface (LSH-dependent outputs)
# ---------------------------------------------------------------------------

def q_simhash_near_pairs(spark, sf_dir) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding. Because the banded
    join is followed by an EXACT Hamming verify, the output equals the
    brute-force pair set within the distance bound — with the portable
    md5 token hash the DuckDB oracle computes exactly that (all-pairs
    bit_count(xor) at gate scale). blocks > max_hamming upholds the
    pigeonhole recall guarantee."""
    from synapse_etl_jobs_spark.operators.dedup_text import simhash_near_pairs
    from synapse_etl_jobs_spark.operators.text import md5_hash48

    d = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(
        d, max_hamming=4, blocks=8, bits=48, token_hash=md5_hash48
    )


def q_connected_components(spark, sf_dir) -> DataFrame:
    """Iterative Hash-Min connected components over deterministic chain
    pairs built from doc ids — min-id component per node. Oracle: DuckDB
    recursive CTE (transitive reachability)."""
    from synapse_etl_jobs_spark.operators.dedup_text import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = (
        d.filter(F.pmod("doc_id", F.lit(5)) < 2)
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        # lazy semi-join instead of a driver-side max() collect (dense
        # ids ⇒ equivalent to the oracle's id_b <= max predicate)
        .join(d.select(F.col("doc_id").alias("id_b")), "id_b", "leftsemi")
    )
    return connected_components(pairs)


def q_minhash_dedup_cc(spark, sf_dir) -> DataFrame:
    """Near-dup removal with exact transitive clustering (LSH → Jaccard
    verify → iterative connected components) at threshold 1.0 over the
    copy-augmented corpus. Equal-shingle-set groups are cliques
    (equality is transitive), so the kept set is exactly the min-id
    representative per group — the DuckDB oracle. Sub-1.0 thresholds and
    chained-cluster semantics are pinned in pytest."""
    from synapse_etl_jobs_spark.operators.dedup_text import minhash_dedup_cc

    aug = _augmented_documents(spark, sf_dir)
    return minhash_dedup_cc(
        aug, threshold=1.0, shingle_k=5, num_hashes=32, bands=8
    ).select("doc_id", "lang", "n_chars")


def q_minhash_dedup_full(spark, sf_dir) -> DataFrame:
    """Full near-dup removal pipeline (LSH candidates → exact-Jaccard
    verify → star-contraction representative) at threshold 1.0 over the
    copy-augmented corpus — same oracle as the CC variant (cliques ⇒
    star contraction is exact). Sub-1.0 behavior pinned in pytest."""
    from synapse_etl_jobs_spark.operators.dedup_text import minhash_dedup

    aug = _augmented_documents(spark, sf_dir)
    # collapse_exact: the production scale guard (boilerplate clusters
    # enter LSH as one representative); survivor set provably invariant
    # (tests/test_lsh_degenerate.py), and the copy-augmented corpus is
    # exactly the shape it accelerates
    return minhash_dedup(
        aug, threshold=1.0, shingle_k=5, num_hashes=32, bands=8,
        collapse_exact=True,
    ).select("doc_id", "lang", "n_chars")


def q_minhash_dedup_incremental(spark, sf_dir) -> DataFrame:
    """Incremental near-dup removal: a NEW batch probed against the
    persisted LSH index of an existing corpus (never re-hashing the
    corpus; corpus text touched only for candidate ids). Batch = the
    doc_id%4==0 slice plus verbatim copies of corpus docs (+10M, must be
    dropped as corpus dups) and copies of batch docs (+20M, dropped
    in-batch); corpus = the rest. Threshold 1.0 ⇒ the survivor set is
    the equal-shingle-set anti-join the DuckDB oracle computes."""
    from synapse_etl_jobs_spark.operators.dedup_text import (
        minhash_dedup_incremental, minhash_index,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    base_new = d.filter(F.col("doc_id") % 4 == 0)
    new = (
        base_new
        .unionByName(
            corpus.filter(F.col("doc_id") % 8 == 1).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "text", "lang", "n_chars",
            )
        )
        .unionByName(
            base_new.filter(F.col("doc_id") % 8 == 0).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                "text", "lang", "n_chars",
            )
        )
    )
    lsh = dict(shingle_k=5, num_hashes=32, bands=8)
    ix = minhash_index(corpus, **lsh)
    # production scale guards on: exact-dup pre-collapse (the copy
    # slices are exactly what it accelerates; survivor set provably
    # invariant) + broadcast probe (index side never shuffles)
    return minhash_dedup_incremental(
        new, corpus, index=ix, threshold=1.0, collapse_exact=True,
        broadcast_probe=True, **lsh
    ).select("doc_id", "lang", "n_chars")


def _span_augmented_documents(spark, sf_dir) -> DataFrame:
    """documents ∪ concat(doc d, unique separator, doc d+1) at +10M —
    every original document's shingles recur inside a concat doc, while
    the separator token splits each concat doc's duplication into TWO
    islands, exercising the gaps-and-islands span merge."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = d.select((F.col("doc_id") - 1).alias("doc_id"),
                   F.col("text").alias("_t2"))
    cat = d.join(nxt, "doc_id").select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ", "text",
            F.concat(F.lit("uniqsep"), F.col("doc_id").cast("string")),
            "_t2",
        ).alias("text"),
    )
    return d.unionByName(cat)


def q_repeated_spans(spark, sf_dir) -> DataFrame:
    """Passage-level duplicated spans (Lee et al. ACL'22 approximation):
    corpus-wide repeated 6-token shingles merged into maximal per-doc
    spans, over the concat-augmented corpus. Portable md5 hash → the
    DuckDB oracle reproduces every span boundary exactly; the xxhash64
    production default shares the identical plan (pinned in pytest)."""
    from synapse_etl_jobs_spark.operators.dedup_text import repeated_spans
    from synapse_etl_jobs_spark.operators.text import md5_hash48

    aug = _span_augmented_documents(spark, sf_dir)
    return repeated_spans(aug, k=6, min_count=2, token_hash=md5_hash48)


def q_duplication_stats(spark, sf_dir) -> DataFrame:
    """Per-document duplicated-token fraction over the same augmented
    corpus — the filterable quality signal built on repeated_spans."""
    from synapse_etl_jobs_spark.operators.dedup_text import duplication_stats
    from synapse_etl_jobs_spark.operators.text import md5_hash48

    aug = _span_augmented_documents(spark, sf_dir)
    return duplication_stats(aug, k=6, min_count=2, token_hash=md5_hash48)


def q_dedup_stream_state(spark, sf_dir) -> DataFrame:
    """The STREAMING dedup-ingest path end to end: documents (plus
    verbatim copies at +10M) arrive as a 2-file Structured-Streaming
    source, each micro-batch is near-dup-removed against the persisted
    LSH index and MERGEd exactly-once (streaming/dedup_stream.py), and
    the final corpus table is returned. At threshold 1.0 shingle-set
    equality is transitive, so the surviving TEXT set is
    batch-split-invariant; with originals forced into the FIRST batch
    (explicit mtimes below) the surviving IDS are the global min-id
    representatives — the equal-shingle-set anti-join the oracle
    computes."""
    from synapse_etl_jobs_spark.streaming.dedup_stream import (
        create_dedup_tables, dedup_stream_into_table,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    aug = _augmented_documents(spark, sf_dir)
    base = _tmpdir("dedup_stream_entry_")
    src = os.path.join(base, "src")
    # two micro-batch files in id order: originals, then the copies
    # (maxFilesPerTrigger=1 → the cross-batch path is what's exercised).
    # The FileStreamSource orders batches by mtime — force distinct
    # mtimes so back-to-back writes can't tie and flip the batch order
    # (corpus-always-wins makes survivor IDS depend on it; only the
    # surviving TEXT set is split-invariant)
    import glob
    import time as _time

    d.coalesce(1).write.parquet(src)
    now = _time.time()
    for fp in glob.glob(os.path.join(src, "*.parquet")):
        os.utime(fp, (now - 100, now - 100))
    aug.filter(F.col("doc_id") >= 10_000_000).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    docs, index = create_dedup_tables(
        spark, os.path.join(base, "docs"), os.path.join(base, "ix"),
        d.schema, num_buckets=8,
    )
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dedup_stream_into_table(
        docs, index, stream, os.path.join(base, "ckpt"),
        threshold=1.0, shingle_k=5, num_hashes=32, bands=8,
        # production scale guards: exact-dup pre-collapse (survivor-set
        # invariant at threshold 1.0) + broadcast probe + bucket-pruned
        # index scan (both defaults, stated for the record)
        collapse_exact=True, broadcast_probe=True, prune_index_scan=True,
    )
    return docs.read().select("doc_id", "lang", "n_chars")


def q_ann_ivf_full(spark, sf_dir) -> DataFrame:
    """IVF-flat ANN with n_probe == n_cells — degenerates to exact
    search, so the brute-force SQL oracle gates the whole IVF plumbing
    (centroid sampling, cell assignment, probe join, re-rank)."""
    from synapse_etl_jobs_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return ivf_topk(e, q, k=3, n_cells=8, n_probe=8)


def q_ann_ivf(spark, sf_dir) -> DataFrame:
    """IVF-flat ANN with PARTIAL probe (the scale path) over the
    copy-augmented corpus, k=2: each query's probe list always contains
    its own nearest cell, which is where its exact copies live, so the
    output is deterministically the exact top-2 and the brute-force SQL
    oracle gates centroid pick + assignment + probe join. General-vector
    recall at partial probe is pinned in pytest."""
    from synapse_etl_jobs_spark.operators.similarity import ivf_topk

    aug = _double_copied_embeddings(spark, sf_dir)
    q = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8)
    return ivf_topk(aug, q, k=2, n_cells=8, n_probe=3)


def q_media_dedup(spark, sf_dir) -> DataFrame:
    """Exact dedup over BINARY media content: hash the bytes through the
    Arrow mapInPandas feature kernel, keep the min-id representative per
    content hash — the multimodal twin of ``dedup_exact`` (every 7th
    media row is a byte-identical duplicate by construction)."""
    from synapse_etl_jobs_spark.operators.multimodal import extract_image_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        # every 7th row duplicates the content of doc_id - 1
        F.encode(
            F.when(
                (F.pmod("doc_id", F.lit(7)) == 0) & (F.col("doc_id") > 0),
                F.lag("text", 1).over(Window.orderBy("doc_id")),
            ).otherwise(F.col("text")),
            "utf-8",
        ).alias("data"),
    )
    feats = extract_image_features(media).select("media_id", "content_hash")
    keep = feats.groupBy("content_hash").agg(F.min("media_id").alias("media_id"))
    return media.join(keep, "media_id", "leftsemi").select("media_id")


def q_media_plumbing(spark, sf_dir) -> DataFrame:
    """Multimodal plumbing: documents → binary media column → Arrow
    mapInPandas feature kernel; hash/size are SQL-checkable."""
    from synapse_etl_jobs_spark.operators.multimodal import extract_image_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("data")
    )
    return extract_image_features(media).select("media_id", "n_bytes", "content_hash")


# ---------------------------------------------------------------------------
# Athena SQL backfills (jobs/backfill_athena.py) — the old-data-warehouse
# snapshot tables reshaped into the change-event envelope. The synthetic
# ``old_<x>`` source mirrors the reference's CSV-projected table shape
# (change_timestamp, record_type, json_record, instance, snapshot_date);
# its JSON payloads derive deterministically from events so the DuckDB
# oracle can compute the expected envelope WITHOUT a JSON round trip.
# ---------------------------------------------------------------------------

def _old_snapshot_view(spark, sf_dir, view_name, payload_struct) -> None:
    """Register the synthetic old_<x> source view. ``payload_struct`` is
    a callable (events_df, created_ts_col) -> struct Column; created is
    second-aligned at ``ts - (event_id % 3) * 2s`` so the ≥1s changeType
    rule fires deterministically (offset 0 → CREATE, 2s/4s → UPDATE)."""
    ev = _t(spark, sf_dir, "events")
    base_s = F.expr("unix_millis(cast(ts as timestamp)) div 1000")
    created = F.timestamp_seconds(base_s - F.pmod(F.col("event_id"), F.lit(3)) * 2)
    (
        ev.select(
            (base_s * 1000).alias("change_timestamp"),
            F.lit("snapshotrecord").alias("record_type"),
            F.to_json(payload_struct(ev, created)).alias("json_record"),
            F.lpad(
                (F.lit(386) + F.pmod(F.col("event_id"), F.lit(10))).cast("string"),
                9, "0",
            ).alias("instance"),
            F.date_format("ts", "yyyy-MM-dd").alias("snapshot_date"),
        )
        .createOrReplaceTempView(view_name)
    )


def _iso(c) -> Column:
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def _run_athena(spark, sf_dir, job, view, payload_struct) -> DataFrame:
    from synapse_etl_jobs_spark.jobs.backfill_athena import run_athena_backfill

    _old_snapshot_view(spark, sf_dir, view, payload_struct)
    dest = _tmpdir(f"athena_{job}_") + "/t"
    return run_athena_backfill(spark, job, view, dest)


def q_backfill_usergroup(spark, sf_dir) -> DataFrame:
    """usergroup Athena backfill (jobs/backfill_athena.py; reference
    backfill_usergroup_athena.sql:56-87): JSON scalar extraction, ISO→ms
    creationDate, null userId, ≥1s changeType rule, zero-pad partition
    columns — run as a Catalog SQL INSERT and read back flattened."""
    def payload(ev, created):
        eid, uid = F.col("event_id"), F.col("user_id")
        return F.struct(
            uid.cast("string").alias("id"),
            (F.pmod(eid, F.lit(2)) == 0).alias("isIndividual"),
            F.concat(F.lit("etag-"), eid.cast("string")).alias("etag"),
            _iso(created).alias("creationDate"),
            F.when(
                F.pmod(eid, F.lit(7)) != 0,
                F.concat(F.lit("/usergroup/"), uid.cast("string")),
            ).alias("uri"),
        )

    out = _run_athena(spark, sf_dir, "usergroup", "old_usergroup_src", payload)
    return out.select(
        "stack", "instance", "objecttype", "changetype",
        "changetimestamp", "snapshottimestamp", "userid",
        F.col("snapshot.id").alias("ug_id"),
        F.col("snapshot.isIndividual").alias("is_individual"),
        F.col("snapshot.etag").alias("etag"),
        F.col("snapshot.creationDate").alias("creation_ms"),
        F.col("snapshot.uri").alias("uri"),
        "year", "month", "day",
    )


def q_backfill_team(spark, sf_dir) -> DataFrame:
    """team Athena backfill (backfill_team_snapshot_athena.sql:61-105):
    11-field snapshot struct with two ISO→ms conversions and a userId
    pulled from the payload's modifiedBy."""
    def payload(ev, created):
        eid, uid = F.col("event_id"), F.col("user_id")
        return F.struct(
            eid.cast("string").alias("id"),
            F.concat(F.lit("team-"), eid.cast("string")).alias("name"),
            F.when(
                F.pmod(eid, F.lit(5)) != 0,
                F.concat(F.lit("desc-"), eid.cast("string")),
            ).alias("description"),
            F.concat(F.lit("i"), F.pmod(eid, F.lit(4)).cast("string")).alias("icon"),
            (F.pmod(eid, F.lit(2)) == 0).alias("canPublicJoin"),
            (F.pmod(eid, F.lit(3)) == 0).alias("canRequestMembership"),
            F.concat(F.lit("etag-"), eid.cast("string")).alias("etag"),
            _iso(created).alias("createdOn"),
            _iso(created + F.expr("INTERVAL 1 HOUR")).alias("modifiedOn"),
            uid.cast("string").alias("createdBy"),
            (uid + 1).cast("string").alias("modifiedBy"),
        )

    out = _run_athena(spark, sf_dir, "team", "old_team_src", payload)
    return out.select(
        "stack", "instance", "objecttype", "changetype",
        "changetimestamp", "snapshottimestamp", "userid",
        F.col("snapshot.id").alias("team_id"),
        F.col("snapshot.name").alias("team_name"),
        F.col("snapshot.description").alias("description"),
        F.col("snapshot.icon").alias("icon"),
        F.col("snapshot.canPublicJoin").alias("can_public_join"),
        F.col("snapshot.canRequestMembership").alias("can_request_membership"),
        F.col("snapshot.createdOn").alias("created_ms"),
        F.col("snapshot.modifiedOn").alias("modified_ms"),
        F.col("snapshot.createdBy").alias("created_by"),
        F.col("snapshot.modifiedBy").alias("modified_by"),
        "year", "month", "day",
    )


def q_backfill_team_member(spark, sf_dir) -> DataFrame:
    """team_member Athena backfill
    (backfill_team_member_snapshot_athena.sql:60-84): nested member
    struct parsed whole from the JSON subtree (the json_parse(json_query)
    pattern → from_json), static changeType UPDATE, userId from the
    nested member.ownerId path."""
    def payload(ev, created):
        eid, uid = F.col("event_id"), F.col("user_id")
        return F.struct(
            F.pmod(eid, F.lit(50)).cast("string").alias("teamId"),
            F.struct(
                uid.cast("string").alias("ownerId"),
                F.concat(F.lit("fn"), uid.cast("string")).alias("firstName"),
                F.concat(F.lit("ln"), uid.cast("string")).alias("lastName"),
                F.concat(F.lit("u"), uid.cast("string")).alias("userName"),
                F.concat(uid.cast("string"), F.lit("@x.org")).alias("email"),
                F.when(
                    F.pmod(eid, F.lit(4)) != 0,
                    F.concat(F.lit("dn"), uid.cast("string")),
                ).alias("displayName"),
                F.lit(True).alias("isIndividual"),
            ).alias("member"),
            (F.pmod(eid, F.lit(2)) == 1).alias("isAdmin"),
        )

    out = _run_athena(
        spark, sf_dir, "team_member", "old_team_member_src", payload
    )
    return out.select(
        "stack", "instance", "objecttype", "changetype",
        "changetimestamp", "snapshottimestamp", "userid",
        F.col("snapshot.teamId").alias("team_id"),
        F.col("snapshot.member.ownerId").alias("owner_id"),
        F.col("snapshot.member.firstName").alias("first_name"),
        F.col("snapshot.member.email").alias("email"),
        F.col("snapshot.member.displayName").alias("display_name"),
        F.col("snapshot.member.isIndividual").alias("is_individual"),
        F.col("snapshot.isAdmin").alias("is_admin"),
        "year", "month", "day",
    )


def q_backfill_userprofile(spark, sf_dir) -> DataFrame:
    """userprofile Athena backfill (backfill_userprofile_athena.sql:77-137):
    the deepest envelope — 21-field struct with two JSON arrays, a nested
    settings struct, and an array of (name, value) preference structs."""
    def payload(ev, created):
        eid, uid = F.col("event_id"), F.col("user_id")
        u = uid.cast("string")
        return F.struct(
            u.alias("ownerId"),
            F.concat(F.lit("etag-"), eid.cast("string")).alias("etag"),
            F.concat(F.lit("fn"), u).alias("firstName"),
            F.concat(F.lit("ln"), u).alias("lastName"),
            F.concat(u, F.lit("@x.org")).alias("email"),
            F.array(
                F.concat(u, F.lit("@x.org")),
                F.concat(F.lit("alt-"), u, F.lit("@y.org")),
            ).alias("emails"),
            F.array(F.concat(F.lit("oid-"), u)).alias("openIds"),
            F.concat(F.lit("user"), u).alias("userName"),
            F.concat(F.lit("User "), u).alias("displayName"),
            F.when(
                F.pmod(eid, F.lit(3)) != 0, F.lit("https://r.example.org")
            ).alias("rStudioUrl"),
            F.lit("summary").alias("summary"),
            F.lit("engineer").alias("position"),
            F.concat(F.lit("city-"), F.pmod(eid, F.lit(9)).cast("string")).alias("location"),
            F.lit("software").alias("industry"),
            F.concat(F.lit("co-"), F.pmod(eid, F.lit(6)).cast("string")).alias("company"),
            eid.cast("string").alias("profilePicureFileHandleId"),
            F.concat(F.lit("https://example.org/"), u).alias("url"),
            F.concat(F.lit("team-"), F.pmod(eid, F.lit(50)).cast("string")).alias("teamName"),
            F.struct(
                (F.pmod(eid, F.lit(2)) == 0).alias("sendEmailNotifications"),
                (F.pmod(eid, F.lit(3)) == 0).alias("markEmailedMessagesAsRead"),
            ).alias("notificationSettings"),
            F.array(
                F.struct(
                    F.lit("p0").alias("name"),
                    (F.pmod(eid, F.lit(2)) == 0).alias("value"),
                ),
                F.struct(
                    F.lit("p1").alias("name"),
                    (F.pmod(eid, F.lit(5)) == 0).alias("value"),
                ),
            ).alias("preferences"),
            _iso(created).alias("createdOn"),
        )

    out = _run_athena(
        spark, sf_dir, "userprofile", "old_userprofile_src", payload
    )
    return out.select(
        "stack", "instance", "objecttype", "changetype",
        "changetimestamp", "snapshottimestamp", "userid",
        F.col("snapshot.ownerId").alias("owner_id"),
        F.col("snapshot.email").alias("email"),
        F.size("snapshot.emails").alias("n_emails"),
        F.element_at("snapshot.emails", 2).alias("alt_email"),
        F.element_at("snapshot.openIds", 1).alias("open_id"),
        F.col("snapshot.userName").alias("user_name"),
        F.col("snapshot.rStudioUrl").alias("rstudio_url"),
        F.col("snapshot.location").alias("location"),
        F.col("snapshot.company").alias("company"),
        F.col("snapshot.notificationSettings.sendEmailNotifications").alias("send_email"),
        F.col("snapshot.notificationSettings.markEmailedMessagesAsRead").alias("mark_read"),
        F.element_at("snapshot.preferences", 1)["value"].alias("pref0"),
        F.element_at("snapshot.preferences", 2)["value"].alias("pref1"),
        F.col("snapshot.createdOn").alias("created_ms"),
        "year", "month", "day",
    )


def q_backfill_verifications(spark, sf_dir) -> DataFrame:
    """verifications Athena backfill
    (backfill_verifications_athena.sql:73-145): the stateHistory array
    lambda — the reference's only N5 transform in anger (:97-110) — each
    element's ISO createdOn converted to epoch-ms inside a native
    ``transform``, plus attachments parsed as an array of structs.
    Variable-length histories (1 or 2 entries) exercise the lambda on
    both shapes."""
    def payload(ev, created):
        eid, uid = F.col("event_id"), F.col("user_id")
        u = uid.cast("string")
        e1 = F.struct(
            _iso(created).alias("createdOn"),
            u.alias("createdBy"),
            F.lit("SUBMITTED").alias("state"),
            F.lit(None).cast("string").alias("reason"),
            F.lit("n0").alias("notes"),
        )
        e2 = F.struct(
            _iso(created + F.expr("INTERVAL 100 SECONDS")).alias("createdOn"),
            (uid + 1).cast("string").alias("createdBy"),
            F.when(F.pmod(eid, F.lit(2)) == 0, F.lit("APPROVED"))
            .otherwise(F.lit("REJECTED")).alias("state"),
            F.when(F.pmod(eid, F.lit(2)) == 1, F.lit("r1")).alias("reason"),
            F.lit(None).cast("string").alias("notes"),
        )
        return F.struct(
            eid.cast("string").alias("id"),
            _iso(created).alias("createdOn"),
            u.alias("createdBy"),
            F.concat(F.lit("fn"), u).alias("firstName"),
            F.concat(F.lit("ln"), u).alias("lastName"),
            F.array(F.concat(u, F.lit("@x.org"))).alias("emails"),
            F.concat(u, F.lit("@x.org")).alias("notificationEmail"),
            F.when(
                F.pmod(eid, F.lit(6)) != 0,
                F.concat(F.lit("city-"), F.pmod(eid, F.lit(9)).cast("string")),
            ).alias("location"),
            F.lit("co").alias("company"),
            F.concat(F.lit("orcid-"), u).alias("orcid"),
            F.when(F.pmod(eid, F.lit(3)) == 0, F.array(e1))
            .otherwise(F.array(e1, e2)).alias("stateHistory"),
            F.array(
                F.struct(
                    F.concat(F.lit("f-"), eid.cast("string"), F.lit(".pdf")).alias("fileName"),
                    eid.cast("string").alias("id"),
                )
            ).alias("attachments"),
        )

    out = _run_athena(
        spark, sf_dir, "verifications", "old_verifications_src", payload
    )
    return out.select(
        "stack", "instance", "objecttype", "changetype",
        "changetimestamp", "snapshottimestamp", "userid",
        F.col("snapshot.id").alias("ver_id"),
        F.col("snapshot.createdOn").alias("created_ms"),
        F.element_at("snapshot.emails", 1).alias("email"),
        F.col("snapshot.location").alias("location"),
        F.col("snapshot.orcid").alias("orcid"),
        F.size("snapshot.stateHistory").alias("n_history"),
        F.element_at("snapshot.stateHistory", 1)["createdOn"].alias("sh1_created_ms"),
        F.element_at("snapshot.stateHistory", 1)["state"].alias("sh1_state"),
        F.element_at("snapshot.stateHistory", -1)["createdOn"].alias("shl_created_ms"),
        F.element_at("snapshot.stateHistory", -1)["state"].alias("shl_state"),
        F.element_at("snapshot.stateHistory", -1)["reason"].alias("shl_reason"),
        F.element_at("snapshot.attachments", 1)["fileName"].alias("att_name"),
        F.element_at("snapshot.attachments", 1)["id"].alias("att_id"),
        "year", "month", "day",
    )


def q_backfill_old_dwh_downloads(spark, sf_dir) -> DataFrame:
    """The old-data-warehouse file-download backfill end to end
    (jobs/backfill_file_downloads.py; reference
    backfill_old_dataware_house_file_download_records.py:89-181): bulk
    source's fileSummary array parsed + exploded + ^SUCCESS-filtered,
    single-download source's downloadedFile struct parsed, common
    envelope fields injected, the two streams unioned and written
    record_date-partitioned."""
    from synapse_etl_jobs_spark.jobs.backfill_file_downloads import (
        backfill_old_dwh_file_downloads,
    )

    ev = _t(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    bulk = ev.filter(F.pmod(eid, F.lit(2)) == 0).select(
        ms.alias("timestamp"),
        F.to_json(F.struct(
            uid.alias("userId"),
            eid.cast("string").alias("resultZipFileHandleId"),
            F.array(
                F.struct(
                    (eid * 10).cast("string").alias("fileHandleId"),
                    eid.cast("string").alias("associateObjectId"),
                    F.lit("FileEntity").alias("associateObjectType"),
                    F.lit("SUCCESS").alias("status"),
                ),
                F.struct(
                    (eid * 10 + 1).cast("string").alias("fileHandleId"),
                    eid.cast("string").alias("associateObjectId"),
                    F.lit("TableEntity").alias("associateObjectType"),
                    F.when(F.pmod(eid, F.lit(3)) == 0, F.lit("FAILURE"))
                    .otherwise(F.lit("SUCCESSFUL")).alias("status"),
                ),
            ).alias("fileSummary"),
        )).alias("json"),
    )
    single = ev.filter(F.pmod(eid, F.lit(2)) == 1).select(
        ms.alias("timestamp"),
        F.to_json(F.struct(
            uid.alias("userId"),
            F.struct(
                eid.cast("string").alias("fileHandleId"),
                F.pmod(eid, F.lit(100)).cast("string").alias("associateObjectId"),
                F.lit("FileEntity").alias("associateObjectType"),
            ).alias("downloadedFile"),
        )).alias("json"),
    )
    dest = _tmpdir("olddwh_") + "/t"
    out = backfill_old_dwh_file_downloads(
        spark, bulk, single, dest, stack="prod", release_number="000000123",
    )
    return out.select(
        F.unix_millis("timestamp").alias("ts_ms"),
        "stack", "instance",
        F.col("record_date").cast("string").alias("record_date"),
        "user_id", "project_id", "downloaded_file_handle_id",
        "file_handle_id", "association_object_id", "association_object_type",
    )


def q_backfill_kinesis_downloads(spark, sf_dir) -> DataFrame:
    """The kinesis file-download backfill
    (jobs/backfill_file_downloads.py; reference
    backfill_kinesis_file_download_records.py:42-72): rename/cast
    mapping, null downloaded_file_handle_id, timestamp-derived
    record_date, partitioned write."""
    from synapse_etl_jobs_spark.jobs.backfill_file_downloads import (
        backfill_kinesis_file_downloads,
    )

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    src = ev.select(
        F.col("user_id").alias("userid"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.pmod(eid, F.lit(100)).alias("projectid"),
        eid.cast("string").alias("filehandleid"),
        F.lit("FileEntity").alias("associatetype"),
        eid.cast("string").alias("associateid"),
        F.lit("prod").alias("stack"),
        F.lit("123").alias("instance"),
    )
    dest = _tmpdir("kinesis_") + "/t"
    out = backfill_kinesis_file_downloads(spark, src, dest)
    return out.select(
        F.unix_millis("timestamp").alias("ts_ms"),
        "stack", "instance",
        F.col("record_date").cast("string").alias("record_date"),
        "user_id", "project_id", "downloaded_file_handle_id",
        "file_handle_id", "association_object_id", "association_object_type",
    )


def q_backfill_access_records(spark, sf_dir) -> DataFrame:
    """The access-record backfill end to end (jobs/backfill_access.py;
    reference backfill_process_access_record.py:17-88): 23 flat
    old-warehouse string columns folded INTO the typed ``payload``
    struct, stack/instance/timestamp promoted to the envelope, year +
    zero-padded month/day partition fields, gzip-JSON write, read back.
    All source columns arrive as STRINGS (the reference's CSV table) so
    the struct casts are exercised."""
    from synapse_etl_jobs_spark.jobs.backfill_access import backfill_access_records

    ev = _t(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    s = lambda c: c.cast("string")  # noqa: E731
    src = ev.select(
        F.concat(F.lit("sess-"), s(eid)).alias("session_id"),
        s(ms).alias("timestamp"),
        s(uid).alias("user_id"),
        F.when(F.pmod(eid, F.lit(2)) == 0, "GET").otherwise("POST").alias("method"),
        F.concat(F.lit("/repo/v1/entity/syn"), s(eid)).alias("request_url"),
        F.lit("Synapse-Java-Client/372.0").alias("user_agent"),
        F.lit("repo-prod.prod.sagebase.org").alias("host"),
        F.when(F.pmod(eid, F.lit(5)) != 0, F.lit("https://www.synapse.org")).alias("origin"),
        F.lit("1.1 example").alias("via"),
        s(F.pmod(eid, F.lit(64))).alias("thread_id"),
        s(F.pmod(eid, F.lit(900)) + 3).alias("elapse_ms"),
        F.when(F.pmod(eid, F.lit(11)) == 0, "false").otherwise("true").alias("success"),
        F.lit("prod").alias("stack"),
        F.lit("000000123").alias("instance"),
        F.date_format("ts", "yyyy-MM-dd").alias("date"),
        F.concat(F.lit("vm-"), s(F.pmod(eid, F.lit(7)))).alias("vm_id"),
        s(eid).alias("return_object_id"),
        F.when(F.pmod(eid, F.lit(3)) == 0, F.lit("limit=20")).alias("query_string"),
        F.when(F.pmod(eid, F.lit(11)) == 0, "500").otherwise("200").alias("response_status"),
        F.lit(None).cast("string").alias("oauth_client_id"),
        F.lit(None).cast("string").alias("basic_auth_username"),
        F.lit("bearertoken").alias("auth_method"),
        F.lit("10.0.0.1").alias("x_forwarded_for"),
    )
    dest = _tmpdir("backfill_acc_") + "/json"
    out = backfill_access_records(spark, src, dest)
    return out.select(
        F.col("payload.sessionId").alias("session_id"),
        F.col("payload.timestamp").alias("payload_ms"),
        F.col("payload.userId").alias("payload_user_id"),
        F.col("payload.method").alias("method"),
        F.col("payload.requestURL").alias("request_url"),
        F.col("payload.origin").alias("origin"),
        F.col("payload.threadId").alias("thread_id"),
        F.col("payload.elapseMS").alias("elapse_ms"),
        F.col("payload.success").alias("success"),
        F.col("payload.responseStatus").alias("response_status"),
        F.col("payload.date").alias("payload_date"),
        "stack", "instance",
        F.col("timestamp").alias("ts_ms"),
    )


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC lake merge at sf0.001."""
    return q_cdc_lake_merge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_final_state": q_cdc_final_state,
        "cdc_final_state_salted": q_cdc_final_state_salted,
        "cdc_lake_merge": q_cdc_lake_merge,
        "incremental_agg_view": q_incremental_agg_view,
        "stream_interval_join": q_stream_interval_join,
        "lake_point_lookup": q_lake_point_lookup,
        "apply_mapping": q_apply_mapping,
        "filter_rlike": q_filter_rlike,
        "union_conformed": q_union_conformed,
        "explode_tokens": q_explode_tokens,
        "first_token": q_first_token,
        "change_type_derivation": q_change_type_derivation,
        "syn_id_parse": q_syn_id_parse,
        "partition_dates": q_partition_dates,
        "instance_strip": q_instance_strip,
        "access_normalize": q_access_normalize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "broadcast_dim_join": q_broadcast_dim_join,
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
        "repetition_features": q_repetition_features,
        "gopher_rules": q_gopher_rules,
        "mask_pii": q_mask_pii,
        "hash_split": q_hash_split,
        "chunk_documents": q_chunk_documents,
        "decontaminate": q_decontaminate,
        "document_frequency": q_document_frequency,
        "tf_idf_topk": q_tf_idf_topk,
        "pack_sequences": q_pack_sequences,
        "weighted_mix": q_weighted_mix,
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "ngram_jaccard_adjacent": q_ngram_jaccard_adjacent,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "doc_fingerprint": q_doc_fingerprint,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_lsh": q_ann_lsh,
        "ann_ivf_full": q_ann_ivf_full,
        "ann_ivf": q_ann_ivf,
        "media_plumbing": q_media_plumbing,
        "media_dedup": q_media_dedup,
        "embedding_quantize": q_embedding_quantize,
        "embedding_neardup_pairs": q_embedding_neardup_pairs,
        "embedding_dedup": q_embedding_dedup,
        "embedding_dedup_lsh": q_embedding_dedup_lsh,
        "embedding_dedup_incremental": q_embedding_dedup_incremental,
        "client_detection": q_client_detection,
        "client_version": q_client_version,
        "url_decode": q_url_decode,
        "reshape_array": q_reshape_array,
        "window_topk": q_window_topk,
        "group_percentiles": q_group_percentiles,
        "rollup_grouping_sets": q_rollup_grouping_sets,
        "heavy_hitters": q_heavy_hitters,
        "pivot_events": q_pivot_events,
        "iso8601_roundtrip": q_iso8601_roundtrip,
        "json_gzip_roundtrip": q_json_gzip_roundtrip,
        "csv_roundtrip": q_csv_roundtrip,
        "json_quarantine": q_json_quarantine,
        "filename_to_date": q_filename_to_date,
        "cdc_lake_merge_mor": q_cdc_lake_merge_mor,
        "cdc_replay_maintained": q_cdc_replay_maintained,
        "cdc_row_maintenance": q_cdc_row_maintenance,
        "cdc_replication": q_cdc_replication,
        "cdc_replication_filtered": q_cdc_replication_filtered,
        "lake_schema_evolution": q_lake_schema_evolution,
        "lake_point_scan": q_lake_point_scan,
        "lake_zorder_scan": q_lake_zorder_scan,
        "cdc_patch_merge": q_cdc_patch_merge,
        "cdc_patch_merge_ooo": q_cdc_patch_merge_ooo,
        "cdc_replication_patch": q_cdc_replication_patch,
        "lake_clone": q_lake_clone,
        "lake_rollback": q_lake_rollback,
        "lake_rebucket": q_lake_rebucket,
        "lake_time_travel": q_lake_time_travel,
        "lake_changes": q_lake_changes,
        "datasource_read": q_datasource_read,
        "datasource_point_scan": q_datasource_point_scan,
        "rollup_cascade": q_rollup_cascade,
        "distinct_sketch": q_distinct_sketch,
        "tumbling_window": q_tumbling_window,
        "sliding_window": q_sliding_window,
        "session_window": q_session_window,
        "simhash_near_pairs": q_simhash_near_pairs,
        "minhash_dedup_full": q_minhash_dedup_full,
        "connected_components": q_connected_components,
        "minhash_dedup_cc": q_minhash_dedup_cc,
        "minhash_dedup_incremental": q_minhash_dedup_incremental,
        "repeated_spans": q_repeated_spans,
        "duplication_stats": q_duplication_stats,
        "dedup_stream_state": q_dedup_stream_state,
        "catalog_pushdown_scan": q_catalog_pushdown_scan,
        "sql_insert_envelope": q_sql_insert_envelope,
        "node_snapshots_job": q_node_snapshots_job,
        "access_record_job": q_access_record_job,
        "user_profile_job": q_user_profile_job,
        "quiz_question_job": q_quiz_question_job,
        "file_download_job": q_file_download_job,
        "certified_quiz_job": q_certified_quiz_job,
        "team_member_job": q_team_member_job,
        "backfill_node_snapshots": q_backfill_node_snapshots,
        "backfill_usergroup": q_backfill_usergroup,
        "backfill_team": q_backfill_team,
        "backfill_team_member": q_backfill_team_member,
        "backfill_userprofile": q_backfill_userprofile,
        "backfill_verifications": q_backfill_verifications,
        "backfill_old_dwh_downloads": q_backfill_old_dwh_downloads,
        "backfill_kinesis_downloads": q_backfill_kinesis_downloads,
        "backfill_access_records": q_backfill_access_records,
    }


_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"

# ---- portable-hash SQL building blocks (mirror operators.text.md5_hash48
# and the simhash/fingerprint formulas exactly) --------------------------

# 48-bit hash: first 12 hex chars of md5 parsed base-16 (DuckDB has no
# conv(); list_reduce over hex digit values is the equivalent)
_MD5H48 = (
    "list_reduce(list_transform(range(1, 13), i -> CAST(strpos("
    "'0123456789abcdef', substring(md5({x}), CAST(i AS INT), 1)) - 1 "
    "AS BIGINT)), (a, b) -> a * 16 + b)"
)

_DOC_AUG = """
  SELECT doc_id, text, lang, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text, lang, n_chars FROM documents
"""


def _shingle_set_sql(k: int) -> str:
    """Sorted distinct k-char shingle list of ``text`` (set-equality key:
    two docs have Jaccard 1.0 iff these lists are equal)."""
    return (
        "list_sort(list_distinct(list_transform("
        f"range(1, greatest(length(text) - {k - 1}, 1) + 1), "
        f"i -> substring(text, CAST(i AS INT), {k}))))"
    )


def _simhash_sig_cte(bits: int = 48) -> str:
    """CTE chain ending in ``sig(doc_id, simhash)`` — the md5-hash48
    SimHash, bit-for-bit the plan ``simhash_signatures(bits=48,
    token_hash=md5_hash48)`` computes."""
    votes = ", ".join(
        f"sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE 0 END) AS b{b}"
        for b in range(bits)
    )
    pack = " + ".join(
        f"(CASE WHEN b{b} * 2 > n THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    hx = _MD5H48.format(x="t.token")
    return f"""
ex AS (
  SELECT doc_id, {hx} AS h
  FROM documents, unnest({_TOKENS}) AS t(token)
  WHERE t.token <> ''
), sums AS (
  SELECT doc_id, count(*) AS n, {votes}
  FROM ex GROUP BY doc_id
), sig AS (
  SELECT d.doc_id, CAST(coalesce({pack}, 0) AS BIGINT) AS simhash
  FROM documents d LEFT JOIN sums USING (doc_id)
)"""


_MINHASH_DUP_PAIRS_ORACLE = f"""
WITH aug AS ({_DOC_AUG}),
sh AS (SELECT doc_id, {_shingle_set_sql(5)} AS s FROM aug)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
"""

def _span_oracle_ctes(k: int) -> str:
    """CTE chain ending in ``isl(doc_id, pos, g)`` — the md5-hash48
    repeated-shingle islands over the concat-augmented corpus, matching
    ``repeated_spans(k=k, min_count=2, token_hash=md5_hash48)``."""
    # position variable MUST NOT be named ``i`` — _MD5H48's internal
    # list_transform lambda uses ``i`` and would shadow it silently
    shingle = _MD5H48.format(
        x=f"array_to_string(list_slice(t, p, p + {k - 1}), ' ')"
    )
    return f"""
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT a.doc_id + 10000000,
         a.text || ' uniqsep' || CAST(a.doc_id AS VARCHAR) || ' ' || b.text
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
toks AS (
  SELECT doc_id, list_filter({_TOKENS}, x -> x <> '') AS t FROM aug
),
sh AS (
  SELECT doc_id, CAST(p - 1 AS INT) AS pos, {shingle} AS h
  FROM toks, unnest(range(1, greatest(len(t) - {k} + 2, 1))) AS r(p)
),
dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2),
rep AS (SELECT doc_id, pos FROM sh WHERE h IN (SELECT h FROM dup)),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
              <= {k} THEN 0 ELSE 1 END AS brk
  FROM rep
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM marked
)"""


_REPEATED_SPANS_ORACLE = f"""
WITH {_span_oracle_ctes(6)}
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + 6 AS INT) AS span_end,
       count(*) AS n_shingles
FROM isl GROUP BY doc_id, g
"""

_DUPLICATION_STATS_ORACLE = f"""
WITH {_span_oracle_ctes(6)},
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 6 AS e
  FROM isl GROUP BY doc_id, g
),
per AS (SELECT doc_id, sum(e - s) AS dup FROM spans GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       CAST(least(coalesce(p.dup, 0), len(t.t)) AS BIGINT) AS dup_tokens,
       round(least(coalesce(p.dup, 0), len(t.t)) * 1.0
             / greatest(len(t.t), 1), 6) AS dup_fraction
FROM toks t LEFT JOIN per p USING (doc_id)
"""

_MINHASH_INCREMENTAL_ORACLE = f"""
WITH corp AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0
), newb AS (
  SELECT doc_id, text, lang, n_chars FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 10000000, text, lang, n_chars FROM documents
  WHERE doc_id % 4 <> 0 AND doc_id % 8 = 1
  UNION ALL
  SELECT doc_id + 20000000, text, lang, n_chars FROM documents
  WHERE doc_id % 4 = 0 AND doc_id % 8 = 0
),
shc AS (SELECT {_shingle_set_sql(5)} AS s FROM corp),
shn AS (SELECT doc_id, lang, n_chars, {_shingle_set_sql(5)} AS s FROM newb)
SELECT doc_id, lang, n_chars FROM shn a
WHERE NOT EXISTS (SELECT 1 FROM shc c WHERE c.s = a.s)
  AND NOT EXISTS (
    SELECT 1 FROM shn o WHERE o.s = a.s AND o.doc_id < a.doc_id
  )
"""

_MINHASH_DEDUP_ORACLE = f"""
WITH aug AS ({_DOC_AUG}),
sh AS (SELECT doc_id, lang, n_chars, {_shingle_set_sql(5)} AS s FROM aug)
SELECT doc_id, lang, n_chars FROM sh a
WHERE NOT EXISTS (
  SELECT 1 FROM sh o WHERE o.s = a.s AND o.doc_id < a.doc_id
)
"""

# exact copies at +1M and +2M: top-2 per query is deterministically the
# two copies (sim 1.0, id-ordered), which every signature/cell scheme
# must find — gates the approximate ANN paths with the exact oracle
_EMB_AUG2 = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) FROM embeddings
  UNION ALL
  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[]) FROM embeddings
"""

_ANN_COPY_ORACLE = f"""
WITH aug AS ({_EMB_AUG2}),
q AS (SELECT vec_id AS query_id, v AS qv FROM aug WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qv, c.v), 6) AS sim
  FROM q JOIN aug c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 2
"""
_LANG_SCORE = (
    "len(list_filter({toks}, x -> list_contains({words}, lower(x))))"
)


def _lang_scores_sql() -> dict[str, str]:
    from synapse_etl_jobs_spark.operators.text import LANG_MARKERS, _is_char_markers

    out = {}
    for lang, words in LANG_MARKERS.items():
        if _is_char_markers(words):
            # character-occurrence scoring (mirrors language_scores)
            out[lang] = " + ".join(
                f"(length(text) - length(replace(text, '{w}', '')))" for w in words
            )
        else:
            wl = "[" + ", ".join(f"'{w}'" for w in words) + "]"
            out[lang] = _LANG_SCORE.format(toks=_TOKENS, words=wl)
    return out


_FTOKS = f"list_filter({_TOKENS}, x -> x <> '')"
_LINES = "list_filter(regexp_split_to_array(text, '\\n'), x -> trim(x) <> '')"
# repetition features (shared by repetition_features + gopher_rules)
_REP_CTE = f"""
tk AS (SELECT doc_id, {_FTOKS} AS toks, {_LINES} AS lns FROM documents),
cnt AS (SELECT doc_id, t.x AS token, count(*) AS c
        FROM tk, unnest(toks) AS t(x) GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY 1),
rep AS (
  SELECT tk.doc_id,
         round((len(lns) - len(list_distinct(lns))) / greatest(CAST(len(lns) AS DOUBLE), 1.0), 6) AS dup_line_frac,
         round((len(toks) - len(list_distinct(toks))) / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS dup_token_frac,
         round(coalesce(topc, 0) / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS top_token_frac
  FROM tk LEFT JOIN top ON tk.doc_id = top.doc_id
)"""


def oracle_sql() -> dict[str, str]:
    scores = _lang_scores_sql()
    best = "greatest(" + ", ".join(f"s_{l}" for l in scores) + ")"
    lang_case = "CASE " + " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in scores
    ) + " ELSE 'und' END"
    shingles3 = (
        "list_distinct(list_transform(range(1, greatest(length(text)-2, 1)+1), "
        "i -> substring(text, CAST(i AS INT), 3)))"
    )

    oracles = {
        "cdc_final_state": _CDC_ORACLE,
        "cdc_final_state_salted": _CDC_ORACLE,
        "cdc_lake_merge": _CDC_ORACLE,
        "lake_point_lookup": f"""
            WITH final_state AS ({_CDC_ORACLE})
            SELECT user_id, event_type, value
            FROM final_state WHERE user_id IN (1, 2, 3)
        """,
        "stream_interval_join": """
            SELECT v.user_id,
                   v.event_id AS view_event,
                   b.event_id AS buy_event,
                   epoch_ms(v.ts) AS view_ms,
                   epoch_ms(b.ts) AS buy_ms
            FROM events v JOIN events b
              ON v.user_id = b.user_id
             AND b.ts BETWEEN v.ts AND v.ts + INTERVAL 30 MINUTE
            WHERE v.event_type = 'view' AND b.event_type = 'purchase'
        """,
        "incremental_agg_view": f"""
            WITH final_state AS ({_CDC_ORACLE})
            SELECT event_type,
                   count(*) AS n_rows,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM final_state GROUP BY event_type
        """,
        "apply_mapping": """
            SELECT event_id AS id, epoch_ms(ts) AS ts_ms, user_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   strftime(ts, '%Y-%m-%d') AS record_date
            FROM events
        """,
        "filter_rlike": """
            SELECT event_id, event_type, round(value, 2) AS value
            FROM events
            WHERE regexp_matches(event_type, '^(click|view)$') AND value > 100
        """,
        "union_conformed": """
            WITH u AS (
              SELECT o_orderkey AS okey, o_totalprice AS total, 'high' AS band
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              UNION ALL
              SELECT o_orderkey, o_totalprice, 'low'
              FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            )
            SELECT band, count(*) AS n, round(sum(total), 2) AS revenue
            FROM u GROUP BY band
        """,
        "explode_tokens": f"""
            SELECT doc_id, t.token
            FROM documents, unnest({_TOKENS}) AS t(token)
            WHERE t.token <> ''
        """,
        "first_token": f"""
            SELECT doc_id,
                   CASE WHEN len(list_filter({_TOKENS}, x -> x <> '')) > 0
                        THEN (list_filter({_TOKENS}, x -> x <> ''))[1] END AS first_token
            FROM documents
        """,
        "change_type_derivation": """
            WITH d AS (
              SELECT epoch_ms(ts) AS changed_ms,
                     min(epoch_ms(ts)) OVER (PARTITION BY user_id) AS created_ms
              FROM events
            )
            SELECT CASE WHEN changed_ms - created_ms >= 1000 THEN 'UPDATE'
                        ELSE 'CREATE' END AS change_type,
                   count(*) AS n
            FROM d GROUP BY 1
        """,
        "syn_id_parse": """
            SELECT o_orderkey,
                   'syn' || CAST(o_orderkey AS VARCHAR) || '.1' AS syn_str,
                   CAST(regexp_extract('syn' || CAST(o_orderkey AS VARCHAR) || '.1',
                        '^(?:syn)?(\\d+)(?:\\.\\d+)?$', 1) AS BIGINT) AS parsed
            FROM orders
        """,
        "partition_dates": """
            SELECT strftime(ts, '%Y-%m-%d') AS record_date,
                   strftime(ts, '%Y') AS year,
                   strftime(ts, '%m') AS month,
                   strftime(ts, '%d') AS day,
                   count(*) AS n
            FROM events GROUP BY 1, 2, 3, 4
        """,
        "instance_strip": """
            SELECT c_custkey,
                   lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS instance,
                   regexp_replace(lpad(CAST(c_custkey AS VARCHAR), 9, '0'), '^0+', '') AS stripped
            FROM customer
        """,
        "access_normalize": """
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN 'INVALID URL'
                        ELSE '/entity/#/wiki/#' END AS signature,
                   o_orderkey AS entity_id
            FROM orders
        """,
        "asof_join": """
            WITH l AS (
              SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
            ), r AS (
              SELECT user_id, epoch_ms(ts) AS uts, max(round(value, 2)) AS uval
              FROM events WHERE event_id % 20 = 0
              GROUP BY user_id, epoch_ms(ts)
            )
            SELECT l.event_id, l.user_id, l.ts_ms,
                   CAST(r.uts AS DOUBLE) AS uts_r, r.uval AS uval_r
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts_ms >= r.uts
        """,
        "range_join": """
            SELECT e.event_id, round(e.value, 2) AS value,
                   n.n_nationkey, n.n_name
            FROM events e JOIN nation n
              ON round(e.value, 2) >= n.n_nationkey * 40.0
             AND round(e.value, 2) <= n.n_nationkey * 40.0 + 39.99
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 10
        """,
        "broadcast_dim_join": """
            SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "dedup_exact": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        """,
        "text_quality": f"""
            SELECT doc_id,
                   length(text) AS n_char,
                   len(list_filter({_TOKENS}, x -> x <> '')) AS n_tokens,
                   round(length(text) / greatest(CAST(greatest(len(list_filter({_TOKENS}, x -> x <> '')), 1) AS DOUBLE), 1.0), 6) AS mean_token_len,
                   round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS digit_ratio,
                   round(len(list_filter({_TOKENS}, x -> list_contains(['the','and','of','to','in','is','that','with','for','a'], lower(x)))) / greatest(CAST(greatest(len(list_filter({_TOKENS}, x -> x <> '')), 1) AS DOUBLE), 1.0), 6) AS stopword_ratio
            FROM documents
        """,
        "lang_id": (
            "SELECT doc_id, lang, " + lang_case + " AS lang_pred FROM ("
            + "SELECT doc_id, lang, "
            + ", ".join(f"{expr} AS s_{l}" for l, expr in scores.items())
            + " FROM documents)"
        ),
        "document_frequency": """
            WITH t AS (
              SELECT doc_id,
                     unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
              FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents)
            SELECT term, doc_freq,
                   round(ln((n.n + 1.0) / (doc_freq + 1.0)) + 1.0, 6) AS idf
            FROM dfq, n
        """,
        "tf_idf_topk": """
            WITH t AS (
              SELECT doc_id,
                     unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
              FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            idf AS (
              SELECT term,
                     round(ln((n.n + 1.0) / (doc_freq + 1.0)) + 1.0, 6) AS idf
              FROM dfq, n
            ),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     round(tf.tf * idf.idf, 6) AS score
              FROM tf JOIN idf USING (term)
            ),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term ASC
                     ) AS kw_rank,
                     term, tf, score
              FROM scored
            )
            SELECT doc_id, kw_rank, term, tf, score
            FROM ranked WHERE kw_rank <= 5
        """,
        "chunk_documents": """
            WITH c AS (
              SELECT doc_id,
                     i.i AS k
              FROM documents,
                   unnest(range(0,
                     CAST(ceil(greatest(length(text) - 200, 0) / 150.0) AS BIGINT) + 1
                   )) AS i(i)
              WHERE length(text) > 0
            )
            SELECT c.doc_id,
                   CAST(c.k AS INT) AS chunk_idx,
                   c.k * 150 + 1 AS chunk_start,
                   substring(d.text, CAST(c.k * 150 + 1 AS INT), 200) AS chunk_text
            FROM c JOIN documents d ON c.doc_id = d.doc_id
        """,
        "decontaminate": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter({_TOKENS}, t -> t <> '') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_filter(list_transform(
                       range(1, greatest(len(toks) - 7, 1) + 1),
                       i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 7 AS INT)), ' ')
                     ), x -> x <> '')) AS grams
              FROM tok
            ), bench AS (
              SELECT DISTINCT {_MD5H48.format(x="u.gram")} AS gh
              FROM g, unnest(grams) AS u(gram)
              WHERE doc_id % 50 = 0
            ), train AS (
              SELECT doc_id, len(grams) AS n_grams, grams
              FROM g WHERE doc_id % 50 <> 0
            ), ex AS (
              SELECT t.doc_id, {_MD5H48.format(x="u.gram")} AS gh
              FROM train t, unnest(t.grams) AS u(gram)
            ), m AS (
              SELECT ex.doc_id, count(b.gh) AS n_matched
              FROM ex LEFT JOIN bench b USING (gh)
              GROUP BY ex.doc_id
            )
            SELECT t.doc_id,
                   t.n_grams,
                   CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
                   coalesce(m.n_matched, 0) >= 1 AS contaminated
            FROM train t LEFT JOIN m ON t.doc_id = m.doc_id
        """,
        "pack_sequences": f"""
            WITH t AS (
              SELECT doc_id,
                     len(list_filter({_TOKENS}, x -> x <> '')) AS n_tokens
              FROM documents
            ), p AS (
              SELECT doc_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS prior
              FROM t
            )
            SELECT doc_id,
                   CAST(n_tokens AS INT) AS n_tokens,
                   CAST(prior // 2048 AS BIGINT) AS pack_id,
                   CAST(prior % 2048 AS BIGINT) AS pack_offset
            FROM p
        """,
        "weighted_mix": f"""
            WITH r AS (
              SELECT doc_id, lang,
                     {_MD5H48.format(x="'42' || chr(31) || CAST(doc_id AS VARCHAR)")}
                       % 1000000 AS rh
              FROM documents
            ), c AS (
              SELECT doc_id, lang,
                     CASE WHEN lang = 'en'
                            THEN 2 + CASE WHEN rh < 500000 THEN 1 ELSE 0 END
                          WHEN lang = 'zh'
                            THEN CASE WHEN rh < 500000 THEN 1 ELSE 0 END
                          ELSE 1 END AS n
              FROM r
            )
            SELECT doc_id, lang, CAST(u.i AS INT) AS copy_idx
            FROM c, unnest(range(0, n)) AS u(i)
            WHERE n > 0
        """,
        "mask_pii": """
            WITH r AS (
              SELECT c_custkey,
                     'contact u' || CAST(c_custkey AS VARCHAR)
                     || '@mail.example.org or call +1 555-010'
                     || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')
                     || ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR)
                     || '.7 done' AS raw
              FROM customer
            )
            SELECT c_custkey, raw,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(raw,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                     '\\+?\\d[\\d\\-\\(\\) ]{7,}\\d', '<PHONE>', 'g'
                   ) AS masked
            FROM r
        """,
        "hash_split": f"""
            SELECT doc_id,
                   CASE WHEN {_MD5H48.format(x="CAST(doc_id AS VARCHAR)")} % 10 < 8
                        THEN 'train'
                        WHEN {_MD5H48.format(x="CAST(doc_id AS VARCHAR)")} % 10 = 8
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "repetition_features": f"""
            WITH {_REP_CTE}
            SELECT doc_id, dup_line_frac, dup_token_frac, top_token_frac
            FROM rep
        """,
        "gopher_rules": f"""
            WITH {_REP_CTE},
            f AS (
              SELECT doc_id,
                     len(list_filter({_TOKENS}, x -> x <> '')) AS n_tokens,
                     round(length(text) / greatest(CAST(greatest(len(list_filter({_TOKENS}, x -> x <> '')), 1) AS DOUBLE), 1.0), 6) AS mean_token_len,
                     round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
                     round(len(list_filter({_TOKENS}, x -> list_contains(['the','and','of','to','in','is','that','with','for','a'], lower(x)))) / greatest(CAST(greatest(len(list_filter({_TOKENS}, x -> x <> '')), 1) AS DOUBLE), 1.0), 6) AS stopword_ratio
              FROM documents
            ),
            g AS (
              SELECT f.doc_id, n_tokens, dup_line_frac, top_token_frac,
                     (n_tokens < 50) AS c1, (n_tokens > 100000) AS c2,
                     (mean_token_len < 3.0) AS c3, (mean_token_len > 10.0) AS c4,
                     (punct_ratio > 0.2) AS c5, (stopword_ratio < 0.02) AS c6,
                     (dup_line_frac > 0.3) AS c7, (top_token_frac > 0.2) AS c8
              FROM f JOIN rep ON f.doc_id = rep.doc_id
            )
            SELECT doc_id, n_tokens, dup_line_frac, top_token_frac,
                   NOT (c1 OR c2 OR c3 OR c4 OR c5 OR c6 OR c7 OR c8) AS keep,
                   CASE WHEN c1 THEN 'too_few_tokens'
                        WHEN c2 THEN 'too_many_tokens'
                        WHEN c3 THEN 'mean_token_len_low'
                        WHEN c4 THEN 'mean_token_len_high'
                        WHEN c5 THEN 'punct_ratio_high'
                        WHEN c6 THEN 'stopword_ratio_low'
                        WHEN c7 THEN 'dup_lines_high'
                        WHEN c8 THEN 'top_token_high'
                   END AS drop_reason
            FROM g
        """,
        "token_counts": f"""
            SELECT doc_id, len(list_filter({_TOKENS}, x -> x <> '')) AS n_tokens
            FROM documents
        """,
        "ngram_jaccard_adjacent": f"""
            WITH sh AS (SELECT doc_id, {shingles3} AS s FROM documents),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
            )
            SELECT id_a, id_b,
                   round(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                         / greatest(CAST(len(list_distinct(list_concat(sa, sb))) AS DOUBLE), 1.0), 6) AS jaccard
            FROM pairs
        """,
        "ann_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim
              FROM q JOIN embeddings c ON c.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "ann_ivf_full": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim
              FROM q JOIN embeddings c ON c.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "media_plumbing": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS content_hash
            FROM documents
        """,
        "media_dedup": """
            WITH media AS (
              SELECT doc_id AS media_id,
                     CASE WHEN doc_id % 7 = 0 AND doc_id > 0
                          THEN lag(text, 1) OVER (ORDER BY doc_id)
                          ELSE text END AS content
              FROM documents
            ),
            keep AS (
              SELECT min(media_id) AS media_id FROM media GROUP BY sha256(content)
            )
            SELECT media_id FROM keep
        """,
        "embedding_quantize": """
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
            ), s AS (
              SELECT vec_id, ve,
                     list_max(list_transform(ve, x -> abs(x))) AS amax
              FROM v
            ), q AS (
              SELECT vec_id, ve, amax,
                     coalesce(amax, 0) / 127.0 AS scale,
                     CASE WHEN coalesce(amax, 0) = 0
                          THEN list_transform(ve, x -> 0)
                          ELSE list_transform(ve, x -> CAST(round(x * 127.0 / amax) AS INT))
                     END AS codes
              FROM s
            )
            SELECT vec_id,
                   round(scale, 6) AS q_scale,
                   codes[1] AS q_first,
                   codes[len(codes)] AS q_last,
                   round(list_cosine_similarity(ve,
                         list_transform(codes, c -> c * scale)), 4) AS recon_cos
            FROM q
        """,
        "embedding_neardup_pairs": f"""
            WITH aug AS ({_EMB_AUG})
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS sim
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.99
        """,
        "embedding_dedup": _EMB_DEDUP_ORACLE,
        "embedding_dedup_lsh": _EMB_DEDUP_ORACLE,
        "embedding_dedup_incremental": _EMB_INCREMENTAL_ORACLE,
        "client_detection": f"""
            SELECT c_custkey, {_ua_case_sql(0)} AS user_agent,
                   {_ua_case_sql(1)} AS client
            FROM customer
        """,
        "client_version": f"""
            SELECT c_custkey, {_ua_case_sql(1)} AS client,
                   {_ua_case_sql(2)} AS client_version
            FROM customer
        """,
        "url_decode": """
            SELECT c_custkey,
                   'path%20with%09tabs/' || CAST(c_custkey AS VARCHAR) || '%0A end' AS raw_url,
                   'pathwithtabs/' || CAST(c_custkey AS VARCHAR) || 'end' AS decoded
            FROM customer
        """,
        "reshape_array": """
            SELECT event_id, CAST(t.x AS INT) AS idx, CAST(t.x * t.x AS INT) AS sq
            FROM events, unnest(range(1, event_id % 4 + 2)) AS t(x)
            WHERE event_id < 2000
        """,
        "window_topk": """
            WITH ranked AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id ASC) AS rnk
              FROM events
            )
            SELECT user_id, event_id, round(value, 2) AS value, CAST(rnk AS INT) AS rnk
            FROM ranked WHERE rnk <= 3
        """,
        "group_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   round(quantile_cont(value, 0.99), 6) AS p99,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "pivot_events": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS n_click,
                   count(*) FILTER (event_type = 'view')     AS n_view,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup')   AS n_signup,
                   count(*) FILTER (event_type = 'error')    AS n_error
            FROM events GROUP BY user_id
        """,
        "heavy_hitters": """
            SELECT user_id, count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "rollup_grouping_sets": """
            SELECT o_orderpriority, o_orderstatus,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price,
                   CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "iso8601_roundtrip": """
            SELECT event_id,
                   strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ') AS iso,
                   epoch_ms(date_trunc('second', ts)) AS epoch_ms,
                   epoch_ms(date_trunc('second', ts)) AS parsed_ms
            FROM events
        """,
        "json_gzip_roundtrip": """
            SELECT event_id, user_id, event_type FROM events
        """,
        "csv_roundtrip": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal FROM customer
        """,
        "json_quarantine": """
            SELECT event_id, user_id FROM events
        """,
        "filename_to_date": """
            SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS record_date
            FROM events
        """,
        "minhash_lsh_pairs": _MINHASH_DUP_PAIRS_ORACLE,
        "minhash_dedup_full": _MINHASH_DEDUP_ORACLE,
        "minhash_dedup_cc": _MINHASH_DEDUP_ORACLE,
        "minhash_dedup_incremental": _MINHASH_INCREMENTAL_ORACLE,
        "repeated_spans": _REPEATED_SPANS_ORACLE,
        "duplication_stats": _DUPLICATION_STATS_ORACLE,
        # the streaming path must land the SAME final state as one-shot
        # dedup over the union — equal-shingle-set min-id anti-join
        "dedup_stream_state": _MINHASH_DEDUP_ORACLE,
        "simhash": f"""
            WITH {_simhash_sig_cte(48)}
            SELECT doc_id, simhash FROM sig
        """,
        "simhash_near_pairs": f"""
            WITH {_simhash_sig_cte(48)}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
        """,
        "doc_fingerprint": f"""
            WITH toks AS (
              SELECT doc_id, list_filter({_TOKENS}, x -> x <> '') AS tk
              FROM documents
            ), h AS (
              SELECT doc_id,
                     list_transform(tk, t -> {_MD5H48.format(x="t")}) AS hs
              FROM toks
            ), w AS (
              SELECT doc_id, list_sort(list_distinct(list_filter(
                       list_transform(range(1, greatest(len(hs) - 7, 1) + 1),
                                      i -> list_min(list_slice(hs, i, i + 7))),
                       x -> x IS NOT NULL))) AS fp
              FROM h
            )
            SELECT doc_id, len(fp) AS n_fingerprints,
                   list_min(fp) AS fp_min, list_max(fp) AS fp_max
            FROM w
        """,
        "ann_lsh": _ANN_COPY_ORACLE,
        "ann_ivf": _ANN_COPY_ORACLE,
        "cdc_lake_merge_mor": _CDC_ORACLE,
        "cdc_replay_maintained": _CDC_ORACLE,
        "cdc_replication": _CDC_ORACLE,
        "cdc_replication_filtered": f"""
            WITH final_state AS ({_CDC_ORACLE})
            SELECT user_id, event_type, value, seq
            FROM final_state WHERE user_id % 4 = 1
        """,
        "cdc_row_maintenance": f"""
            WITH final_state AS ({_CDC_ORACLE})
            SELECT user_id, event_type,
                   CASE WHEN event_type = 'purchase' THEN value + 1
                        ELSE value END AS value
            FROM final_state
            WHERE event_type IS DISTINCT FROM 'click'
        """,
        "datasource_read": _CDC_ORACLE,
        "datasource_point_scan": """
WITH ev AS (
  SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
         event_id AS seq, user_id, event_type, round(value, 2) AS value
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM ev
)
SELECT user_id, event_type, value
FROM ranked WHERE rn = 1 AND op <> 'DELETE' AND user_id = 7
""",
        "lake_schema_evolution": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS val,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k
              FROM events
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM ev
            )
            SELECT user_id, event_type, val,
                   CASE WHEN seq > (SELECT max(event_id) // 2 FROM events) THEN k END AS k,
                   seq
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
        """,
        "lake_point_scan": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS value
              FROM events
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM ev
            )
            SELECT user_id, event_type, value
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
              AND user_id BETWEEN 1 AND 10
        """,
        "lake_zorder_scan": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS value
              FROM events
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM ev
            )
            SELECT user_id, event_type, value
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
              AND value BETWEEN 25.0 AND 75.0
        """,
        "cdc_patch_merge": """
            WITH ev AS (
              SELECT user_id, event_id AS seq,
                     CASE WHEN event_id % 11 = 0 THEN 'DELETE'
                          WHEN event_id % 3 = 0 THEN 'PATCH_ET'
                          WHEN event_id % 3 = 1 THEN 'PATCH_V'
                          ELSE 'UPSERT' END AS op,
                     event_type, round(value, 2) AS value
              FROM events
            ), d AS (
              SELECT user_id,
                     max(seq) FILTER (WHERE op = 'DELETE') AS del_seq
              FROM ev GROUP BY user_id
            ), live AS (
              SELECT e.* FROM ev e JOIN d USING (user_id)
              WHERE e.op <> 'DELETE' AND e.seq > coalesce(d.del_seq, -1)
            )
            SELECT user_id,
                   arg_max(event_type, seq)
                     FILTER (WHERE op IN ('UPSERT', 'PATCH_ET')) AS event_type,
                   arg_max(value, seq)
                     FILTER (WHERE op IN ('UPSERT', 'PATCH_V')) AS value
            FROM live GROUP BY user_id
        """,
        "lake_rebucket": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS value
              FROM events
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM ev
            )
            SELECT user_id, event_type, value
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
        """,
        "lake_rollback": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS value
              FROM events
              WHERE event_id <= (SELECT max(event_id) FROM events) // 2
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM ev
            )
            SELECT user_id, event_type, value
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
        """,
        "catalog_pushdown_scan": """
            SELECT event_id, event_type, round(value, 2) AS value,
                   strftime(ts, '%Y-%m-%d') AS record_date
            FROM events
            WHERE strftime(ts, '%d') <= '10' AND event_type = 'click'
        """,
        "sql_insert_envelope": """
            SELECT 'prod' AS stack,
                   CASE WHEN epoch_ms(ts) -
                             min(epoch_ms(ts)) OVER (PARTITION BY user_id) >= 1000
                        THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   epoch_ms(ts) AS change_timestamp,
                   user_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   event_type,
                   round(value, 2) AS value,
                   strftime(ts, '%Y') AS year,
                   strftime(ts, '%m') AS month,
                   strftime(ts, '%d') AS day
            FROM events
        """,
        "node_snapshots_job": """
            SELECT CASE WHEN value > 100 THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   epoch_ms(ts) AS change_ms,
                   user_id AS change_user_id,
                   epoch_ms(ts) AS snapshot_ms,
                   strftime(ts, '%Y-%m-%d') AS snapshot_date,
                   event_id AS id,
                   user_id AS benefactor_id,
                   event_id % 97 AS project_id,
                   event_id % 31 AS parent_id,
                   event_type AS node_type,
                   epoch_ms(ts) AS created_ms,
                   user_id AS created_by,
                   epoch_ms(ts) + 5000 AS modified_ms,
                   user_id AS modified_by,
                   event_id % 5 AS version_number,
                   event_id + 1 AS file_handle_id,
                   'node-' || CAST(event_id AS VARCHAR) AS name,
                   CAST(NULL AS VARCHAR) AS version_comment,
                   'v' || CAST(event_id % 5 AS VARCHAR) AS version_label,
                   CAST(NULL AS VARCHAR) AS alias,
                   event_id % 11 AS activity_id,
                   2 AS n_column_models,
                   1 AS n_scope_ids,
                   event_id % 3 AS first_item_version,
                   'syn' || CAST(event_id AS VARCHAR) AS reference_target,
                   event_id % 2 = 0 AS is_search_enabled,
                   CASE WHEN event_type = 'view'
                        THEN 'SELECT * FROM syn' || CAST(event_id AS VARCHAR)
                   END AS defining_sql,
                   user_id % 2 = 0 AS is_public,
                   user_id % 3 = 0 AS is_controlled,
                   user_id % 5 = 0 AS is_restricted,
                   1 AS n_effective_ars,
                   props AS annotations,
                   json_extract_string(props, '$.k') AS derived_annotations,
                   CAST(NULL AS VARCHAR) AS internal_annotations,
                   event_id % 3 + 1 AS n_version_history,
                   CAST(floor(value * 1000) AS BIGINT) AS storage_bytes
            FROM events
        """,
        "access_record_job": f"""
            SELECT 'sess-' || CAST(user_id AS VARCHAR) AS session_id,
                   epoch_ms(ts) AS ts_ms,
                   strftime(ts, '%Y-%m-%d') AS record_date,
                   user_id,
                   CASE WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END AS method,
                   CASE WHEN event_id % 3 = 0
                        THEN 'repo/entity/syn' || CAST(event_id AS VARCHAR)
                        ELSE '/repo/v1/entity/syn' || CAST(event_id AS VARCHAR)
                             || '/wiki/' || CAST(user_id AS VARCHAR)
                   END AS request_url,
                   {_ua_case_sql(0, key="user_id")} AS user_agent,
                   'api.example.org' AS host,
                   event_id % 64 AS thread_id,
                   event_id % 1000 AS elapse_ms,
                   event_id % 7 <> 0 AS success,
                   'prod' AS stack,
                   regexp_replace(lpad(CAST(user_id AS VARCHAR), 9, '0'), '^0+', '') AS instance,
                   'vm-' || CAST(event_id % 16 AS VARCHAR) AS vm_id,
                   CASE WHEN event_id % 7 <> 0 THEN 200 ELSE 500 END AS response_status,
                   (CASE WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END)
                     || ' ' ||
                   (CASE WHEN event_id % 3 = 0 THEN 'INVALID URL'
                         ELSE '/entity/#/wiki/#' END) AS normalized_method_signature,
                   {_ua_case_sql(1, key="user_id")} AS client,
                   {_ua_case_sql(2, key="user_id")} AS client_version,
                   event_id AS entity_id
            FROM events
        """,
        "backfill_node_snapshots": """
            SELECT epoch_ms(ts) AS change_ms,
                   CASE WHEN event_id % 3 >= 1 THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   user_id,
                   'ENTITY' AS object_type,
                   'prod' AS stack,
                   '123' AS instance,
                   'syn' || CAST(event_id AS VARCHAR) AS syn_id,
                   epoch_ms(date_trunc('second', ts)) AS created_ms,
                   epoch_ms(date_trunc('second', ts)) + (event_id % 3) * 1000 AS modified_ms,
                   event_type AS node_type,
                   event_id % 5 AS version_number,
                   epoch_ms(CAST(strftime(ts, '%Y-%m-%d') AS TIMESTAMP)) AS snapshot_ms
            FROM events
        """,
        # the Athena backfill oracles share one derivation: change is
        # second-aligned ts, created = change - (event_id % 3) * 2s, so
        # the >1s rule fires exactly when event_id % 3 != 0
        "backfill_usergroup": """
            SELECT 'prod' AS stack,
                   CAST(386 + event_id % 10 AS VARCHAR) AS instance,
                   'PRINCIPAL' AS objecttype,
                   CASE WHEN (event_id % 3) * 2000 > 1000
                        THEN 'UPDATE' ELSE 'CREATE' END AS changetype,
                   (epoch_ms(ts) // 1000) * 1000 AS changetimestamp,
                   epoch_ms(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS snapshottimestamp,
                   NULL::BIGINT AS userid,
                   CAST(user_id AS VARCHAR) AS ug_id,
                   (event_id % 2 = 0) AS is_individual,
                   'etag-' || CAST(event_id AS VARCHAR) AS etag,
                   ((epoch_ms(ts) // 1000) - (event_id % 3) * 2) * 1000 AS creation_ms,
                   CASE WHEN event_id % 7 != 0
                        THEN '/usergroup/' || CAST(user_id AS VARCHAR) END AS uri,
                   CAST(year(ts) AS VARCHAR) AS year,
                   lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
                   lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day
            FROM events
        """,
        "backfill_team": """
            SELECT 'prod' AS stack,
                   CAST(386 + event_id % 10 AS VARCHAR) AS instance,
                   'PRINCIPAL' AS objecttype,
                   CASE WHEN (event_id % 3) * 2000 > 1000
                        THEN 'UPDATE' ELSE 'CREATE' END AS changetype,
                   (epoch_ms(ts) // 1000) * 1000 AS changetimestamp,
                   epoch_ms(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS snapshottimestamp,
                   user_id + 1 AS userid,
                   CAST(event_id AS VARCHAR) AS team_id,
                   'team-' || CAST(event_id AS VARCHAR) AS team_name,
                   CASE WHEN event_id % 5 != 0
                        THEN 'desc-' || CAST(event_id AS VARCHAR) END AS description,
                   'i' || CAST(event_id % 4 AS VARCHAR) AS icon,
                   (event_id % 2 = 0) AS can_public_join,
                   (event_id % 3 = 0) AS can_request_membership,
                   ((epoch_ms(ts) // 1000) - (event_id % 3) * 2) * 1000 AS created_ms,
                   ((epoch_ms(ts) // 1000) - (event_id % 3) * 2 + 3600) * 1000 AS modified_ms,
                   CAST(user_id AS VARCHAR) AS created_by,
                   CAST(user_id + 1 AS VARCHAR) AS modified_by,
                   CAST(year(ts) AS VARCHAR) AS year,
                   lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
                   lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day
            FROM events
        """,
        "backfill_team_member": """
            SELECT 'prod' AS stack,
                   CAST(386 + event_id % 10 AS VARCHAR) AS instance,
                   'PRINCIPAL' AS objecttype,
                   'UPDATE' AS changetype,
                   (epoch_ms(ts) // 1000) * 1000 AS changetimestamp,
                   epoch_ms(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS snapshottimestamp,
                   user_id AS userid,
                   CAST(event_id % 50 AS VARCHAR) AS team_id,
                   CAST(user_id AS VARCHAR) AS owner_id,
                   'fn' || CAST(user_id AS VARCHAR) AS first_name,
                   CAST(user_id AS VARCHAR) || '@x.org' AS email,
                   CASE WHEN event_id % 4 != 0
                        THEN 'dn' || CAST(user_id AS VARCHAR) END AS display_name,
                   TRUE AS is_individual,
                   (event_id % 2 = 1) AS is_admin,
                   CAST(year(ts) AS VARCHAR) AS year,
                   lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
                   lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day
            FROM events
        """,
        "backfill_userprofile": """
            SELECT 'prod' AS stack,
                   CAST(386 + event_id % 10 AS VARCHAR) AS instance,
                   'PRINCIPAL' AS objecttype,
                   CASE WHEN (event_id % 3) * 2000 > 1000
                        THEN 'UPDATE' ELSE 'CREATE' END AS changetype,
                   (epoch_ms(ts) // 1000) * 1000 AS changetimestamp,
                   epoch_ms(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS snapshottimestamp,
                   user_id AS userid,
                   CAST(user_id AS VARCHAR) AS owner_id,
                   CAST(user_id AS VARCHAR) || '@x.org' AS email,
                   2 AS n_emails,
                   'alt-' || CAST(user_id AS VARCHAR) || '@y.org' AS alt_email,
                   'oid-' || CAST(user_id AS VARCHAR) AS open_id,
                   'user' || CAST(user_id AS VARCHAR) AS user_name,
                   CASE WHEN event_id % 3 != 0
                        THEN 'https://r.example.org' END AS rstudio_url,
                   'city-' || CAST(event_id % 9 AS VARCHAR) AS location,
                   'co-' || CAST(event_id % 6 AS VARCHAR) AS company,
                   (event_id % 2 = 0) AS send_email,
                   (event_id % 3 = 0) AS mark_read,
                   (event_id % 2 = 0) AS pref0,
                   (event_id % 5 = 0) AS pref1,
                   ((epoch_ms(ts) // 1000) - (event_id % 3) * 2) * 1000 AS created_ms,
                   CAST(year(ts) AS VARCHAR) AS year,
                   lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
                   lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day
            FROM events
        """,
        "backfill_verifications": """
            WITH base AS (
              SELECT *,
                     (epoch_ms(ts) // 1000) * 1000 AS change_ms,
                     ((epoch_ms(ts) // 1000) - (event_id % 3) * 2) * 1000 AS created_ms
              FROM events
            )
            SELECT 'prod' AS stack,
                   CAST(386 + event_id % 10 AS VARCHAR) AS instance,
                   'VERIFICATION_SUBMISSION' AS objecttype,
                   CASE WHEN (event_id % 3) * 2000 > 1000
                        THEN 'UPDATE' ELSE 'CREATE' END AS changetype,
                   change_ms AS changetimestamp,
                   epoch_ms(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS snapshottimestamp,
                   user_id AS userid,
                   CAST(event_id AS VARCHAR) AS ver_id,
                   created_ms,
                   CAST(user_id AS VARCHAR) || '@x.org' AS email,
                   CASE WHEN event_id % 6 != 0
                        THEN 'city-' || CAST(event_id % 9 AS VARCHAR) END AS location,
                   'orcid-' || CAST(user_id AS VARCHAR) AS orcid,
                   CASE WHEN event_id % 3 = 0 THEN 1 ELSE 2 END AS n_history,
                   created_ms AS sh1_created_ms,
                   'SUBMITTED' AS sh1_state,
                   CASE WHEN event_id % 3 = 0 THEN created_ms
                        ELSE created_ms + 100000 END AS shl_created_ms,
                   CASE WHEN event_id % 3 = 0 THEN 'SUBMITTED'
                        WHEN event_id % 2 = 0 THEN 'APPROVED'
                        ELSE 'REJECTED' END AS shl_state,
                   CASE WHEN event_id % 3 != 0 AND event_id % 2 = 1
                        THEN 'r1' END AS shl_reason,
                   'f-' || CAST(event_id AS VARCHAR) || '.pdf' AS att_name,
                   CAST(event_id AS VARCHAR) AS att_id,
                   CAST(year(ts) AS VARCHAR) AS year,
                   lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
                   lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day
            FROM base
        """,
        "backfill_old_dwh_downloads": """
            WITH bulk AS (SELECT * FROM events WHERE event_id % 2 = 0),
            single AS (SELECT * FROM events WHERE event_id % 2 = 1),
            bulk_rows AS (
              SELECT epoch_ms(ts) AS ts_ms, 'prod' AS stack, '123' AS instance,
                     strftime(ts, '%Y-%m-%d') AS record_date,
                     user_id, NULL::BIGINT AS project_id,
                     CAST(event_id AS VARCHAR) AS downloaded_file_handle_id,
                     CAST(event_id * 10 AS VARCHAR) AS file_handle_id,
                     CAST(event_id AS VARCHAR) AS association_object_id,
                     'FileEntity' AS association_object_type
              FROM bulk
              UNION ALL
              SELECT epoch_ms(ts), 'prod', '123', strftime(ts, '%Y-%m-%d'),
                     user_id, NULL::BIGINT, CAST(event_id AS VARCHAR),
                     CAST(event_id * 10 + 1 AS VARCHAR),
                     CAST(event_id AS VARCHAR), 'TableEntity'
              FROM bulk WHERE event_id % 3 != 0
            ),
            single_rows AS (
              SELECT epoch_ms(ts) AS ts_ms, 'prod' AS stack, '123' AS instance,
                     strftime(ts, '%Y-%m-%d') AS record_date,
                     user_id, NULL::BIGINT AS project_id,
                     NULL::VARCHAR AS downloaded_file_handle_id,
                     CAST(event_id AS VARCHAR) AS file_handle_id,
                     CAST(event_id % 100 AS VARCHAR) AS association_object_id,
                     'FileEntity' AS association_object_type
              FROM single
            )
            SELECT * FROM bulk_rows UNION ALL SELECT * FROM single_rows
        """,
        "backfill_access_records": """
            SELECT 'sess-' || CAST(event_id AS VARCHAR) AS session_id,
                   epoch_ms(ts) AS payload_ms,
                   user_id AS payload_user_id,
                   CASE WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END AS method,
                   '/repo/v1/entity/syn' || CAST(event_id AS VARCHAR) AS request_url,
                   CASE WHEN event_id % 5 != 0
                        THEN 'https://www.synapse.org' END AS origin,
                   event_id % 64 AS thread_id,
                   event_id % 900 + 3 AS elapse_ms,
                   (event_id % 11 != 0) AS success,
                   CASE WHEN event_id % 11 = 0 THEN 500 ELSE 200 END AS response_status,
                   strftime(ts, '%Y-%m-%d') AS payload_date,
                   'prod' AS stack,
                   '000000123' AS instance,
                   epoch_ms(ts) AS ts_ms
            FROM events
        """,
        "backfill_kinesis_downloads": """
            SELECT epoch_ms(ts) AS ts_ms, 'prod' AS stack, '123' AS instance,
                   strftime(ts, '%Y-%m-%d') AS record_date,
                   user_id, event_id % 100 AS project_id,
                   NULL::VARCHAR AS downloaded_file_handle_id,
                   CAST(event_id AS VARCHAR) AS file_handle_id,
                   CAST(event_id AS VARCHAR) AS association_object_id,
                   'FileEntity' AS association_object_type
            FROM events
        """,
        "user_profile_job": """
            SELECT CASE WHEN value > 100 THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   epoch_ms(ts) AS change_ms,
                   user_id AS change_user_id,
                   strftime(ts, '%Y-%m-%d') AS snapshot_date,
                   user_id AS id,
                   'user-' || CAST(user_id AS VARCHAR) AS user_name,
                   CASE WHEN user_id % 5 = 0 THEN NULL
                        ELSE 'u' || CAST(user_id AS VARCHAR) || '@example.org'
                   END AS email,
                   epoch_ms(ts) AS created_ms,
                   user_id % 2 = 0 AS is_two_factor_auth_enabled
            FROM events
        """,
        "quiz_question_job": """
            SELECT epoch_ms(ts) AS change_ms,
                   CASE WHEN value > 100 THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   user_id AS change_user_id,
                   event_id % 1000 AS response_id,
                   i.i AS question_index,
                   (event_id + i.i) % 2 = 0 AS is_correct,
                   strftime(ts, '%Y-%m-%d') AS snapshot_date,
                   CASE WHEN event_id % 4 = 0 THEN epoch_ms(ts) - 1000
                        ELSE epoch_ms(ts) END AS created_ms
            FROM events, unnest(range(0, event_id % 3 + 1)) AS i(i)
        """,
        "file_download_job": """
            SELECT user_id,
                   epoch_ms(ts) AS ts_ms,
                   strftime(ts, '%Y-%m-%d') AS record_date,
                   event_id % 97 AS project_id,
                   event_id AS file_handle_id,
                   CASE WHEN event_id % 3 = 0 THEN event_id
                        ELSE event_id + 5 END AS downloaded_file_handle_id,
                   'FileEntity' AS association_object_type,
                   event_id AS association_object_id,
                   'sess-' || CAST(user_id AS VARCHAR) AS session_id,
                   'prod' AS stack,
                   '000042' AS instance
            FROM events
        """,
        "certified_quiz_job": """
            SELECT epoch_ms(ts) AS change_ms,
                   CASE WHEN value > 100 THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   user_id,
                   event_id % 1000 AS response_id,
                   event_id % 11 <> 0 AS passed,
                   epoch_ms(ts) - 1000 AS passed_on_ms,
                   CASE WHEN event_id % 2 = 0 THEN FALSE
                        ELSE event_id % 5 = 0 END AS revoked,
                   CASE WHEN event_id % 3 = 0 THEN event_id % 11 <> 0
                        ELSE event_id % 7 = 0 END AS certified,
                   CASE WHEN event_id % 4 = 0 THEN epoch_ms(ts) - 1000
                        ELSE epoch_ms(ts) END AS created_ms,
                   strftime(ts, '%Y-%m-%d') AS snapshot_date,
                   'prod' AS stack,
                   '7' AS instance
            FROM events
        """,
        "team_member_job": """
            SELECT CASE WHEN value > 100 THEN 'UPDATE' ELSE 'CREATE' END AS change_type,
                   user_id AS change_user_id,
                   strftime(ts, '%Y-%m-%d') AS snapshot_date,
                   event_id % 53 AS team_id,
                   user_id AS member_id,
                   event_id % 9 = 0 AS is_admin
            FROM events
        """,
        "lake_time_travel": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS value
              FROM events
            ), first_batch AS (
              SELECT * FROM ev WHERE seq <= (SELECT max(event_id) // 2 FROM events)
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM first_batch
            )
            SELECT user_id, event_type, value
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
        """,
        "lake_changes": """
            WITH ev AS (
              SELECT CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
                     event_id AS seq, user_id, event_type, round(value, 2) AS value
              FROM events
            ), tail AS (
              -- windows 1..2 of the 3-batch replay: seq >= ceil((max+1)/3)
              SELECT * FROM ev
              WHERE seq >= (SELECT (max(event_id) + 3) // 3 FROM events)
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
              FROM tail
            )
            SELECT user_id, event_type, value, seq, op = 'DELETE' AS deleted
            FROM ranked WHERE rn = 1
        """,
        "connected_components": """
            WITH RECURSIVE pairs AS (
              SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
              WHERE doc_id % 5 < 2
                AND doc_id + 1 <= (SELECT max(doc_id) FROM documents)
            ),
            sym AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ),
            nodes AS (SELECT u AS n FROM sym UNION SELECT v FROM sym),
            reach(n, m) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.n, s.v FROM reach r JOIN sym s ON s.u = r.m
            )
            SELECT n AS node, min(m) AS component FROM reach GROUP BY n
        """,
        "rollup_cascade": """
            SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
                   event_type,
                   count(*) AS n,
                   round(sum(value), 2) AS sum_v,
                   round(min(value), 4) AS min_v,
                   round(max(value), 4) AS max_v
            FROM events GROUP BY 1, 2
        """,
        "distinct_sketch": """
            SELECT event_type, count(DISTINCT user_id) AS n_exact,
                   TRUE AS within_2pct
            FROM events GROUP BY event_type
        """,
        "tumbling_window": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
                   event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "sliding_window": """
            WITH hits AS (
              SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
                       AS window_start,
                     ts
              FROM events, unnest([0, 1]) AS t(k)
              WHERE ts < time_bucket(INTERVAL '30 minutes', ts)
                         - k * INTERVAL '30 minutes' + INTERVAL '1 hour'
            )
            SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
                   count(*) AS n
            FROM hits GROUP BY 1, 2
        """,
        "session_window": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                            OR lag(ts) OVER w IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM marked
            )
            SELECT min(ts) AS window_start,
                   max(ts) + INTERVAL '30 minutes' AS window_end,
                   user_id, count(*) AS n
            FROM numbered GROUP BY user_id, session_id
        """,
    }
    # same final state is the whole point of the out-of-order variant —
    # alias the oracle so the two can never silently diverge
    oracles["cdc_patch_merge_ooo"] = oracles["cdc_patch_merge"]
    # the replica of a patch source must land on the identical
    # per-column final state — alias the same oracle
    oracles["cdc_replication_patch"] = oracles["cdc_patch_merge"]
    # fork state after replaying the second half = the full-stream LWW
    oracles["lake_clone"] = _CDC_ORACLE
    return oracles
