"""Sequence packing (distributed prefix sum) and train/test
decontamination: partition-count invariance, oracle equality vs a plain
pandas cumsum, and n-gram overlap semantics on hand-built corpora."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.operators.packing import pack_sequences, prefix_sum
from synapse_etl_jobs_spark.operators.text import (
    decontaminate,
    md5_hash48,
    token_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "n_tokens": [(7 * i * i + 13 * i + 5) % 900 + 1 for i in range(200)],
        }
    )
    return spark.createDataFrame(pdf)


def pandas_prefix(pdf):
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pdf["before"] = pdf["n_tokens"].cumsum().shift(1).fillna(0).astype(int)
    return pdf


def test_prefix_sum_matches_pandas(spark, docs):
    got = (
        prefix_sum(docs, "doc_id", "n_tokens", out_col="before")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pandas_prefix(docs.toPandas())
    assert (got["before"].to_numpy() == want["before"].to_numpy()).all()


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_prefix_sum_partition_invariant(spark, docs, parts):
    """The global prefix sum must be bit-stable regardless of where range
    boundaries land — the property that makes packing deterministic on
    any cluster size."""
    got = (
        prefix_sum(docs, "doc_id", "n_tokens", out_col="b", num_partitions=parts)
        .toPandas()
        .sort_values("doc_id")["b"]
        .to_numpy()
    )
    want = pandas_prefix(docs.toPandas())["before"].to_numpy()
    assert (got == want).all()


def test_pack_sequences_semantics(spark, docs):
    out = pack_sequences(docs, "doc_id", "n_tokens", budget=1000).toPandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    want = pandas_prefix(docs.toPandas())
    assert (out["pack_id"].to_numpy() == want["before"].to_numpy() // 1000).all()
    assert (out["pack_offset"].to_numpy() == want["before"].to_numpy() % 1000).all()
    # pack ids are nondecreasing in doc order and gap-free
    pids = out["pack_id"].to_numpy()
    assert (pids[1:] >= pids[:-1]).all()
    assert set(range(pids.max() + 1)) == set(pids.tolist())


def test_pack_no_global_single_task_window(spark, docs):
    """The plan must not contain a window over an empty partition spec on
    the corpus path (single-reducer sort); only the tiny per-partition
    offsets frame may use one."""
    plan = (
        pack_sequences(docs, "doc_id", "n_tokens", budget=1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-side running sum must be partitioned by _pid (parallel);
    # the only unpartitioned window runs over the #partitions-row frame
    assert plan.count("windowspecdefinition(_pid") >= 1


def _docs_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_decontaminate_flags_overlap(spark):
    bench = _docs_df(
        spark, [(1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    )
    train = _docs_df(
        spark,
        [
            # contains the benchmark's first 8 tokens verbatim
            (1, "x y alpha beta gamma delta epsilon zeta eta theta z"),
            # clean
            (2, "one two three four five six seven eight nine ten"),
            # short doc (<8 tokens) equal to a short bench doc
            (3, "tiny exact copy"),
            # empty text must never match
            (4, "   "),
        ],
    )
    bench2 = bench.union(_docs_df(spark, [(1001, "tiny exact copy")]))
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, bench2, n=8).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_matched"] >= 1
    assert not out[2]["contaminated"]
    assert out[3]["contaminated"]  # full-text gram of a short doc
    assert not out[4]["contaminated"] and out[4]["n_grams"] == 0


def test_decontaminate_hash_choice_equivalent(spark):
    bench = _docs_df(spark, [(100, "a b c d e f g h i j k l")])
    train = _docs_df(spark, [(1, "z a b c d e f g h q"), (2, "unrelated words only here")])
    a = decontaminate(train, bench, n=8).toPandas().sort_values("doc_id")
    b = (
        decontaminate(train, bench, n=8, gram_hash=md5_hash48)
        .toPandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_token_ngrams_short_and_empty(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["a b c", "", "  ", "w1 w2 w3 w4 w5"]})
    )
    got = df.select(token_ngrams("text", 4).alias("g")).collect()
    assert got[0]["g"] == ["a b c"]
    assert got[1]["g"] == [] and got[2]["g"] == []
    assert got[3]["g"] == ["w1 w2 w3 w4", "w2 w3 w4 w5"]
