"""Deterministic sampling/mixing: nesting, partition invariance, exact
expected multiset, and stratum weight semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from synapse_etl_jobs_spark.operators.sampling import hash_sample, weighted_mix


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(2000),
            "lang": ["en", "zh", "fr", "de"] * 500,
        }
    )
    return spark.createDataFrame(pdf)


def test_hash_sample_rate_and_nesting(spark, docs):
    s10 = set(r.doc_id for r in hash_sample(docs, "doc_id", 0.1).collect())
    s20 = set(r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect())
    assert s10 <= s20, "samples with one seed must nest"
    assert 0.05 < len(s10) / 2000 < 0.15
    assert 0.15 < len(s20) / 2000 < 0.25
    # different seed -> different (roughly independent) sample
    s10b = set(r.doc_id for r in hash_sample(docs, "doc_id", 0.1, seed=7).collect())
    assert s10 != s10b


def test_hash_sample_partition_invariant(spark, docs):
    a = sorted(r.doc_id for r in hash_sample(docs.repartition(1), "doc_id", 0.3).collect())
    b = sorted(r.doc_id for r in hash_sample(docs.repartition(13), "doc_id", 0.3).collect())
    assert a == b


def test_weighted_mix_semantics(spark, docs):
    out = weighted_mix(
        docs, "doc_id", "lang", weights={"en": 2.5, "zh": 0.5, "fr": 0.0}, seed=42
    ).toPandas()
    by_lang = out.groupby("lang")["doc_id"].agg(["count", "nunique"])
    # en: every doc 2 or 3 copies -> count in [2*500, 3*500], nunique = 500
    assert by_lang.loc["en", "nunique"] == 500
    assert 1000 <= by_lang.loc["en", "count"] <= 1500
    # copy_idx values: en docs with 3 copies have idx {0,1,2}
    en = out[out["lang"] == "en"]
    assert set(en["copy_idx"].unique()) == {0, 1, 2}
    # zh: ~half kept, single copies
    assert "fr" not in by_lang.index, "weight 0 must drop the stratum"
    assert 150 <= by_lang.loc["zh", "count"] <= 350
    assert (out[out["lang"] == "zh"]["copy_idx"] == 0).all()
    # de: default weight 1.0 -> exactly one copy per doc
    assert by_lang.loc["de", "count"] == 500
    assert by_lang.loc["de", "nunique"] == 500


def test_weighted_mix_deterministic(spark, docs):
    w = {"en": 1.7, "zh": 0.4}
    a = weighted_mix(docs, "doc_id", "lang", w).toPandas()
    b = weighted_mix(docs.repartition(17), "doc_id", "lang", w).toPandas()
    key = ["doc_id", "copy_idx"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_weighted_mix_rejects_negative(spark, docs):
    with pytest.raises(ValueError, match="negative weight"):
        weighted_mix(docs, "doc_id", "lang", {"en": -1.0})
