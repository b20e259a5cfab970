"""Text analysis + fuzzy dedup operators."""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.operators import dedup_text, text


def docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_token_count_and_quality(spark):
    df = docs(spark, ["the cat  sat", "", "  a  b  ", "UPPER 123 !!"])
    out = {r["doc_id"]: r for r in text.quality_features(df).collect()}
    assert out[0]["n_tokens"] == 3
    assert out[1]["n_tokens"] == 0
    assert out[2]["n_tokens"] == 2
    assert out[3]["digit_ratio"] == round(3 / 12, 6)
    assert out[3]["punct_ratio"] == round(2 / 12, 6)
    assert out[0]["stopword_ratio"] == round(1 / 3, 6)


def test_detect_language(spark):
    df = docs(spark, [
        "the cat and the dog sat in the yard",
        "el perro y la casa de los gatos",
        "le chien et le chat dans les rues",
        "der hund und die katze mit dem ball",
        "xyzzy qwerty plugh",
    ])
    out = [r["lang_pred"] for r in df.select(
        "doc_id", text.detect_language("text").alias("lang_pred")
    ).orderBy("doc_id").collect()]
    assert out == ["en", "es", "fr", "de", "und"]


def test_fingerprint_stability(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "sleepy", 1)
    df = docs(spark, [base, base, edited])
    fps = [r[0] for r in df.select(text.fingerprint("text")).collect()]
    assert fps[0] == fps[1]  # deterministic
    # small edit → most fingerprints shared (winnowing locality)
    shared = len(set(fps[0]) & set(fps[2]))
    assert shared >= len(fps[0]) * 0.5


def test_dedup_exact(spark):
    df = docs(spark, ["aaa", "bbb", "aaa", "ccc", "bbb"])
    kept = sorted(r["doc_id"] for r in dedup_text.dedup_exact(df).collect())
    assert kept == [0, 1, 3]


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    near = base.replace("runs", "walks")
    far1 = "completely different content about spark sql engines and shuffles " * 4
    far2 = "yet another unrelated document talking about parquet files only " * 4
    df = docs(spark, [base, near, far1, far2])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_text.minhash_lsh_candidates(
            df, shingle_k=5, num_hashes=32, bands=8
        ).collect()
    }
    assert (0, 1) in pairs
    assert (2, 3) not in pairs


def test_minhash_dedup_removes_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    near = base.replace("runs", "walks")
    far = "completely different content about spark sql engines and shuffles " * 4
    df = docs(spark, [base, near, far])
    kept = sorted(
        r["doc_id"]
        for r in dedup_text.minhash_dedup(
            df, threshold=0.6, shingle_k=5, num_hashes=32, bands=8
        ).collect()
    )
    assert kept == [0, 2]


def test_ngram_jaccard_exact_values(spark):
    df = docs(spark, ["abcd", "abcd", "zzzz"])
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup_text.ngram_jaccard_pairs(df, pairs, k=3).collect()
    }
    assert out[(0, 1)] == 1.0
    assert out[(1, 2)] == 0.0


def test_simhash_properties(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    near = base.replace("dog", "cat")
    far = "completely different words here about databases " * 3
    df = docs(spark, [base, base, near, far])
    out = [r[0] for r in df.select(
        dedup_text.simhash_column("text")
    ).collect()]
    assert out[0] == out[1]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out[0], out[2]) < ham(out[0], out[3])


def test_simhash_near_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog and then sleeps " * 3
    near = base.replace("sleeps", "rests")
    far = "entirely unrelated database engine shuffle partition text " * 3
    df = docs(spark, [base, near, far])
    # pigeonhole guarantee needs max_hamming < blocks: 10-bit distance →
    # 16 blocks of 4 bits guarantee ≥1 shared block
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_text.simhash_near_pairs(df, max_hamming=10, blocks=16).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_connected_components_chain_and_clusters(spark):
    from synapse_etl_jobs_spark.operators.dedup_text import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4, triangle 10-11-12, isolated edge 20-21
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_minhash_dedup_cc_removes_chained_cluster(spark):
    from synapse_etl_jobs_spark.operators.dedup_text import (
        minhash_dedup, minhash_dedup_cc,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base),
        (2, base + "alpha beta"),            # near-dup of 1
        (3, base + "alpha beta gamma delta"), # near-dup of 2, weaker vs 1
        (50, "completely different text about spark shuffles and joins " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept_cc = sorted(
        r["doc_id"]
        for r in minhash_dedup_cc(
            df, threshold=0.75, shingle_k=5, num_hashes=64, bands=16
        ).collect()
    )
    # transitive closure: the whole chain collapses to doc 1
    assert kept_cc == [1, 50]
    # the one-round variant keeps at least as many docs (under-merges chains)
    kept_star = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            df, threshold=0.75, shingle_k=5, num_hashes=64, bands=16
        ).collect()
    )
    assert set(kept_cc) <= set(kept_star)


def test_connected_components_string_ids(spark):
    """Ids are never cast — string UUID-ish ids cluster by lexicographic min."""
    from synapse_etl_jobs_spark.operators.dedup_text import connected_components

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "id_a string, id_b string",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                   "doc-x": "doc-x", "doc-y": "doc-x"}


def test_connected_components_nonconvergence_raises(spark):
    from synapse_etl_jobs_spark.operators.dedup_text import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # warn mode returns partial labels instead
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(chain, max_iter=2, on_nonconverged="warn")
        assert out.count() == 13
        assert any("did not converge" in str(x.message) for x in w)


def test_detect_language_chinese_chars(spark):
    """zh has no word boundaries — detection must count marker
    characters, not whitespace tokens."""
    df = spark.createDataFrame(
        [(1, "我是一个人，我有一个想法，就是不要人云亦云。"),
         (2, "the cat sat on the mat with a hat for the win")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["pred"] for r in df.select(
        "doc_id", text.detect_language("text").alias("pred")).collect()}
    assert out == {1: "zh", 2: "en"}


def test_simhash_near_pairs_validates_pigeonhole(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        dedup_text.simhash_near_pairs(d, max_hamming=4, blocks=4).collect()
    with pytest.raises(ValueError, match="divisible"):
        dedup_text.simhash_near_pairs(d, max_hamming=2, blocks=5).collect()


def test_simhash_signatures_matches_column_form(spark):
    from synapse_etl_jobs_spark.operators.dedup_text import (
        simhash_column, simhash_signatures,
    )

    d = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta"), (3, "")],
        "doc_id long, text string")
    col_form = {r["doc_id"]: r["s"] for r in
                d.select("doc_id", simhash_column("text").alias("s")).collect()}
    df_form = {r["doc_id"]: r["simhash"] for r in simhash_signatures(d).collect()}
    assert df_form == col_form
    assert df_form[3] == 0  # empty doc keeps a (zero) signature


def test_repetition_features(spark):
    from synapse_etl_jobs_spark.operators.text import repetition_features
    df = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),          # dup line, dup tokens
            (2, "x y z"),                   # all unique
            (3, "w w w w"),                 # one token dominates
            (4, ""),                        # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert rows[1]["dup_line_frac"] == round(1 / 3, 6)
    assert rows[1]["dup_token_frac"] == round(2 / 6, 6)  # a,b repeated once each
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[3]["top_token_frac"] == 1.0
    assert rows[4]["dup_line_frac"] == 0.0 and rows[4]["top_token_frac"] == 0.0


def test_gopher_rules_verdicts(spark):
    from synapse_etl_jobs_spark.operators.text import gopher_rules
    long_good = ("the quick brown fox jumps over the lazy dog and then "
                 "walks into town with many other friendly animals " * 5)
    df = spark.createDataFrame(
        [
            (1, long_good),
            (2, "tiny doc"),                                  # too few tokens
            (3, " ".join(["spam"] * 100)),                    # no stopwords fails first
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert rows[1]["keep"] is True and rows[1]["drop_reason"] is None
    assert rows[2]["keep"] is False and rows[2]["drop_reason"] == "too_few_tokens"
    # rule ORDER: stopword_ratio_low fires before dup/top-token rules
    assert rows[3]["keep"] is False and rows[3]["drop_reason"] == "stopword_ratio_low"
    # thresholds are parameterized
    loose = gopher_rules(df, min_tokens=1, min_stopword_ratio=0.0,
                         max_dup_line_frac=1.0, max_top_token_frac=1.0)
    got = {r["doc_id"]: r["keep"] for r in loose.collect()}
    assert got[3] is True


def test_mask_pii(spark):
    from synapse_etl_jobs_spark.operators.text import mask_pii
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.co.uk now"),
            (2, "server 192.168.001.250 port"),
            (3, "call +1 (555) 010-9999 ok"),
            (4, "clean text 42"),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["m"] for r in df.select("id", mask_pii("t").alias("m")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server <IP> port"
    assert got[3] == "call <PHONE> ok"
    assert got[4] == "clean text 42"


def test_hash_split_deterministic_and_proportional(spark):
    import pytest as _pytest
    from synapse_etl_jobs_spark.operators.text import hash_split
    df = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    w = {"train": 8, "val": 1, "test": 1}
    a = df.select("k", hash_split("k", w).alias("s"))
    counts = {r["s"]: r["n"] for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 10_000 < 0.85  # ~80%
    # stable under corpus growth: the first 10k keys keep their labels
    bigger = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    b = bigger.select("k", hash_split("k", w).alias("s")).filter(F.col("k").cast("long") < 10_000)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with _pytest.raises(ValueError):
        hash_split("k", {"train": 0})


def test_chunk_documents(spark):
    import pytest as _pytest
    from synapse_etl_jobs_spark.operators.text import chunk_documents
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_chars=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_text"])
        )
    # step=2: starts 1,3,5,7 cover the 10-char doc; last chunk may be short
    assert by_doc[1] == [(0, 1, "abcd"), (1, 3, "cdef"), (2, 5, "efgh"),
                         (3, 7, "ghij")]
    assert by_doc[2] == [(0, 1, "abc")]  # doc shorter than a chunk
    assert 3 not in by_doc               # empty doc → zero chunks
    # every adjacent pair overlaps by exactly `overlap` chars
    for (_, s1, t1), (_, s2, t2) in zip(by_doc[1], by_doc[1][1:]):
        assert t1[s2 - s1:] == t2[: len(t1) - (s2 - s1)]
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=4, overlap=4)


def test_terms_normalization(spark):
    df = docs(spark, ["Foo-BAR baz42, foo!  ", "", "...,;"])
    out = {r["doc_id"]: r["t"] for r in
           df.select("doc_id", text.terms("text").alias("t")).collect()}
    assert out[0] == ["foo", "bar", "baz42", "foo"]
    assert out[1] == []  # empty doc -> no terms
    assert out[2] == []  # punctuation-only doc -> no terms


def test_document_frequency_and_idf(spark):
    import math

    df = docs(spark, ["apple banana apple", "banana cherry", "apple"])
    out = {r["term"]: r for r in text.document_frequency(df).collect()}
    assert out["apple"]["doc_freq"] == 2  # per-doc distinct, not 3
    assert out["banana"]["doc_freq"] == 2
    assert out["cherry"]["doc_freq"] == 1
    assert out["apple"]["idf"] == round(math.log(4 / 3) + 1, 6)
    assert out["cherry"]["idf"] == round(math.log(4 / 2) + 1, 6)


def test_tf_idf_topk_ranking_and_ties(spark):
    import math

    # doc 0: 'rare' appears once (df=1), 'common' twice (df=2) -- rare
    # outranks common only if tf*idf says so; doc 1 pins the tie-break
    # (equal score -> term ascending).
    df = docs(spark, ["rare common common", "zz aa"])
    out = text.tf_idf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["kw_rank"])
    idf1 = round(math.log(3 / 2) + 1, 6)  # df=1 -> ln((2+1)/(1+1))+1, N=2
    assert d0[0]["term"] == "common" and d0[0]["score"] == round(2 * idf1, 6)
    assert d0[1]["term"] == "rare" and d0[1]["score"] == round(1 * idf1, 6)
    d1 = sorted(by_doc[1], key=lambda r: r["kw_rank"])
    # aa and zz tie on score -> lexicographic term order breaks it
    assert [r["term"] for r in d1] == ["aa", "zz"]
    # every doc emits at most k rows
    assert all(len(v) <= 2 for v in by_doc.values())


def test_spread_for_explode_modes(spark):
    from synapse_etl_jobs_spark.operators.text import spread_for_explode

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string").coalesce(1)
    target = spark.sparkContext.defaultParallelism
    # probe mode: a 1-split frame gets repartitioned up to the core count
    assert spread_for_explode(df).rdd.getNumPartitions() == target
    # explicit floor
    assert spread_for_explode(df, min_parts=3).rdd.getNumPartitions() == 3
    # probe=False: unconditional repartition (derived-frame safe path)
    assert spread_for_explode(
        df, min_parts=5, probe=False
    ).rdd.getNumPartitions() == 5
    # already-wide frames pass through untouched in probe mode
    wide = df.repartition(target + 4)
    assert spread_for_explode(wide).rdd.getNumPartitions() == target + 4
