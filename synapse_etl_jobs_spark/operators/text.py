"""Text-analysis operators for training-data pipelines.

All tokenization/scoring is native Catalyst expressions (split, regexp,
higher-order array functions) — no Python in the hot path — so they run
at scan speed over 100 TB of documents. Deterministic by construction:
every score is an exact function of the text, reproducible in ANSI SQL
(the DuckDB oracles in __spark_entry__.py mirror these formulas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lists (public stopwords); argmax voting
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"],
    "de": ["der", "die", "und", "das", "von", "den", "mit", "ein", "eine", "ist"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

_PUNCT_RE = r"[^\w\s]"


def spread_for_explode(
    df: DataFrame, min_parts: int | None = None, probe: bool = True
) -> DataFrame:
    """Repartition a compact corpus frame BEFORE an explode that
    multiplies its work by orders of magnitude (shingles, tokens,
    vector components).

    Explodes execute in the stage of their INPUT: a small parquet
    corpus arrives as 1-2 splits (parquet can't split below a row
    group), so per-shingle hashing would run on 1-2 cores no matter how
    many the cluster has — measured 3-4x of the wall time of every LSH
    signature pass at sf0.1 local[32]. The repartition shuffles only
    the compact document rows, never the exploded rows, and is a no-op
    when the scan already has enough splits (the 100 TB case, where
    corpus files outnumber cores).

    Partition-count probe note: ``df.rdd`` finalizes upstream AQE
    stages. Corpus inputs are scan-shaped in practice (no shuffles), so
    the probe is free; for a DERIVED frame (joins/unions upstream) pass
    ``probe=False`` — the repartition then happens unconditionally
    (compact rows, cheap) instead of pre-executing the upstream plan
    just to count partitions."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if not probe:
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def tokens(c) -> Column:
    """Whitespace tokenization with empty tokens removed."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(c) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c) -> Column:
    """Sub-word-ish token count: word tokens split further at letter/digit
    boundaries and every 4 characters — a cheap BPE proxy for budget
    estimation (counts, not ids)."""
    col = c if isinstance(c, Column) else F.col(c)
    pieces = F.split(col, r"\s+|(?<=[a-zA-Z])(?=\d)|(?<=\d)(?=[a-zA-Z])")
    return F.aggregate(
        F.filter(pieces, lambda t: t != ""),
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-scoring features, one select (all codegen):
    char/token counts, mean token length, punctuation-ish & digit &
    uppercase & stopword ratios. Formulas use portable ASCII character
    classes and 6-dp rounding so they are reproducible bit-for-bit in
    ANSI SQL (the DuckDB oracle mirrors them exactly)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_char = F.length(t)
    n_tok = F.size(toks)
    en = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(en, F.lower(x))))

    def ratio(num, den):
        return F.round(num / F.greatest(den.cast("double"), F.lit(1.0)), 6)

    return df.select(
        "*",
        n_char.alias("n_char"),
        n_tok.alias("n_tokens"),
        ratio(n_char, F.greatest(n_tok, F.lit(1))).alias("mean_token_len"),
        # count of chars NOT alnum/whitespace — a portable punct proxy
        ratio(F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")), n_char).alias("punct_ratio"),
        ratio(F.length(F.regexp_replace(t, r"[^0-9]", "")), n_char).alias("digit_ratio"),
        ratio(F.length(F.regexp_replace(t, r"[^A-Z]", "")), n_char).alias("upper_ratio"),
        ratio(stop_hits, F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition metrics for quality filtering (the Gopher/RefinedWeb
    family — Rae et al. 2021 §A1.1): duplicate-line fraction, duplicate-
    token fraction, and top-token fraction. All native expressions, one
    select; formulas mirror 1:1 into ANSI SQL for the oracle."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    toks = tokens(text_col)
    n_lines = F.size(lines)
    n_toks = F.size(toks)

    def ratio(num, den):
        return F.round(num / F.greatest(den.cast("double"), F.lit(1.0)), 6)

    # top-token fraction: occurrences of the most frequent token /
    # tokens. Computed as the longest run in the SORTED token array —
    # one O(n log n) sort + O(n) fold per row, zero shuffles (the
    # explode+groupBy+join alternative costs two shuffles; for a
    # row-local gate the fused scan wins). A naive
    # per-distinct-token filter would be O(n·distinct) — avoided.
    sorted_toks = F.array_sort(toks)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    top_tok = F.aggregate(sorted_toks, acc0, step)["best"]
    return df.select(
        "*",
        ratio(n_lines - F.size(F.array_distinct(lines)), n_lines).alias(
            "dup_line_frac"
        ),
        ratio(n_toks - F.size(F.array_distinct(toks)), n_toks).alias(
            "dup_token_frac"
        ),
        ratio(F.coalesce(top_tok, F.lit(0)), n_toks).alias("top_token_frac"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.02,
    max_dup_line_frac: float = 0.3,
    max_top_token_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style document quality gate: compute the standard feature
    set (quality_features + repetition_features) and a per-rule verdict;
    ``keep`` is the conjunction and ``drop_reason`` names the FIRST
    failed rule (deterministic order), null when kept. Thresholds are
    the published defaults, parameterized. One fused select tree — no
    shuffles, scan-speed at 100 TB."""
    feats = repetition_features(quality_features(df, text_col), text_col)
    rules = [
        ("too_few_tokens", F.col("n_tokens") < min_tokens),
        ("too_many_tokens", F.col("n_tokens") > max_tokens),
        ("mean_token_len_low", F.col("mean_token_len") < min_mean_token_len),
        ("mean_token_len_high", F.col("mean_token_len") > max_mean_token_len),
        ("punct_ratio_high", F.col("punct_ratio") > max_punct_ratio),
        ("stopword_ratio_low", F.col("stopword_ratio") < min_stopword_ratio),
        ("dup_lines_high", F.col("dup_line_frac") > max_dup_line_frac),
        ("top_token_high", F.col("top_token_frac") > max_top_token_frac),
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    keep = F.lit(True)
    for _, cond in rules:
        keep = keep & ~cond
    return feats.select("*", keep.alias("keep"), reason.alias("drop_reason"))


def _is_char_markers(words: list[str]) -> bool:
    """True for unsegmented (character-based) marker sets like zh."""
    return all(len(w) == 1 and not w.isascii() for w in words)


def language_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-hit counts.

    Space-segmented languages count whole-token equality hits; zh (no
    word boundaries — whitespace tokens are whole sentences, so token
    equality against single-character markers can never match) counts
    marker-CHARACTER occurrences in the raw text instead."""
    toks = tokens(text_col)
    t = F.col(text_col)
    out = {}
    for lang, words in LANG_MARKERS.items():
        if _is_char_markers(words):
            score = F.lit(0)
            for w in words:
                score = score + (F.length(t) - F.length(F.replace(t, F.lit(w))))
            out[lang] = score
        else:
            arr = F.array(*[F.lit(w) for w in words])
            out[lang] = F.size(
                F.filter(toks, lambda x: F.array_contains(arr, F.lower(x)))
            )
    return out


def detect_language(text_col: str = "text") -> Column:
    """Argmax of marker votes, deterministic tie order en>es>fr>de>zh;
    zero hits → 'und'. N-gram-free heuristic — cheap and SQL-mirrorable."""
    scores = language_scores(text_col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # first lang wins ties
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement) — applied IN ORDER (email before
    # generic digit runs so local parts survive as a single token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-\(\) ]{7,}\d", "<PHONE>"),
]


def mask_pii(c, patterns: list[tuple[str, str, str]] | None = None) -> Column:
    """Regex PII masking for training-data scrubbing: chained
    ``regexp_replace`` (Java regex, codegen — scan speed). Pattern order
    matters and is part of the contract; the defaults cover
    email/IPv4/phone with conservative patterns (over-masking beats
    leaking). Patterns avoid constructs whose semantics differ between
    regex engines so the SQL oracle reproduces them exactly."""
    col = c if isinstance(c, Column) else F.col(c)
    for _name, pat, repl in patterns or PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def hash_split(c, weights: dict[str, int], seed: int = 42, hash_fn=None) -> Column:
    """Deterministic dataset split label (train/val/test …) from a
    stable key hash — reproducible across runs, machines, and engines
    (no RNG state): bucket = pmod(hash(key), sum(weights)), assigned to
    labels by cumulative ranges. The standard leakage-safe way to split
    corpora: a document's split never changes when the corpus grows, and
    grouping keys (e.g. url/domain) keep related docs on the same side.

    ``hash_fn``: default seeded xxhash64 (production); ``md5_hash48``
    for the SQL-oracle-checked path."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    total = sum(weights.values())
    col = c if isinstance(c, Column) else F.col(c)
    h = hash_fn(col) if hash_fn else F.xxhash64(col, F.lit(seed))
    bucket = F.pmod(h, F.lit(total))
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo += w
    return expr


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the context-window preprocessing step of training/RAG pipelines.
    Chunk starts step by ``chunk_chars - overlap``; the final chunk may
    be short; empty docs yield zero chunks. Pure native expressions
    (sequence + transform + posexplode): scan-speed, no shuffle, and
    trivially SQL-mirrorable. Output: (id_col, chunk_idx, chunk_text,
    chunk_start) — ``chunk_start`` is 1-based to match SQL substring."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    starts = F.when(n <= 0, F.array().cast("array<long>")).otherwise(
        F.sequence(
            F.lit(1).cast("long"),
            # last start: the smallest 1+k*step covering the tail
            (F.ceil((F.greatest(n - chunk_chars, F.lit(0))) / step) * step + 1)
            .cast("long"),
            F.lit(step).cast("long"),
        )
    )
    chunks = F.transform(starts, lambda s: t.substr(s.cast("int"), F.lit(chunk_chars)))
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).withColumn("chunk_start", F.col("chunk_idx").cast("long") * step + 1)


def md5_hash48(c) -> Column:
    """48-bit deterministic string hash that BOTH Spark and ANSI SQL can
    compute: the first 12 hex chars of md5 parsed base-16 (DuckDB mirror:
    ``list_reduce`` over hex digits). The portable alternative to
    xxhash64 for oracle-checked paths — same fixture-free determinism,
    lower throughput (md5 vs xxhash), so the xxhash64 default stays the
    production path and this one gates correctness."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def char_shingles(c, k: int = 3) -> Column:
    """Distinct k-character shingles of a string (native, no UDF)."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (k - 1), F.lit(1))),
            lambda i: col.substr(i, F.lit(k)),
        )
    )


def fingerprint(text_col: str = "text", window: int = 8, token_hash=None) -> Column:
    """Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03):
    min token-hash over each sliding window of token hashes, distinct,
    sorted. Robust to small edits; native expressions only.

    ``token_hash``: Column→Column hash of one token; default xxhash64
    (production), ``md5_hash48`` for the SQL-oracle-checked path. A
    zero-token document yields an EMPTY fingerprint (window mins over no
    hashes are null and are filtered out, matching the SQL mirror)."""
    hf = token_hash or (lambda t: F.xxhash64(t))
    toks = tokens(text_col)
    hashes = F.transform(toks, hf)
    n = F.size(hashes)
    starts = F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1)))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, window)))
    return F.array_sort(
        F.array_distinct(F.filter(mins, lambda x: x.isNotNull()))
    )


def token_ngrams(c, n: int = 8) -> Column:
    """Distinct whitespace-token n-grams of a string, joined by single
    spaces (native: sequence + slice + concat; no UDF). Documents with
    fewer than ``n`` tokens contribute their full token string as the
    single gram — a short doc equal to a benchmark doc still matches."""
    toks = tokens(c)
    m = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(m - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.filter(
            F.transform(
                starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
            ),
            lambda g: g != "",  # zero-token doc -> NO grams (never matches)
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_matches: int = 1,
    gram_hash=None,
) -> DataFrame:
    """Train/test decontamination: flag training documents sharing token
    ``n``-grams with a benchmark/eval corpus (the standard 8-13-gram
    overlap rule used for LLM training sets — GPT-3 App. C / PaLM-style).

    Scale shape: the benchmark side reduces to DISTINCT gram hashes —
    typically tiny next to the corpus — so the overlap test is a
    broadcast-able equi-join keyed on an 8-byte hash (no corpus shuffle
    when the broadcast fires; AQE decides). The doc side explodes to
    (doc, gram) pairs, but the per-doc aggregate is map-side partial, so
    wire volume ≈ matched pairs, not all grams. No all-pairs comparison
    anywhere.

    ``gram_hash``: Column→Column hash of one gram; default xxhash64
    (production), ``md5_hash48`` for the SQL-oracle-checked path.

    Returns one row per doc: id, n_grams, n_matched, contaminated.
    """
    hf = gram_hash or (lambda g: F.xxhash64(g))
    d = spread_for_explode(docs).select(
        F.col(id_col), token_ngrams(F.col(text_col), n).alias("_grams")
    ).select(
        id_col,
        F.size("_grams").alias("n_grams"),
        F.explode_outer("_grams").alias("_gram"),
    ).withColumn("_gh", hf(F.col("_gram"))).drop("_gram")
    bench_grams = (
        benchmark.select(F.explode(token_ngrams(F.col(text_col), n)).alias("_gram"))
        .select(hf(F.col("_gram")).alias("_gh"))
        .distinct()
    )
    marked = d.join(bench_grams.withColumn("_hit", F.lit(1)), "_gh", "left")
    out = marked.groupBy(id_col, "n_grams").agg(
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_matched")
    )
    return out.select(
        id_col,
        "n_grams",
        "n_matched",
        (F.col("n_matched") >= min_matches).alias("contaminated"),
    )


def terms(c) -> Column:
    """Normalized word terms: lowercase, split on any non-alphanumeric
    run, empties removed. Identical regex semantics in Java and RE2, so
    the ANSI-SQL oracle reproduces it verbatim."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def document_frequency(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary with document frequency and smoothed IDF
    (``ln((N+1)/(df+1)) + 1``, the scikit-learn convention).

    Scale shape: explode to (doc, term), distinct within each doc via the
    per-doc aggregate (map-side partial — wire ≈ distinct doc-term pairs,
    not total tokens), then a term-keyed count. N (corpus size) joins in
    as a broadcast single-row aggregate, never a collect. Output is
    |vocab| rows — the small side of any downstream TF-IDF join.

    Returns: term, doc_freq, idf (6-dp rounded for cross-engine bit
    stability of downstream rankings)."""
    doc_terms = (
        spread_for_explode(docs)
        .select(F.col(id_col), F.explode(terms(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _idf_of(doc_terms, docs, id_col)


def _idf_of(doc_terms: DataFrame, docs: DataFrame, id_col: str) -> DataFrame:
    """IDF table from an existing (doc, term, tf) aggregate — kept
    separate so tf_idf_topk can feed the SAME doc_terms subplan and get
    its shuffle reused (ReusedExchange) instead of a second corpus scan."""
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    return (
        doc_terms.groupBy("term")
        # sum(least(1, tf)) == count(*) because tf >= 1 by construction,
        # but the optimizer cannot prove that, so it keeps tf in this
        # branch's child aggregate instead of rewriting it to a distinct.
        # Both branches then plan the byte-identical groupBy(id, term)
        # exchange, and ReuseExchange materializes it ONCE — tf_idf_topk
        # costs one corpus scan + one explode shuffle, not two.
        .agg(F.sum(F.least(F.lit(1), F.col("tf"))).alias("doc_freq"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "doc_freq",
            F.round(
                F.log((F.col("_n") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0, 6
            ).alias("idf"),
        )
    )


def tf_idf_topk(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document.

    Scale shape: term frequencies aggregate map-side partial off the
    exploded tokens; the IDF table (|vocab| rows, from
    :func:`document_frequency`) joins on ``term`` — the classic
    big-fact × small-dim shape AQE broadcasts when vocab fits, shuffles
    when it doesn't. The final top-k window partitions by document id
    (millions of independent keys — full parallelism, nothing global).
    Ranking orders by the 6-dp ROUNDED score then term, so rank
    boundaries cannot drift between engines on double noise.

    Returns: id, kw_rank (1-based), term, tf, score."""
    doc_terms = (
        spread_for_explode(docs)
        .select(F.col(id_col), F.explode(terms(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # derive IDF from the SAME doc_terms plan: the groupBy(id, term)
    # shuffle is byte-identical on both branches, so Catalyst's
    # ReuseExchange materializes it once — one corpus scan, not two
    # (asserted in tools/explain_audit.py)
    idf = _idf_of(doc_terms, docs, id_col).drop("doc_freq")
    scored = doc_terms.join(idf, "term").select(
        id_col,
        "term",
        "tf",
        F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= k)
        .select(id_col, "kw_rank", "term", "tf", "score")
    )
