"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions (no UDFs — these run in whole-stage
codegen over string columns, the cheapest possible form at 100 TB),
and all deterministic/DuckDB-reproducible for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions.hashing import hash64
from neo4j_arrow_spark.functions.textfns import tokens

#: Tiny per-language stopword lists for the n-gram/stopword vote.
#: Deliberately small: each word is matched as a whole token.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "a", "in"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
}

#: BPE-ish token pattern: letter runs, digit runs, single symbols —
#: identical regex semantics in Spark (Java regex) and DuckDB (RE2).
BPEISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]"


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens are in the stopword list (multiset count)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, text_col: str = "text") -> Column:
    """Predicted language as a Column: CJK-codepoint presence
    short-circuits to 'zh'; otherwise the stopword vote with
    deterministic tie-break (highest count, then alphabetical language
    code); no hits → 'und'.

    Each per-language score expression appears exactly once inside an
    array_max over (hits, tiebreak, code) structs — a chained
    ``when(score > running_best)`` fold duplicates the running best
    into every comparison and blows the expression tree up
    exponentially (measured 10× slowdown at sf0.1). For bulk scoring
    prefer :func:`lang_id_table`, which keeps the whole vote in
    whole-stage codegen."""
    toks = tokens(text_col)
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    entries = [
        F.struct(
            _stopword_hits(toks, words).alias("h"),
            F.lit(-i).alias("tb"),  # ties -> alphabetically first code
            F.lit(code).alias("code"),
        )
        for i, (code, words) in enumerate(sorted(LANG_STOPWORDS.items()))
    ]
    best = F.array_max(F.array(*entries))
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best["h"] > 0, best["code"])
        .otherwise(F.lit("und"))
    )


def lang_id_table(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Bulk language ID: ``(id_col, lang_pred)`` with the same
    semantics as :func:`lang_id`, computed via explode → codegen
    conditional aggregation → array_max pick. No higher-order (hence
    interpreted) array expressions anywhere: the token walk happens
    once per document as plain rows inside whole-stage codegen, and the
    only exchange is the |docs|-sized groupBy on the id."""
    codes = sorted(LANG_STOPWORDS)
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("_t")
    )
    hits = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("_t").isin(*LANG_STOPWORDS[c]), 1).otherwise(0)
            ).alias(f"_h_{c}")
            for c in codes
        ]
    )
    entries = [
        F.struct(
            F.col(f"_h_{c}").alias("h"),
            F.lit(-i).alias("tb"),
            F.lit(c).alias("code"),
        )
        for i, c in enumerate(codes)
    ]
    best = F.array_max(F.array(*entries))
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    return (
        df.select(id_col, text_col)
        .join(hits, id_col)
        .select(
            F.col(id_col),
            F.when(has_cjk, F.lit("zh"))
            .when(best["h"] > 0, best["code"])
            .otherwise(F.lit("und"))
            .alias("lang_pred"),
        )
    )


def token_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    character length."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_RE), 0))
        .cast("long")
        .alias("n_bpeish"),
        F.length(text_col).cast("long").alias("n_chars_measured"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation,
    mean-token-length band, stopword presence, symbol density penalty.
    Weights are arbitrary but fixed; the value is a deterministic pure
    function of the text."""
    # Materialize the token array ONCE in its own projection: the
    # score references it four times (size, stopword filter, length
    # aggregate), and Spark's subexpression elimination does not reach
    # through higher-order-function lambdas — inline, each reference
    # re-ran regexp_extract_all (measured 8x the single-pass cost at
    # sf1: 16.2s vs 2.1s for one tokens() evaluation). CollapseProject
    # keeps the alias un-inlined because it is non-cheap and
    # multiply-referenced.
    base = df.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("_toks")
    )
    toks = F.col("_toks")
    n_toks = F.size(toks)
    n_chars = F.length(text_col)
    en_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    # symbols = chars that are not alnum/space
    n_symbols = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", "")
    )
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    mean_tok_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_toks,
    ).otherwise(F.lit(0.0))
    tok_len_score = F.when(
        (mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_score = F.least(
        F.when(n_toks > 0, en_hits * F.lit(10.0) / n_toks).otherwise(F.lit(0.0)),
        F.lit(1.0),
    )
    symbol_penalty = F.when(
        n_chars > 0, F.least(n_symbols * F.lit(5.0) / n_chars, F.lit(1.0))
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.3) * length_score
        + F.lit(0.2) * tok_len_score
        + F.lit(0.3) * stop_score
        + F.lit(0.2) * (F.lit(1.0) - symbol_penalty)
    )
    return base.select(F.col(id_col), F.round(score, 6).alias("quality"))


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Content fingerprints: ``fp_exact`` hashes the normalized token
    stream (whitespace/punctuation-insensitive exact dup key);
    ``fp_sorted`` hashes the SORTED token multiset (word-order-
    insensitive — catches shuffled near-dups). Both 60-bit cross-engine
    stable hashes."""
    # tokens materialized once: the two fingerprints would otherwise
    # each re-run regexp_extract_all (CSE does not reach through the
    # array expressions — the quality_score lesson)
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return base.select(
        F.col(id_col),
        hash64(F.array_join(F.col("_toks"), " ")).alias("fp_exact"),
        hash64(F.array_join(F.array_sort("_toks"), " ")).alias("fp_sorted"),
    )


#: PII patterns — plain character classes + bounded repetition only, so
#: Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
LONGNUM_RE = "[0-9][0-9][0-9][0-9][0-9][0-9]+"


def redact(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """PII scrub for training corpora: replace email addresses with
    ``<EMAIL>`` and 6+-digit runs (phone/account/ssn-shaped) with
    ``<NUM>``; reports per-document redaction counts. Emails first —
    their local parts may contain digit runs. Pure codegen
    ``regexp_replace``/``regexp_count``, no UDFs."""
    emails_gone = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col),
        F.regexp_replace(emails_gone, LONGNUM_RE, "<NUM>").alias("clean_text"),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(emails_gone, F.lit(LONGNUM_RE)).cast("long").alias(
            "n_numbers"
        ),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sequence chunking for training prep: split each document's token
    stream into windows of ``chunk_tokens`` with ``overlap`` tokens of
    context between consecutive chunks (stride = chunk_tokens -
    overlap). The last chunk is the tail window — every token appears
    in at least one chunk, and chunk boundaries are a pure function of
    the text (deterministic on any engine/partitioning).

    Returns ``(id_col, chunk_id int, n_tokens long, chunk_text)``.
    Documents shorter than one chunk yield a single (possibly empty)
    chunk. Map-only: no shuffle at any scale."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    with_toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    # integer-exact chunk count; the <= guard keeps the arithmetic
    # strictly positive (negative `div` rounds differently across
    # engines)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(f"(size(_toks) - {chunk_tokens} + {stride - 1}) div {stride}")
    )
    with_toks = with_toks.withColumn("_n_chunks", n_chunks)
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("_n_chunks") - 1),
        lambda i: F.slice("_toks", i * stride + 1, chunk_tokens),
    )
    return with_toks.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_ctoks")
    ).select(
        F.col(id_col),
        "chunk_id",
        F.size("_ctoks").cast("long").alias("n_tokens"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
    )


def collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Bigram collocation mining: adjacent token pairs scored by
    integer-quantized lift ``c(w1,w2) · N · 1000 div (c(w1) · c(w2))``
    (N = total token count) — monotone in PMI but computed entirely in
    integers, so the score is order-independent and bit-identical on
    any engine (no float log). High scores = tokens that co-occur far
    more than their frequencies predict — phrase/term detection for
    corpus analysis.

    Returns ``(w1, w2, n_pair, lift_q)`` for pairs seen at least
    ``min_count`` times. Plan: two explode+count aggregations (bigram,
    unigram) + two joins of the min_count-filtered bigram table against
    unigram counts; the total-count scalar rides in via a literal-sized
    cross join. The min_count filter runs BEFORE the joins, so join
    input is the (small) frequent-pair set, not the raw bigram stream.
    """
    toks = docs.select(tokens(text_col).alias("_toks"))
    uni = (
        toks.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    pairs_arr = F.when(
        F.size("_toks") >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1),"
            " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    bi = (
        toks.select(F.explode(pairs_arr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    total = uni.agg(F.sum("cnt").alias("_n"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("cnt").alias("_c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("cnt").alias("_c2"))
    return (
        bi.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.expr("(n_pair * _n * 1000) div (_c1 * _c2)").alias("lift_q"),
        )
    )


def tfidf(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_df: int = 2,
    top_n: int = 200,
    scale: int = 1_000_000,
) -> DataFrame:
    """Sparse TF-IDF-style document vectors over the df-built
    vocabulary: ``(id, token, tf, df, tfidf_q)`` where ``tfidf_q =
    (tf * scale * N) div df`` — the log-free rational variant
    (tf x N/df), quantized to integers so the score is bit-exact on
    any engine/partitioning (a float ln() differs in last-ulp between
    libm implementations; see the fixed-point rationale in
    operators/pagerank.py). Monotone in tf and in 1/df, which is what
    downstream ranking consumes.

    Plan: explode -> (doc, token) counts -> broadcast-join the
    (tiny, top_n-bounded) vocabulary. N is computed once (scalar)."""
    from neo4j_arrow_spark.operators.sampling import build_vocab

    n_docs = docs.count()
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    vocab = build_vocab(docs, id_col, text_col, min_df=min_df, top_n=top_n)
    return (
        tf.join(F.broadcast(vocab.select("token", "df")), "token")
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.expr(f"(tf * {scale} * {n_docs}) div df").alias("tfidf_q"),
        )
    )


def repetition_scores(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_word_frac`` — occurrences of the most frequent word / total
      words (catches keyword-stuffed / templated docs);
    - ``dup_bigram_frac`` — 1 - distinct-bigrams/total-bigrams
      (catches loops and boilerplate repetition).

    Published repetition filters (duplicate-line / n-gram fractions)
    drop documents above fixed thresholds; this operator emits the raw
    fractions so the caller picks thresholds. All counts are integers
    and the fractions are single IEEE divisions — bit-stable across
    engines.

    Plan: entirely narrow — per-row higher-order functions over the
    token array (top word count = longest equal-run in the sorted
    array; distinct bigrams via array_distinct). Zero shuffles, zero
    joins: at 100 TB this is a pure map stage that scales linearly
    with input splits, where the explode->groupBy formulation costs
    four (doc_id, gram) shuffles plus two join exchanges.
    """

    def _longest_run(sorted_arr: Column) -> Column:
        # max multiplicity of any element == longest run of equal
        # adjacent elements once sorted. Single fold, O(n) per row.
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(acc: Column, x: Column) -> Column:
            run = (
                F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long"))
                .otherwise(F.lit(1).cast("long"))
            )
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])

    base = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "_toks", tokens(text_col)
    )
    # bigrams from the materialized token column (same strings as
    # shingles(text, 2), minus a second tokenization pass)
    toks = F.col("_toks")
    base = base.withColumn(
        "_bg",
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.array_join(F.slice(toks, i, 2), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    n_words = F.size("_toks").cast("long")
    top = _longest_run(F.array_sort("_toks"))
    n_bg = F.size("_bg").cast("long")
    n_dbg = F.size(F.array_distinct("_bg")).cast("long")
    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.when(n_words > 0, top / n_words).otherwise(F.lit(0.0)).alias(
            "top_word_frac"
        ),
        F.when(n_bg > 0, F.lit(1.0) - n_dbg / n_bg)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def contamination_overlap(
    df: DataFrame,
    id_col: str,
    eval_pred: Column,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark-decontamination check (the GPT-3/C4 procedure): for
    every non-eval document, the fraction of its distinct word
    ``n``-gram shingles that also occur anywhere in the held-out eval
    split (``eval_pred`` marks eval rows). Training docs above a
    threshold get dropped to avoid eval leakage.

    Output: ``(id, n_shingles, n_contaminated, contamination_frac)``;
    docs with no shingles (< n tokens) report 0/0/0.0.

    Scale shape: shingling goes through dedup.shingle_table
    (posexplode + window lead — whole-stage codegen; the
    array-expression form re-tokenizes per element, quadratic per
    doc); the eval shingle set is globally distinct (one shuffle over
    eval rows only — the small split) and the train-side probe is a
    single equi-join on the shingle string that AQE can broadcast
    when the eval split fits, else shuffle-hash. No cross join, no
    per-row UDF.
    """
    from neo4j_arrow_spark.operators.dedup import shingle_table

    base = df.select(F.col(id_col), F.col(text_col), eval_pred.alias("_eval"))
    eval_sh = (
        shingle_table(base.filter(F.col("_eval")), id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_docs = base.filter(~F.col("_eval"))
    train = shingle_table(train_docs, id_col, text_col, n).withColumnRenamed(
        "doc", id_col
    )
    per_doc = (
        train.join(eval_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
    )
    out = train_docs.select(id_col).join(per_doc, id_col, "left")
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long")
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        n_sh.alias("n_shingles"),
        n_hit.alias("n_contaminated"),
        F.when(n_sh > 0, n_hit / n_sh).otherwise(F.lit(0.0)).alias(
            "contamination_frac"
        ),
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    min_doc_frac: float = 0.04,
) -> DataFrame:
    """Boilerplate signal: the fraction of a document's distinct word
    ``n``-grams that are corpus-wide boilerplate — occurring in at
    least ``max(2, floor(min_doc_frac * total_docs))`` distinct
    documents (headers, footers, license blurbs, nav chrome).

    Output: ``(id, n_shingles, n_boilerplate, boilerplate_frac)``.

    The threshold is relative to the corpus size via a broadcast
    scalar aggregate, so the operator is scale-invariant; the heavy
    frames shuffle once each (shingle doc-frequency, probe join) and
    shingling goes through dedup.shingle_table (codegen posexplode +
    lead — NOT the quadratic array-expression form).
    """
    from neo4j_arrow_spark.operators.dedup import shingle_table

    base = df.select(F.col(id_col), F.col(text_col))
    sh = shingle_table(base, id_col, text_col, n).withColumnRenamed(
        "doc", id_col
    )
    total = base.select(
        F.greatest(
            F.lit(2), F.floor(F.count("*") * F.lit(min_doc_frac))
        ).alias("_min_docs")
    )
    boiler = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("_df") >= F.col("_min_docs"))
        .select("shingle")
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        sh.join(boiler, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_boilerplate"),
        )
    )
    out = base.select(id_col).join(per_doc, id_col, "left")
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long")
    n_b = F.coalesce(F.col("n_boilerplate"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        n_sh.alias("n_shingles"),
        n_b.alias("n_boilerplate"),
        F.when(n_sh > 0, n_b / n_sh).otherwise(F.lit(0.0)).alias(
            "boilerplate_frac"
        ),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies over the
    whitespace-token stream — the inner statistic of a BPE tokenizer
    training round (the highest-count pair is the next merge).
    Symbols here are characters within a token; pairs never span
    tokens. Output: ``(lhs string, rhs string, n_pairs long)`` with
    ``n_pairs >= min_count`` (lhs/rhs — LEFT/RIGHT are SQL keywords).

    Plan: tokens explode (codegen) → per-token character posexplode →
    adjacent pairing with a (token-instance, pos) window lead — one
    shuffle keyed by token instance (high-cardinality, skew-free).
    The final pair count has few distinct keys (alphabet²) but
    map-side partial aggregation compresses each task's output to at
    most that many rows before the exchange, so the hot keys never
    concentrate rows.

    The window partitions on ``(id_col, _ti)`` — a real column, NOT
    monotonically_increasing_id(): a nondeterministic id upstream of a
    shuffle re-keys rows on task retry and splits a token's characters
    across partitions, corrupting pair counts.
    """
    toks = df.select(
        F.col(id_col).alias("_row"),
        F.posexplode(tokens(text_col)).alias("_ti", "_tok"),
    )
    chars = toks.select(
        "_row",
        "_ti",
        F.posexplode(F.split("_tok", "")).alias("_ci", "_ch"),
    ).filter(F.col("_ch") != "")
    w = Window.partitionBy("_row", "_ti").orderBy("_ci")
    pairs = (
        chars.withColumn("_next", F.lead("_ch").over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col("_ch").alias("lhs"), F.col("_next").alias("rhs"))
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count)
    )
    return pairs


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str = "text",
    seq_len: int = 512,
) -> DataFrame:
    """Sequence packing for pretraining: documents are concatenated in
    id order within each ``group_col`` shard and cut into fixed
    ``seq_len``-token training sequences; a document's pack is the
    sequence its first token lands in. Output: ``(id, group, n_tokens,
    start_offset, pack_id)``.

    Packing per shard (source/domain) rather than globally is both the
    scalable plan — the running sum is a window per shard key, one
    shuffle, no single-partition global prefix scan — and what real
    pipelines do (shard-local packing keeps workers independent).
    Token counts use the BPE-ish regex of :func:`token_stats`.
    """
    n_tok = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_RE), 0))
        .cast("long")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (
        df.select(F.col(id_col), F.col(group_col), n_tok.alias("n_tokens"))
        .withColumn("start_offset", start)
        .withColumn(
            "pack_id", F.expr(f"start_offset div {seq_len}").cast("long")
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 10,
    scale: int = 1_000,
) -> DataFrame:
    """BM25 retrieval: top-``k`` documents per query, exact integer
    scoring (k1 = 6/5, b = 3/4 — the standard 1.2/0.75 as rationals).

    ``queries`` is ``(query_id, term)``, one row per query term. With
    ``N`` docs, ``L`` total tokens, ``dl`` the doc length and ``df``
    the term's document frequency, the per-term score multiplied
    through by ``10·L`` clears every denominator::

        idf_q    = (N * scale) div df           -- log-free rational idf
        score_q  = (22 * L * idf_q * tf) div (10*L*tf + 3*L + 9*dl*N)

    All-integer arithmetic: sums over matched terms are exact and
    order-independent, so Spark and the DuckDB oracle agree bit-for-bit
    (same fixed-point rationale as operators/pagerank.py; ``scale``
    capped low enough that 22·L·idf_q·tf stays inside int64 at sf1).

    Plan (100 TB shape): the tiny query table broadcasts into the
    (doc, term, tf) stream so only query-term postings survive the
    scan; df is an aggregation of those postings alone; the two corpus
    scalars (N, L) ride in via a 1-row broadcast cross join; top-k is
    one window over the (n_queries × matched-docs) score frame,
    partitioned by query.
    """
    # persisted: three consumers (tf, dl, corpus length) would each
    # re-run the regex explode otherwise (r6 — the 3x tokenization was
    # the bulk of the sf1 scale ratio, same pattern as
    # unigram_surprisal). N counts ALL docs (empty ones too), so it
    # comes from the doc table, not the token table.
    from neo4j_arrow_spark.operators.dedup import _with_intermediates

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).persist()
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = docs.agg(F.count("*").alias("_n")).crossJoin(
        toks.agg(F.count("*").alias("_l"))
    )
    qterms = queries.select("query_id", "term").distinct()
    postings = tf.join(F.broadcast(qterms), "term")
    dfreq = (
        postings.select("term", id_col)
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_q", F.expr(f"(_n * {scale}) div df"))
        .withColumn(
            "score_q",
            F.expr(
                "(22 * _l * idf_q * tf) div "
                "(10 * _l * tf + 3 * _l + 9 * dl * _n)"
            ),
        )
        .groupBy("query_id", id_col)
        .agg(
            F.sum("score_q").alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return _with_intermediates(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "n_terms_matched", "rank"),
        [toks],
    )


def unigram_surprisal(
    docs: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document unigram-LM surprisal proxies — the perplexity-style
    quality signal (rare-token-heavy documents score high, word-salad
    and OOV-dense text stand out) without float logarithms.

    Per token, with corpus count ``cnt`` and corpus size ``N``:

    - inverse frequency ``ifq = N div cnt`` (the tfidf-style log-free
      rational; see tfidf's fixed-point rationale), and
    - ``ilog2(ifq) = length(bin(ifq)) - 1`` — the EXACT integer floor
      of log2, computed from the binary string length, so the per-doc
      sum is a true log-domain surprisal within 1 bit/token and
      bit-identical on any engine (a float ln() differs in last-ulp
      between libm implementations).

    Returns ``(id, n_tokens, mitf_q, log2loss_q)`` where ``mitf_q =
    sum(ifq) div n_tokens`` and ``log2loss_q = sum(ilog2(ifq))``.

    Plan: explode -> corpus unigram counts (map-side combinable) ->
    one hash join token->count -> per-doc aggregation. N is a scalar
    count. No UDFs, no driver-side data.

    The token table is persisted: it feeds THREE consumers (the corpus
    size N action, the vocabulary count, and the per-doc join) and the
    regex tokenization is the dominant cost — un-persisted, the explode
    ran once per consumer (r6: 3x the regex work, the main term of the
    sf1 scale ratio). Released via ``unpersist_intermediates`` after
    the result is consumed."""
    from neo4j_arrow_spark.operators.dedup import _with_intermediates

    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).persist()
    n_total = tok.count()
    cnt = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    per = tok.join(cnt, "token").withColumn(
        "ifq", F.expr(f"{n_total} div cnt")
    )
    return _with_intermediates(
        per.groupBy(id_col).agg(
            F.count("*").alias("n_tokens"),
            F.expr("sum(ifq) div count(*)").alias("mitf_q"),
            F.sum(F.expr("length(bin(ifq)) - 1")).alias("log2loss_q"),
        ),
        [tok],
    )


def dup_ngram_spans(
    docs: DataFrame, id_col: str, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Cross-document exact-substring duplication: the fraction of each
    document's ``n``-token shingles that also occur in at least one
    OTHER document — the span-level dedup signal (suffix-array-style
    exact duplication, approximated at shingle granularity, which is
    how it distributes).

    Returns ``(id, n_shingles, dup_shingles, dup_frac_q)`` with
    ``dup_frac_q = dup_shingles * 1e6 div n_shingles`` (documents
    shorter than ``n`` tokens have no shingles and are omitted).

    Plan: single pass, no joins — shingling via codegen posexplode +
    window lead (occurrence-preserving twin of dedup.shingle_table;
    the array-expression transform/slice form re-tokenizes per
    reference and benched ~6x slower), then per-(shingle, doc)
    occurrence counts (one row per doc a shingle touches, so the group
    SIZE is the distinct-doc count), a count-over-window partitioned
    by shingle to tag each row with that count, and one per-doc
    aggregation splitting occurrences into total vs cross-doc. Shingle
    keys stay exact strings (a 64-bit hash would be oracle-identical
    here but collides at 100 TB shingle counts); hub shingles are
    bounded by AQE skew splits like the LSH band buckets."""
    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = (
        toks.select(
            F.col(id_col),
            F.concat_ws(" ", *parts).alias("sh"),
            parts[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select(id_col, "sh")
    )
    occ = sh.groupBy("sh", id_col).agg(F.count("*").alias("occ"))
    nd = F.count("*").over(Window.partitionBy("sh"))
    return (
        occ.withColumn("nd", nd)
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_shingles"),
            F.sum(F.when(F.col("nd") >= 2, F.col("occ")).otherwise(0)).alias(
                "dup_shingles"
            ),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "dup_shingles",
            F.expr("dup_shingles * 1000000 div n_shingles").alias("dup_frac_q"),
        )
    )
