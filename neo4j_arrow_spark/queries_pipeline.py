"""Driver-contract queries for the training-data-pipeline operators
(dedup / similarity / text analysis) with DuckDB oracles.

The oracle SQL is generated from the same parameters as the Spark
plans, using the dual-dialect builders in ``functions.hashing`` /
``functions.textfns`` — one source of truth per semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions.hashing import duck_hash64, duck_hash_bit
from neo4j_arrow_spark.functions.textfns import duck_shingles, duck_tokens
from neo4j_arrow_spark.operators import dedup, similarity, text
from neo4j_arrow_spark.registry import query
from neo4j_arrow_spark.sources.tpch import load_table

# ---- shared oracle fragments ---------------------------------------------

#: distinct (doc, shingle) pairs — mirrors dedup.shingle_table(n=3)
_SH_CTE = f"""
sh AS (
    SELECT DISTINCT doc, shingle FROM (
        SELECT doc_id AS doc, unnest({duck_shingles("text", 3)}) AS shingle
        FROM documents
    )
)
"""

_NUM_HASHES, _BANDS, _ROWS_PER_BAND = 16, 8, 2
_SIMHASH_BITS, _SIM_CHUNKS, _MAX_HAMMING = 16, 4, 3

#: Kirsch-Mitzenmacher double hashing, mirroring minhash_signatures
_SIG_CTE = (
    "sh2 AS (\n    SELECT doc, "
    f"{duck_hash64('shingle', 0, 7)} AS h1, "
    f"{duck_hash64('shingle', 1, 7)} AS h2 FROM sh\n),\n"
    "sig AS (\n    SELECT doc, "
)
_SIG_CTE += ", ".join(
    f"min(h1 + {i} * h2) AS mh_{i}" for i in range(_NUM_HASHES)
)
_SIG_CTE += "\n    FROM sh2 GROUP BY doc\n)"

_BAND_ARMS = "\n    UNION ALL\n".join(
    "    SELECT doc, {b} AS band, {key} AS band_key FROM sig".format(
        b=b,
        key=duck_hash64(
            " || ',' || ".join(
                f"mh_{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
            ),
            1000 + b,
        ),
    )
    for b in range(_BANDS)
)

#: deterministic sequential-ish dot product; cast to double element-wise
def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE))"
    )


def _duck_cos(a: str, b: str) -> str:
    return (
        f"round({_duck_dot(a, b)} / "
        f"(sqrt({_duck_dot(a, a)}) * sqrt({_duck_dot(b, b)})), 6)"
    )


# ---- exact dedup -----------------------------------------------------------

@query(
    "exact_dedup_keep",
    oracle="""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) t WHERE rn = 1
    """,
)
def exact_dedup_keep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materializing variant: keep one (min-id) row per content
    group, all other columns surviving."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    return dedup.exact_dedup_keep(docs, ["text"], "doc_id").drop("text")


@query(
    "exact_dedup_docs",
    oracle="""
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY text) AS canonical_id,
           doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_duplicate
    FROM documents
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"], "doc_id")


# ---- minhash ---------------------------------------------------------------

#: full CTE chain ending in ``pairs(id_a, id_b, jaccard)`` — shared by
#: the pair query and the cluster query built on top of it
_MINHASH_PAIRS_CTES = f"""{_SH_CTE},
    {_SIG_CTE},
    buckets AS (
{_BAND_ARMS}
    ),
    cands AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM buckets a
        JOIN buckets b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
    ),
    sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
    inter AS (
        SELECT id_a, id_b, count(*) AS n
        FROM cands
        JOIN sh sa ON id_a = sa.doc
        JOIN sh sb ON id_b = sb.doc AND sa.shingle = sb.shingle
        GROUP BY id_a, id_b
    ),
    pairs AS (
        SELECT id_a, id_b,
               round(n / (za.sz + zb.sz - n), 6) AS jaccard
        FROM inter
        JOIN sizes za ON id_a = za.doc
        JOIN sizes zb ON id_b = zb.doc
        WHERE round(n / (za.sz + zb.sz - n), 6) >= 0.3
    )"""


@query(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTES}
    SELECT id_a, id_b, jaccard FROM pairs
    """,
)
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3, threshold=0.3,
    )


# ---- simhash ---------------------------------------------------------------

_SUMS_CTE = "sums AS (\n    SELECT doc, "
_SUMS_CTE += ", ".join(
    f"sum({duck_hash_bit('h', i)}) AS b{i}" for i in range(_SIMHASH_BITS)
)
_SUMS_CTE += (
    f"\n    FROM (SELECT doc, {duck_hash64('shingle', 0)} AS h FROM sh) GROUP BY doc\n)"
)
_FP_EXPR = " + ".join(
    f"(CASE WHEN b{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(_SIMHASH_BITS)
)
_SIMHASH_CTE = (
    f"fps AS (SELECT doc, CAST({_FP_EXPR} AS BIGINT) AS simhash FROM sums)"
)


@query(
    "simhash_fingerprints",
    oracle=f"""
    WITH {_SH_CTE},
    {_SUMS_CTE},
    {_SIMHASH_CTE}
    SELECT doc, simhash FROM fps
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", bits=_SIMHASH_BITS)


_CHUNK_W = _SIMHASH_BITS // _SIM_CHUNKS
_CHUNK_COLS = ", ".join(
    f"(simhash >> {c * _CHUNK_W}) & {(1 << _CHUNK_W) - 1} AS c{c}"
    for c in range(_SIM_CHUNKS)
)
_CHUNK_JOINS = "\n        UNION\n".join(
    f"""        SELECT a.doc AS id_a, b.doc AS id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM chunked a JOIN chunked b
          ON a.c{c} = b.c{c} AND a.doc < b.doc"""
    for c in range(_SIM_CHUNKS)
)


@query(
    "simhash_pairs",
    oracle=f"""
    WITH {_SH_CTE},
    {_SUMS_CTE},
    {_SIMHASH_CTE},
    chunked AS (SELECT doc, simhash, {_CHUNK_COLS} FROM fps),
    pairs AS (
{_CHUNK_JOINS}
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
    FROM pairs
    WHERE bit_count(xor(sh_a, sh_b)) <= {_MAX_HAMMING}
    """,
)
def simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(
        docs, "doc_id", "text",
        bits=_SIMHASH_BITS, max_hamming=_MAX_HAMMING, chunks=_SIM_CHUNKS,
    )


# ---- exact n-gram jaccard ---------------------------------------------------

_MAX_DF = 100


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SH_CTE},
    rare AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {_MAX_DF}
    ),
    indexed AS (SELECT doc, sh.shingle FROM sh JOIN rare USING (shingle)),
    sizes AS (SELECT doc, count(*) AS sz FROM indexed GROUP BY doc),
    inter AS (
        SELECT a.doc AS id_a, b.doc AS id_b, count(*) AS n
        FROM indexed a JOIN indexed b
          ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    )
    SELECT id_a, id_b, round(n / (za.sz + zb.sz - n), 6) AS jaccard
    FROM inter
    JOIN sizes za ON id_a = za.doc
    JOIN sizes zb ON id_b = zb.doc
    WHERE round(n / (za.sz + zb.sz - n), 6) >= 0.3
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.3, max_df=_MAX_DF,
    )


# ---- embedding near-dup ------------------------------------------------------

@query(
    "embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dedup.duck_quantized_cos("a.embedding", "b.embedding")} AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {dedup.duck_quantized_cos("a.embedding", "b.embedding")} >= 0.4
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked quantized-integer cosine kernel (the 100 TB path);
    oracle computes the identical exact integer dot product."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs_blocked(
        emb, "vec_id", "embedding", threshold=0.4
    )


@query(
    "embedding_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {dedup.duck_quantized_cos("a.embedding", "b.embedding")} >= 0.4
    ),
    e2 AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM e2
        UNION
        SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
    ),
    canon AS (SELECT a, least(min(b), a) AS comp FROM reach GROUP BY a),
    lab AS (
        SELECT d.vec_id, coalesce(c.comp, d.vec_id) AS canonical_id
        FROM embeddings d LEFT JOIN canon c ON d.vec_id = c.a
    ),
    sz AS (SELECT canonical_id, count(*) AS cluster_size
           FROM lab GROUP BY canonical_id)
    SELECT lab.vec_id, lab.canonical_id,
           lab.vec_id <> lab.canonical_id AS is_duplicate,
           sz.cluster_size
    FROM lab JOIN sz USING (canonical_id)
    """,
)
def embedding_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end: embedding-cosine near-dup pairs
    (blocked integer kernel) -> connected components -> one canonical
    vector per cluster — the same pairs->clusters->canonical step as
    neardup_clusters but over the embedding modality, so paraphrased
    near-dups that share no shingles still collapse. Oracle: the exact
    quantized-cosine pair CTE + a recursive transitive closure."""
    emb = load_table(spark, sf_dir, "embeddings")
    prs = dedup.embedding_neardup_pairs_blocked(
        emb, "vec_id", "embedding", threshold=0.4
    )
    return dedup.neardup_clusters(prs, emb, "vec_id")


# ---- text analysis -----------------------------------------------------------

@query(
    "doc_fingerprints",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {duck_tokens("text")} AS t FROM documents)
    SELECT doc_id,
           {duck_hash64("array_to_string(t, ' ')")} AS fp_exact,
           {duck_hash64("array_to_string(list_sort(t), ' ')")} AS fp_sorted
    FROM tok
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs, "doc_id")


@query(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           len({duck_tokens("text")})::BIGINT AS n_tokens,
           len(regexp_extract_all(text,
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]'))::BIGINT AS n_bpeish,
           length(text)::BIGINT AS n_chars_measured
    FROM documents
    """,
)
def token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_stats(docs, "doc_id")


_QUALITY_ORACLE = f"""
WITH feats AS (
    SELECT doc_id,
           {duck_tokens("text")} AS t,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
               AS n_symbols
    FROM documents
),
scored AS (
    SELECT doc_id,
           least(n_chars / 500.0, 1.0) AS length_score,
           CASE WHEN len(t) > 0 THEN
               CASE WHEN list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t)
                         BETWEEN 3.0 AND 10.0
                    THEN 1.0 ELSE 0.5 END
           ELSE 0.5 END AS tok_len_score,
           least(CASE WHEN len(t) > 0 THEN
               len(list_filter(t, x -> list_contains(
                   ['the','and','is','of','to','a','in'], x))) * 10.0 / len(t)
           ELSE 0.0 END, 1.0) AS stop_score,
           CASE WHEN n_chars > 0
                THEN least(n_symbols * 5.0 / n_chars, 1.0) ELSE 0.0
           END AS symbol_penalty
    FROM feats
)
SELECT doc_id,
       round(0.3 * length_score + 0.2 * tok_len_score + 0.3 * stop_score
             + 0.2 * (1.0 - symbol_penalty), 6) AS quality
FROM scored
"""


@query("quality_scores", oracle=_QUALITY_ORACLE)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_score(docs, "doc_id")


def _weighted_sample_oracle() -> str:
    from neo4j_arrow_spark.functions.hashing import duck_hash64

    h = duck_hash64("doc_id::VARCHAR", 0)
    return f"""
    WITH q AS ({_QUALITY_ORACLE})
    SELECT doc_id, quality FROM q
    WHERE ({h}) % 1000000 < CAST(round(quality * 1000000, 0) AS BIGINT)
    """


@query("quality_weighted_sample", oracle=_weighted_sample_oracle())
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subsampling: keep each document with
    probability equal to its quality score, decided by an integer
    hash-vs-threshold test (operators/sampling.weighted_sample) — the
    reproducible alternative to rand()-based sampling. High-quality
    docs survive, boilerplate is thinned, and the keep set is a pure
    function of (doc_id, score, seed)."""
    from neo4j_arrow_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_score(docs, "doc_id")
    return weighted_sample(scored, "doc_id", "quality")


@query(
    "weighted_sample_invariants",
    oracle=f"""
    WITH q AS ({_QUALITY_ORACLE})
    SELECT CAST(0 AS BIGINT) AS strays,
           CAST(0 AS BIGINT) AS dups,
           CAST(0 AS BIGINT) AS quality_mismatches,
           CAST(0 AS BIGINT) AS full_quality_missing,
           CAST(0 AS BIGINT) AS zero_quality_present,
           CAST((SELECT count(*) FROM q WHERE quality >= 1.0) AS BIGINT)
               AS n_full_quality
    """,
)
def weighted_sample_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-free invariants over quality_weighted_sample (r5 verdict
    #8 — its exact oracle shares the hash family with the Spark side):
    the sample is a subset of the scored corpus with unchanged scores
    and no duplicates; every quality >= 1.0 document is ALWAYS kept
    (hash % 1e6 < 1e6 is a tautology) and every quality <= 0 document
    is always dropped — true for any hash implementation. n_full_quality
    pins the count of always-kept docs to an independently computed
    value."""
    from neo4j_arrow_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_score(docs, "doc_id").persist()
    samp = weighted_sample(scored, "doc_id", "quality").persist()
    strays = samp.select("doc_id").join(
        scored.select("doc_id"), "doc_id", "left_anti"
    ).agg(F.count("*").alias("strays"))
    dups = samp.agg(
        (F.count("*") - F.countDistinct("doc_id")).alias("dups")
    )
    mism = (
        samp.alias("s")
        .join(scored.alias("q"), "doc_id")
        .filter(F.col("s.quality") != F.col("q.quality"))
        .agg(F.count("*").alias("quality_mismatches"))
    )
    full = scored.filter(F.col("quality") >= 1.0).persist()
    missing = full.select("doc_id").join(
        samp.select("doc_id"), "doc_id", "left_anti"
    ).agg(F.count("*").alias("full_quality_missing"))
    zeros = (
        samp.alias("s")
        .join(scored.filter(F.col("quality") <= 0.0).alias("z"), "doc_id")
        .agg(F.count("*").alias("zero_quality_present"))
    )
    nfull = full.agg(F.count("*").alias("n_full_quality"))
    res = (
        strays.crossJoin(dups)
        .crossJoin(mism)
        .crossJoin(missing)
        .crossJoin(zeros)
        .crossJoin(nfull)
    )
    from neo4j_arrow_spark.operators.dedup import _with_intermediates

    return _with_intermediates(res, [scored, samp, full])


_LANG_CODES = sorted(text.LANG_STOPWORDS)
_LANG_HITS = ", ".join(
    "len(list_filter(t, x -> list_contains({words}, x))) AS {code}_hits".format(
        code=code,
        words="[" + ",".join(f"'{w}'" for w in text.LANG_STOPWORDS[code]) + "]",
    )
    for code in _LANG_CODES
)
_G = "greatest(" + ", ".join(f"{c}_hits" for c in _LANG_CODES) + ")"
_LANG_CASE = (
    "CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' "
    f"WHEN {_G} = 0 THEN 'und' "
    + " ".join(f"WHEN {c}_hits = {_G} THEN '{c}'" for c in _LANG_CODES[:-1])
    + f" ELSE '{_LANG_CODES[-1]}' END"
)


@query(
    "lang_id_pred",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, text, {duck_tokens("text")} AS t FROM documents
    ),
    hits AS (SELECT doc_id, text, {_LANG_HITS} FROM feats)
    SELECT doc_id, {_LANG_CASE} AS lang_pred FROM hits
    """,
)
def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id_table(docs, "doc_id")


# ---- similarity search --------------------------------------------------------

def _ann_brute_sql(k: int) -> str:
    return f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               {_duck_cos("q.embedding", "n.embedding")} AS cos
        FROM embeddings q, embeddings n
        WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos
    FROM ranked WHERE rank <= {k}
    """


@query("ann_topk_brute", oracle=_ann_brute_sql(5))
def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


def _ann_ivf_sql(k: int) -> str:
    return f"""
    WITH centroids AS (SELECT vec_id AS bucket, embedding AS cv
                       FROM embeddings WHERE vec_id < 8),
    iscore AS (
        SELECT i.vec_id AS item_id, c.bucket,
               {_duck_cos("i.embedding", "c.cv")} AS ccos
        FROM embeddings i, centroids c
    ),
    assigned AS (
        SELECT item_id, bucket FROM (
            SELECT item_id, bucket,
                   row_number() OVER (PARTITION BY item_id
                                      ORDER BY ccos DESC, bucket ASC) AS rn
            FROM iscore
        ) WHERE rn = 1
    ),
    qscore AS (
        SELECT q.vec_id AS query_id, c.bucket,
               {_duck_cos("q.embedding", "c.cv")} AS qcos
        FROM embeddings q, centroids c WHERE q.vec_id < 10
    ),
    probes AS (
        SELECT query_id, bucket FROM (
            SELECT query_id, bucket,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY qcos DESC, bucket ASC) AS rn
            FROM qscore
        ) WHERE rn = 1
    ),
    searched AS (
        SELECT p.query_id, a.item_id AS neighbor_id,
               {_duck_cos("q.embedding", "n.embedding")} AS cos
        FROM probes p
        JOIN assigned a ON p.bucket = a.bucket
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings n ON n.vec_id = a.item_id
        WHERE p.query_id <> a.item_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM searched
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos
    FROM ranked WHERE rank <= {k}
    """


@query("ann_ivf_topk", oracle=_ann_ivf_sql(3))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        emb.filter(F.col("vec_id") < 8),
        "vec_id",
        "embedding",
        k=3,
        nprobe=1,
    )


def _lsh_oracle(n_bits: int, dim: int, k: int) -> str:
    from neo4j_arrow_spark.operators.dedup import QUANT_SCALE
    from neo4j_arrow_spark.operators.similarity import (
        _lsh_bucket_sql,
        lsh_signs,
    )

    bucket = _lsh_bucket_sql(lsh_signs(n_bits, dim), "qv", one_based=True)
    return f"""
    WITH q AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                   x -> round(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS qv
        FROM embeddings
    ),
    b AS (SELECT vec_id, embedding, ({bucket}) AS bucket FROM q),
    cand AS (
        SELECT a.vec_id AS query_id, n.vec_id AS neighbor_id,
               {_duck_cos("a.embedding", "n.embedding")} AS cos
        FROM b a JOIN b n ON a.bucket = n.bucket AND a.vec_id <> n.vec_id
        WHERE a.vec_id < 10
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM cand
    ) WHERE rank <= {k}
    """


@query("ann_lsh_topk", oracle=_lsh_oracle(8, 64, 5))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third ANN path: random-hyperplane LSH (operators/similarity.
    lsh_topk) — 8-bit signatures over the quantized vectors, candidates
    = same-bucket pairs, exact cosine rank within. Complements brute
    (exact) and IVF (centroid-probed); bucket equi-join is the 100 TB
    shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        dim=64,
        n_bits=8,
        k=5,
    )


# ---- dataset selection: split / stratify / vocabulary -------------------------

_SPLIT_HASH = duck_hash64("doc_id::VARCHAR")


@query(
    "split_assignment",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN h < 98 THEN 'train'
                WHEN h < 99 THEN 'valid'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_SPLIT_HASH} % 100 AS h FROM documents) t
    """,
)
def split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/valid/test split (98/1/1) —
    map-only at any scale; adding documents never reassigns old ones
    (operators/sampling.py)."""
    from neo4j_arrow_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return hash_split(docs, "doc_id")


@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_SPLIT_HASH}, doc_id) AS rn
        FROM documents) t
    WHERE rn <= 20
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 20-docs-per-language sample: rank within stratum by
    (md5 hash, id) — uniform-without-replacement, engine-independent."""
    from neo4j_arrow_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang", "doc_id", k=20)


@query(
    "vocab_top200",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest({duck_tokens("text")}) AS token
        FROM documents
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY token)
    SELECT token, df, rank FROM (
        SELECT token, df,
               CAST(row_number() OVER (ORDER BY df DESC, token) AS BIGINT)
                   AS rank
        FROM dfreq WHERE df >= 2) t
    WHERE rank <= 200
    """,
)
def vocab_top200(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary by document frequency: top-200 tokens with
    df >= 2, totally ordered (df desc, token asc) so the cut is exact."""
    from neo4j_arrow_spark.operators.sampling import build_vocab

    docs = load_table(spark, sf_dir, "documents")
    return build_vocab(docs, "doc_id", min_df=2, top_n=200)


@query(
    "tfidf_vectors",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({duck_tokens("text")}) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df
              FROM tok GROUP BY token),
    vocab AS (
        SELECT token, df FROM (
            SELECT token, df,
                   row_number() OVER (ORDER BY df DESC, token) AS rank
            FROM dfreq WHERE df >= 2) t
        WHERE rank <= 200
    )
    SELECT tf.doc_id, tf.token,
           CAST(tf.tf AS BIGINT) AS tf,
           CAST(v.df AS BIGINT) AS df,
           CAST((tf.tf * 1000000 * (SELECT count(*) FROM documents)) // v.df
                AS BIGINT) AS tfidf_q
    FROM tf JOIN vocab v USING (token)
    """,
)
def tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF document vectors over the df-capped vocabulary —
    integer-quantized rational idf (tf x N/df) so the score is
    bit-exact cross-engine (operators/text.tfidf)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.tfidf(docs, "doc_id")


# ---- k-means (IVF training) ---------------------------------------------------

def _kmeans_oracle(k: int, iterations: int, dim: int) -> str:
    """Unrolled integer-exact Lloyd's iterations as DuckDB SQL — the
    same recurrence as operators/clustering.kmeans_fixed."""
    from neo4j_arrow_spark.operators.dedup import QUANT_SCALE

    def dist(c_alias: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (q.qv[i] - {c_alias}.cv[i]) * (q.qv[i] - {c_alias}.cv[i])))"
        )

    ctes = [
        "q AS (SELECT vec_id, list_transform(embedding, "
        f"x -> round(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS qv FROM embeddings)",
        f"""c0 AS (
    SELECT CAST(rn - 1 AS BIGINT) AS cluster, qv AS cv FROM (
        SELECT vec_id, qv, row_number() OVER (ORDER BY vec_id) AS rn
        FROM q) t
    WHERE rn <= {k})""",
    ]
    for t in range(1, iterations + 1):
        ctes.append(
            f"""a{t} AS (
    SELECT vec_id, cluster FROM (
        SELECT q.vec_id, c.cluster,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {dist('c')}, c.cluster) AS rn
        FROM q CROSS JOIN c{t - 1} c) t
    WHERE rn = 1)"""
        )
        ctes.append(
            f"""c{t} AS (
    SELECT cluster, list(m ORDER BY pos) AS cv FROM (
        SELECT a.cluster, d.i AS pos,
               sum(q.qv[d.i]) // count(*) AS m
        FROM a{t} a JOIN q USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) d
        GROUP BY a.cluster, d.i) t
    GROUP BY cluster)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT vec_id, cluster, CAST(qdist AS BIGINT) AS qdist FROM (
        SELECT q.vec_id, c.cluster, {dist('c')} AS qdist,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {dist('c')}, c.cluster) AS rn
        FROM q CROSS JOIN c{iterations} c) t
    WHERE rn = 1"""
    )


@query("kmeans_assign", oracle=_kmeans_oracle(4, 2, 64))
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd's iterations over the embeddings, integer-exact
    (quantized vectors, integer squared-L2, integer-mean centroids) so
    fixed-iteration k-means is bit-identical cross-engine — the
    training step that produces operators/similarity.py's IVF
    centroid table."""
    from neo4j_arrow_spark.operators.clustering import kmeans_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fixed(emb, "vec_id", "embedding", k=4, iterations=2)


@query(
    "minhash_incremental_pairs",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTES}
    SELECT id_a, id_b, jaccard FROM pairs
    WHERE id_a % 5 = 0 OR id_b % 5 = 0
    """,
)
def minhash_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (daily-ingest) near-dup check: docs with id % 5 = 0
    play the new batch, candidates join only new buckets against all
    buckets (operators/dedup.minhash_lsh_pairs_incremental) — per-
    ingest cost ∝ |new|, old-old pairs never re-checked. Oracle: the
    all-pairs result filtered to pairs touching a new doc, which the
    incremental plan must equal exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_incremental(
        docs, "doc_id", "text",
        is_new=F.col("doc_id") % 5 == 0,
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3, threshold=0.3,
    )


# ---- corpus-level dedup (pairs -> clusters -> canonical docs) --------------

@query(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    e2 AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM e2
        UNION
        SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
    ),
    canon AS (SELECT a, least(min(b), a) AS comp FROM reach GROUP BY a),
    lab AS (
        SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN canon c ON d.doc_id = c.a
    ),
    sz AS (SELECT canonical_id, count(*) AS cluster_size
           FROM lab GROUP BY canonical_id)
    SELECT lab.doc_id, lab.canonical_id,
           lab.doc_id <> lab.canonical_id AS is_duplicate,
           sz.cluster_size
    FROM lab JOIN sz USING (canonical_id)
    """,
)
def neardup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step that actually shrinks a corpus: MinHash pair list ->
    connected components -> one canonical doc per near-dup cluster
    (operators/dedup.neardup_clusters). Oracle: the shared pairs CTEs +
    a recursive transitive closure — feasible at oracle scale only,
    which is why the Spark side uses O(log n) star contraction."""
    docs = load_table(spark, sf_dir, "documents")
    prs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3, threshold=0.3,
    )
    return dedup.neardup_clusters(prs, docs, "doc_id")


# ---- training-prep text ops ------------------------------------------------

_CHUNK, _OVERLAP = 64, 48  # stride 16
_STRIDE = _CHUNK - _OVERLAP


@query(
    "doc_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {duck_tokens("text")} AS toks FROM documents
    ),
    c AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) <= {_CHUNK} THEN 1
                    ELSE 1 + (len(toks) - {_CHUNK} + {_STRIDE - 1}) // {_STRIDE}
               END AS n_chunks
        FROM t
    ),
    x AS (
        SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(toks[chunk_id * {_STRIDE} + 1 :
                        chunk_id * {_STRIDE} + {_CHUNK}]) AS BIGINT)
               AS n_tokens,
           array_to_string(toks[chunk_id * {_STRIDE} + 1 :
                                chunk_id * {_STRIDE} + {_CHUNK}], ' ')
               AS chunk_text
    FROM x
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence chunking for training prep: 64-token windows with
    48-token overlap (stride 16) per document — every token covered,
    boundaries a pure function of the text (operators/text.
    chunk_documents). Map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return text.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=_CHUNK, overlap=_OVERLAP
    )


_PII_SUFFIX_SQL = (
    "text || ' contact user' || doc_id || '@mail.example.com ref '"
    " || (1000000 + doc_id * 7919)"
)


@query(
    "pii_redact",
    oracle=f"""
    WITH pii AS (SELECT doc_id, {_PII_SUFFIX_SQL} AS text FROM documents),
    e AS (
        SELECT doc_id, text,
               regexp_replace(text, '{text.EMAIL_RE}', '<EMAIL>', 'g')
                   AS no_email
        FROM pii
    )
    SELECT doc_id,
           regexp_replace(no_email, '{text.LONGNUM_RE}', '<NUM>', 'g')
               AS clean_text,
           CAST(len(regexp_extract_all(text, '{text.EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(no_email, '{text.LONGNUM_RE}'))
                AS BIGINT) AS n_numbers
    FROM e
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/text.redact): emails -> <EMAIL>, 6+-digit
    runs -> <NUM>, with per-doc counts. The documents fixture has no
    organic PII, so a deterministic contact line is appended first —
    the oracle appends the identical line."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com ref "),
            (F.lit(1_000_000) + F.col("doc_id") * 7919).cast("string"),
        ).alias("text"),
    )
    return text.redact(docs, "doc_id", "text")


# ---- bigram collocations ---------------------------------------------------

@query(
    "bigram_collocations",
    oracle=f"""
    WITH t AS (SELECT {duck_tokens("text")} AS toks FROM documents),
    uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    bi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)
        ) GROUP BY w1, w2
        HAVING count(*) >= 5
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS _n FROM uni)
    SELECT w1, w2, n_pair,
           (n_pair * _n * 1000) // (c1.cnt * c2.cnt) AS lift_q
    FROM bi
    JOIN uni c1 ON bi.w1 = c1.w
    JOIN uni c2 ON bi.w2 = c2.w
    CROSS JOIN n
    """,
)
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase detection by integer-quantized lift (operators/text.
    collocations): adjacent token pairs that co-occur far beyond what
    their unigram frequencies predict — PMI-monotone but float-free,
    so bit-identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    return text.collocations(docs, "doc_id", min_count=5)


# ---- Count-Min sketch ------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH = 4, 64


def _cms_oracle(depth: int, width: int) -> str:
    from neo4j_arrow_spark.functions.hashing import duck_hash64

    def bucket(r: int) -> str:
        return f"({duck_hash64('l_suppkey::VARCHAR', r)}) % {width}"

    cell_arms = "\n        UNION ALL\n".join(
        f"        SELECT {r} AS row, {bucket(r)} AS bucket FROM base"
        for r in range(depth)
    )
    key_arms = "\n        UNION ALL\n".join(
        f"        SELECT l_suppkey, true_cnt, {r} AS row, {bucket(r)} AS bucket"
        " FROM keys"
        for r in range(depth)
    )
    return f"""
    WITH base AS (SELECT l_suppkey FROM lineitem),
    cells AS (
        SELECT row, bucket, count(*) AS cell_cnt FROM (
{cell_arms}
        ) GROUP BY row, bucket
    ),
    keys AS (SELECT l_suppkey, count(*) AS true_cnt FROM base GROUP BY 1),
    key_arms AS (
{key_arms}
    )
    SELECT l_suppkey, true_cnt, min(cell_cnt) AS cms_est
    FROM key_arms JOIN cells USING (row, bucket)
    GROUP BY l_suppkey, true_cnt
    """


@query("cms_heavy_hitters", oracle=_cms_oracle(_CMS_DEPTH, _CMS_WIDTH))
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates over lineitem suppliers
    (operators/sketches.cms_estimates): a 4x64-cell sketch — constant
    size regardless of input, the 100 TB shape — with the exact count
    alongside so the overestimate-only guarantee is oracle-checked
    (width < |keys| forces real collisions)."""
    from neo4j_arrow_spark.operators.sketches import cms_estimates

    li = load_table(spark, sf_dir, "lineitem")
    return cms_estimates(li, "l_suppkey", depth=_CMS_DEPTH, width=_CMS_WIDTH)


# ---- repetition / normalization quality (round 2) --------------------------

_REPETITION_SQL = f"""
    WITH w AS (
        SELECT doc_id, unnest({duck_tokens("text")}) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
    wstats AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               CAST(max(c) AS BIGINT) AS top_word_count
        FROM wc GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id, unnest({duck_shingles("text", 2)}) AS g FROM documents
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
    gstats AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(count(*) AS BIGINT) AS n_distinct_bigrams
        FROM gc GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(n_words, 0) AS n_words,
           CASE WHEN coalesce(n_words, 0) > 0
                THEN top_word_count / CAST(n_words AS DOUBLE)
                ELSE 0.0 END AS top_word_frac,
           CASE WHEN coalesce(n_bigrams, 0) > 0
                THEN 1.0 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE)
                ELSE 0.0 END AS dup_bigram_frac
    FROM documents d
    LEFT JOIN wstats USING (doc_id)
    LEFT JOIN gstats USING (doc_id)
"""


@query("repetition_scores", oracle=_REPETITION_SQL)
def repetition_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: most-frequent-word fraction and
    duplicate-bigram fraction per document (operators/text.
    repetition_scores) — the standard drop-rules for templated/looping
    documents in a pretraining corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_scores(docs, "doc_id")


_NORMALIZED_DEDUP_SQL = """
    WITH c AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-zA-Z0-9]+', ' ', 'g'))
                   AS canon
        FROM documents
    ),
    g AS (
        SELECT canon, min(doc_id) AS keeper, count(*) AS group_size
        FROM c GROUP BY canon
    )
    SELECT c.doc_id, g.keeper, g.group_size
    FROM c JOIN g USING (canon)
"""


@query("normalized_dedup", oracle=_NORMALIZED_DEDUP_SQL)
def normalized_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form exact dedup (case/whitespace/punctuation
    -insensitive): every doc mapped to the min-id keeper of its
    canonical group (operators/dedup.normalized_dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.normalized_dedup(docs, "doc_id")


from neo4j_arrow_spark.operators.dedup import QUANT_SCALE as _QS

_QUANTIZE_SQL = f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> round(x::DOUBLE * {_QS})::BIGINT) AS qv
        FROM embeddings
    ),
    m AS (
        SELECT vec_id, qv,
               list_max(list_transform(qv, x -> abs(x))) AS qmax
        FROM q
    )
    SELECT vec_id, qmax,
           CASE WHEN qmax > 0 THEN array_to_string(
               list_transform(qv, x -> CASE WHEN x < 0
                   THEN -((abs(x) * 254 + qmax) // (2 * qmax))
                   ELSE (abs(x) * 254 + qmax) // (2 * qmax) END), ',')
           ELSE array_to_string(list_transform(qv, x -> 0), ',')
           END AS q8
    FROM m
"""


@query("embedding_quantize", oracle=_QUANTIZE_SQL)
def embedding_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (operators/similarity.
    quantize_int8): map-only, integer-exact, the storage-compression
    leg of the ANN stack."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return similarity.quantize_int8(vecs, "vec_id")


# ---- decontamination / boilerplate (round 3) -------------------------------

_CONTAM_N = 5

_CONTAMINATION_SQL = f"""
    WITH sh AS (
        SELECT doc_id, (doc_id % 20 = 0) AS is_eval,
               unnest(list_distinct({duck_shingles("text", _CONTAM_N)})) AS g
        FROM documents
    ),
    ev AS (SELECT DISTINCT g, 1 AS hit FROM sh WHERE is_eval),
    pd AS (
        SELECT sh.doc_id,
               CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN ev.hit IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit
        FROM sh LEFT JOIN ev USING (g)
        WHERE NOT sh.is_eval
        GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_sh, 0) AS n_shingles,
           coalesce(n_hit, 0) AS n_contaminated,
           CASE WHEN coalesce(n_sh, 0) > 0
                THEN n_hit / CAST(n_sh AS DOUBLE) ELSE 0.0
           END AS contamination_frac
    FROM documents d LEFT JOIN pd USING (doc_id)
    WHERE d.doc_id % 20 <> 0
"""


@query("contamination_check", oracle=_CONTAMINATION_SQL)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/C4-style benchmark decontamination: per training doc, the
    fraction of its distinct 5-gram shingles that appear anywhere in
    the held-out eval split (doc_id % 20 == 0 here) — docs above a
    threshold leak eval data and get dropped
    (operators/text.contamination_overlap)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.contamination_overlap(
        docs, "doc_id", F.col("doc_id") % 20 == 0, n=_CONTAM_N
    )


_BOILER_N, _BOILER_FRAC = 3, 0.04

_BOILERPLATE_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct({duck_shingles("text", _BOILER_N)})) AS g
        FROM documents
    ),
    t AS (
        SELECT greatest(2, CAST(floor(count(*) * {_BOILER_FRAC}) AS BIGINT))
               AS min_docs
        FROM documents
    ),
    b AS (
        SELECT g, 1 AS hit FROM sh
        GROUP BY g HAVING count(*) >= (SELECT min_docs FROM t)
    ),
    pd AS (
        SELECT sh.doc_id,
               CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN b.hit IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM sh LEFT JOIN b USING (g)
        GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_sh, 0) AS n_shingles,
           coalesce(n_b, 0) AS n_boilerplate,
           CASE WHEN coalesce(n_sh, 0) > 0
                THEN n_b / CAST(n_sh AS DOUBLE) ELSE 0.0
           END AS boilerplate_frac
    FROM documents d LEFT JOIN pd USING (doc_id)
"""


@query("boilerplate_fraction", oracle=_BOILERPLATE_SQL)
def boilerplate_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate n-gram signal: fraction of each doc's distinct
    3-grams occurring in >= max(2, 4% of docs) documents — the
    header/footer/license-blurb detector of a web-corpus pipeline
    (operators/text.boilerplate_fraction)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.boilerplate_fraction(
        docs, "doc_id", n=_BOILER_N, min_doc_frac=_BOILER_FRAC
    )


_GROUP_SPLIT_HASH = duck_hash64("source")


@query(
    "group_split_by_source",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN h < 98 THEN 'train'
                WHEN h < 99 THEN 'valid'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, source, {_GROUP_SPLIT_HASH} % 100 AS h
          FROM documents) t
    """,
)
def group_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware split: hash the SOURCE (domain) instead of the doc
    id, so every document from one source lands in the same split —
    the standard guard against near-duplicate leakage across
    train/test (operators/sampling.hash_split on the group key)."""
    from neo4j_arrow_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return hash_split(docs, "source")


_BPE_PAIRS_SQL = f"""
    WITH t AS (
        SELECT unnest({duck_tokens("text")}) AS tok FROM documents
    ),
    p AS (
        SELECT substring(tok, i, 1) AS lhs, substring(tok, i + 1, 1) AS rhs
        FROM t, unnest(range(1, length(tok))) AS r(i)
        WHERE length(tok) >= 2
    )
    SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
"""


@query("bpe_pair_counts", oracle=_BPE_PAIRS_SQL)
def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-character pair frequencies within tokens —
    the merge statistic of one BPE tokenizer-training round
    (operators/text.bpe_pair_counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_pair_counts(docs, "text", min_count=2)


_PACK_SQL = """
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // 512 AS BIGINT) AS pack_id
    FROM (
        SELECT doc_id, source,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]'))::BIGINT
                   AS n_tokens
        FROM documents
    )
"""


@query("sequence_packing", oracle=_PACK_SQL)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local sequence packing: concatenate each source's docs in
    id order and cut into 512-token training sequences; every doc maps
    to the pack its first token lands in
    (operators/text.pack_sequences)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.pack_sequences(docs, "doc_id", "source", seq_len=512)


_QUALITY_FILTER_SQL = f"""
    WITH q AS ({_QUALITY_ORACLE}),
    t AS (SELECT quantile_cont(quality, 0.25) AS thr FROM q)
    SELECT doc_id, quality FROM q
    WHERE quality >= (SELECT thr FROM t)
"""


@query("quality_filtered_corpus", oracle=_QUALITY_FILTER_SQL)
def quality_filtered_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-thresholded quality filter: keep documents at or
    above the corpus 25th quality percentile — the relative (corpus-
    calibrated) variant of a fixed-threshold drop rule. Spark's exact
    `percentile` matches DuckDB's quantile_cont (both linear
    interpolation); the scalar threshold broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    # persist the (doc_id, quality) frame: the threshold aggregate and
    # the filter side otherwise EACH recompute the regex-heavy scoring
    # pass (r4 sf1 outlier — 3 evaluations made the 10x-data wall 9.3x;
    # the cached plan is one scoring pass + two cheap cached scans)
    scored = text.quality_score(docs, "doc_id").persist()
    thr = scored.agg(F.expr("percentile(quality, 0.25)").alias("thr"))
    out = (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("thr"))
        .select("doc_id", "quality")
    )
    from neo4j_arrow_spark.operators.dedup import _with_intermediates

    return _with_intermediates(out, [scored])


_RECALL_SQL = f"""
    WITH brute AS ({_ann_brute_sql(3)}),
    ivf AS ({_ann_ivf_sql(3)}),
    hits AS (
        SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM brute b JOIN ivf i
          ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    ),
    qs AS (SELECT DISTINCT query_id FROM brute)
    SELECT q.query_id,
           coalesce(n_hits, 0) AS n_hits,
           coalesce(n_hits, 0) / 3.0 AS recall
    FROM qs q LEFT JOIN hits USING (query_id)
"""


def _recall_frame(brute: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an approximate index vs the exact
    brute-force top-k: overlap counted by a semi join on (query,
    neighbor), missing queries coalesced to 0."""
    hits = (
        brute.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        brute.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))).alias(
                "recall"
            ),
        )
    )


@query("ann_ivf_recall", oracle=_RECALL_SQL)
def ann_ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@3 of the IVF(nprobe=1) index
    against the exact brute-force top-3 per query — the measurement
    loop that tunes nlist/nprobe at scale. Both legs are the
    oracle-verified operators; recall is their per-query overlap / k."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    brute = similarity.cosine_topk(emb, queries_df, "vec_id", "embedding", k=3)
    ivf = similarity.ivf_topk(
        emb, queries_df, emb.filter(F.col("vec_id") < 8),
        "vec_id", "embedding", k=3, nprobe=1,
    )
    return _recall_frame(brute, ivf, 3)


_LSH_RECALL_SQL = f"""
    WITH brute AS ({_ann_brute_sql(3)}),
    lsh AS ({_lsh_oracle(8, 64, 3)}),
    hits AS (
        SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM brute b JOIN lsh l
          ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    ),
    qs AS (SELECT DISTINCT query_id FROM brute)
    SELECT q.query_id,
           coalesce(n_hits, 0) AS n_hits,
           coalesce(n_hits, 0) / 3.0 AS recall
    FROM qs q LEFT JOIN hits USING (query_id)
"""


@query("ann_lsh_recall", oracle=_LSH_RECALL_SQL)
def ann_lsh_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH twin of ann_ivf_recall: recall@3 of the 8-bit
    hyperplane-LSH index vs exact brute-force top-3 — with it, both
    approximate indexes carry a quality measurement loop, not just a
    speed claim."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    brute = similarity.cosine_topk(emb, queries_df, "vec_id", "embedding", k=3)
    lsh = similarity.lsh_topk(
        emb, queries_df, "vec_id", "embedding", dim=64, n_bits=8, k=3
    )
    return _recall_frame(brute, lsh, 3)


# ---- BM25 retrieval -----------------------------------------------------------

_BM25_QUERIES = [
    (1, "spark"), (1, "join"), (1, "fast"),
    (2, "hash"), (2, "table"), (2, "scan"),
    (3, "window"), (3, "agg"), (3, "stream"),
]
_BM25_SCALE = 1_000


@query(
    "bm25_topk",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES
        {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}
    ),
    tok AS (
        SELECT doc_id, unnest({duck_tokens("text")}) AS term FROM documents
    ),
    stats AS (
        SELECT (SELECT count(*) FROM documents) AS n,
               count(*) AS l
        FROM tok
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    postings AS (
        SELECT q.query_id, tf.doc_id, tf.term, tf.tf
        FROM tf JOIN q USING (term)
    ),
    dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM postings GROUP BY term
    ),
    scored AS (
        SELECT p.query_id, p.doc_id,
               sum((22 * s.l * ((s.n * {_BM25_SCALE}) // d.df) * p.tf) //
                   (10 * s.l * p.tf + 3 * s.l + 9 * dl.dl * s.n)) AS score,
               count(*) AS n_terms_matched
        FROM postings p
        JOIN dfreq d USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, CAST(score AS BIGINT) AS score,
           CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query with exact integer scoring (k1=1.2,
    b=0.75 as rationals, denominators cleared) — operators/text.
    bm25_topk; the oracle is the identical all-integer recurrence."""
    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, term string"
    )
    out = text.bm25_topk(docs, queries_df, "doc_id", k=10, scale=_BM25_SCALE)
    return out.select(
        F.col("query_id").cast("int"),
        "doc_id",
        F.col("score").cast("long"),
        F.col("n_terms_matched").cast("long"),
        F.col("rank").cast("int"),
    )


# ---- product quantization -----------------------------------------------------

def _pq_oracle(
    m: int, k_codes: int, iterations: int, dim: int, topk: int, qmod: int
) -> str:
    """Unrolled PQ train + encode + ADC top-k — the identical integer
    recurrence as operators/similarity.pq_train_encode / pq_topk."""
    from neo4j_arrow_spark.operators.dedup import QUANT_SCALE

    sub = dim // m

    def dist(q_alias: str, c_alias: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {sub + 1}), "
            f"i -> ({q_alias}.qv[i] - {c_alias}.cv[i]) * "
            f"({q_alias}.qv[i] - {c_alias}.cv[i])))"
        )

    ctes = [
        "q AS (SELECT vec_id, list_transform(embedding, "
        f"x -> round(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS qv FROM embeddings)",
    ]
    for s in range(m):
        o = s * sub
        ctes.append(
            f"qs{s} AS (SELECT vec_id, qv[{o + 1}:{o + sub}] AS qv FROM q)"
        )
        ctes.append(f"""c{s}_0 AS (
    SELECT CAST(rn - 1 AS BIGINT) AS cluster, qv AS cv FROM (
        SELECT vec_id, qv, row_number() OVER (ORDER BY vec_id) AS rn
        FROM qs{s}) t
    WHERE rn <= {k_codes})""")
        for t in range(1, iterations + 1):
            ctes.append(f"""a{s}_{t} AS (
    SELECT vec_id, cluster FROM (
        SELECT q.vec_id, c.cluster,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {dist('q', 'c')}, c.cluster) AS rn
        FROM qs{s} q CROSS JOIN c{s}_{t - 1} c) t
    WHERE rn = 1)""")
            ctes.append(f"""c{s}_{t} AS (
    SELECT cluster, list(mv ORDER BY pos) AS cv FROM (
        SELECT a.cluster, d.i AS pos,
               sum(q.qv[d.i]) // count(*) AS mv
        FROM a{s}_{t} a JOIN qs{s} q USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, {sub + 1})) AS i) d
        GROUP BY a.cluster, d.i) t
    GROUP BY cluster)""")
        ctes.append(f"""code{s} AS (
    SELECT vec_id, cluster FROM (
        SELECT q.vec_id, c.cluster,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {dist('q', 'c')}, c.cluster) AS rn
        FROM qs{s} q CROSS JOIN c{s}_{iterations} c) t
    WHERE rn = 1)""")
        ctes.append(f"""lut{s} AS (
    SELECT q.vec_id AS query_id, c.cluster AS code, {dist('q', 'c')} AS d
    FROM qs{s} q CROSS JOIN c{s}_{iterations} c
    WHERE q.vec_id % {qmod} = 0)""")
    code_joins = "\n    ".join(
        f"JOIN code{s} USING (vec_id)" if s else "code0"
        for s in range(m)
    )
    lut_joins = "\n    ".join(
        f"JOIN lut{s} l{s} ON l{s}.query_id = l0.query_id "
        f"AND l{s}.code = code{s}.cluster"
        if s
        else "JOIN lut0 l0 ON l0.code = code0.cluster"
        for s in range(m)
    )
    adc = " + ".join(f"l{s}.d" for s in range(m))
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       CAST(rank AS INT) AS rank
FROM (
    SELECT l0.query_id, code0.vec_id, {adc} AS adc_dist,
           row_number() OVER (PARTITION BY l0.query_id
                              ORDER BY {adc}, code0.vec_id) AS rank
    FROM {code_joins}
    {lut_joins}
) WHERE rank <= {topk}"""
    )


@query("pq_adc_topk", oracle=_pq_oracle(4, 8, 2, 64, 5, 53))
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 4 subspaces x 8-centroid codebooks
    (integer-exact Lloyd's per subspace), ADC top-5 per query via a
    broadcast lookup-table join over the exploded code table
    (operators/similarity.pq_train_encode / pq_topk). Queries are every
    500th vector. The oracle unrolls the identical train/encode/scan
    recurrence."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    out = similarity.pq_topk(
        emb, queries_df, "vec_id", "embedding",
        m=4, k_codes=8, iterations=2, k=5,
    )
    return out.select(
        "query_id", "vec_id",
        F.col("adc_dist").cast("long"),
        F.col("rank").cast("int"),
    )


# ---- unigram surprisal / span dedup / temperature sampling ----------------

@query(
    "unigram_surprisal",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({duck_tokens("text")}) AS token FROM documents
    ),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY token),
    n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM t)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(_n // cnt) // count(*) AS BIGINT) AS mitf_q,
           CAST(sum(length(bin(_n // cnt)) - 1) AS BIGINT) AS log2loss_q
    FROM t JOIN cnt USING (token) CROSS JOIN n
    GROUP BY doc_id
    """,
)
def unigram_surprisal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal proxies per document (operators/text.
    unigram_surprisal): mean inverse token frequency plus an EXACT
    integer floor-log2 surprisal (length(bin(x)) - 1 on both engines)
    — the perplexity-style quality signal with zero float logs."""
    docs = load_table(spark, sf_dir, "documents")
    return text.unigram_surprisal(docs, "doc_id")


@query(
    "dup_ngram_spans",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({duck_shingles("text", 8)}) AS sh FROM documents
    ),
    dup AS (
        SELECT sh FROM (
            SELECT sh, count(DISTINCT doc_id) AS nd FROM sh GROUP BY sh
        ) WHERE nd >= 2
    ),
    total AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM sh GROUP BY doc_id
    ),
    per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_shingles
        FROM sh WHERE sh IN (SELECT sh FROM dup) GROUP BY doc_id
    )
    SELECT total.doc_id, n_shingles,
           COALESCE(dup_shingles, 0) AS dup_shingles,
           COALESCE(dup_shingles, 0) * 1000000 // n_shingles AS dup_frac_q
    FROM total LEFT JOIN per ON total.doc_id = per.doc_id
    """,
)
def dup_ngram_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication at 8-gram shingle
    granularity (operators/text.dup_ngram_spans): per-doc count and
    ppm fraction of shingles that occur in >= 2 distinct documents —
    the span-level dedup signal next to the whole-doc MinHash family."""
    docs = load_table(spark, sf_dir, "documents")
    return text.dup_ngram_spans(docs, "doc_id", n=8)


@query(
    "lang_temperature_weights",
    oracle="""
    WITH c AS (
        SELECT lang AS "group", CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    z AS (SELECT sum(n_docs) AS _n, sum(sqrt(n_docs)) AS _zn FROM c)
    SELECT "group", n_docs,
           round(n_docs / _n, 6) AS p_raw,
           round(sqrt(n_docs) / _zn, 6) AS p_temp,
           round((sqrt(n_docs) / _zn) / (n_docs / _n), 6) AS boost
    FROM c CROSS JOIN z
    """,
)
def lang_temperature_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) language sampling weights
    (operators/sampling.temperature_weights): the multilingual-corpus
    rebalancing rule p^alpha / Z with per-group boost factors. sqrt is
    IEEE-correctly-rounded on both engines, so round(6) only absorbs
    sum-order ulps."""
    from neo4j_arrow_spark.operators.sampling import temperature_weights

    docs = load_table(spark, sf_dir, "documents")
    return temperature_weights(docs, "lang", alpha=0.5)


def _pq_recall_oracle(m: int, k_codes: int, iterations: int, dim: int,
                      topk: int, qmod: int) -> str:
    from neo4j_arrow_spark.operators.dedup import QUANT_SCALE

    return f"""
    WITH bq AS (
        SELECT vec_id AS query_id, list_transform(embedding,
               x -> round(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS qv
        FROM embeddings WHERE vec_id % {qmod} = 0
    ),
    bn AS (
        SELECT vec_id AS neighbor_id, list_transform(embedding,
               x -> round(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS nv
        FROM embeddings
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               list_sum(list_transform(range(1, len(qv) + 1),
                   i -> (qv[i] - nv[i]) * (qv[i] - nv[i]))) AS l2q
        FROM bq, bn
    ),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY l2q, neighbor_id) AS rank
            FROM scored) WHERE rank <= {topk}
    ),
    pq AS (
        SELECT query_id, vec_id AS neighbor_id
        FROM ({_pq_oracle(m, k_codes, iterations, dim, topk, qmod)})
    ),
    hits AS (
        SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM brute b JOIN pq p
          ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    ),
    qs AS (SELECT DISTINCT query_id FROM brute)
    SELECT q.query_id,
           coalesce(n_hits, 0) AS n_hits,
           coalesce(n_hits, 0) / {topk}.0 AS recall
    FROM qs q LEFT JOIN hits USING (query_id)
    """


@query("pq_adc_recall", oracle=_pq_recall_oracle(4, 8, 2, 64, 5, 53))
def pq_adc_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the PQ/ADC index against the exact integer squared-
    L2 top-5 on the same quantized grid (operators/similarity.l2q_topk)
    — closes the measurement loop for the third index family: IVF, LSH
    and PQ all carry a quality metric next to their speed story."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 53 == 0)
    brute = similarity.l2q_topk(emb, queries_df, "vec_id", "embedding", k=5)
    pq = similarity.pq_topk(
        emb,
        queries_df.select(F.col("vec_id").alias("query_id"), "embedding"),
        "vec_id", "embedding", m=4, k_codes=8, iterations=2, k=5,
    ).select("query_id", F.col("vec_id").alias("neighbor_id"))
    return _recall_frame(brute, pq, 5)


# ---- k-NN graph construction ----------------------------------------------

def _knn_graph_sql(k: int) -> str:
    """IVF-bucketed approximate k-NN graph: with nprobe=1 a vector
    probes exactly its own assigned bucket, so the searched set is the
    per-bucket all-pairs — the oracle states that identity directly.
    nlist scales with the corpus (max(8, N div 256)) so bucket size —
    and with it the per-bucket all-pairs SEARCH cost — stays CONSTANT
    as data grows; a fixed nlist made the sf1 scale proof go quadratic
    (83x wall at 10x data). Assignment is TWO-LEVEL (r9): flat
    assignment against a ∝N centroid set is itself N²/256 (the r8
    10.6x sf1 ratio) — routing through ncoarse = ceil(√nlist) coarse
    cells makes it N·2√nlist. ceil(sqrt(x)) on a correctly-rounded
    IEEE double is exact for these magnitudes, so both engines compute
    the identical ncoarse."""
    return f"""
    WITH nl AS (SELECT greatest(8, count(*) // 256) AS nlist,
                       greatest(4, CAST(ceil(sqrt(CAST(greatest(8,
                           count(*) // 256) AS DOUBLE))) AS BIGINT))
                       AS ncoarse
                FROM embeddings),
    coarse AS (SELECT vec_id AS cell, embedding AS xv
               FROM embeddings CROSS JOIN nl WHERE vec_id < ncoarse),
    fine AS (SELECT vec_id AS bucket, embedding AS cv
             FROM embeddings CROSS JOIN nl WHERE vec_id < nlist),
    fine_cell AS (
        SELECT bucket, cell FROM (
            SELECT f.bucket, c.cell,
                   row_number() OVER (PARTITION BY f.bucket
                                      ORDER BY {_duck_cos("f.cv", "c.xv")}
                                      DESC, c.cell ASC) AS rn
            FROM fine f, coarse c
        ) WHERE rn = 1
    ),
    icell AS (
        SELECT item_id, cell FROM (
            SELECT i.vec_id AS item_id, c.cell,
                   row_number() OVER (PARTITION BY i.vec_id
                                      ORDER BY {_duck_cos("i.embedding", "c.xv")}
                                      DESC, c.cell ASC) AS rn
            FROM embeddings i, coarse c
        ) WHERE rn = 1
    ),
    assigned AS (
        SELECT item_id, bucket FROM (
            SELECT ic.item_id, fc.bucket,
                   row_number() OVER (PARTITION BY ic.item_id
                                      ORDER BY {_duck_cos("e.embedding", "f.cv")}
                                      DESC, fc.bucket ASC) AS rn
            FROM icell ic
            JOIN embeddings e ON e.vec_id = ic.item_id
            JOIN fine_cell fc ON fc.cell = ic.cell
            JOIN fine f ON f.bucket = fc.bucket
        ) WHERE rn = 1
    ),
    searched AS (
        SELECT a.item_id AS query_id, b.item_id AS neighbor_id,
               {_duck_cos("q.embedding", "n.embedding")} AS cos
        FROM assigned a
        JOIN assigned b ON a.bucket = b.bucket AND a.item_id <> b.item_id
        JOIN embeddings q ON q.vec_id = a.item_id
        JOIN embeddings n ON n.vec_id = b.item_id
    )
    SELECT query_id AS u, neighbor_id AS v, CAST(rank AS BIGINT) AS rank, cos
    FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM searched
    ) WHERE rank <= {k}
    """


@query("knn_graph_ivf", oracle=_knn_graph_sql(3))
def knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN GRAPH construction (the gds.knn analogue, and
    the standard GNN/embedding-dedup preprocessing step): every vector
    becomes a node with directed edges to its top-3 cosine neighbors
    inside its IVF bucket. Same operator as ann_ivf_topk with the full
    table as the query set — per-bucket all-pairs search is linear
    (bucket size stays ~256 as nlist scales with N), and assignment
    routes through a two-level coarse quantizer (ncoarse ≈ √nlist) so
    it is N·2√nlist instead of the flat N·nlist = N²/256 (the r8
    10.6x sf1 ratio). The 100 TB path for building similarity graphs."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    nlist = max(8, emb.count() // 256)  # scalar; bucket size stays ~256
    ncoarse = max(4, math.ceil(math.sqrt(float(nlist))))
    out = similarity.ivf_topk(
        emb, emb, emb.filter(F.col("vec_id") < nlist),
        "vec_id", "embedding", k=3, nprobe=1,
        coarse=emb.filter(F.col("vec_id") < ncoarse),
    )
    return out.select(
        F.col("query_id").alias("u"),
        F.col("neighbor_id").alias("v"),
        F.col("rank").cast("long"),
        "cos",
    )


# ---- dataset drift ---------------------------------------------------------

_PSI_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"


@query(
    "events_value_drift_psi",
    oracle=f"""
    WITH ref AS (SELECT value FROM events WHERE ts < {_PSI_SPLIT}),
    cur AS (SELECT value FROM events WHERE ts >= {_PSI_SPLIT}),
    s AS (SELECT min(value) AS _mn, max(value) AS _mx FROM ref),
    rb AS (
        SELECT least(9, greatest(0,
                   CAST(floor((value - _mn) * 10 / (_mx - _mn)) AS INT)
               )) AS bucket, count(*) AS rn
        FROM ref CROSS JOIN s GROUP BY 1
    ),
    cb AS (
        SELECT least(9, greatest(0,
                   CAST(floor((value - _mn) * 10 / (_mx - _mn)) AS INT)
               )) AS bucket, count(*) AS cn
        FROM cur CROSS JOIN s GROUP BY 1
    ),
    nn AS (SELECT (SELECT count(*) FROM ref) + 10 AS dr,
                  (SELECT count(*) FROM cur) + 10 AS dc),
    spine AS (SELECT unnest(range(10))::INT AS bucket),
    j AS (
        SELECT spine.bucket,
               CAST(coalesce(rn, 0) AS BIGINT) AS ref_n,
               CAST(coalesce(cn, 0) AS BIGINT) AS cur_n,
               (coalesce(rn, 0) + 1) * 1000000 // dr AS ref_ppm,
               (coalesce(cn, 0) + 1) * 1000000 // dc AS cur_ppm
        FROM spine
        LEFT JOIN rb ON spine.bucket = rb.bucket
        LEFT JOIN cb ON spine.bucket = cb.bucket
        CROSS JOIN nn
    )
    SELECT bucket, ref_n, cur_n,
           CAST(ref_ppm AS BIGINT) AS ref_ppm,
           CAST(cur_ppm AS BIGINT) AS cur_ppm,
           CAST((ref_ppm - cur_ppm) * CAST(floor(1000000 *
                ln(ref_ppm::DOUBLE / cur_ppm::DOUBLE)) AS BIGINT)
                AS BIGINT) AS term_q
    FROM j
    """,
)
def events_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream (operators/profiling.drift_psi): the production
    drift monitor a training pipeline runs between corpus snapshots —
    per-bucket ppm shares + integer fixed-point PSI terms, Laplace
    smoothed, bucketed on the reference's min/max."""
    from neo4j_arrow_spark.operators.profiling import drift_psi

    ev = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    return drift_psi(ref, cur, "value", n_buckets=10)
