"""Similarity search over embedding columns.

- :func:`cosine_topk` — brute-force exact top-k: the correctness
  baseline. O(|Q|·|N|); fine when the query set is small or as the
  per-bucket kernel.
- :func:`ivf_assign` / :func:`ivf_topk` — IVF-style approximate
  search: vectors are bucketed by nearest centroid, queries probe only
  ``nprobe`` closest centroid buckets. The 100 TB path: centroids are
  broadcast-size, the bucket assignment is a narrow map, and the
  search join is an equi-join on bucket id.

Scores use the deterministic sequential-fold cosine from
:mod:`~neo4j_arrow_spark.operators.dedup`, rounded to 6 digits, with
id tie-breaks — reproducible on DuckDB for the correctness gate.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.dedup import (
    QUANT_SCALE,
    cosine,
    cosine_prenormed,
    norm,
)


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    ``queries`` rows join against every item (broadcast the query side
    when small — Catalyst does this automatically under AQE since the
    query frame is tiny relative to items). Norms precomputed per row,
    one dot per pair. Ranking: (cos desc, neighbor id asc) via
    row_number — fully deterministic.

    Output: (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    n = items.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("nn"),
    )
    scored = q.join(n, how="cross").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_prenormed(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 6
        ).alias("cos"),
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos")
    )


def lsh_signs(n_bits: int, dim: int, seed: int = 0) -> list[list[int]]:
    """±1 random-hyperplane coefficients as a pure function of
    ``(seed, bit, dim)`` via md5 — both engines (and the oracle
    builder) regenerate the identical planes from the parameters, so
    no plane table needs to ship anywhere."""
    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{b}:{i}".encode()).hexdigest()[:15], 16)
            & 1
            else -1
            for i in range(dim)
        ]
        for b in range(n_bits)
    ]


def _lsh_bucket_sql(signs: list[list[int]], arr: str, one_based: bool) -> str:
    """Bucket id = Σ_b [plane_b · v ≥ 0] · 2^b over a quantized integer
    vector column ``arr`` — shared SQL generator for Spark (0-based
    indexing) and DuckDB (1-based)."""
    terms = []
    for b, row in enumerate(signs):
        dot = " + ".join(
            f"{'' if s > 0 else '-'}{arr}[{i + 1 if one_based else i}]"
            for i, s in enumerate(row)
        )
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(terms)


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bits: int = 8,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH ANN: vectors hash to a ``n_bits``-bit
    signature (sign of the dot with each deterministic hyperplane);
    candidates are pairs in the SAME bucket, ranked exactly by cosine.
    Queries whose bucket holds no other vector yield no rows — the
    standard single-probe LSH recall trade-off (more bits → fewer,
    closer candidates).

    The signature is computed on the QUANTIZED integer vector (same
    20-bit fixed point as k-means/near-dup), so the sign sums are
    integer-exact and any engine agrees on every bucket. The candidate
    pairing is an equi-join on bucket id — at 100 TB this is the
    whole point: |Q|·|N| collapses to Σ_bucket |Q_b|·|N_b| and the
    join shuffles on a uniformly-hashed key.

    Output: (query_id, neighbor_id, rank, cos).
    """
    signs = lsh_signs(n_bits, dim, seed)
    qvec = F.transform(
        F.col(vec_col), lambda x: F.round(x * QUANT_SCALE).cast("long")
    )
    bucket = F.expr(_lsh_bucket_sql(signs, "_qv", one_based=False))
    it = (
        items.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
            norm(F.col(vec_col)).alias("nn"),
            qvec.alias("_qv"),
        )
        .withColumn("bucket", bucket)
        .drop("_qv")
    )
    qs = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(F.col(vec_col)).alias("qn"),
            qvec.alias("_qv"),
        )
        .withColumn("bucket", bucket)
        .drop("_qv")
    )
    scored = (
        qs.join(it, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_prenormed(
                    F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")
                ),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos")
    )


def ivf_assign(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign every item to its nearest centroid (max cosine, centroid
    id tie-break). centroids must be small (it is broadcast).

    Output: (item id, bucket, cos_to_centroid)."""
    c = centroids.select(
        F.col(id_col).alias("bucket"), F.col(vec_col).alias("cv")
    )
    scored = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("iv")
    ).join(F.broadcast(c), how="cross").select(
        "item_id",
        "bucket",
        F.round(cosine(F.col("iv"), F.col("cv")), 6).alias("ccos"),
    )
    w = Window.partitionBy("item_id").orderBy(
        F.col("ccos").desc(), F.col("bucket").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("item_id", "bucket", "ccos")
    )


def ivf_assign_2level(
    items: DataFrame,
    centroids: DataFrame,
    coarse: DataFrame,
    id_col: str,
    vec_col: str,
    _fine_cells: DataFrame | None = None,
) -> DataFrame:
    """Two-level IVF assignment — same output contract as
    :func:`ivf_assign`, but the nearest-centroid search routes through
    a COARSE quantizer: the fine centroids are pre-assigned to their
    nearest coarse cell, every item picks its nearest coarse cell
    first, and then compares only against the fine centroids of that
    cell. Flat assignment is |N|·nlist work — with nlist ∝ |N|
    (constant bucket size, the linear-search configuration) that is a
    quadratic (the r8 bench's 10.6x sf1 ratio on knn_graph_ivf); two
    levels cut it to |N|·(ncoarse + nlist/ncoarse), minimized at
    ncoarse ≈ √nlist. Both centroid sets stay broadcast-size; the
    shuffles are the two per-item argmax windows, linear in |N|.

    Every argmax uses the shared (round(cos, 6) desc, id asc) order,
    so the membership is deterministic and the DuckDB oracle restates
    it exactly. A coarse cell can never be empty of fine centroids as
    long as the coarse set is a SUBSET of the fine set (each coarse
    vector assigns to itself at cos = 1).

    Output: (item_id, bucket, ccos) — ccos is the fine-centroid
    cosine, as in :func:`ivf_assign`. ``_fine_cells`` lets a caller
    that already computed the fine→coarse cell map (ivf_topk computes
    it for the probe side too) pass it in instead of re-deriving it."""
    fine_cells = _fine_cells
    if fine_cells is None:
        fine_cells = ivf_assign(centroids, coarse, id_col, vec_col).select(
            F.col("item_id").alias("bucket"), F.col("bucket").alias("cell")
        )
    fine = centroids.select(
        F.col(id_col).alias("bucket"), F.col(vec_col).alias("cv")
    ).join(F.broadcast(fine_cells), "bucket")

    co = coarse.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("xv")
    )
    it = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("iv")
    )
    s1 = it.join(F.broadcast(co), how="cross").select(
        "item_id",
        "iv",
        "cell",
        F.round(cosine(F.col("iv"), F.col("xv")), 6).alias("ccos"),
    )
    w1 = Window.partitionBy("item_id").orderBy(
        F.col("ccos").desc(), F.col("cell").asc()
    )
    cells = (
        s1.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select("item_id", "iv", "cell")
    )
    s2 = cells.join(F.broadcast(fine), "cell").select(
        "item_id",
        "bucket",
        F.round(cosine(F.col("iv"), F.col("cv")), 6).alias("ccos"),
    )
    w2 = Window.partitionBy("item_id").orderBy(
        F.col("ccos").desc(), F.col("bucket").asc()
    )
    return (
        s2.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .select("item_id", "bucket", "ccos")
    )


#: float64 element budget for one `_bucket_self_topk` chunk temporary
#: (~64 MB); tests shrink it to force multi-chunk execution on small
#: buckets
_SELF_TOPK_CHUNK_ELEMS = 1 << 23


def _bucket_self_topk(assigned: DataFrame, k: int) -> DataFrame:
    """Per-bucket all-pairs cosine + top-k for the self-search path of
    :func:`ivf_topk` (queries == items, nprobe == 1).

    ``assigned`` is ``(item_id, bucket, nv array<float>, nn double)``.
    One Arrow kernel per bucket computes the raw (unrounded) cosine of
    every ordered pair with the exact sequential-fold operation order
    of :func:`~neo4j_arrow_spark.operators.dedup.cosine_prenormed`
    (vectorized across pairs, sequential across dimensions — bit-equal
    IEEE doubles). The kernel prunes each query's candidates to the
    rows that can still reach the top-k AFTER Spark-side round(·, 6):
    a row whose raw cosine is more than 2e-6 below the query's k-th
    largest raw cosine rounds strictly below at least k rows (round
    moves a value by at most 5e-7), so it can never enter the rounded
    top-k and dropping it cannot change ranks 1..k. Spark applies the
    canonical round + (cos desc, neighbor asc) row_number ranking on
    the pruned set, so the output is identical to the unpruned plan.

    Peak kernel memory is O(chunk·|bucket|), NOT O(|bucket|²·d): query
    rows are processed in chunks of at most 2^23/|bucket| rows (~64 MB
    of float64 per temporary), and the dot-product fold accumulates one
    per-dimension outer product at a time instead of materializing the
    full |bucket|²·d pair tensor (a 10k-vector bucket at d=64 would be
    ~51 GB in one Python worker — the guide-§5 memory-blowup pattern).
    Worst-case resident set per task is ~4 chunk·|bucket| float64
    frames (acc, one broadcast temp, cosm, mask) ≈ 256 MB, independent
    of d and of bucket skew. Each pair's fold is still A[q,0]·A[n,0],
    then += A[q,i]·A[n,i] in index order — the identical IEEE operation
    sequence as the pair tensor (and as the JVM aggregate(zip_with(…))
    it replaced), verified bit-equal in both directions.
    """
    import numpy as np
    import pandas as pd

    chunk_elems = _SELF_TOPK_CHUNK_ELEMS  # captured by value for the worker

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["item_id"].to_numpy()
        nn = pdf["nn"].to_numpy(dtype=np.float64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"query_id": ids[:0], "neighbor_id": ids[:0],
                 "cos": np.empty(0, dtype=np.float64)}
            )
        A = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
        m, d = A.shape
        keep_k = min(k, m - 1)
        chunk = max(1, min(m, chunk_elems // m))
        out_q, out_n, out_c = [], [], []
        for q0 in range(0, m, chunk):
            Aq = A[q0:q0 + chunk]
            # sequential fold across dimensions, vectorized across
            # pairs: identical IEEE op order to aggregate(zip_with(...))
            # per pair; one chunk·m outer product per dimension keeps
            # peak memory independent of d (docstring)
            acc = Aq[:, 0, None] * A[None, :, 0]
            for i in range(1, d):
                acc += Aq[:, i, None] * A[None, :, i]
            cosm = acc / (nn[q0:q0 + chunk, None] * nn[None, :])
            rows = np.arange(cosm.shape[0])
            cosm[rows, q0 + rows] = -np.inf  # drop self pairs
            # k-th largest raw cosine per query row
            kth = np.partition(cosm, m - 1 - keep_k, axis=1)[:, m - 1 - keep_k]
            mask = cosm >= (kth - 2e-6)[:, None]
            qi, ni = np.nonzero(mask)
            out_q.append(ids[q0 + qi])
            out_n.append(ids[ni])
            out_c.append(cosm[qi, ni])
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q),
             "neighbor_id": np.concatenate(out_n),
             "cos": np.concatenate(out_c)}
        )

    scored = assigned.groupBy("bucket").applyInPandas(
        _score, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos")
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 1,
    coarse: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroid buckets
    of each query and rank exactly within them.

    The item·query pairing is an equi-join on bucket — at scale this is
    the difference between |Q|·|N| and |Q|·|N|/n_buckets·nprobe.

    ``coarse`` (optional) switches BOTH the item assignment and the
    query probe selection to the two-level path of
    :func:`ivf_assign_2level` — required whenever nlist itself scales
    with |N| (constant-bucket configurations), where flat assignment
    is quadratic. With ``coarse``, probes are the top-``nprobe`` fine
    centroids WITHIN the query's nearest coarse cell (slightly lower
    recall than the flat global top-``nprobe``; identical at
    nprobe=1, where both pick the two-level assignment bucket).

    Output: (query_id, neighbor_id, rank, cos)."""
    fine_cells = None
    if coarse is not None:
        fine_cells = ivf_assign(centroids, coarse, id_col, vec_col).select(
            F.col("item_id").alias("bucket"), F.col("bucket").alias("cell")
        )
        assign = ivf_assign_2level(
            items, centroids, coarse, id_col, vec_col, _fine_cells=fine_cells
        )
    else:
        assign = ivf_assign(items, centroids, id_col, vec_col)
    assigned = assign.join(
        items.select(
            F.col(id_col).alias("item_id"),
            F.col(vec_col).alias("nv"),
            norm(F.col(vec_col)).alias("nn"),
        ),
        "item_id",
    )

    if queries is items and nprobe == 1:
        # Self-search at nprobe=1 (the knn-graph configuration): a
        # query's probe bucket IS its assignment bucket — both are the
        # rank-1 centroid under the identical (round(cos,6) desc, id
        # asc) order (flat path) or the identical two-level route
        # (coarse path). The probe side's duplicate assignment subtree
        # (cross-join + argmax windows over the full vector set, twice
        # with a coarse quantizer) therefore computes exactly
        # ``assigned`` again — skip it (guide §1.2.1: don't compute
        # things twice). The per-bucket all-pairs scoring then runs as
        # ONE Arrow kernel per bucket (guide §4.2/§8): each vector
        # ships to Python once per bucket instead of once per PAIR
        # (the bucket self-join shipped |bucket| copies), and the
        # sequential-fold cosine vectorizes across the pair matrix in
        # numpy with the IDENTICAL per-pair IEEE operation sequence
        # (elementwise product, then one add per dimension in index
        # order, then dot/(qn*nn)) — bit-equal doubles, verified
        # against the zip_with fold on the full pair set. Rounding and
        # the (round(cos,6) desc, id asc) top-k ranking stay in Spark,
        # so the ranking semantics are untouched.
        return _bucket_self_topk(assigned, k)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    if coarse is not None:
        # two-level probe: nearest coarse cell, then top-nprobe fine
        # centroids of that cell — |Q|·(ncoarse + nlist/ncoarse) work
        co = coarse.select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("xv")
        )
        fine = centroids.select(
            F.col(id_col).alias("bucket"), F.col(vec_col).alias("cv")
        ).join(F.broadcast(fine_cells), "bucket")
        qc = q.join(F.broadcast(co), how="cross").select(
            "query_id",
            "qv",
            "qn",
            "cell",
            F.round(cosine(F.col("qv"), F.col("xv")), 6).alias("qcos"),
        )
        wc = Window.partitionBy("query_id").orderBy(
            F.col("qcos").desc(), F.col("cell").asc()
        )
        qcells = (
            qc.withColumn("_rn", F.row_number().over(wc))
            .filter(F.col("_rn") == 1)
            .select("query_id", "qv", "qn", "cell")
        )
        q_scored = qcells.join(F.broadcast(fine), "cell").select(
            "query_id",
            "qv",
            "qn",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("qcos"),
        )
    else:
        c = centroids.select(
            F.col(id_col).alias("bucket"), F.col(vec_col).alias("cv")
        )
        q_scored = q.join(F.broadcast(c), how="cross").select(
            "query_id",
            "qv",
            "qn",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("qcos"),
        )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("bucket").asc()
    )
    probes = (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "bucket")
    )

    scored = probes.join(assigned, "bucket").select(
        "query_id",
        F.col("item_id").alias("neighbor_id"),
        F.round(
            cosine_prenormed(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 6
        ).alias("cos"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos")
    )


def quantize_int8(
    vectors: DataFrame, id_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the
    compression step before an ANN index ships vectors to disk (4x
    smaller than float32, dot products stay in integer SIMD range).

    Per vector: scale by max |component| so values span [-127, 127].
    All arithmetic is integer (inputs pass through the shared
    QUANT_SCALE fixed-point grid first, rounding is the exact
    ``(2*254*|q| + 2*qmax) div (4*qmax)`` rational — no float rounding
    ambiguity cross-engine). Map-only: no shuffle at any scale.

    Returns ``(id_col, qmax, q8)`` with ``q8`` the comma-joined int8
    components and ``qmax`` the per-vector scale denominator (restore
    ``x ≈ q8/127 * qmax/QUANT_SCALE``).
    """
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x * QUANT_SCALE).cast("long")
    )
    src = vectors.select(F.col(id_col), qv.alias("_qv"))
    qmax = F.array_max(F.transform(F.col("_qv"), F.abs))

    def q8(x):
        # round(|x| * 127 / qmax) as exact integer arithmetic:
        # (|x|*254 + qmax) div (2*qmax), then re-apply the sign.
        # floor() on the double quotient is exact here: numerator
        # < 2^38, so a non-integer true quotient can never round
        # across an integer boundary (error < 1 ulp << gap).
        mag = F.floor(
            (F.abs(x) * 254 + F.col("_qmax")) / (2 * F.col("_qmax"))
        ).cast("long")
        return F.when(x < 0, -mag).otherwise(mag)

    return (
        src.withColumn("_qmax", qmax)
        .select(
            F.col(id_col),
            F.col("_qmax").alias("qmax"),
            F.when(
                F.col("_qmax") > 0,
                F.array_join(F.transform(F.col("_qv"), q8), ","),
            )
            .otherwise(F.array_join(F.transform(F.col("_qv"), lambda x: F.lit(0)), ","))
            .alias("q8"),
        )
    )


# -- product quantization ---------------------------------------------------

def pq_train_encode(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
) -> tuple[DataFrame, list[list[tuple[int, list[int]]]]]:
    """Product quantization: split each vector into ``m`` contiguous
    subspaces, train a ``k_codes``-centroid codebook per subspace
    (integer-exact Lloyd's — identical recurrence to operators/
    clustering.lloyd_centroids), and encode every vector as its
    per-subspace nearest-centroid id.

    ALL subspaces train simultaneously in one long-form frame
    ``(id, s, qv)`` with composite cluster key ``(s, cluster)`` — one
    Spark job per Lloyd iteration instead of m, which is what keeps
    training wall time independent of m (the m sequential loops of the
    naive layout were the whole cost at bench scale).

    Returns ``(codes_long, codebooks)``: codes_long is
    ``(id_col, s, code)`` — one row per (vector, subspace) — and
    codebooks the per-subspace centroid list (model parameters,
    driver-resident like every trainer here). Compression: dim
    quantized longs → m small ints per vector, the standard memory
    story that lets a 100 TB corpus ADC-scan from RAM.

    Determinism: per-subspace seeds are the ``k_codes`` lowest-id
    vectors; assignment ties break to the lowest cluster id; centroid
    means are integer ``sum div count`` — bit-identical to the
    unrolled per-subspace oracle.
    """
    spark = vectors.sparkSession
    q = vectors.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col), lambda x: F.round(x * QUANT_SCALE).cast("long")
        ).alias("qv"),
    )
    # ONE driver job fetches dim AND every seed: the per-subspace seeds
    # are the k_codes lowest-id vectors and the id set is identical in
    # every subspace, so the k_codes lowest FULL vectors determine all
    # m seed sets — sliced driver-side below. (Previously: a limit(1)
    # collect for dim, a count() to force the persist, and a windowed
    # collect for seeds — three sequential jobs of pure overhead,
    # guide §1.2.2/§5: the driver should do almost no data work, and
    # here it only handles k_codes rows.)
    seed_vecs = q.orderBy(id_col).limit(k_codes).collect()
    if not seed_vecs:
        raise ValueError("pq_train_encode: empty vector table")
    dim = len(seed_vecs[0]["qv"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    subdim = dim // m
    slices = F.array(*[F.slice("qv", s * subdim + 1, subdim) for s in range(m)])
    sub = q.select(
        F.col(id_col), F.posexplode(slices).alias("s", "qv")
    ).persist()

    cents: dict[tuple[int, int], list[int]] = {}
    for s in range(m):
        for c, r in enumerate(seed_vecs):
            cents[(s, c)] = list(r["qv"][s * subdim : (s + 1) * subdim])

    def _assign(centroids: dict[tuple[int, int], list[int]]) -> DataFrame:
        # MAP-ONLY assignment (guide §2.4 — remove shuffles outright):
        # one broadcast row per subspace carries that subspace's
        # candidate list ordered by cluster id; the per-row argmin is
        # array_min over (qdist, cluster) structs — struct ordering IS
        # the old min(struct(qdist, cluster, …)) groupBy tie-break, and
        # qdist is the identical integer zip_with fold, so the
        # assignment is bit-identical to the join+groupBy formulation
        # it replaces while shuffling NOTHING. (The old plan shuffled
        # |N|·m·k_codes scored rows per iteration and again for the
        # final encode; PQ assignment against a broadcast codebook is
        # embarrassingly parallel, and now the plan says so.)
        cent_df = spark.createDataFrame(
            [
                (
                    s,
                    [
                        (int(c2), [int(x) for x in cv2])
                        for (s2, c2), cv2 in sorted(centroids.items())
                        if s2 == s
                    ],
                )
                for s in sorted({s for s, _ in centroids})
            ],
            "s int, _cands array<struct<cluster: bigint, _cv: array<bigint>>>",
        )
        qdist = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(F.col("qv"), c["_cv"], lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        best = F.array_min(
            F.transform(
                F.col("_cands"),
                lambda c: F.struct(
                    qdist(c).alias("qdist"), c["cluster"].alias("cluster")
                ),
            )
        )
        return sub.join(F.broadcast(cent_df), "s").select(
            F.col(id_col), "s",
            best["cluster"].alias("cluster"),
            F.col("qv"),
            best["qdist"].alias("qdist"),
        )

    def _tdiv(a: int, b: int) -> int:
        return -(-a // b) if a < 0 else a // b

    sums = [F.sum(F.col("qv")[i]).alias(f"_s{i}") for i in range(subdim)]
    for _ in range(iterations):
        rows = (
            _assign(cents)
            .groupBy("s", "cluster")
            .agg(F.count("*").alias("_n"), *sums)
            .collect()
        )
        cents = {
            (int(r["s"]), int(r["cluster"])): [
                _tdiv(int(r[f"_s{i}"]), int(r["_n"])) for i in range(subdim)
            ]
            for r in rows
        }
    # persist stays (callers may scan codes more than once) but the
    # eager count() is gone: the first consumer materializes the cache
    # in its own job — one fewer sequential driver round-trip
    codes = (
        _assign(cents)
        .select(F.col(id_col), "s", F.col("cluster").alias("code"))
        .persist()
    )
    sub.unpersist()
    books: list[list[tuple[int, list[int]]]] = [
        sorted(
            (c, cv) for (s, c), cv in cents.items() if s == si
        )
        for si in range(m)
    ]
    return codes, books


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-``k`` search over PQ codes: per
    query, the exact integer squared-L2 distance to each CODEBOOK
    reconstruction — computed as a per-subspace lookup-table sum, never
    touching the original vectors at query time.

    Plan (the PQ scale story): the LUT (queries × m × k_codes integer
    distances) broadcasts; the long-form code table joins it on
    ``(s, code)`` and one sum-by-(query, id) scores the whole corpus —
    a compressed linear scan with no shuffle wider than the score
    frame itself. Ties break (distance, id) so ranking is total.

    Returns ``(query_id, id_col, adc_dist, rank)``.
    """
    codes, books = pq_train_encode(
        vectors, id_col, vec_col, m=m, k_codes=k_codes, iterations=iterations
    )
    spark = vectors.sparkSession
    subdim = len(books[0][0][1])
    book_df = spark.createDataFrame(
        [(s, c, [int(x) for x in cv]) for s, book in enumerate(books)
         for c, cv in book],
        "s int, code long, _cv array<long>",
    )
    qq = queries.select(
        F.col(query_id_col),
        F.transform(
            F.col(vec_col), lambda x: F.round(x * QUANT_SCALE).cast("long")
        ).alias("qv"),
    )
    slices = F.array(
        *[F.slice("qv", s * subdim + 1, subdim) for s in range(m)]
    )
    qsub = qq.select(
        F.col(query_id_col), F.posexplode(slices).alias("s", "_sq")
    )
    sq = F.aggregate(
        F.zip_with("_sq", "_cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    lut = qsub.join(F.broadcast(book_df), "s").select(
        F.col(query_id_col), "s", "code", sq.alias("_d")
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_d").alias("adc_dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", id_col)
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )
    from neo4j_arrow_spark.operators.dedup import _with_intermediates

    return _with_intermediates(out, [codes])


def _l2q_kernel(qv_col: str, nv_col: str):
    """Vectorized integer squared-L2 column: exact longs, summation-
    order-independent, so the numpy kernel is drift-free vs the JVM
    fold by construction (guide §4.2)."""
    import numpy as np

    def _l2q(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        for qv, nv in it:
            a = np.stack(qv.to_numpy()).astype(np.int64)
            b = np.stack(nv.to_numpy()).astype(np.int64)
            d = a - b
            yield pd.Series((d * d).sum(axis=1))

    udf = F.pandas_udf(_l2q, "long")
    return udf(qv_col, nv_col)


def l2q_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k by squared L2 distance on the QUANT_SCALE-quantized
    grid — the ground truth for the PQ/ADC index (pq_train_encode
    quantizes to the same grid, so ADC error is measured against the
    metric it actually approximates, not cosine). Integer arithmetic
    end-to-end: rounding to the power-of-two grid is exact, distances
    are exact longs, ranking ties break on neighbor id.

    Output: (query_id, neighbor_id, rank, l2q). Self-matches are kept
    (dist 0, rank 1), matching pq_topk's candidate set."""
    quant = lambda c: F.transform(  # noqa: E731
        F.col(c), lambda x: F.round(x * QUANT_SCALE).cast("long")
    )
    q = queries.select(F.col(id_col).alias("query_id"), quant(vec_col).alias("qv"))
    n = items.select(F.col(id_col).alias("neighbor_id"), quant(vec_col).alias("nv"))

    # Integer distances are summation-order-independent (exact longs),
    # so the per-pair JVM higher-order fold — the slowest expression in
    # the plan by an order of magnitude — can be a vectorized Arrow
    # kernel with no cross-engine drift at all (guide §4.2).
    scored = q.join(n, how="cross").select(
        "query_id",
        "neighbor_id",
        _l2q_kernel("qv", "nv").alias("l2q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2q").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "l2q")
    )
