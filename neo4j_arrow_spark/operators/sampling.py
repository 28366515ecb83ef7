"""Dataset splitting, stratified sampling, vocabulary building —
the selection layer of a training-data pipeline.

All three are deterministic functions of the data (hash-based, never
``rand()``): reruns, retries, and engine changes reproduce the same
split — a hard requirement for leakage-free train/test protocols —
and the DuckDB oracle can verify them exactly.

Scale notes: ``hash_split`` is map-only (no shuffle at any size).
``stratified_sample`` is one shuffle on the label; a skewed label is
one hot partition — acceptable because the window only keeps k rows
per label (rank short-circuits are not available, but AQE splits the
sort). ``build_vocab`` is the classic two-aggregation plan (per-doc
distinct -> df count); the top-n is a single-partition sort of an
already-df-filtered vocabulary, the same budget as the minhash df-cap
in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions.hashing import hash64
from neo4j_arrow_spark.functions.textfns import tokens

__all__ = ["hash_split", "stratified_sample", "build_vocab", "weighted_sample"]


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Assign every row to a named split by hashing its id: bucket =
    md5-hash(id) % 100, split = the bucket's range in cumulative
    percentage order. ``splits`` maps name -> percentage and must sum
    to 100. Map-only; adding data never reassigns existing rows."""
    splits = splits or {"train": 98, "valid": 1, "test": 1}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = F.pmod(hash64(F.col(id_col).cast("string"), seed=seed), F.lit(100))
    expr = None
    cum = 0
    for name, pct in splits.items():
        cum += pct
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, label_col: str, id_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Deterministic k rows per label value: rank rows within each
    label by (md5-hash(id), id) and keep the first k — a reproducible
    uniform-without-replacement sample per stratum."""
    w = Window.partitionBy(label_col).orderBy(
        hash64(F.col(id_col).cast("string"), seed=seed), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sampling with per-row keep probability
    ``weight_col`` (a [0,1] column — e.g. a quality score): keep a row
    iff ``hash(id) mod 1e6 < round(weight * 1e6)``. This is the
    quality-weighted subsampling step of a corpus pipeline (keep good
    documents with high probability, down-weight boilerplate) made
    reproducible: the decision is a pure integer function of (id,
    weight, seed), so reruns and engines agree row-for-row — unlike
    ``rand()``-based sampling, which can never be oracle-verified.
    Map-only: no shuffle at any scale."""
    thresh = F.round(F.col(weight_col) * 1_000_000, 0).cast("long")
    draw = F.pmod(hash64(F.col(id_col).cast("string"), seed=seed), F.lit(1_000_000))
    return df.filter(draw < thresh)


def build_vocab(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_df: int = 2,
    top_n: int = 200,
) -> DataFrame:
    """Token vocabulary by document frequency: ``(token, df, rank)``
    for the ``top_n`` tokens appearing in at least ``min_df`` distinct
    documents. Rank order (df desc, token asc) is total, so the cut is
    deterministic."""
    tok_docs = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .dropDuplicates([id_col, "token"])
    )
    dfreq = tok_docs.groupBy("token").agg(F.count("*").alias("df"))
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # top-k (per-partition heaps, merged at the driver), unlike a global
    # row_number window which drags the whole vocabulary into a single
    # partition. Ranking the surviving top_n rows then needs no window
    # at all (an unpartitioned window single-partitions and warns even
    # over tiny inputs): rank = 1 + |rows strictly ahead|, a broadcast
    # self-join over at most top_n rows.
    top = (
        dfreq.filter(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(top_n)
    )
    a, b = top.alias("a"), top.alias("b")
    ahead = (F.col("b.df") > F.col("a.df")) | (
        (F.col("b.df") == F.col("a.df")) & (F.col("b.token") < F.col("a.token"))
    )
    return (
        a.join(F.broadcast(b), ahead, "left")
        .groupBy(F.col("a.token").alias("token"), F.col("a.df").alias("df"))
        .agg((F.count("b.token") + 1).alias("rank"))
    )


def temperature_weights(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling weights per group (the multilingual-
    corpus rebalancing rule: sample group g with probability
    proportional to ``p_g^alpha`` instead of its raw share ``p_g``,
    up-weighting tail languages/sources).

    Returns ``(group, n_docs, p_raw, p_temp, boost)`` where ``p_temp =
    p_g^alpha / sum(p^alpha)`` and ``boost = p_temp / p_raw`` (the
    per-doc oversampling factor a sampler applies within the group).
    Doubles are rounded to ``round_to`` decimals — with the default
    alpha=0.5 the power is an IEEE-correctly-rounded sqrt on every
    engine, so rounding only absorbs the final sum-order ulp.

    Plan: one map-side-combinable groupBy + a broadcast 1-row scalar
    join (group cardinality is languages/sources — tiny by nature)."""
    counts = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").alias("_n"),
        F.sum(F.pow(F.col("n_docs"), F.lit(alpha))).alias("_zn"),
    )
    # p_g^alpha / Z where Z = sum n^alpha / N^alpha cancels N^alpha:
    # work in counts directly to avoid an extra division's rounding
    return counts.crossJoin(F.broadcast(tot)).select(
        "group",
        "n_docs",
        F.round(F.col("n_docs") / F.col("_n"), round_to).alias("p_raw"),
        F.round(F.pow("n_docs", F.lit(alpha)) / F.col("_zn"), round_to).alias(
            "p_temp"
        ),
        F.round(
            (F.pow("n_docs", F.lit(alpha)) / F.col("_zn"))
            / (F.col("n_docs") / F.col("_n")),
            round_to,
        ).alias("boost"),
    )
