"""Similarity search over the ``embeddings`` table (64-dim float vectors).

North-star extension set: brute-force cosine top-k as the exact baseline,
an IVF-style cell-restricted top-k as the scale path, threshold pair
mining, and an Arrow-vectorized pandas_udf variant (the UDF surface,
SURVEY.md §2.10 X2).

Numeric determinism: both engines cast float32 elements to double and fold
the product sum strictly left-to-right (Spark ``aggregate`` over
``zip_with``; DuckDB ``list_sum`` over ``list_transform``), so cosines are
bit-identical and ORDER BY cosine ranks identically -- ties additionally
broken by vec_id.

Scale design (100 TB):
- Brute-force is exact k-NN done right: the QUERY BATCH is broadcast
  (bounded, here 8 vectors) and the candidate set streams through one
  scan -- cost O(N x Q), no shuffle of the big side, never an N x N
  crossJoin.
- IVF restricts candidates to the query's coarse cell (the ``label``
  column stands in for a k-means assignment): an equi-join on the cell id
  turns O(N) probes per query into O(N / cells), the standard
  inverted-file ANN trade.
- Pair mining stays inside cells (blocked all-pairs); a hot cell is the
  skew risk and would be salted at real scale.
- The pandas_udf path moves vectors through Arrow once per batch and does
  the arithmetic in NumPy -- the pattern for when the kernel outgrows SQL
  expressions (quantization, PQ codes, re-ranking).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table
from .registry import register

#: Query batch: the first QUERY_N vectors by vec_id.
QUERY_N = 8
TOP_K = 3
PAIR_THRESHOLD = 0.4


def dot(a: Column, b: Column) -> Column:
    """Strict left-to-right double-precision dot product of two arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _o_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def _o_norm(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def _o_cosine(a: str, b: str) -> str:
    return f"({_o_dot(a, b)} / ({_o_norm(a)} * {_o_norm(b)}))"


@register(
    "sim_topk_bruteforce",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < {QUERY_N}),
        s AS (SELECT q.q_id, e.vec_id,
                     {_o_cosine("q.q_emb", "e.embedding")} AS cosine
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
              FROM s)
        WHERE rank <= {TOP_K}
    """,
    doc="Exact cosine top-k, the ANN recall baseline: broadcast the "
    "(bounded) query batch against one streaming scan of the corpus, "
    "rank per query. The corpus side never shuffles for the join; the "
    "only shuffle is the final per-query ranking on q_id -- Q x N rows "
    "of (id, id, double), not vectors.",
    bench=True,
    tags=("similarity", "llm-data"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    # Norms once per VECTOR (pre-join projection), not once per PAIR:
    # cuts the fold work per pair from 3 to 1. Same doubles -- a vector's
    # norm is pair-independent -- so oracle parity is unaffected.
    emb_n = emb.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q = emb_n.where(F.col("vec_id") < QUERY_N).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        emb_n.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cosine", "rank")
    )


@register(
    "sim_topk_ivf",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                          embedding AS q_emb
                   FROM embeddings WHERE vec_id < {QUERY_N}),
        s AS (SELECT q.q_id, e.vec_id,
                     {_o_cosine("q.q_emb", "e.embedding")} AS cosine
              FROM q JOIN embeddings e
                ON e.label = q.q_label AND e.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
              FROM s)
        WHERE rank <= {TOP_K}
    """,
    doc="IVF-style ANN top-k: candidates restricted to the query's coarse "
    "cell (label = precomputed k-means assignment), probing 1/cells of "
    "the corpus per query -- the inverted-file trade of recall for a "
    "cells-fold cost cut. The cell restriction is a broadcast-hash "
    "equi-join on the cell id (plan-asserted), so the corpus side still "
    "never shuffles.",
    bench=True,
    tags=("similarity", "llm-data"),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    emb_n = emb.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q = emb_n.where(F.col("vec_id") < QUERY_N).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        emb_n.join(
            F.broadcast(q),
            (F.col("label") == F.col("q_label"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            "vec_id",
            (
                dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cosine", "rank")
    )


@register(
    "sim_cell_pairs",
    oracle=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               {_o_cosine("a.embedding", "b.embedding")} AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_o_cosine("a.embedding", "b.embedding")} >= {PAIR_THRESHOLD}
    """,
    doc="Embedding-cosine near-dup mining: all pairs above threshold "
    "WITHIN a cell (blocked all-pairs -- the equi-join on the cell id "
    "keeps the pair space at cells x (N/cells)^2 instead of N^2). At "
    "real scale a hot cell gets salted into sub-blocks; semantics "
    "unchanged.",
    tags=("similarity", "llm-data", "dedup"),
)
def sim_cell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    emb_n = emb.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = emb_n.select(
        F.col("vec_id").alias("vec_a"),
        "label",
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = emb_n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "label", cos.alias("cosine"))
        .where(F.col("cosine") >= PAIR_THRESHOLD)
    )


def _cosine_pandas_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine kernel: NumPy over stacked vector batches.

    Each invocation receives a few thousand (query, candidate) vector
    pairs as Arrow arrays; the arithmetic is one vectorized matmul-shaped
    pass instead of per-row Python -- the 10-100x rule from the UDF
    guidance. float64 accumulation (NumPy pairwise summation), so values
    agree with the JVM fold to ~1e-12 but are not bit-identical --
    hence rows-only registration, with equivalence to sim_topk_bruteforce
    asserted in tests at 1e-9.
    """
    import numpy as np

    av = np.stack(a.to_numpy()).astype(np.float64)
    bv = np.stack(b.to_numpy()).astype(np.float64)
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    return pd.Series(num / den)


def _cosine_pandas():
    # pandas_udf needs an active SparkSession (PySpark 4 resolves the DDL
    # return type eagerly), so construct it per-call, not at import.
    return F.pandas_udf(_cosine_pandas_kernel, "double")


@register(
    "sim_topk_pandas",
    oracle=None,  # float64 pairwise summation: ~1e-12 of the JVM fold,
    # not bit-identical -- verified against sim_topk_bruteforce in pytest.
    doc="Brute-force cosine top-k through the vectorized-UDF path (X2): "
    "same broadcast-query / streaming-candidate shape as "
    "sim_topk_bruteforce, but the kernel is an Arrow-batched pandas_udf "
    "doing NumPy batch arithmetic -- the template for kernels SQL "
    "expressions cannot host (PQ decode, re-ranking models). Ranking "
    "stays JVM-side.",
    bench=True,
    tags=("similarity", "llm-data", "pandas-udf"),
)
def sim_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < QUERY_N).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _cosine_pandas()(F.col("q_emb"), F.col("embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cosine", "rank")
    )


# --- LSH-bucketed ANN (sign random projections) ----------------------------

#: Hyperplane count: 2^LSH_PLANES buckets. Derived ONCE from md5 so both
#: engines share the identical +/-1 matrix as literals -- no cross-engine
#: hash dependency at query time.
LSH_PLANES = 6


def _lsh_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{p}|{d}".encode()).digest()[0] % 2 else -1
            for d in range(64)
        ]
        for p in range(LSH_PLANES)
    ]


def _bucket_sql(one_based: bool) -> str:
    """The bucket id as a SQL expression over ``embedding`` (engine array
    indexing differs: Spark subscripts 0-based, DuckDB 1-based)."""
    parts = []
    for p, row in enumerate(_lsh_signs()):
        terms = " + ".join(
            f"{'' if s == 1 else '-'}CAST(embedding[{d + (1 if one_based else 0)}]"
            " AS DOUBLE)"
            for d, s in enumerate(row)
        )
        parts.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


@register(
    "sim_topk_lsh",
    oracle=f"""
        WITH b AS (SELECT vec_id, embedding,
                          {_bucket_sql(one_based=True)} AS bucket
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, bucket AS q_bucket, embedding AS q_emb
              FROM b WHERE vec_id < {QUERY_N}),
        s AS (SELECT q.q_id, e.vec_id,
                     {_o_cosine("q.q_emb", "e.embedding")} AS cosine
              FROM q JOIN b e
                ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
              FROM s)
        WHERE rank <= {TOP_K}
    """,
    doc="LSH-bucketed ANN top-k (the scale path alongside sim_topk_ivf): "
    "6 sign-random-projection hyperplanes hash every vector to one of 64 "
    "buckets; candidates = the query's bucket only, shrinking the probe "
    "set ~bucket-count-fold at the cost of recall (multi-probe over "
    "neighboring buckets buys it back). The +/-1 plane matrix is derived "
    "once from md5 and inlined as literals in BOTH engines, so bucket "
    "assignment -- and therefore the result -- is engine-exact. The "
    "bucket expression is pure codegen arithmetic on the scan: no "
    "shuffle to assign buckets, one broadcast-hash join on bucket id.",
    bench=True,
    tags=("similarity", "llm-data", "lsh"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        "embedding",
        F.expr(_bucket_sql(one_based=False)).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = b.where(F.col("vec_id") < QUERY_N).select(
        F.col("vec_id").alias("q_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = b.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    ).select(
        "q_id",
        "vec_id",
        (dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cosine", "rank")
    )
