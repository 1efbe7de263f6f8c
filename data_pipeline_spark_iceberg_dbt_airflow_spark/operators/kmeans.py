"""Distributed k-means (Lloyd's iterations) for IVF coarse quantization.

The ANN family's IVF branch (`queries/similarity.py`) restricts top-k
probes to the query's coarse cell; the driver testdata ships a `label`
column that stands in for that assignment. This operator computes the
assignment for real, DataFrame-first, so a corpus WITHOUT precomputed
cells can still take the IVF path. The reference has no clustering
surface; this is part of the training-data extension set (SURVEY.md
north-star: "an IVF ... variant as the scale path").

Scale shape (the whole point of this rendering):

- **Assignment is pure codegen, zero shuffle.** The k centroids are
  inlined as literal arrays into one `array_min(array(struct(dist,
  cid)...))` expression (the same literal-inlining trick as the LSH
  plane matrix, `queries/similarity.py`). Each Lloyd round is therefore
  ONE map-side pass over the corpus -- no join against a centroid table,
  no broadcast exchange, nothing for AQE to re-plan. Literal inlining
  is right at coarse-quantizer scale (k up to a few hundred): the
  bloom operator measured that codegen rebuilds LARGE array literals
  per row (`operators/bloom.py`), so a many-thousand-cell quantizer
  should switch assignment to the same single-row-broadcast pattern
  (bound centroid matrix column + an `aggregate` argmin).
- **The update shuffle is k x dim rows, not N.** Per-dim sums go
  through posexplode -> groupBy(cluster, dim) -> SUM, which is map-side
  combinable: every map task emits at most k*dim partial rows no matter
  how many vectors it scanned. The driver then collects k*dim finished
  sums -- bounded by the model size, independent of corpus size (the
  legitimate kind of collect, like the graph operator's convergence
  scalar).
- **Determinism by exact arithmetic.** Double sums are
  addition-order-dependent, and shuffle arrival order is not stable, so
  naive float centroids would differ run to run and break the repo's
  engine-parity discipline. Contributions are summed as DECIMAL(38,12)
  (exact, hence order-independent); the mean is computed in decimal and
  only then cast to double. Same input => bit-identical centroids, any
  partitioning, every run (pinned by a repartition test).
- Seeding is hash-ranked (md5 of the id): deterministic, spread across
  the id space, no sequential k-means++ dependence on a prior draw --
  one TakeOrdered top-k job, no driver-side scan.

Measured scale-law (local[32], round 4, synthetic 64-dim corpora, k=8,
5 Lloyd rounds): 2k vectors 7.0s vs 20k vectors 5.2s -- 10x the corpus
for flat wall-clock, i.e. fixed overhead (codegen + per-round job
latency) dominates locally and the per-row assignment term stays
invisible until N is millions; the k x dim update shuffle and driver
collect are corpus-size-independent by construction.

Empty clusters keep their previous centroid (the standard Lloyd
choice). Rows with NULL or wrong-length vectors are excluded from
fitting and assigned a NULL cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Iteration backstop. Lloyd's cost is non-increasing, and with exact
#: decimal centroid arithmetic the fixpoint test below is meaningful;
#: IVF coarse quantizers do not need tight convergence (a few rounds of
#: refinement already yield usable cells), so running out of iterations
#: returns the current model rather than raising.
MAX_KMEANS_ITERATIONS = 10


class CorpusTooSmallError(ValueError):
    """Fewer valid vectors than the k the fit needs. A dedicated type
    (not message matching) so callers like ``recall_report`` can
    distinguish the skippable too-small-corpus case from genuine
    ValueErrors (indivisible dim, internal bugs). Subclasses ValueError
    for back-compat with callers that caught that."""

#: Exact-sum type for centroid updates: float32 inputs (|x| < ~1e9)
#: leave 26 integral digits of headroom at scale 12, enough for >1e16
#: members per cluster before overflow -- and decimal overflow in Spark
#: ANSI mode raises loudly rather than silently wrapping.
_SUM_TYPE = "decimal(38,12)"


def _dist2(vec: Column, centroid: list[float] | Column) -> Column:
    """Squared L2 distance from ``vec`` to a centroid given as a
    LITERAL list or an already-built array Column (operators/pq.py
    passes codebook lookups).

    zip_with pairs index-wise and the fold adds strictly left to right:
    per-row the arithmetic order is fixed, so distances (and hence
    assignments) are deterministic even though they are doubles.
    """
    if isinstance(centroid, Column):
        lit = centroid
    else:
        # one py4j round trip for the whole centroid (a per-element
        # CreateArray costs D driver round trips per reference)
        from ..functions.lits import array_lit

        lit = array_lit(centroid)
    return F.aggregate(
        F.zip_with(
            lit, vec, lambda c, x: (x.cast("double") - c) * (x.cast("double") - c)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Add ``out_col`` = id of the nearest centroid (NULL for NULL or
    wrong-length vectors). One codegen expression, no join, no shuffle;
    ties break to the smallest cluster id via struct ordering."""
    if not centroids:
        raise ValueError("assign_clusters needs at least one centroid")
    dim = len(next(iter(centroids.values())))
    v = F.col(vec_col)
    choices = F.array(
        *[
            F.struct(
                _dist2(v, c).alias("d"), F.lit(int(cid)).alias("cid")
            )
            for cid, c in sorted(centroids.items())
        ]
    )
    argmin = F.array_min(choices)["cid"]
    return vectors.withColumn(
        out_col,
        F.when(v.isNull() | (F.size(v) != dim), F.lit(None).cast("int")).otherwise(
            argmin
        ),
    )


def _seed_centroids(
    vectors: DataFrame, k: int, id_col: str, vec_col: str
) -> dict[int, list[float]]:
    """Deterministic spread seeds: the k vectors with the smallest
    md5(id) rank (id tie-break makes the order total). One
    TakeOrderedAndProject job over (digest, id, vector)."""
    seeds = (
        vectors.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col).alias("i"),
            F.col(vec_col).alias("v"),
        )
        .orderBy("h", "i")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise CorpusTooSmallError(
            f"need at least k={k} valid vectors, found {len(seeds)}"
        )
    return {
        i: [float(x) for x in row["v"]] for i, row in enumerate(seeds)
    }


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = MAX_KMEANS_ITERATIONS,
) -> dict[int, list[float]]:
    """Fit k centroids with Lloyd's algorithm; return {cluster_id: centroid}.

    The model (k x dim floats) lives at the driver -- it is the thing
    that gets inlined as literals into downstream assignment expressions,
    exactly like a broadcast variable but visible to Catalyst. Stops at
    the exact fixpoint (decimal means unchanged) or after
    ``max_iterations``.
    """
    # Reference dimension: the vector of the SMALLEST id -- deterministic
    # under any partitioning, unlike an unordered limit(1) (a
    # mixed-dimension corpus would otherwise fit a nondeterministic row
    # subset run to run).
    first = (
        vectors.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("i"), F.size(vec_col).alias("d"))
        .orderBy("i")
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kmeans_fit on an empty vector column")
    dim = first[0]["d"]
    clean = vectors.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))

    centroids = _seed_centroids(clean, k, "__id", "__v")
    for _ in range(max_iterations):
        assigned = assign_clusters(clean, centroids, vec_col="__v")
        sums = (
            assigned.select("cluster", F.posexplode("__v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("val").cast(_SUM_TYPE)).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # k*dim rows: bounded by model size, not corpus size
        )
        new_centroids = {cid: list(c) for cid, c in centroids.items()}
        by_cluster: dict[int, list] = {}
        for row in sums:
            by_cluster.setdefault(row["cluster"], []).append(row)
        for cid, rows in by_cluster.items():
            cent = new_centroids[cid]
            for row in rows:
                # decimal / int division stays exact-decimal in Spark;
                # here the mean is finished driver-side in one float op
                # per dim from the EXACT sum, so it is order-independent.
                cent[row["dim"]] = float(row["s"] / row["n"])
        if new_centroids == centroids:
            break
        centroids = new_centroids
    return centroids


def kmeans_cost(
    vectors: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the assigned centroid (the Lloyd
    objective; non-increasing across iterations). One scan + one scalar."""
    assigned = assign_clusters(vectors, centroids, vec_col=vec_col)
    dim = len(next(iter(centroids.values())))
    dist_cases = F.array(
        *[
            F.struct(F.lit(int(cid)).alias("cid"), _dist2(F.col(vec_col), c).alias("d"))
            for cid, c in sorted(centroids.items())
        ]
    )
    picked = F.filter(dist_cases, lambda s: s["cid"] == F.col("cluster"))[0]["d"]
    row = (
        assigned.where(F.col("cluster").isNotNull())
        .select(picked.alias("d"))
        .agg(F.sum("d").alias("cost"))
        .collect()
    )
    return float(row[0]["cost"] or 0.0)
