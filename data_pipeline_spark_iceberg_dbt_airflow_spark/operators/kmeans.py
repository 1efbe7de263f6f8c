"""Distributed k-means (Lloyd's iterations) for IVF coarse quantization.

The ANN family's IVF branch (`queries/similarity.py`) restricts top-k
probes to the query's coarse cell; the driver testdata ships a `label`
column that stands in for that assignment. This operator computes the
assignment for real, DataFrame-first, so a corpus WITHOUT precomputed
cells can still take the IVF path. The reference has no clustering
surface; this is part of the training-data extension set (SURVEY.md
north-star: "an IVF ... variant as the scale path").

Scale shape (the whole point of this rendering):

- **Assignment is pure codegen, zero shuffle.** The k x dim centroid
  matrix is inlined as ONE nested-array literal and the argmin is a
  `transform(sequence(0, k-1), ...)` over it (the same
  literal-inlining trick as the LSH plane matrix,
  `queries/similarity.py`, in its k-invariant-tree form). Each Lloyd
  round is therefore ONE map-side pass over the corpus -- no join
  against a centroid table, no broadcast exchange, nothing for AQE to
  re-plan -- and the expression TREE stays a handful of nodes no
  matter the k (the matrix constant-folds to a single Literal), so
  per-round analyzer/optimizer/Janino cost is flat. The earlier
  unrolled per-centroid form paid ~13s/round of driver-side plan cost
  at k=200 against 0.36s of execution (see assign_clusters).
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

import pandas as pd
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

#: assign_clusters switches from the pure-Catalyst expression to the
#: Arrow/numpy kernel above this many distance terms (k x dim): the
#: HOF expression's interpreted eval is per-term, the kernel is
#: vectorized, and the two are bit-equal (see _assign_vectorized).
#: 4096 keeps every oracle-checked small-k rendering (k <= 8, dim 64)
#: on the expression path.
_VECTORIZED_CELLS = 4096

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
    ties break to the smallest cluster id via struct ordering.

    The k centroids travel as ONE nested-array literal indexed by a
    ``transform(sequence(0, k-1), ...)`` argmin, NOT as k separate
    per-centroid distance subtrees: the expression tree is k-invariant
    (the matrix constant-folds to a single Literal on the optimizer's
    first pass), where the unrolled form was ~k*dim nodes that every
    analyzer/optimizer rule re-walked and Janino recompiled PER ACTION
    -- at k=200 x dim=64 that was ~13s of driver-side plan cost per
    Lloyd round against 0.36s of execution (measured round 8, 50k
    rows; the rewrite is arithmetic-identical, so models and
    assignments stay bit-equal).

    Above ``_VECTORIZED_CELLS`` distance terms (k x dim) the work is
    delegated to the Arrow/numpy kernel (`_assign_vectorized`): the
    higher-order-function expression is CodegenFallback and its
    interpreted eval measured 8.2s for one 50k x k=200 pass where the
    kernel takes ~1s. The kernel is bit-equal by construction (strict
    left-fold distances, same tie rule -- see its docstring), so which
    path runs is invisible in results; small-k callers (the
    driver-oracle-checked IVF/semdedup renderings, k <= 8) stay on
    the pure-Catalyst expression and keep Python out of their plans."""
    if not centroids:
        raise ValueError("assign_clusters needs at least one centroid")
    from ..functions.lits import array_lit

    items = sorted(centroids.items())
    dim = len(items[0][1])
    k = len(items)
    if k * dim > _VECTORIZED_CELLS:
        return _assign_vectorized(vectors, centroids, vec_col, out_col)
    v = F.col(vec_col)
    mat = array_lit([c for _, c in items])
    cids = F.expr(
        "array(" + ",".join(str(int(cid)) for cid, _ in items) + ")"
    )
    choices = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.struct(
            _dist2(v, F.element_at(mat, i + 1)).alias("d"),
            F.element_at(cids, i + 1).alias("cid"),
        ),
    )
    argmin = F.array_min(choices)["cid"]
    return vectors.withColumn(
        out_col,
        F.when(v.isNull() | (F.size(v) != dim), F.lit(None).cast("int")).otherwise(
            argmin
        ),
    )


def _assign_vectorized(
    vectors: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str,
    out_col: str,
) -> DataFrame:
    """Arrow-vectorized nearest-centroid assignment for the Lloyd hot
    loop: one scalar pandas_udf whose batch body is numpy, ~10x the
    throughput of the interpreted higher-order-function expression at
    k in the hundreds (HOFs are CodegenFallback -- measured 9.5s vs
    ~1s per round at 50k x k=200 x dim=64, round 8).

    BIT-EQUAL to ``assign_clusters`` by construction, ties included.
    The reference arithmetic is the strict left fold
    ``acc += (x_j - c_j)^2`` in dimension order -- the exact add order
    of `_dist2`'s ``aggregate`` in the same IEEE doubles. A bare
    ``|x|^2 - 2xC^T + |c|^2`` matmul rounds DIFFERENTLY, breaks exact
    distance TIES differently, and was measured steering Lloyd to a
    different fixpoint on a tied fixture (tests/test_semdedup.py) --
    so the kernel uses the matmul only as a provably-banded SCREEN
    (round 9): any centroid whose BLAS distance interval
    [d - 3e-13*B, d + 3e-13*B] cannot reach the best's provably
    cannot win or tie the fold argmin (B bounds both computations'
    rounding; see the GAMMA derivation below), and the few candidates
    that can are re-evaluated with the exact fold. The returned pick
    is therefore the fold argmin bit-for-bit, at matmul speed (~23x
    the all-fold kernel at k=4000 x dim=64, ~150x the interpreted
    HOF expression). argmin takes the first minimum with
    centroid rows in cluster-id order = array_min's (d, cid) struct
    ordering. NULL/wrong-length vectors get NULL. Rows with a NaN or
    NULL element (np.asarray renders a None element as NaN -- the two
    are indistinguishable post-Arrow) are masked to NULL cluster, not
    folded: STRICTER than the expression path, which NaN-orders /
    NULL-propagates them into an arbitrary pick -- but never different
    on valid input, and every fit caller excludes NULL-element and NaN
    vectors upstream (semdedup/classifier share the exists(isNull |
    isnan) gate; round-8 ADVICE closed the isnan-only hole), so the
    mask is defense against a caller that forgets, not a live path.

    INTERNAL to ``kmeans_fit``: the public ``assign_clusters`` stays
    the pure-Catalyst expression, so driver-oracle-checked query plans
    keep zero Python in them."""
    import numpy as np

    items = sorted(centroids.items())
    mat = np.asarray([c for _, c in items], dtype=np.float64)
    ids = np.asarray([cid for cid, _ in items], dtype=np.int64)
    dim = mat.shape[1]
    cc = np.einsum("ij,ij->i", mat, mat)

    @F.pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        out = np.full(len(col), -1, dtype=np.int64)
        rows = {
            i: np.asarray(col.iloc[i], dtype=np.float64)
            for i, v in enumerate(col)
            if v is not None and len(v) == dim
        }
        valid = [i for i, r in rows.items() if not np.isnan(r).any()]
        if valid:
            x = np.vstack([rows[i] for i in valid])
            out[valid] = ids[_banded_argmin(x, mat, cc)]
        s = pd.Series(out, dtype="Int64")
        return s.mask(s < 0).astype("Int32")

    return vectors.withColumn(out_col, nearest(F.col(vec_col)))


def _fold_rows(xr, mt):
    """The reference fold: acc += (x_j - c_j)^2 dimension-by-dimension,
    the exact add order (and IEEE doubles) of _dist2's aggregate
    expression."""
    import numpy as np

    acc = np.zeros((xr.shape[0], mt.shape[0]))
    for j in range(mt.shape[1]):
        t = xr[:, j, None] - mt[None, :, j]
        acc += t * t
    return acc


#: The fold and the BLAS expansion |x|^2 - 2x.c + |c|^2 each deviate
#: from the true distance by <= ~2.3e-14 * B where
#: B = |x|^2 + 2|x.c| + |c|^2 (gamma_n summation bounds at dim=64;
#: every fold term is nonnegative so its bound is relative to the
#: distance itself, the expansion's must absorb cancellation via B).
#: GAMMA = 3e-13 * B therefore brackets |d_blas - d_fold| with >10x
#: margin: a centroid whose banded interval cannot reach the best's
#: provably cannot win OR tie the fold argmin, and the few that can
#: are re-folded exactly (in centroid-id order, first minimum --
#: argmin's own tie rule). Measured 23x over the all-fold kernel at
#: 2000 x k=4000 x dim=64 with bit-identical picks on exact-tie,
#: large-norm-cancellation and quantized fixtures (round 9).
_GAMMA = 3e-13


def _banded_argmin(x, mat, cc):
    """Exact fold-argmin row picks (indices into ``mat``'s rows) at
    matmul speed: the BLAS expansion as a provably-banded SCREEN (see
    _GAMMA), the reference fold on the few candidates the band cannot
    separate. The pick equals ``argmin(_fold_rows(x, mat))``
    bit-for-bit, ties included (first minimum in row order). ``cc`` is
    the precomputed per-centroid |c|^2. Extracted verbatim from the
    round-9 assignment kernel (round 12) so the hierarchical
    quantizer's per-cell fine pick reuses the SAME screen+refold
    arithmetic; pinned by the kernel-vs-expression differential
    fixtures in tests/test_kmeans.py."""
    import numpy as np

    # Bound the kernel's working set: the (rows x k) distance/band
    # temporaries are chunked so chunk*k stays ~8M doubles (~64MB/array)
    # no matter the Arrow batch size or k -- at k=4000 an unchunked
    # 10k-row batch would hold ~320MB temporaries PER concurrent task.
    chunk_rows = max(1, 8_000_000 // max(1, mat.shape[0]))
    picks = np.empty(x.shape[0], dtype=np.int64)
    for lo in range(0, x.shape[0], chunk_rows):
        xc = x[lo : lo + chunk_rows]
        n = xc.shape[0]
        xx = np.einsum("ij,ij->i", xc, xc)
        dots = xc @ mat.T
        d = dots * -2.0
        d += xx[:, None]
        d += cc[None, :]
        # non-finite d rows make the band meaningless (NaN
        # comparisons silently skip the refold, and a -inf
        # entry would win an argmin the fold never saw).
        # Checking d catches BOTH causes: literal +-inf
        # elements (inf-inf = NaN in the expansion) AND
        # finite elements ~1e155+ whose squares overflow
        # xx/dots (round-9 ADVICE -- the old isfinite(xc)
        # guard missed the overflow class). Route every such
        # row (never produced by any real embedding) through
        # the reference fold.
        inf_rows = ~np.isfinite(d).all(axis=1)
        if inf_rows.any():
            picks_inf = np.argmin(
                _fold_rows(xc[inf_rows], mat), axis=1
            )
        best = np.argmin(d, axis=1)
        rix = np.arange(n)
        dmin = d[rix, best]
        # reuse dots as the band matrix, then d as the lower
        # bound d - band
        np.abs(dots, out=dots)
        dots *= 2.0
        dots += xx[:, None]
        dots += cc[None, :]
        dots *= _GAMMA
        thresh = dmin + dots[rix, best]
        d -= dots
        amb = d <= thresh[:, None]
        hard = np.nonzero(amb.sum(axis=1) > 1)[0]
        if len(hard):
            # batch refolds by candidate set: duplicated
            # centroids (a real fit shape -- duplicate corpus
            # docs can both seed) make EVERY row of those
            # cells ambiguous with the SAME candidate pair,
            # so grouping turns a per-row python loop into
            # one fold per distinct set
            groups: dict[tuple, list] = {}
            for i in hard:
                key = tuple(np.nonzero(amb[i])[0])
                groups.setdefault(key, []).append(i)
            for cand_t, idxs in groups.items():
                cand = np.asarray(cand_t)
                accs = _fold_rows(xc[idxs], mat[cand])
                best[idxs] = cand[np.argmin(accs, axis=1)]
        if inf_rows.any():
            best[inf_rows] = picks_inf
        picks[lo : lo + chunk_rows] = best
    return picks


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
    fit_sample: int | None = None,
) -> dict[int, list[float]]:
    """Fit k centroids with Lloyd's algorithm; return {cluster_id: centroid}.

    The model (k x dim floats) lives at the driver -- it is the thing
    that gets inlined as literals into downstream assignment expressions,
    exactly like a broadcast variable but visible to Catalyst. Stops at
    the exact fixpoint (decimal means unchanged) or after
    ``max_iterations``.

    ``fit_sample`` bounds the Lloyd loop's corpus term: when set, the
    rounds run over the ``fit_sample`` vectors with the smallest
    md5(id) rank (id tie-break) instead of the whole corpus -- the
    SAME ranking the seeder uses, so the sample is a superset of the
    seeds by construction and the seed model is unchanged. This is
    the scale escape for quantizers sized proportionally to the
    corpus (k ~ N makes the per-round assignment term N*k ~ N^2):
    coarse cells only need to be REPRESENTATIVE, not converged on
    every row, and an md5-ranked sample is an unbiased fixed-size
    draw that is deterministic under any partitioning. Measured at
    200k x 64-dim, k=800: full fit 98.2s -> fit_sample=40k 25.6s with
    downstream semantic-dup drops within noise (SCALING.md). The
    sample is localCheckpointed (sample-sized, bounded by the caller)
    so rounds re-scan the sample, not the corpus lineage. A sample
    smaller than k raises CorpusTooSmallError from the seeder.
    ``None`` (default) fits on every valid vector, exactly as before.
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
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        # NaN/NULL-element vectors would be masked to NULL cluster by
        # the assignment kernel and crash the centroid-update loop
        # (KeyError None); they can't be fitted either way -- the same
        # gate semdedup/classifier apply upstream, now enforced here
        # so the public operator holds its own contract
        & ~F.exists(
            F.col(vec_col), lambda x: x.isNull() | F.isnan(x)
        )
    ).select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))

    fit_rows = clean
    if fit_sample is not None and max_iterations > 0:
        # the md5-ranked head: one TakeOrdered-shaped job, then a
        # truncated (checkpointed) sample-sized frame for the rounds
        # A global sort-limit lands the sample in ONE partition (the
        # limit's single-partition collect shape) -- left that way,
        # every Lloyd round would run on one core (measured 2x SLOWER
        # than the unsampled fit at 200k). Re-spread by id hash before
        # checkpointing; the model is partitioning-independent by the
        # decimal-sum design, so the spread is free of semantics.
        par = vectors.sparkSession.sparkContext.defaultParallelism
        fit_rows = (
            clean.select(
                F.md5(F.col("__id").cast("string")).alias("__h"),
                "__id",
                "__v",
            )
            .orderBy("__h", "__id")
            .limit(int(fit_sample))
            .drop("__h")
            .repartition(par, "__id")
            .localCheckpoint(eager=True)
        )
    centroids = _seed_centroids(fit_rows, k, "__id", "__v")
    for _ in range(max_iterations):
        # hot loop: vectorized assignment (see _assign_vectorized); the
        # update sums stay exact-decimal Spark aggregation, so the
        # model remains bit-identical under any partitioning
        assigned = _assign_vectorized(
            fit_rows, centroids, vec_col="__v", out_col="cluster"
        )
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
    from ..functions.lits import array_lit

    assigned = assign_clusters(vectors, centroids, vec_col=vec_col)
    items = sorted(centroids.items())
    # same k-invariant literal-matrix shape as assign_clusters
    mat = array_lit([c for _, c in items])
    cids = F.expr(
        "array(" + ",".join(str(int(cid)) for cid, _ in items) + ")"
    )
    picked = _dist2(
        F.col(vec_col),
        F.element_at(mat, F.array_position(cids, F.col("cluster")).cast("int")),
    )
    row = (
        assigned.where(F.col("cluster").isNotNull())
        .select(picked.alias("d"))
        .agg(F.sum("d").alias("cost"))
        .collect()
    )
    return float(row[0]["cost"] or 0.0)
