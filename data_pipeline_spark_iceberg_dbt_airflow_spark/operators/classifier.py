"""Distributed binary logistic regression for learned quality gating.

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") and its descendants (DCLM, fastText
OH-2.5) replace hand-tuned quality heuristics with a LINEAR classifier
over cheap lexical features, trained on a small labeled seed set
(known-good pages vs raw crawl) and applied to the whole corpus. The
reference has no classifier surface (numeric price micro-batches,
/root/reference/Iceberg-dbt-project/scripts/extract_bitcoin_prices.py);
this is north-star training-data extension surface, paired with
``hash_embed`` (queries/text.py) as the feature map -- the same signed
hashing trick fastText uses for its n-gram buckets.

Spark-first shape, mirroring ``operators/kmeans.py``:

- **Scoring is pure codegen, zero shuffle.** The fitted weight vector
  is inlined as ONE literal array (``functions/lits``, one
  py4j round trip); ``sigmoid(dot(x, w) + b)`` is a single
  whole-stage-codegen expression per row. Gating 100 TB costs exactly
  one scan -- no join, no broadcast exchange, nothing stateful.
- **Each training round is one combinable aggregate.** Full-batch
  gradient descent: round t inlines w_t as literals, computes the
  per-row residual ``sigmoid(w_t . x + b_t) - y`` map-side, and sums
  ``resid * x[i]`` per feature through one groupBy-less ``agg`` of
  dim+2 sums -- map-side partials bound every task's output at dim+2
  cells regardless of row count. The driver collects dim+2 finished
  numbers per round: the model-sized collect this repo's posture
  allows (k-means k x dim, PQ codebooks, BPE argmax), never rows.
- **Determinism by exact arithmetic.** Shuffle/partition arrival order
  is not stable and double addition is not associative, so float
  gradient sums would drift run to run. Contributions are cast to
  DECIMAL(38,12) and summed exactly (order-independent), the same
  trick as the k-means centroid update -- same input => bit-identical
  weights, any partitioning (pinned by a repartition test).
- **Training cost is seed-set-sized, scoring corpus-sized.** The seed
  set is thousands of labeled docs (CCNet's is one Wikipedia dump);
  callers should ``localCheckpoint`` the joined feature frame so the
  per-round actions do not replay upstream lineage. Rounds are capped
  (gradient-norm early stop), so total work is
  O(rounds x |seed| x dim) + one corpus scan to score.

Rows whose label is NULL or whose vector is NULL / wrong-width / or
contains NaN or NULL elements are excluded from fitting; scoring such
vectors yields a NULL score (callers decide pass/fail for unscorable
docs, as the LM gate does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lits import array_sql

#: Iteration backstop. Full-batch GD on L2-normalized features with
#: unit learning rate converges geometrically on separable seed sets;
#: the gate needs a good ranking, not a tight optimum, so running out
#: returns the current model rather than raising (k-means posture).
MAX_LOGREG_ITERATIONS = 60

#: Early stop: mean-gradient infinity-norm under this is converged.
GRAD_TOL = 1e-4

#: Exact-sum type for gradient accumulation (see module docstring).
_SUM_TYPE = "decimal(38,12)"


class SeedSetError(ValueError):
    """The labeled seed set cannot train a binary classifier: empty
    after validity filtering, or single-class. A dedicated type so
    pipeline callers can fall back to the heuristic gate instead of
    swallowing genuine ValueErrors."""


def _sigmoid_margin_sql(
    vec_sql: str, weights: list[float], bias: float
) -> str:
    """sigmoid(w . x + b) as ONE SQL expression string whose GENERATED
    CODE does not depend on the model values.

    Two costs shaped this rendering (both measured dominant in early
    fits, ~1-2s/round each at dim=64):

    - **py4j chatter.** Building the expression through the Column API
      costs a JVM round trip per operator call; a training loop that
      reconstructs it every round pays hundreds of socket hops. A
      string renders driver-side for free and crosses py4j once inside
      the enclosing selectExpr (the array_lit lesson, taken one level
      up).
    - **Janino recompiles.** Weights and bias travel inside ONE array
      literal: constant-folded array literals reach codegen as
      reference objects, while a scalar bias literal would inline as a
      double constant in the generated Java -- different source every
      round, a fresh whole-stage-codegen compile every round. With the
      model array the only thing that changes, all rounds hit the same
      compiled class.

    The model array is dim+1 wide vs the dim-wide vector; ``zip_with``
    pads the vector side with one NULL, and coalescing that pad to 1.0
    makes the last term bias*1.0 -- the bias joins the same fold, as
    the LAST addend (bit-identical to a separate ``+ bias``). Callers
    must exclude vectors with NULL elements (both entry points do);
    otherwise a NULL element would silently read as 1.0.
    """
    model = array_sql(list(weights) + [float(bias)])
    dot = (
        f"aggregate(zip_with({model}, {vec_sql}, "
        f"(w, xe) -> w * coalesce(cast(xe as double), 1.0D)), "
        f"0.0D, (acc, v) -> acc + v)"
    )
    return f"(1.0D / (1.0D + exp(-({dot}))))"


def logreg_fit(
    train: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
    l2: float = 1e-3,
    learning_rate: float = 2.0,
    max_iterations: int = MAX_LOGREG_ITERATIONS,
    tol: float = GRAD_TOL,
) -> tuple[list[float], float]:
    """Fit (weights, bias) by full-batch gradient descent; one Spark
    action per round, dim+2 exact sums collected (model-sized).

    ``label_col`` must be 0/1 (castable); ``dim`` defaults to the
    width of the first valid row's vector. L2 regularization applies
    to weights only (never the bias), standard for a calibration-free
    gate. Raises :class:`SeedSetError` on an empty or single-class
    seed set -- a gate trained on one class would pass or fail
    EVERYTHING and silently neutralize curation.
    """
    # TRUNCATE lineage FIRST, filter the checkpointed frame after:
    # every round is an action, and replaying the caller's upstream
    # plan (feature join, text pipeline) per round would dominate the
    # fit. Ordering matters beyond lineage replay: a validity filter
    # placed BELOW the checkpoint gets predicate-pushed into the
    # caller's plan, where substituting the vector-producing
    # expression into `exists`/`size` re-derives the vector per
    # predicate (measured 150s of a 170s fit on a hash_embed lineage).
    # The checkpointed frame is (vector, label) x |seed| --
    # seed-set-sized -- and the filter costs one cheap pass over it.
    base = (
        train.select(
            F.col(vec_col).alias("x"),
            F.col(label_col).cast("double").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    x = F.col("x")
    has_bad = F.exists(x, lambda e: e.isNull() | F.isnan(e))
    valid = F.col("y").isNotNull() & x.isNotNull() & ~has_bad
    if dim is None:
        probe = base.where(valid).select(F.size(x).alias("d")).first()
        if probe is None:
            raise SeedSetError("seed set has no valid labeled rows")
        dim = int(probe["d"])
    rows = base.where(valid & (F.size(x) == dim))

    # class balance probe (one tiny aggregate): both classes required
    n_pos, n_neg = rows.select(
        F.sum(F.col("y").cast(_SUM_TYPE)),
        F.sum((F.lit(1.0) - F.col("y")).cast(_SUM_TYPE)),
    ).first()
    if not n_pos or not n_neg:
        raise SeedSetError(
            f"seed set needs both classes (pos={n_pos}, neg={n_neg})"
        )
    n = float(n_pos) + float(n_neg)

    weights = [0.0] * dim
    bias = 0.0
    # The per-feature sum expressions are round-invariant: build the
    # strings once. The residual is PROJECTED once below the aggregate
    # rather than repeated inside all dim+1 sums: CollapseProject
    # leaves a non-cheap producer referenced 65x in place, so the
    # sigmoid fold evaluates once per row and the aggregate's
    # expression trees stay dim-independent-small (the 65x-embedded
    # form made each round's analysis+codegen cost quadratic in dim).
    grad_sums = [
        f"sum(cast(element_at(x, {i + 1}) * r as {_SUM_TYPE})) as g{i}"
        for i in range(dim)
    ] + [f"sum(cast(r as {_SUM_TYPE})) as gb"]
    for _ in range(max_iterations):
        resid = f"({_sigmoid_margin_sql('x', weights, bias)} - y) as r"
        # dim+1 exact decimal sums in ONE combinable aggregate; each
        # map task emits dim+2 partial cells however many rows it saw
        sums = rows.selectExpr("x", resid).selectExpr(grad_sums).first()
        grad = [float(sums[i]) / n + l2 * weights[i] for i in range(dim)]
        grad_b = float(sums[dim]) / n
        weights = [
            w - learning_rate * g for w, g in zip(weights, grad)
        ]
        bias -= learning_rate * grad_b
        if max(abs(g) for g in grad + [grad_b]) < tol:
            break
    return weights, bias


def logreg_score(
    df: DataFrame,
    weights: list[float],
    bias: float,
    *,
    vec_col: str = "embedding",
    out_col: str = "score",
) -> DataFrame:
    """Append ``out_col`` = sigmoid(w . x + b): one codegen expression,
    no join, no shuffle. NULL / wrong-width / NaN vectors score NULL
    (unscorable, caller's policy decides)."""
    v = F.col(vec_col)
    scorable = (
        v.isNotNull()
        & (F.size(v) == len(weights))
        & ~F.exists(v, lambda x: x.isNull() | F.isnan(x))
    )
    return df.withColumn(
        out_col,
        F.when(
            scorable,
            F.expr(_sigmoid_margin_sql(f"`{vec_col}`", weights, bias)),
        ),
    )
