"""Distributed k-means operator (operators/kmeans.py).

k-means is iterative and float-valued, so it carries no SQL oracle;
correctness is pinned by the Lloyd invariants instead: every row lands
on its true nearest centroid (checked against an independent NumPy
recomputation), the objective is non-increasing round over round, the
model is bit-identical under repartitioning (the decimal-exact update
claim), and degenerate shapes (k=1, NULL/ragged vectors) behave.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
    assign_clusters,
    kmeans_cost,
    kmeans_fit,
)

K = 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def model(spark, emb):
    return kmeans_fit(emb, K, max_iterations=5)


def test_model_shape(model):
    assert sorted(model) == list(range(K))
    dims = {len(c) for c in model.values()}
    assert dims == {64}
    assert all(np.isfinite(c).all() for c in model.values())


def test_assignment_is_nearest_centroid(emb, model):
    """Spark's literal-inlined argmin == NumPy's argmin, every row."""
    rows = assign_clusters(emb, model).select("vec_id", "embedding", "cluster").collect()
    cents = np.array([model[i] for i in range(K)])
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        d = ((cents - v) ** 2).sum(axis=1)
        assert r["cluster"] == int(np.argmin(d)), r["vec_id"]


def test_cost_non_increasing(spark, emb):
    costs = [
        kmeans_cost(emb, kmeans_fit(emb, K, max_iterations=n))
        for n in (1, 3, 5)
    ]
    assert costs[0] >= costs[1] >= costs[2]


def test_deterministic_under_repartitioning(emb, model):
    """The decimal-exact update makes centroids independent of shuffle
    arrival order: a 7-partition refit reproduces the model bit-for-bit."""
    refit = kmeans_fit(emb.repartition(7), K, max_iterations=5)
    assert refit == model


def test_k1_is_global_mean(emb):
    model = kmeans_fit(emb, 1, max_iterations=3)
    got = np.array(model[0])
    arrs = np.array(
        [r["embedding"] for r in emb.where(F.col("embedding").isNotNull()).collect()],
        dtype=np.float64,
    )
    np.testing.assert_allclose(got, arrs.mean(axis=0), rtol=0, atol=1e-9)


def test_null_and_ragged_vectors(spark, model):
    df = spark.createDataFrame(
        [(1, None), (2, [0.0] * 3), (3, [float(i) for i in range(64)])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["cluster"] for r in assign_clusters(df, model).collect()}
    assert out[1] is None and out[2] is None and out[3] is not None


def test_assignment_plan_has_no_shuffle(emb, model):
    """Assignment must stay a map-side codegen expression: no Exchange,
    no join -- the property that makes a Lloyd round one corpus pass."""
    plan = assign_clusters(emb, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivf_cells_are_usable(emb, model):
    """End-to-end with the ANN family's IVF shape: every non-null vector
    gets a cell, and cells partition the corpus (sizes sum to N)."""
    assigned = assign_clusters(emb, model)
    sizes = assigned.groupBy("cluster").count().collect()
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert sum(r["count"] for r in sizes if r["cluster"] is not None) == n


def test_kmeans_clusters_hash_embedded_documents(spark, sf_dir):
    """End-to-end model-free topic clustering: hash_embed vectors ->
    kmeans_fit -> assignment. Every document lands in a cell, the model
    is reproducible, and planted near-duplicate texts co-cluster."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed,
    )

    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (90001, "alpha beta gamma delta epsilon zeta eta theta"),
            (90002, "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        "doc_id long, text string",
    )
    vecs = hash_embed(base.unionByName(planted), dim=64)
    model = kmeans_fit(vecs, 3, id_col="doc_id", vec_col="embedding", max_iterations=4)
    assigned = assign_clusters(vecs, model, vec_col="embedding")
    out = {r["doc_id"]: r["cluster"] for r in assigned.collect()}
    assert all(c is not None for c in out.values())
    assert out[90001] == out[90002]  # near-identical texts co-cluster
    refit = kmeans_fit(
        vecs.repartition(9), 3, id_col="doc_id", vec_col="embedding", max_iterations=4
    )
    assert refit == model


def test_fit_sample_superset_equals_full_fit(emb, model):
    """A sample at least as large as the corpus IS the corpus (the
    md5-ranked head is the whole id set), so the model must be
    bit-identical to the unsampled fit."""
    n = emb.count()
    sampled = kmeans_fit(emb, K, max_iterations=5, fit_sample=n + 10)
    assert sampled == model


def test_fit_sample_model_is_deterministic_and_usable(emb):
    """The sampled fit is a pure function of the id set (md5-ranked
    head), so repartitioning cannot move it; the model still assigns
    every valid vector of the FULL corpus."""
    a = kmeans_fit(emb, K, max_iterations=3, fit_sample=20)
    b = kmeans_fit(
        emb.repartition(7), K, max_iterations=3, fit_sample=20
    )
    assert a == b
    assigned = assign_clusters(emb, a)
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert (
        assigned.where(F.col("cluster").isNotNull()).count() == n
    )
    got = {
        r["cluster"]
        for r in assigned.collect()
        if r["cluster"] is not None
    }
    assert got <= set(range(K))  # every assigned id is a model cell


def test_fit_sample_smaller_than_k_raises(emb):
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        CorpusTooSmallError,
    )

    with pytest.raises(CorpusTooSmallError):
        kmeans_fit(emb, K, max_iterations=2, fit_sample=K - 1)


def test_vectorized_kernel_bit_equal_to_expression(spark):
    """The Arrow/numpy kernel must reproduce the pure-Catalyst
    assignment BIT-FOR-BIT, ties included -- the property that lets
    assign_clusters switch paths invisibly. The fixture engineers the
    hard cases: exact distance ties (points equidistant to several
    centroids, centroids duplicated verbatim), zero vectors, a point
    equal to a centroid, and float32-ish values whose squared terms
    round."""
    import random

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        _assign_vectorized,
    )

    rng = random.Random(1234)
    dim = 16
    cents = {
        0: [1.0] + [0.0] * (dim - 1),
        1: [-1.0] + [0.0] * (dim - 1),
        2: [-1.0] + [0.0] * (dim - 1),  # duplicate of 1: forced tie
        3: [rng.uniform(-1, 1) for _ in range(dim)],
    }
    rows = [
        (0, [0.0] * dim),                      # equidistant to 0/1/2
        (1, [1.0] + [0.0] * (dim - 1)),        # exactly centroid 0
        (2, None),                             # NULL vector
        (3, [0.5] * 3),                        # wrong dim
    ] + [
        (10 + i, [rng.uniform(-2, 2) for _ in range(dim)])
        for i in range(200)
    ] + [
        # near-tie band: tiny first-coordinate offsets around 0
        (300 + i, [i * 1e-16] + [0.0] * (dim - 1))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(5)
    expr = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, cents).collect()
    }
    vec = {
        r["vec_id"]: r["cluster"]
        for r in _assign_vectorized(
            df, cents, "embedding", "cluster"
        ).collect()
    }
    assert expr == vec
    assert expr[2] is None and expr[3] is None
    assert expr[0] == 0 and expr[1] == 0  # ties break to smallest cid


def test_vectorized_kernel_masks_null_and_nan_elements(spark):
    """Round-8 ADVICE: np.asarray renders a NULL element as NaN, so a
    correct-width [null, ...] vector used to take the argmin-over-NaN
    path (first centroid, silently) where the Catalyst expression
    NULL-propagates. The kernel now masks any row with a NaN or NULL
    element to NULL cluster before the fold -- stricter than the
    expression's arbitrary pick, never different on valid input."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        _assign_vectorized,
    )

    dim = 4
    cents = {0: [1.0, 0.0, 0.0, 0.0], 1: [-1.0, 0.0, 0.0, 0.0]}
    rows = [
        (0, [0.9, 0.0, 0.0, 0.0]),        # valid -> 0
        (1, [None, 1.0, 1.0, 1.0]),       # NULL element, correct width
        (2, [float("nan"), 0.0, 0.0, 0.0]),  # NaN element
        (3, None),                         # NULL vector
        (4, [-0.9, 0.0, 0.0, 0.0]),       # valid -> 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in _assign_vectorized(df, cents, "embedding", "cluster").collect()
    }
    assert got == {0: 0, 1: None, 2: None, 3: None, 4: 1}


def test_vectorized_kernel_screen_survives_cancellation(spark):
    """Round 9: the kernel screens with the BLAS expansion
    |x|^2 - 2x.c + |c|^2 inside a rigorous rounding band and re-folds
    only the candidates the band cannot separate. The killer fixture
    for a bare expansion is catastrophic cancellation: centroids a
    large vector apart by 1 ulp-scale, rows sitting ON one of them --
    the expansion's value is rounding noise (~|x|^2 * eps >> the true
    distance), so ONLY the band-forced exact refold can reproduce the
    expression path's pick. Also sweeps magnitudes 1e-3..1e3 to pin
    the band's scale invariance."""
    import random

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        _assign_vectorized,
    )

    rng = random.Random(99)
    dim = 16
    big = [1e6 * rng.uniform(0.5, 2.0) for _ in range(dim)]
    cents = {
        0: big,
        1: [v * (1 + 1e-15) for v in big],   # 1 ulp-scale away from 0
        2: [0.0] * dim,
        3: [rng.uniform(-1, 1) for _ in range(dim)],
    }
    rows = [(0, big), (1, [v * (1 + 5e-16) for v in big])]
    vid = 10
    for mag in (1e-3, 1e-1, 1.0, 1e1, 1e3):
        for _ in range(40):
            rows.append(
                (vid, [mag * rng.uniform(-2, 2) for _ in range(dim)])
            )
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)
    expr = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, cents).collect()
    }
    vec = {
        r["vec_id"]: r["cluster"]
        for r in _assign_vectorized(
            df, cents, "embedding", "cluster"
        ).collect()
    }
    assert expr == vec
    assert expr[0] == 0  # exact-zero fold distance beats the 1-ulp twin


def test_vectorized_kernel_routes_finite_overflow_through_fold(spark):
    """Round-9 ADVICE: a FINITE vector with elements ~1e155 overflows
    xx/dots in the BLAS expansion, so its distance row goes inf/NaN,
    the band is meaningless (NaN comparisons silently skip the refold)
    and the raw argmin-over-NaN pick can differ from the fold argmin
    the kernel guarantees bit-equality to. The fixture's expanded d row
    is [NaN, NaN] (both centroids aligned with the huge vector) while
    the fold says centroid 1 wins exactly -- the old isfinite(input)
    guard saw only finite elements and returned np.argmin's first-NaN
    pick (centroid 0). Non-finite d rows must route through the
    reference fold; literal +-inf elements keep their old routing."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        _assign_vectorized,
    )

    cents = {0: [2e155, 0.0], 1: [1e155, 0.0]}
    rows = [
        (0, [1e155, 1.0]),          # overflow class: fold says 1
        (1, [float("inf"), 0.0]),   # literal-inf class: fold ties -> 0
        (2, [0.5, 0.5]),            # ordinary row
        (3, [1e155, 0.0]),          # exactly centroid 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expr = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, cents).collect()
    }
    vec = {
        r["vec_id"]: r["cluster"]
        for r in _assign_vectorized(df, cents, "embedding", "cluster").collect()
    }
    assert expr == vec
    assert expr[0] == 1 and expr[3] == 1
